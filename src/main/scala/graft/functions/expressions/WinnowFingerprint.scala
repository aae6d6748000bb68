package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprint (MOSS-style): polynomial rolling hash
  * of every character k-gram, then the minimum over each sliding window
  * of `w` consecutive k-gram hashes; the fingerprint is the sorted
  * distinct set of selected minima. Near-identical documents share most
  * fingerprints — the locality property that makes this the standard
  * copy-detection sketch.
  *
  * One compiled pass per row: the k-gram hash is updated incrementally
  * (true rolling update, O(1) per position after the first gram), and
  * the window minima in a second O(n·w) sweep. Hash family is
  * `h = (h·131 + c) mod 1e9+7` over code points — replicated exactly by
  * the DuckDB oracle via `list_reduce`, so t06 is oracle-exact.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryRefCodegen {
  require(k >= 2 && w >= 1, "winnow_fingerprint requires k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val M = 1000000007L
  private val B = 131L
  // B^(k-1) mod M, to roll the leading char out
  private val BK: Long = {
    var r = 1L; var i = 0
    while (i < k - 1) { r = r * B % M; i += 1 }
    r
  }

  override protected def nullSafeEval(input: Any): Any = {
    // CODE POINTS, not UTF-16 units: gram positions and the rolled
    // values must match the oracle's unicode(substr(..)) replay on
    // any text, supplementary planes included (round-13 verdict #3)
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val numGrams = n - k + 1
    if (numGrams < w) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](numGrams)
    var acc = 0L
    var i = 0
    while (i < k) { acc = (acc * B + cps(i)) % M; i += 1 }
    h(0) = acc
    i = 1
    while (i < numGrams) {
      // roll out gram i-1's lead, roll in code point i+k-1; keep the
      // residue positive
      acc = ((acc - cps(i - 1) * BK % M + M) % M * B + cps(i + k - 1)) % M
      h(i) = acc
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= numGrams - w) {
      var m = h(i); var j = 1
      while (j < w) { if (h(i + j) < m) m = h(i + j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint"
}
