package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash over character k-shingles of a string.
  *
  * Why a native Expression instead of the composable
  * `transform`/`aggregate` formulation in TextFunctions: Catalyst
  * higher-order functions are evaluated interpreted (no whole-stage
  * codegen), so numPerms × shingles lambda invocations per row cost
  * ~100 ns each — 100+ s for a 50k-doc corpus. This expression does
  * the whole signature in one tight JVM loop per row (FNV-1a rolling
  * window hash + xxhash-style avalanche mix per permutation, no
  * allocation per shingle), ~1000× less interpreter overhead. At
  * 100 TB this is the difference between a map-only pass and an
  * unusable operator.
  *
  * Duplicates shingles need no dedup: min() is idempotent under
  * repetition.
  */
case class MinHashShingles(child: Expression, k: Int, numPerms: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val n = math.max(text.length - k + 1, 1)
    var i = 0
    while (i < n) {
      val end = math.min(i + k, text.length)
      // FNV-1a over the shingle's chars — no substring allocation.
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < end) { h = (h ^ text.charAt(j)) * 0x100000001b3L; j += 1 }
      var p = 0
      while (p < numPerms) {
        val x = mix(h, p)
        if (x < mins(p)) mins(p) = x
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** murmur3-finalizer avalanche of (h, seed) — a cheap, well-mixed
    * permutation family. */
  @inline private def mix(h: Long, seed: Int): Long = {
    var x = h ^ (seed.toLong * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
  override def prettyName: String = "minhash_shingles"
}
