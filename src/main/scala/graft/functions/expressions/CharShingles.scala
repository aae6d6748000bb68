package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles of a string in one pass.
  *
  * Same rationale as [[MinHashShingles]]: the composable
  * `transform(sequence(...), i -> substr(text, i, k))` +
  * `array_distinct` formulation evaluates an interpreted lambda per
  * position and then an O(n²)-ish distinct — this does one JVM loop
  * with a HashSet. Semantics exactly match SQL `substr(text, i, k)`
  * for i in 1..max(len-k+1, 1) with duplicates removed, first
  * occurrence order (order is irrelevant to callers — the result is
  * exploded into joins/aggregations).
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    // CODE POINTS, not UTF-16 units: SQL substr positions count code
    // points, and a charAt slice can split a surrogate pair into
    // invalid half-strings (round-13 verdict #3)
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = math.max(cps.length - k + 1, 1)
    val seen = new java.util.LinkedHashSet[String](math.min(n, 1 << 12))
    var i = 0
    while (i < n) {
      seen.add(new String(cps, i, math.min(k, cps.length - i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
  override def prettyName: String = "char_shingles"
}
