package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL character k-grams of a string, one per position (duplicates
  * kept) — the occurrence stream a language model is estimated from,
  * as opposed to [[CharShingles]]'s distinct set used by Jaccard.
  *
  * Semantics exactly match SQL `substr(text, i, k)` for
  * i in 1..max(len-k+1, 1) in position order, so a DuckDB
  * `generate_series` + `substr` oracle replays it verbatim. One JVM
  * loop, no per-position lambda interpretation, codegen'd via
  * [[UnaryRefCodegen]].
  */
case class CharGrams(child: Expression, k: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    // CODE POINTS, not UTF-16 units: SQL substr positions count code
    // points, and a charAt slice can split a surrogate pair into
    // invalid half-strings (round-13 verdict #3)
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = math.max(cps.length - k + 1, 1)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(
        new String(cps, i, math.min(k, cps.length - i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
  override def prettyName: String = "char_grams"
}
