package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character k-gram COUNT MAP in one pass:
  * `array<struct<g:string, c:int>>`, sorted by gram.
  *
  * The t09 LM pipeline previously exploded every gram OCCURRENCE
  * ([[CharGrams]]) and aggregated to per-(doc, gram) counts through a
  * groupBy — a shuffle whose map side materializes O(chars) rows per
  * document before the partial aggregate compresses them. This
  * expression does the per-doc aggregation inside the row (the
  * [[TokenRepetitionStats]] pattern): the explode that follows emits
  * ALREADY-COUNTED (gram, count) pairs, so the first exchange of the
  * pipeline disappears entirely and the gram stream leaves the scan
  * at distinct-grams-per-doc cardinality, never occurrences.
  *
  * Gram semantics are exactly [[CharGrams]]'s (SQL `substr(text, i,
  * k)` for i in 1..max(len-k+1, 1)), so the DuckDB
  * `generate_series`+`substr`+`GROUP BY` oracle replays the counts
  * verbatim; the sorted output order makes the emitted array
  * deterministic (it feeds aggregation, but determinism keeps fresh
  * Verify runs byte-identical).
  */
case class CharGramCounts(child: Expression, k: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("c", IntegerType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    // CODE POINTS, not UTF-16 units — see CharGrams (round-13 #3)
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = math.max(cps.length - k + 1, 1)
    val counts = new java.util.TreeMap[String, Integer]()
    var i = 0
    while (i < n) {
      val g = new String(cps, i, math.min(k, cps.length - i))
      val c = counts.get(g)
      counts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramCounts =
    copy(child = newChild)
  override def prettyName: String = "char_gram_counts"
}
