package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word bigrams of a single-space-tokenized string in one pass.
  *
  * Semantics exactly match the composable formulation
  * `wordNgrams(split(text, " "), 2)` — tokens are the segments
  * between single space characters (empty segments kept, as Spark's
  * `split` and DuckDB's `string_split` both do) and each bigram is
  * `tok(i) + " " + tok(i+1)`. Because the join delimiter IS the split
  * delimiter, every bigram is a contiguous substring of the original
  * text spanning two adjacent segments, so the whole array falls out
  * of one scan over the space positions — no token array, no
  * interpreted `transform`/`concat_ws` lambda per position (the HOF
  * path evaluates outside whole-stage codegen and was the CPU cost of
  * the corpus bigram count at scale).
  */
case class WordBigrams(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    // m spaces -> m+1 segments -> m bigrams; bigram j spans from the
    // start of segment j to the end of segment j+1
    var spaces = 0
    var i = 0
    while (i < n) { if (text.charAt(i) == ' ') spaces += 1; i += 1 }
    if (spaces == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](spaces)
    var startPrevSeg = 0 // start of segment (spaceIdx - 1)
    var startCurSeg = 0  // start of segment spaceIdx
    var spaceIdx = 0
    i = 0
    while (i < n) {
      if (text.charAt(i) == ' ') {
        if (spaceIdx >= 1)
          out(spaceIdx - 1) = UTF8String.fromString(text.substring(startPrevSeg, i))
        startPrevSeg = startCurSeg
        startCurSeg = i + 1
        spaceIdx += 1
      }
      i += 1
    }
    out(spaces - 1) = UTF8String.fromString(text.substring(startPrevSeg, n))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
  override def prettyName: String = "word_bigrams"
}
