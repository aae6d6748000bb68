package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in one pass:
  * `struct(n_tok, n_distinct, top_token_c, n_bi, top_bigram_c)`.
  *
  * The declarative formulation (explode tokens → groupBy(doc, gram) →
  * groupBy(doc), twice, then a doc_id join) costs four shuffles and
  * materializes one row per gram occurrence — at corpus scale that is
  * tokens-per-doc × docs exchange rows for what is a per-row
  * computation. This walks the string once with two open-addressing-ish
  * hash maps (unigram, bigram) whose size is bounded by tokens-per-doc,
  * turning t08 into a map-only operator. Token boundaries are runs of
  * [[SimHashTokens.isSep]] (the RE2-compatible class
  * `TextFunctions.tokens` splits on), including the split's empty-text
  * behavior (one empty token).
  */
case class TokenRepetitionStats(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_token_c", IntegerType, nullable = false),
    StructField("n_bi", IntegerType, nullable = false),
    StructField("top_bigram_c", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    if (text.isEmpty) {
      // split(trim(''), "\s+") yields [""] — one empty token, no bigrams
      return new GenericInternalRow(Array[Any](1, 1, 1, 0, 0))
    }
    val uni = new java.util.HashMap[String, Integer]()
    val bi = new java.util.HashMap[String, Integer]()
    var nTok = 0; var topU = 0; var topB = 0
    var prev: String = null
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && SimHashTokens.isSep(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !SimHashTokens.isSep(text.charAt(i))) i += 1
        val tok = text.substring(start, i)
        nTok += 1
        val c0 = uni.get(tok)
        val c = if (c0 == null) 1 else c0 + 1
        uni.put(tok, c)
        if (c > topU) topU = c
        if (prev != null) {
          val bg = prev + " " + tok
          val b0 = bi.get(bg)
          val b = if (b0 == null) 1 else b0 + 1
          bi.put(bg, b)
          if (b > topB) topB = b
        }
        prev = tok
      }
    }
    val nBi = if (nTok >= 2) nTok - 1 else 0
    new GenericInternalRow(Array[Any](nTok, uni.size, topU, nBi, topB))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "token_repetition_stats"
}
