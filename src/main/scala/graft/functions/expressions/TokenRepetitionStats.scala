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
  * turning t08 into a map-only operator. Tokenization replicates
  * `split(trim(text), "[ \t\n\f\r]+")` EXACTLY on every input —
  * trim strips ASCII SPACES only (Spark's and DuckDB's one-arg trim;
  * Java's String.trim strips all of U+0000–0020 and would diverge on
  * tab/newline-bounded text), and split keeps the leading/trailing
  * empty tokens Spark's limit=-1 split and DuckDB's
  * string_split_regex both produce (a leading separator run yields a
  * leading "" token; a trailing run a trailing "" token; empty text
  * one "" token).
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
    val raw = input.asInstanceOf[UTF8String].toString
    // trim ASCII spaces ONLY (= Spark/DuckDB trim); Java's .trim would
    // also strip tab/newline/VT and silently drop the oracle's
    // boundary empty tokens
    var b = 0; var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    val text = raw.substring(b, e)
    if (text.isEmpty) {
      // split('', cls) yields [""] — one empty token, no bigrams
      return new GenericInternalRow(Array[Any](1, 1, 1, 0, 0))
    }
    val uni = new java.util.HashMap[String, Integer]()
    val bi = new java.util.HashMap[String, Integer]()
    var nTok = 0; var topU = 0; var topB = 0
    var prev: String = null
    var i = 0
    var tokStart = 0
    val n = text.length
    def emit(tok: String): Unit = {
      nTok += 1
      val c0 = uni.get(tok)
      val c = if (c0 == null) 1 else c0 + 1
      uni.put(tok, c)
      if (c > topU) topU = c
      if (prev != null) {
        val bg = prev + " " + tok
        val b0 = bi.get(bg)
        val bc = if (b0 == null) 1 else b0 + 1
        bi.put(bg, bc)
        if (bc > topB) topB = bc
      }
      prev = tok
    }
    // split-with-limit=-1 semantics: a token is the (possibly empty)
    // span between separator RUNS, so leading/trailing runs produce
    // boundary "" tokens exactly like Spark split / string_split_regex
    while (i < n) {
      if (SimHashTokens.isSep(text.charAt(i))) {
        emit(text.substring(tokStart, i))
        i += 1
        while (i < n && SimHashTokens.isSep(text.charAt(i))) i += 1
        tokStart = i
      } else i += 1
    }
    emit(text.substring(tokStart, n))
    val nBi = if (nTok >= 2) nTok - 1 else 0
    new GenericInternalRow(Array[Any](nTok, uni.size, topU, nBi, topB))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "token_repetition_stats"
}
