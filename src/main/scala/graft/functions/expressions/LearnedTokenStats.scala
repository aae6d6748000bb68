package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Learned-vocab token counting in one compiled pass:
  * `struct(ws_tokens, learned_tokens)` per document.
  *
  * `vocab` is the learned unit inventory (driver-fit: the top-V
  * corpus substrings by exact frequency — see Pipeline.learnedVocab),
  * and a document's learned token count is what a greedy
  * LONGEST-MATCH tokenizer (the WordPiece inference rule) emits:
  * each whitespace word is scanned left to right, at every position
  * the longest vocab unit that matches is consumed as one token, and
  * a position no unit covers consumes one code point as one token
  * (the byte/char-fallback convention, so segmentation never fails).
  * Whitespace words are the segments of `split(text, ' ')`, empties
  * skipped; `ws_tokens` counts those words, so the two counts price
  * the same stream under the two definitions.
  *
  * The declarative alternative (explode words → join a distinct-word
  * segmentation frame → re-aggregate per doc) moves one row per word
  * occurrence through two shuffles; this is a map-only scan with the
  * ≤V-entry vocab held once per JVM. Positions are Unicode CODE
  * POINTS (TokenGramHashes' convention) and candidate pieces compare
  * as code-point substrings, exactly the DuckDB replay's
  * substr()-equality — identical on all inputs, not just BMP.
  */
case class LearnedTokenStats(child: Expression, vocab: Seq[String])
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("learned_tokens", LongType, nullable = false)))

  // vocab units bucketed by code-point length: byLen(n) holds the
  // length-n units, maxLen bounds the longest-match probe window
  @transient private lazy val byLen: Array[java.util.HashSet[String]] = {
    val maxL = if (vocab.isEmpty) 1
      else vocab.iterator.map(u => u.codePointCount(0, u.length)).max
    val a = Array.fill(maxL + 1)(new java.util.HashSet[String]())
    vocab.foreach { u => a(u.codePointCount(0, u.length)).add(u) }
    a
  }

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val sets = byLen
    val maxL = sets.length - 1
    var ws = 0L
    var learned = 0L
    var i = 0
    val n = cps.length
    while (i <= n) {
      // word = [i, j) up to the next single-space separator
      var j = i
      while (j < n && cps(j) != ' ') j += 1
      if (j > i) {
        ws += 1
        var pos = i
        while (pos < j) {
          var len = math.min(maxL, j - pos)
          var matched = 0
          while (matched == 0 && len >= 2) {
            if (sets(len).contains(new String(cps, pos, len))) matched = len
            else len -= 1
          }
          pos += (if (matched == 0) 1 else matched)
          learned += 1
        }
      }
      i = j + 1
    }
    new GenericInternalRow(Array[Any](ws, learned))
  }

  override protected def withNewChildInternal(newChild: Expression): LearnedTokenStats =
    copy(child = newChild)
  override def prettyName: String = "learned_token_stats"
}
