package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens in one pass.
  *
  * Same rationale as [[MinHashShingles]]: the HOF formulation costs 64
  * interpreted folds per row (one per bit); this walks the string
  * once, hashes each token, and updates 64 counters in a tight loop.
  * Token boundaries are runs of [[SimHashTokens.isSep]] — the
  * RE2-compatible whitespace class `TextFunctions.tokens` splits on.
  *
  * ORACLE-REPLAYABLE bit draws (the d04/t06/d08 family): token hash is
  * the polynomial `fold((acc*131 + char) mod 1e9+7)` and bit b of a
  * token is the PARITY of the affine bijection `(a_b·h + b_b) mod
  * 1e9+7` — prime modulus, everything under 2^63, so DuckDB replays
  * signature construction, chunk blocking and hamming distances in
  * plain SQL. Counter semantics: bit set in token hash → +1, else −1;
  * sig bit b = (count_b > 0); zero tokens → sig 0.
  */
case class SimHashTokens(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {
  import SimHashTokens._

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](64)
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && isSep(text.charAt(i))) i += 1
      if (i < n) {
        var h = 0L
        // fold CODE POINTS (a surrogate pair is ONE oracle char): the
        // separators are ASCII so boundary detection stays charAt,
        // but the hash must match unicode(substr(tok, i, 1)) on any
        // text, supplementary planes included
        while (i < n && !isSep(text.charAt(i))) {
          val cp = text.codePointAt(i)
          h = (h * 131L + cp) % M
          i += Character.charCount(cp)
        }
        var b = 0
        while (b < 64) {
          val v = (as(b) * h + bs(b)) % M
          if ((v & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens =
    copy(child = newChild)
  override def prettyName: String = "simhash_tokens"
}

object SimHashTokens {
  val M = 1000000007L

  /** Per-bit draw constants — independent splitmix64 draws (see
    * [[MinHashShingles.mix64]] for why a shared linear factor is
    * degenerate), offset into a different index stream than the
    * minhash family. Exposed so the DuckDB oracle SQL interpolates
    * the SAME values. */
  def aConst(b: Int): Long = {
    val a = (MinHashShingles.mix64(1000L + 2L * b) >>> 1) % M
    if (a == 0) 1L else a
  }
  def bConst(b: Int): Long = (MinHashShingles.mix64(1000L + 2L * b + 1) >>> 1) % M
  private[expressions] val as: Array[Long] = Array.tabulate(64)(aConst)
  private[expressions] val bs: Array[Long] = Array.tabulate(64)(bConst)

  /** THE engine-wide token-separator set = DuckDB/RE2's `\s` class,
    * exactly [ \t\n\f\r]. Java's `\s` additionally matches U+000B
    * (vertical tab) and Character.isWhitespace matches U+001C–1F,
    * U+2028 etc. — either would silently diverge from the oracle's
    * tokenization on text containing those characters.
    * [[graft.functions.TextFunctions.tokens]] derives its split regex
    * from this constant and [[isSep]] must stay equivalent to
    * membership in it (spec-pinned over the full char range) — one
    * definition, no drift. */
  private[graft] val SepChars: String = " \t\n\f\r"

  /** Hand-unrolled membership test for the hot per-char loops (JIT
    * compiles the comparisons; equivalence with [[SepChars]] is
    * asserted in FunctionsSpec). */
  private[graft] def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
}
