package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashes of every sliding k-TOKEN gram of a single-space-tokenized
  * string, in one pass (the d12/t16 gram unit).
  *
  * Tokens are the segments of `split(text, ' ')` (trailing/empty
  * segments included — Spark's split semantics), and the k-token gram
  * at position p joined by single spaces is EXACTLY the original
  * substring from token p's start to token p+k−1's end, so the gram
  * hash is a substring hash: two prefix-hash arrays (bases 131 and
  * 137, both mod the shared prime M = 1e9+7) make each gram O(1) via
  * hash(l,r) = (P(r) − P(l)·base^(r−l)) mod M, and the emitted value
  * packs the two independent polynomials as h131·M + h137 —
  * collisions need BOTH 1e9-sized hashes to collide (~1e-18/pair),
  * where a single polynomial would birthday-collide in the hundreds
  * of thousands at a 10⁷-gram corpus. The composable formulation this
  * replaces (md5 of array_join(slice(tokens,...)) per position)
  * rebuilds and hashes every gram string from scratch — O(k·|token|)
  * per position and an allocation per gram.
  *
  * Element i of the result is the gram at token position i (0-based);
  * length = n_tokens − k + 1, empty when the doc has fewer than k
  * tokens. Folds Unicode CODE POINTS (one surrogate pair = one fold
  * step) — exactly the DuckDB replay's unicode(substr(...)) fold on
  * ALL inputs, not just BMP text, so the function is safe on the
  * public SQL surface without a corpus contract (the round-7 ADVICE
  * item; d04/d05's older expressions keep the documented BMP
  * contract at their own call sites).
  */
case class TokenGramHashes(child: Expression, k: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val M = MinHashShingles.M // 1e9+7, the shared replayable prime

  override protected def nullSafeEval(input: Any): Any = {
    // one pass to code points: positions below are code-point indexes,
    // so surrogate pairs fold as ONE step — the oracle's unit
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    // token boundaries under single-space splitting: token i spans
    // [starts(i), ends(i)); n tokens = #spaces + 1 (empties included)
    var nTok = 1
    var i = 0
    while (i < len) { if (cps(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < len) {
      if (cps(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    // prefix hashes and powers for both bases, all mod M (products of
    // two sub-1e9+7 longs stay far under Long.MaxValue)
    val p1 = new Array[Long](len + 1); val w1 = new Array[Long](len + 1)
    val p2 = new Array[Long](len + 1); val w2 = new Array[Long](len + 1)
    w1(0) = 1L; w2(0) = 1L
    i = 0
    while (i < len) {
      val c = cps(i).toLong
      p1(i + 1) = (p1(i) * 131L + c) % M
      p2(i + 1) = (p2(i) * 137L + c) % M
      w1(i + 1) = (w1(i) * 131L) % M
      w2(i + 1) = (w2(i) * 137L) % M
      i += 1
    }
    def sub(p: Array[Long], w: Array[Long], l: Int, r: Int): Long = {
      val h = (p(r) - (p(l) * w(r - l)) % M) % M
      if (h < 0) h + M else h
    }
    val nGrams = nTok - k + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val l = starts(g); val r = ends(g + k - 1)
      out(g) = java.lang.Long.valueOf(
        sub(p1, w1, l, r) * M + sub(p2, w2, l, r))
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)
  override def prettyName: String = "token_gram_hashes"
}
