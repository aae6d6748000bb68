package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation,
  * built entirely from `org.apache.spark.sql.functions` higher-order
  * functions so every step stays inside whole-stage codegen (no UDFs;
  * see the build brief's "Functions, not UDFs").
  */
object TextFunctions {

  /** Character k-shingles of `text` as an array (distinct not applied —
    * callers explode + distinct as needed). 1-based `substring`
    * matches SQL semantics on both Spark and DuckDB. */
  def shingles(text: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k)))

  /** Whitespace tokens (trimmed, split on runs of whitespace). The
    * split class derives from [[expressions.SimHashTokens.SepChars]]
    * rather than `\s` because Java's `\s` includes U+000B while
    * DuckDB/RE2's does not — the explicit class is the set both
    * engines mean, so oracle tokenization agrees on ALL inputs, and
    * the native expressions share the same single definition. */
  def tokens(text: Column): Column =
    split(trim(text), "[" + expressions.SimHashTokens.SepChars + "]+")

  /** Canonical text: lowercase, non-alphanumeric runs collapsed to a
    * single space, trimmed — the normalization step of RDW's ingest
    * validation generalized to document fingerprinting. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Word n-grams (n >= 2) joined by a single space. Spark `sequence`
    * counts DOWN when stop < start, so short arrays are guarded to an
    * empty result explicitly. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array())
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))

  /** Count of tokens that are members of `words`. */
  def tokenCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Deterministic 64-bit mix of a string via two xxhash64 seeds —
    * used as the hash family for MinHash/SimHash. Pure column
    * expression, codegen'd. */
  def hash64(c: Column, seed: Int): Column = xxhash64(lit(seed), c)

  /** Count-min-sketch bucket for hash row `r`: the first 16 md5 bits
    * of "tok|r" mod `width`. md5 agrees across engines, so a sketch
    * built on this family replays bit-for-bit in a DuckDB oracle.
    * ONE definition shared by the batch sketch (t10) and the
    * continuously-maintained one (e08/cmsStream) — batch, stream and
    * oracle cannot diverge. */
  def cmsBucket(tok: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(tok, lit(s"|$r"))), 1, 4), 16, 10)
      .cast(org.apache.spark.sql.types.IntegerType) % width

  /** MinHash signature: hash each element ONCE with xxhash64, then
    * derive the `numPerms` permutations arithmetically (xor-multiply
    * mix with odd constants — bijective on Long, overflow wraps
    * deterministically). One string-hash pass instead of numPerms
    * passes: this is what keeps the signature O(shingles) per row at
    * corpus scale. Pure column expressions, no shuffle, no UDF. */
  def minHashSignature(elems: Column, numPerms: Int): Column =
    minHashFromHashes(transform(elems, e => xxhash64(e)), numPerms)

  /** MinHash from a pre-hashed long array. IMPORTANT at scale: bind
    * the hash array with its own `withColumn` before calling this —
    * higher-order functions are not whole-stage-codegen'd, so an
    * inline hash expression would be re-evaluated once per
    * permutation instead of once per row. */
  def minHashFromHashes(hashes: Column, numPerms: Int): Column =
    // xxhash64 over (seed, long) is fixed-width input — cheap, and
    // ANSI-safe (a raw multiply mix overflows under Spark 4 ANSI mode).
    transform(sequence(lit(0), lit(numPerms - 1)),
      s => aggregate(hashes, lit(Long.MaxValue),
        (acc, h) => least(acc, xxhash64(s, h))))

  /** 64-bit SimHash over token array: per bit, sign of the sum of
    * (+1/-1) contributions of each token's hash bit. Tokens are
    * hashed once up front; the 64 bit-sums then fold over longs. */
  def simHash(toks: Column): Column = simHashFromHashes(transform(toks, t => xxhash64(t)))

  /** SimHash from a pre-hashed long array — same binding caveat as
    * [[minHashFromHashes]]. */
  def simHashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
