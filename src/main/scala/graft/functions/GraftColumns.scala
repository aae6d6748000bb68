package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SqlBridge

import graft.functions.expressions.{CharGramCounts, CharGrams, CharShingles, CosineSimilarity, HllRegisters, HyperplaneSignature, MinHashShingles, NearestCentroidSq, NearestClusters, SimHashTokens, TokenGramHashes, TokenRepetitionStats, WinnowFingerprint, WordBigrams}

/** Column-API entry points for graft's native Catalyst expressions. */
object GraftColumns {
  /** MinHash signature of `text`'s character k-shingles as
    * array<long> of length numPerms — single compiled pass per row
    * (see [[MinHashShingles]]). */
  def minHashShingles(text: Column, k: Int, numPerms: Int): Column =
    SqlBridge.column(MinHashShingles(SqlBridge.expression(text), k, numPerms))

  /** Distinct character k-shingles in one pass (see [[CharShingles]]). */
  def charShingles(text: Column, k: Int): Column =
    SqlBridge.column(CharShingles(SqlBridge.expression(text), k))

  /** ALL character k-grams, duplicates kept — the LM occurrence
    * stream (see [[CharGrams]]). */
  def charGrams(text: Column, k: Int): Column =
    SqlBridge.column(CharGrams(SqlBridge.expression(text), k))

  /** Per-doc k-gram count map (sorted array<struct<g,c>>) — see
    * [[graft.functions.expressions.CharGramCounts]]. */
  def charGramCounts(text: Column, k: Int): Column =
    SqlBridge.column(CharGramCounts(SqlBridge.expression(text), k))

  /** 64-bit SimHash over whitespace tokens in one pass (see
    * [[SimHashTokens]]). */
  def simHashTokens(text: Column): Column =
    SqlBridge.column(SimHashTokens(SqlBridge.expression(text)))

  /** Word bigrams of single-space-tokenized text in one pass (see
    * [[WordBigrams]]). */
  def wordBigrams(text: Column): Column =
    SqlBridge.column(WordBigrams(SqlBridge.expression(text)))

  /** Sliding k-token gram hashes (double-polynomial rolling hash) in
    * one pass — the d12/t16 gram unit (see [[TokenGramHashes]]). */
  def tokenGramHashes(text: Column, k: Int): Column =
    SqlBridge.column(TokenGramHashes(SqlBridge.expression(text), k))

  /** Learned-vocab greedy longest-match token counting in one pass —
    * struct(ws_tokens, learned_tokens) per doc (see
    * [[graft.functions.expressions.LearnedTokenStats]]). `vocab` is
    * driver-fit (Pipeline.learnedVocab), held once per JVM like
    * [[nearestClusters]]' centroid matrix. */
  def learnedTokenStats(text: Column, vocab: Seq[String]): Column =
    SqlBridge.column(graft.functions.expressions.LearnedTokenStats(
      SqlBridge.expression(text), vocab))

  /** Cosine similarity of two numeric arrays in one pass (see
    * [[CosineSimilarity]]). */
  def cosineSim(a: Column, b: Column): Column =
    SqlBridge.column(CosineSimilarity(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Winnowed rolling-hash document fingerprint (see
    * [[WinnowFingerprint]]). */
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    SqlBridge.column(WinnowFingerprint(SqlBridge.expression(text), k, w))

  /** Indices of the k nearest centroids by cosine, one tight loop per
    * row (see [[NearestClusters]]). Centroids are driver-side
    * (quantizer output), held as a plain matrix, not per-row
    * re-evaluated literals. */
  def nearestClusters(vec: Column, centroids: Array[Array[Double]], k: Int): Column =
    SqlBridge.column(NearestClusters(SqlBridge.expression(vec),
      centroids.map(_.toIndexedSeq).toIndexedSeq, k))

  /** Exact-integer argmin centroid assignment for the replayable
    * Lloyd fit — subspace-aware, strict-`<` lowest-index ties (see
    * [[NearestCentroidSq]]). */
  def nearestCentroidSq(subspace: Column, qvec: Column,
                        centroids: Array[Array[Array[Long]]]): Column =
    SqlBridge.column(NearestCentroidSq(SqlBridge.expression(subspace),
      SqlBridge.expression(qvec),
      centroids.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** 64-bit-max hyperplane LSH signature against a precomputed plane
    * matrix, one tight loop per row (see [[HyperplaneSignature]]). */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    SqlBridge.column(HyperplaneSignature(SqlBridge.expression(vec),
      planes.map(_.toIndexedSeq).toIndexedSeq))

  /** Per-document repetition stats struct in one pass (see
    * [[TokenRepetitionStats]]). */
  def tokenRepetitionStats(text: Column): Column =
    SqlBridge.column(TokenRepetitionStats(SqlBridge.expression(text)))

  /** HyperLogLog register aggregate over a 32-bit hash column:
    * struct(s_total, v_zero), mergeable 256-byte buffer (see
    * [[HllRegisters]]). */
  def hllRegisters(hash32: Column): Column =
    SqlBridge.column(
      HllRegisters(SqlBridge.expression(hash32)).toAggregateExpression())
}
