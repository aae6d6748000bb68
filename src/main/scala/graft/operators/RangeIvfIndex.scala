package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted form of the s07 IVF range-search index (reference role:
  * the reusable vector index a warehouse deployment keeps next to the
  * embedding table, rather than re-deriving per query).
  *
  * Two parquet frames under one root:
  *   - `assigned/`: (cand_id, embedding, cluster) — the corpus with
  *     its quantizer cell; partitioned BY cluster so a probe that
  *     admits few cells prunes to few files (PartitionFilters, not a
  *     post-scan filter).
  *   - `cells/`: (cluster, cv, bmin) — one row per cell: centroid and
  *     angular radius (min member cosine). k ≈ √n rows total; always
  *     broadcast-sized.
  *
  * Build once with [[write]]; every later
  * [[probe]] skips the quantizer fit, the corpus assignment pass, and
  * the per-cell radius agg — the admission test plus the probe join
  * are the only per-query work. The probe emits exactly the
  * brute-force rows (the s07 spherical-triangle bound is a proof, not
  * a heuristic), so the index changes the cost, never the answer.
  */
object RangeIvfIndex {

  /** Fit + assign + radius-agg over an (vec_id, embedding) corpus and
    * persist the index under `path`. `n` is the corpus cardinality
    * (from parquet footer metadata in deployment — no scan). */
  def write(s: SparkSession, emb: DataFrame, n: Long, path: String): Unit = {
    val (cands, cellMeta) = graft.queries.Pipeline.rangeIvfIndex(s, emb, n)
    cands.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assigned")
    cellMeta.write.mode("overwrite").parquet(s"$path/cells")
  }

  /** Load the two index frames. The assigned frame's scan carries the
    * cluster partition column; cells is broadcast-sized by design. */
  def read(s: SparkSession, path: String): (DataFrame, DataFrame) =
    (s.read.parquet(s"$path/assigned"),
     s.read.parquet(s"$path/cells"))

  /** Range search over a persisted index: for each query vector, all
    * corpus vectors with cosine ≥ tau — exactly the brute-force rows.
    * `queries` must expose (q_id, q_vec). */
  def probe(s: SparkSession, path: String, queries: DataFrame,
            tau: Double): DataFrame = {
    val (cands, cellMeta) = read(s, path)
    val admitted = graft.queries.Pipeline.rangeIvfAdmit(
      cellMeta, queries.select(col("q_id"), col("q_vec")), tau)
    graft.queries.Pipeline.rangeIvfProbe(cands, admitted, tau)
  }

  /** Exact top-k over a persisted index (s08's seed-then-prove):
    * brute-force rows, admitted-list cost. `queries` must expose
    * (q_id, q_vec). */
  def topk(s: SparkSession, path: String, queries: DataFrame,
           k: Int, seedCells: Int = 3): DataFrame = {
    val (cands, cellMeta) = read(s, path)
    graft.queries.Pipeline.topkProbe(
      cands, cellMeta, queries.select(col("q_id"), col("q_vec")), k, seedCells)
  }
}
