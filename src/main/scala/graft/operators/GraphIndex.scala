package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.queries.Pipeline

/** Persisted graph ANN index — s16's deployment story (build once,
  * probe many), completing the persisted-index ladder: RangeIvfIndex
  * holds the inverted lists, PqIndex the compressed codes, GraphIndex
  * the neighbor graph (the index family HNSW-class systems serialize
  * as adjacency lists).
  *
  * Layout under one root:
  *   - `edges/`: (a_id, b_id) — each node's top-M out-neighbors,
  *     partitioned as written (the search joins on a_id; at
  *     warehouse scale bucket by a_id so both hop joins co-locate).
  *   - `pivots/`: (cluster, pid, p_vec) — the per-cell entry points,
  *     k ≈ √n rows, broadcast at probe time.
  *
  * write() materializes exactly the frames the per-query s16 path
  * derives (one shared build definition — Pipeline.graphIndexFrames),
  * and probe() runs the same fixed-horizon search
  * (Pipeline.graphProbe), so IndexSpec can pin loaded-index probes
  * equal to s16 row-for-row. Graph MAINTENANCE is intentionally
  * absent: inserting into a small-world graph rewires existing
  * nodes' neighborhoods (the NN-descent/HNSW insert path), which is
  * a rebuild-class operation here — the s12/s13 frozen-fit append
  * argument does not carry over, and pretending it does would
  * silently degrade the graph. Rebuild on schedule, exactly like
  * quantizer refits.
  */
object GraphIndex {

  def write(s: SparkSession, emb: DataFrame, n: Long, path: String): Unit = {
    val (edges, piv) = Pipeline.graphIndexFrames(
      emb.select(col("vec_id"), col("embedding")), n)
    edges.write.mode("overwrite").parquet(s"$path/edges")
    piv.write.mode("overwrite").parquet(s"$path/pivots")
  }

  /** Fixed-horizon graph search over the loaded frames. `queries`
    * must expose (q_id, q_vec); `emb` supplies exact vectors for the
    * frontier scoring. */
  def probe(s: SparkSession, path: String, emb: DataFrame,
            queries: DataFrame, k: Int): DataFrame =
    Pipeline.graphProbe(
      s.read.parquet(s"$path/edges"),
      s.read.parquet(s"$path/pivots"),
      queries.select(col("q_id"), col("q_vec")), emb, k)
}
