package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.QUtil._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Operators

/** Cross-family primitives shared by every pipeline trait:
  * the query signature, the stopword list, the input-spread helper,
  * the quality-score parts, and the level-by-level sequence packer. */
private[graft] trait PipelineShared {
  type Q = (SparkSession, String) => DataFrame

  private[queries] val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** documents is a single small parquet file → Spark schedules ONE
    * task for it, serializing the CPU-heavy per-row work (shingling,
    * hashing). Spread it across the cluster first — at warehouse
    * scale the input arrives already partitioned and this is a no-op
    * choice, but an engine must not be single-threaded just because
    * the scan is. */
  private[queries] def docsSpread(s: SparkSession, d: String) =
    T.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  // Quality formula shared by t02 (scoring) and p01 (curation gate):
  // one definition so the two queries can never drift apart.
  private[queries] def qualityParts = {
    val toks = TF.tokens(col("text"))
    val nTok = size(toks)
    val stopRatio = TF.tokenCountIn(toks, stopwords).cast(DoubleType) / nTok
    val punctRatio = length(regexp_replace(col("text"), "[a-z0-9 \\t\\n\\f\\r]", ""))
      .cast(DoubleType) / length(col("text"))
    val quality = lit(0.5) * least(lit(1.0), nTok / lit(100.0)) +
      lit(0.3) * (lit(1.0) - stopRatio) - lit(0.2) * punctRatio
    (nTok, stopRatio, punctRatio, quality)
  }

  // -- p02: sequence packing into context windows --------------------------
  // Pretraining packs documents by concatenating each source stream
  // and slicing at the context length: a doc's bin is its starting
  // token offset DIV the context budget, its offset within the bin
  // the remainder. A single per-source running-sum window would be
  // CORRECT but serializes each source onto one task — with a fixed
  // source count the per-partition work grows linearly with the
  // corpus (measured: 12× at a 10× corpus). So the prefix sum is
  // hierarchical: local cumsums per (source, shard) run in parallel
  // across shards (shard = contiguous doc_id range, so shard order =
  // stream order), the shard-total table (#shards rows, corpus/512)
  // is prefix-summed per source and broadcast back as base offsets.
  // Same output as the flat window — the DuckDB oracle IS the flat
  // window — deterministic integer arithmetic throughout.
  /** The hierarchical prefix sum p02 pioneered, over an arbitrary
    * per-doc `cost` column (ONE definition shared by p02's text-only
    * packing and m04's multimodal packing, so the two can never
    * disagree about the packing arithmetic): local cumsums per
    * (source, shard) in parallel, shard-total table prefix-summed per
    * source and broadcast back as base offsets. Identical output to
    * the flat per-source window — which would serialize each source
    * onto one task — with shard-level parallelism. Expects
    * (doc_id, source, cost [+ carried columns]); adds start_tok /
    * bin_id / bin_offset. */
  private[graft] def hierarchicalPack(base: DataFrame, budget: Int,
                               shardSize: Int): DataFrame = {
    val sharded = base.withColumn("shard", expr(s"doc_id div $shardSize"))
    val wLocal = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("local_cum", sum(col("cost")).over(wLocal))
    val offsets = sharded.groupBy(col("source"), col("shard"))
      .agg(sum(col("cost")).as("shard_tokens"))
      .withColumn("base_off",
        coalesce(sum(col("shard_tokens")).over(
          Window.partitionBy(col("source")).orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("shard"), col("base_off"))
    local.join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("start_tok",
        col("base_off") + col("local_cum") - col("cost"))
      .withColumn("bin_id", expr(s"start_tok div $budget"))
      .withColumn("bin_offset", pmod(col("start_tok"), lit(budget)))
  }

}
