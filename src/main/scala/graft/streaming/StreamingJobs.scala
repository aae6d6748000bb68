package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming jobs mirroring the batch semantics of
  * e01/e02 in [[graft.queries.Pipeline]] (RDW's exam-event ingest
  * stream, reference /root/reference/docs/Architecture.md "Exam
  * Processor"). Same column expressions as the batch path, so batch
  * is the oracle for the stream (tested with MemoryStream in
  * StreamingSpec).
  *
  * Scale: tumbling-window agg + watermark keeps state bounded to
  * (watermark horizon / window) × key cardinality per partition;
  * dedupe state is bounded the same way. Both shuffle once on the
  * grouping key — the minimum for stateful streaming.
  */
object StreamingJobs {

  /** Tumbling 1-hour counts/sums per event_type. Watermark allows 2h
    * of lateness before state eviction. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Watermarked stream dedupe: first arrival per (user_id,
    * event_type) wins; state for keys older than the watermark is
    * dropped. */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates(Seq("user_id", "event_type"))
}
