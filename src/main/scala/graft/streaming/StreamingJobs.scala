package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
    * event_type) wins. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) is what actually bounds the state: with the
    * plain variant Spark only evicts dedup state when the event-time
    * column is part of the duplicate keys — it isn't here — so state
    * would grow with distinct keys forever. The within-watermark
    * variant expires each key's state once the watermark passes its
    * first-seen time + delay, which is the semantics a re-submission
    * window needs (duplicates arrive close together; a re-submission
    * 2 h later is a legitimate new version, handled by latest-wins
    * downstream). */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Stream-stream interval join (click→purchase attribution): each
    * purchase matches same-user clicks at most 1 h before it. Both
    * sides watermarked; the time-range bound lets Spark evict click
    * state older than (purchase watermark − 1 h), so join state is
    * O(1 h of clicks), never O(stream). One shuffle per side on
    * user_id. `withWatermark` is a no-op in batch, so the same
    * function run on batch frames is the oracle for the stream.
    *
    * Expects `clicks(user_id, click_id, click_ts)` and
    * `purchases(p_user_id, purchase_id, purchase_ts, value)`. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("click_ts", "2 hours")
      .join(purchases.withWatermark("purchase_ts", "2 hours"),
        col("user_id") === col("p_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))

  /** Streaming corpus curation: quality/language gates + per-window
    * per-language admission stats over a document stream — the
    * continuous form of the batch curation chain (p01's gates). The
    * caller supplies the quality expression so stream and batch can
    * never diverge (it IS the batch formula). `withWatermark` is a
    * no-op in batch, so running this same function on a batch frame
    * is the oracle for the stream (e03's trick).
    *
    * Scale: gates are map-side; one shuffle on (window, lang); state
    * bounded to (watermark horizon / window) × languages. */
  def curateStream(docs: DataFrame, quality: org.apache.spark.sql.Column): DataFrame =
    docs
      .withWatermark("ts", "2 hours")
      .withColumn("kept", col("lang") === "en" && quality >= 0.55)
      .groupBy(window(col("ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("n_kept"))

  /** Streaming migrate: keeps a latest-state mart continuously up to
    * date with a change stream — RDW's Migrate Reporting Service
    * ("watches the data warehouse for changes and copies any changes
    * … within a few minutes", reference
    * /root/reference/docs/Architecture.md "Migrate Reporting
    * Service"). Each micro-batch merges into the mart via
    * [[graft.operators.Operators.migrateWithDeletes]] (latest-wins
    * across upserts AND tombstones) and publishes a NEW snapshot
    * directory `v_<batchId>`, then atomically swaps the `_LATEST`
    * pointer file. Snapshot-versioning rather than in-place
    * overwrite: Spark (correctly) refuses to overwrite a path it is
    * reading, a failed publish leaves the previous snapshot live, and
    * old snapshots give time travel for free — the same commit model
    * table formats use. Batch replays after a restart are idempotent
    * in BOTH crash windows: before the publish, the replay rebuilds
    * `v_<batchId>` from the previous snapshot; after the publish (but
    * before the checkpoint commit), `_LATEST` already names
    * `v_<batchId>`, so the replay detects the applied batch and
    * skips the merge entirely — it must, because re-merging would
    * read the very directory it overwrites.
    *
    * Scale: the merge is one shuffle on the natural key per batch;
    * the snapshot write is the same partitioned layout as any mart
    * write. At warehouse scale the mart would be key-partitioned so
    * only touched partitions rewrite; here the full-snapshot write
    * keeps the commit model exact.
    */
  def migrateStream(updates: DataFrame, martRoot: String,
                    keys: Seq[String], versionCol: String, tieBreakCol: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        // Replay after a crash between publishLatest and the streaming
        // checkpoint commit: the batch was fully applied, _LATEST already
        // points at this batch's snapshot. Merging again would read
        // v_<batchId> while overwriting it — skip instead.
        if (readLatestName(sp, martRoot).contains(s"v_$batchId")) ()
        else {
        val ordering = Seq(col(versionCol).desc, col(tieBreakCol).desc)
        val merged = readMartLatest(sp, martRoot) match {
          case Some(current) =>
            // the published mart carries only survivors (the deleted
            // column is dropped at merge time) — every mart row is
            // alive, so it re-enters the merge with deleted = false
            graft.operators.Operators.migrateWithDeletes(
              current.withColumn("deleted", lit(false)),
              batch.toDF(), keys.map(col), ordering)
          case None =>
            graft.operators.Operators.migrateWithDeletes(
              batch.toDF().limit(0), batch.toDF(), keys.map(col), ordering)
        }
        val snapshot = s"$martRoot/v_$batchId"
        merged.write.mode("overwrite").parquet(snapshot)
        publishLatest(sp, martRoot, s"v_$batchId")
        }
        ()
      }
      .start()

  /** Read the current mart snapshot via the `_LATEST` pointer. */
  def readMartLatest(spark: SparkSession, martRoot: String): Option[DataFrame] =
    readLatestName(spark, martRoot)
      .map(name => spark.read.parquet(s"$martRoot/$name"))

  /** The snapshot directory name `_LATEST` currently points at, if any. */
  def readLatestName(spark: SparkSession, martRoot: String): Option[String] = {
    val fs = fileSystem(spark, martRoot)
    val ptr = new org.apache.hadoop.fs.Path(martRoot, "_LATEST")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      Some(try scala.io.Source.fromInputStream(in).mkString.trim finally in.close())
    }
  }

  private def publishLatest(spark: SparkSession, martRoot: String, name: String): Unit = {
    val fs = fileSystem(spark, martRoot)
    val tmp = new org.apache.hadoop.fs.Path(martRoot, s"_LATEST.tmp")
    val ptr = new org.apache.hadoop.fs.Path(martRoot, "_LATEST")
    val out = fs.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    fs.delete(ptr, false)
    if (!fs.rename(tmp, ptr))
      throw new java.io.IOException(s"failed to publish mart snapshot $name")
  }

  private def fileSystem(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  case class EventRow(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based streaming sessionization with explicit per-key state
    * (flatMapGroupsWithState + event-time timeout): a session closes
    * when a later event arrives past the gap, or when the watermark
    * passes last-event + gap. State per key is one small struct —
    * bounded regardless of stream length, the property that matters
    * on an unbounded 100 TB/day stream. Mirrors the batch
    * [[graft.operators.Operators.sessionize]] semantics.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[EventRow],
                       gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, it: Iterator[EventRow],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      def emit(st: SessionState) = SessionOut(userId,
        new Timestamp(st.start), new Timestamp(st.last), st.n, st.sum)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var st = state.getOption.orNull
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val t = e.ts.getTime
          st = if (st == null) SessionState(t, t, 1, e.value)
          else if (t - st.last > gapMs) { closed += emit(st); SessionState(t, t, 1, e.value) }
          else st.copy(last = math.max(st.last, t), n = st.n + 1, sum = st.sum + e.value)
        }
        if (st != null) {
          state.update(st)
          // setTimeoutTimestamp throws if the requested time is not
          // strictly after the current watermark — reachable here
          // because flatMapGroupsWithState does NOT pre-drop late
          // events, so a straggler with last + gap <= watermark would
          // otherwise kill the query. Clamp: the session then times
          // out on the next trigger, which is the correct semantics
          // for an already-expired session.
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(st.last + gapMs, wm + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class SessRow(user_id: Long, ts: Timestamp, cents: Long)
  case class SessAgg(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, cents: Long)

  /** Oracle-grade gap sessionization with explicit per-key state: the
    * same flatMapGroupsWithState shape as [[sessionizeStream]], but
    * every quantity the state holds is an exact integer — event time
    * as epoch MICROseconds (events carry sub-millisecond precision a
    * long-ms state would silently truncate) and money as cents
    * (pre-cast through Catalyst's DECIMAL(12,2), the cast already
    * proven to match DuckDB's) — so the BATCH run of this exact code
    * path hash-matches a declarative SQL oracle (e07). In batch the
    * timeout machinery does not exist; end-of-input plays the role of
    * the watermark, so the trailing open session emits instead of
    * parking in state (detected by the watermark probe throwing).
    *
    * Scale: state per key is one 4-long struct, bounded regardless of
    * stream length; one shuffle on user_id.
    */
  def sessionizeExact(events: Dataset[SessRow],
                      gapSeconds: Long): Dataset[SessAgg] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

    def update(userId: Long, it: Iterator[SessRow],
               state: GroupState[SessAgg]): Iterator[SessAgg] = {
      if (state.hasTimedOut) {
        val out = state.getOption.iterator
        state.remove()
        out
      } else {
        val sorted = it.toSeq.sortBy(r => micros(r.ts))
        var st = state.getOption.orNull
        val closed = Seq.newBuilder[SessAgg]
        sorted.foreach { e =>
          val t = micros(e.ts)
          st = if (st == null) SessAgg(userId, t, t, 1, e.cents)
          else if (t - st.end_us > gapUs) {
            closed += st; SessAgg(userId, t, t, 1, e.cents)
          } else st.copy(end_us = math.max(st.end_us, t),
            n_events = st.n_events + 1, cents = st.cents + e.cents)
        }
        if (st != null) {
          try {
            val wm = state.getCurrentWatermarkMs()
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.end_us / 1000L + gapSeconds * 1000L, wm + 1))
          } catch { case _: UnsupportedOperationException =>
            // batch mode: no watermark, no timeouts — end of input
            // closes the trailing session
            closed += st
          }
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class ChunkRow(chunk: Int, cv: Long, doc_id: Long, ts: Timestamp, sig: Long)
  case class NearDupHit(chunk: Int, a_id: Long, b_id: Long, hamming: Int)
  case class BucketState(entries: List[(Long, Long, Long)]) // (docId, sig, tsMs)

  /** Streaming near-duplicate detection over a document stream — the
    * continuous form of d05's SimHash dedup: each doc's 64-bit SimHash
    * (native [[graft.functions.expressions.SimHashTokens]]) splits
    * into 4 × 16-bit chunks; by pigeonhole, any pair within hamming
    * distance 3 agrees on at least one chunk, so per-(chunk, value)
    * buckets are a complete blocking scheme. Each bucket holds the
    * docs seen within `horizonSeconds` of event time and emits a hit
    * for every prior doc within hamming ≤ 3 of a new arrival.
    *
    * Output: (chunk, a_id, b_id, hamming) with a earlier than b by
    * (ts, doc_id) — a pair near-dup via k chunks appears k times, as
    * in d05's per-chunk candidate semantics; the declarative
    * equivalent (self-join on (chunk, value) with an event-time range
    * predicate) is the batch oracle, spec-asserted against BOTH the
    * batch run of this code path and the incremental MemoryStream run.
    *
    * Scale: state per bucket is the docs within the horizon that share
    * a 16-bit chunk value — the stream-time analogue of d05's bounded
    * buckets; event-time timeout evicts whole buckets once the
    * watermark passes. Signature + chunking are map-side; the only
    * shuffle is the groupByKey on (chunk, value).
    */
  def nearDupStream(chunked: Dataset[ChunkRow],
                    horizonSeconds: Long): Dataset[NearDupHit] = {
    import chunked.sparkSession.implicits._
    val horizonMs = horizonSeconds * 1000L

    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    def update(key: (Int, Long), it: Iterator[ChunkRow],
               state: GroupState[BucketState]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // (ts, doc_id) order makes pair direction deterministic in
        // batch mode and across micro-batch boundaries
        val sorted = it.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
        var entries = state.getOption.map(_.entries).getOrElse(Nil)
        val hits = Seq.newBuilder[NearDupHit]
        var maxTs = Long.MinValue
        sorted.foreach { r =>
          val t = r.ts.getTime
          maxTs = math.max(maxTs, t)
          entries = entries.filter(_._3 >= t - horizonMs)
          entries.foreach { case (aId, aSig, _) =>
            val h = ham(aSig, r.sig)
            if (h <= 3 && aId != r.doc_id)
              hits += NearDupHit(key._1, aId, r.doc_id, h)
          }
          entries = (r.doc_id, r.sig, t) :: entries
        }
        state.update(BucketState(entries))
        // In batch mode the watermark node is eliminated from the plan
        // and GroupState refuses watermark/timeout calls; timeouts
        // can't fire in batch anyway, so only arm them when streaming.
        try {
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
        } catch { case _: UnsupportedOperationException => () }
        hits.result().iterator
      }
    }

    chunked
      .groupByKey(r => (r.chunk, r.cv))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Algebraic partial aggregates for the OLAP mart: exact decimal sum
    * + row count per key. Shared by the continuous migrate
    * ([[olapMigrateStream]]) and the batch oracle (e06) so the stored
    * shape cannot diverge from the certified one. The fixed
    * DECIMAL(30,2) keeps the mart schema stable across arbitrarily
    * many merge generations (Spark would otherwise widen the sum type
    * every merge until it hit the precision cap). */
  def olapPartials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol).cast(DecimalType(12, 2)))
        .cast(DecimalType(30, 2)).as("sum_dec"),
        count(lit(1)).as("n_rows"))

  /** Derive the read-time measures from stored partials: exact decimal
    * sum surfaced as double, count, and avg as ONE IEEE division —
    * the q47 exactness policy, so a mart maintained by any number of
    * delta merges hash-equals the full recompute. */
  def olapDerive(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.select(keys.map(col) ++ Seq(
      col("sum_dec").cast(DoubleType).as("sum_value"),
      col("n_rows"),
      (col("sum_dec").cast(DoubleType) / col("n_rows")).as("avg_value")): _*)

  /** Continuous OLAP aggregate maintenance — RDW's Migrate OLAP
    * Service as a stream (reference /root/reference/docs/Architecture
    * .md "Migrate OLAP … watches the data warehouse for changes",
    * migrated daily; here the same merge runs per micro-batch).
    * Each batch's rows partial-aggregate ([[olapPartials]]) and merge
    * into the mart by RE-AGGREGATING partials — sums add, counts add
    * — so maintenance work scales with |delta| + |mart|, never the
    * fact history (q47's algebraic-partials property, run
    * continuously). Snapshots + `_LATEST` pointer give the same
    * atomic commit and crash-replay idempotency as [[migrateStream]]:
    * a replayed batch whose snapshot is already published is SKIPPED —
    * essential here, because re-merging partials would double-count.
    */
  def olapMigrateStream(updates: DataFrame, martRoot: String,
                        keys: Seq[String], valueCol: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        if (readLatestName(sp, martRoot).contains(s"v_$batchId")) ()
        else {
          val delta = olapPartials(batch.toDF(), keys, valueCol)
          val merged = readMartLatest(sp, martRoot) match {
            case Some(cur) => cur.unionByName(delta)
              .groupBy(keys.map(col): _*)
              .agg(sum(col("sum_dec")).cast(DecimalType(30, 2)).as("sum_dec"),
                sum(col("n_rows")).as("n_rows"))
            case None => delta
          }
          merged.write.mode("overwrite").parquet(s"$martRoot/v_$batchId")
          publishLatest(sp, martRoot, s"v_$batchId")
        }
        ()
      }
      .start()

  /** Map a document frame (doc_id, ts, text) to the 4-chunk SimHash
    * rows [[nearDupStream]] consumes; the watermark rides the chunk
    * rows. Shared by the batch oracle path and the streaming path so
    * they cannot diverge. */
  def simhashChunks(docs: DataFrame): Dataset[ChunkRow] = {
    import docs.sparkSession.implicits._
    val sig = graft.functions.GraftColumns.simHashTokens(col("text"))
    docs
      .withColumn("sig", sig)
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sig"), 16 * c).bitwiseAND(lit(0xFFFFL)).as("cv"))
        }: _*)).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.cv").as("cv"),
        col("doc_id"), col("ts"), col("sig"))
      .withWatermark("ts", "2 hours")
      .as[ChunkRow]
  }
}
