package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.QUtil._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Operators

/** Batch-equivalent forms of the streaming family (e01–e14); the
  * streaming jobs themselves live in graft.streaming.StreamingJobs
  * and are proven batch==stream==oracle in StreamingSpec. */
private[graft] trait PipelineStreamBatch extends PipelinePack {
  // -- e11: continuous multimodal intake probe -----------------------------
  // m05's header parse joined to the streaming family (see
  // StreamingJobs.mediaIntakeStream): media files priced and
  // validated AS THEY ARRIVE, aggregated per (hour window, source) —
  // the running answer an ingestion SLO consumes. Batch run of the
  // same code path is the oracle; the oracle SQL states the generator
  // formulas aggregated to the same grid.
  private[queries] val e11: Q = (s, d) => {
    val media = framedWav(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.mediaIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e11Sql =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts,
      |    [8000, 16000, 22050, 44100][CAST((doc_id // 2) % 4 AS INTEGER) + 1]
      |      * (doc_id % 2 + 1)
      |      * (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE 2 END) AS byte_rate
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(0 AS BIGINT) AS n_unparseable,
      |  CAST(SUM(n_chars) AS BIGINT) AS audio_bytes,
      |  CAST(SUM((CAST(n_chars AS BIGINT) * 1000) // byte_rate) AS BIGINT)
      |    AS audio_ms
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e15: streaming gzip corpus intake -----------------------------------
  // t25's read path joined to the streaming family (see
  // StreamingJobs.gzipIntakeStream): gzip members decompressed AS
  // THEY ARRIVE — header walk, full RFC 1951 inflate, CRC-32/ISIZE
  // verification per member — folded per (hour window, source) into
  // the intake SLO. Batch run of the same code path is the oracle;
  // the oracle SQL states the decoded-text volumes directly from
  // documents (a decoder misreading any byte changes text_chars or
  // drops a file into n_undecodable and breaks the hash).
  private[queries] val e15: Q = (s, d) => {
    val media = framedGzip(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.gzipIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e15Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(SUM(n_chars) AS BIGINT) AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e16: streaming record-framed gzip intake -----------------------------
  // t26's read path joined to the streaming family (see
  // StreamingJobs.jsonlIntakeStream): gzip members decompressed AS
  // THEY ARRIVE, the JSONL payload parsed PER RECORD, both failure
  // levels (undecodable member / malformed record) accounted per
  // (hour window, source). Batch run of the same code path is the
  // oracle; the oracle SQL re-derives record counts and body volumes
  // from documents via t26's piece arithmetic (a parser misreading
  // one escape or boundary changes body_chars or shifts a record
  // into n_malformed and breaks the hash).
  private[queries] val e16: Q = (s, d) => {
    val media = framedJsonlGzip(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.jsonlIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e16Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, text, length(text) AS len,
       |    1 + doc_id % 4 AS nrec,
       |    CASE WHEN doc_id % 11 = 7
       |         THEN (doc_id // 11) % (1 + doc_id % 4)
       |         ELSE -1 END AS badj,
       |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
       |  FROM documents),
       |recs AS (
       |  SELECT doc_id, source, ts, text, len, nrec, badj,
       |    unnest(range(0, nrec)) AS j
       |  FROM d),
       |perdoc AS (
       |  SELECT doc_id, source, ts,
       |    SUM(CASE WHEN j = badj THEN 0 ELSE 1 END) AS n_records,
       |    SUM(CASE WHEN j = badj THEN 1 ELSE 0 END) AS n_malformed,
       |    SUM(CASE WHEN j = badj THEN 0 ELSE
       |      length(substr(text, CAST(j * len // nrec AS INTEGER) + 1,
       |        CAST((j + 1) * len // nrec - j * len // nrec AS INTEGER)))
       |      END) AS n_chars
       |  FROM recs GROUP BY 1, 2, 3)
       |SELECT date_trunc('hour', ts) AS window_start, source,
       |  COUNT(*) AS n_members,
       |  CAST(0 AS BIGINT) AS n_undecodable,
       |  CAST(SUM(n_records) AS BIGINT) AS n_records,
       |  CAST(SUM(n_malformed) AS BIGINT) AS n_malformed,
       |  CAST(SUM(n_chars) AS BIGINT) AS body_chars
       |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e18: streaming zstd intake --------------------------------------------
  // t30's read path joined to the streaming family (see
  // StreamingJobs.zstdIntakeStream): real-library-compressed FRAME
  // SERIES — zstd frames with skippable frames interleaved (RFC 8878
  // §3.1.2) — walked and decoded AS THEY ARRIVE by the hand-written
  // RFC 8878 decoder, strict UTF-8 per frame, folded per (hour
  // window, source); t30's corrupt payloads surface in n_undecodable.
  // Batch run of the same code path is the oracle; the oracle SQL
  // re-derives counts and volumes from documents via t30's doc
  // arithmetic (a mis-walked boundary or misdecoded symbol shifts a
  // count or changes text_chars and breaks the hash).
  private[queries] val e18: Q = (s, d) => {
    val media = framedZstdSeries(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.zstdIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e18Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    doc_id % 11 = 7 AS corrupt,
      |    1 + doc_id % 3 AS nfrm,
      |    (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS nskip,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undecodable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE nfrm END) AS BIGINT) AS n_frames,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE nskip END) AS BIGINT)
      |    AS n_skippable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END) AS BIGINT)
      |    AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e19: streaming brotli intake -------------------------------------------
  // t31's read path joined to the streaming family (see
  // StreamingJobs.brotliIntakeStream): RFC 7932 streams decoded AS
  // THEY ARRIVE by the hand-written decoder, strict UTF-8, folded per
  // (hour window, source); t31's corrupt payloads surface in
  // n_undecodable. Batch run of the same code path is the oracle; the
  // oracle SQL re-derives volumes from documents via t31's doc
  // arithmetic (one misdecoded symbol changes text_chars and breaks
  // the hash).
  private[queries] val e19: Q = (s, d) => {
    val media = framedBrotli(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.brotliIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e19Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    doc_id % 11 = 7 AS corrupt,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undecodable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END) AS BIGINT)
      |    AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e23: streaming bzip2 intake --------------------------------------------
  // t40's read path joined to the streaming family (see
  // StreamingJobs.bzip2IntakeStream): bzip2 streams decoded AS THEY
  // ARRIVE by the hand-written decoder, corrupt payloads counted in
  // n_undecodable. Batch run of the same code path is the oracle;
  // the oracle SQL states decoded-text volumes directly from
  // documents (t40's shared fixture).
  private[queries] val e23: Q = (s, d) => {
    val media = framedBzip2(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.bzip2IntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e23Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    doc_id % 11 = 7 AS corrupt,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undecodable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END) AS BIGINT)
      |    AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e25: streaming lz4 intake ------------------------------------------------
  // t42's read path joined to the streaming family (see
  // StreamingJobs.lz4IntakeStream): LZ4 frames decoded AS THEY
  // ARRIVE by the hand-written decoder, corrupt payloads counted in
  // n_undecodable. Batch run of the same code path is the oracle;
  // the oracle SQL states decoded-text volumes directly from
  // documents (t42's shared fixture).
  private[queries] val e25: Q = (s, d) => {
    val media = framedLz4(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.lz4IntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e25Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    doc_id % 11 = 7 AS corrupt,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undecodable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END) AS BIGINT)
      |    AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e24: streaming xz intake -------------------------------------------------
  // t41's read path joined to the streaming family (see
  // StreamingJobs.xzIntakeStream): xz streams decoded AS THEY ARRIVE
  // by the hand-written decoder, corrupt payloads counted in
  // n_undecodable. Batch run of the same code path is the oracle;
  // the oracle SQL states decoded-text volumes directly from
  // documents (t41's shared fixture).
  private[queries] val e24: Q = (s, d) => {
    val media = framedXz(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.xzIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e24Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS n_chars,
      |    doc_id % 11 = 7 AS corrupt,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_undecodable,
      |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE n_chars END) AS BIGINT)
      |    AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e20: streaming WET shard intake ---------------------------------------
  // t34's read path joined to the streaming family (see
  // StreamingJobs.wetIntakeStream): `.wet.gz` shards member-walked AS
  // THEY ARRIVE, `conversion` records' text/plain blocks decoded
  // charset-aware, the e17 two-level accounting. Batch run of the
  // same code path is the oracle; the oracle SQL re-derives record
  // counts and body volumes from documents via t34's piece
  // arithmetic.
  private[queries] val e20: Q = (s, d) => {
    val media = framedWet(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.wetIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e20Sql =
    """WITH d AS (
      |  SELECT doc_id, source, text, length(text) AS len,
      |    1 + doc_id % 3 AS nrec,
      |    CASE WHEN doc_id % 11 = 7
      |         THEN (doc_id // 11) % (1 + doc_id % 3)
      |         ELSE -1 END AS badj,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents),
      |recs AS (
      |  SELECT doc_id, source, ts, text, len, nrec, badj,
      |    unnest(range(0, nrec)) AS j
      |  FROM d),
      |perdoc AS (
      |  SELECT doc_id, source, ts,
      |    1 + SUM(CASE WHEN j = badj THEN 0 ELSE 1 END) AS n_records,
      |    SUM(CASE WHEN j = badj THEN 1 ELSE 0 END) AS n_malformed,
      |    SUM(CASE WHEN j = badj THEN 0 ELSE 1 END) AS n_conversions,
      |    SUM(CASE WHEN j = badj THEN 0 ELSE
      |      length(substr(text, CAST(j * len // nrec AS INTEGER) + 1,
      |        CAST((j + 1) * len // nrec - j * len // nrec AS INTEGER)))
      |      END) AS n_chars
      |  FROM recs GROUP BY 1, 2, 3)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_shards,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(SUM(n_records) AS BIGINT) AS n_records,
      |  CAST(SUM(n_malformed) AS BIGINT) AS n_malformed,
      |  CAST(SUM(n_conversions) AS BIGINT) AS n_conversions,
      |  CAST(SUM(n_chars) AS BIGINT) AS body_chars
      |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e21: streaming ZIP archive intake -------------------------------------
  // t37's read path joined to the streaming family (see
  // StreamingJobs.zipIntakeStream): ZIP archives index-walked AS THEY
  // ARRIVE, members stored/deflate-decoded + CRC-checked, both
  // failure levels (unusable index / bad member) accounted per (hour
  // window, source). Batch run of the same code path is the oracle;
  // the oracle SQL re-derives member counts and body volumes from
  // documents via t37's piece arithmetic (a walker misreading one
  // header field or CRC shifts a count and breaks the hash).
  private[queries] val e21: Q = (s, d) => {
    val media = framedZip(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.zipIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e21Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS len,
      |    1 + doc_id % 3 AS nmem,
      |    CASE WHEN doc_id % 11 = 7
      |         THEN (doc_id // 11) % (1 + doc_id % 3)
      |         ELSE -1 END AS badj,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, ts, nmem,
      |    CASE WHEN badj >= 0 THEN 1 ELSE 0 END AS bad,
      |    len - CASE WHEN badj >= 0
      |          THEN (badj + 1) * len // nmem - badj * len // nmem
      |          ELSE 0 END AS ok_chars
      |  FROM d)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_archives,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(SUM(nmem) AS BIGINT) AS n_members,
      |  CAST(SUM(bad) AS BIGINT) AS n_malformed,
      |  CAST(SUM(ok_chars) AS BIGINT) AS text_chars
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e22: streaming tar.gz intake ------------------------------------------
  // t38's read path joined to the streaming family (see
  // StreamingJobs.tarIntakeStream): `.tar.gz` drops gunzipped and
  // ustar-walked AS THEY ARRIVE, archive-level failure accounting
  // (tar has no index and no resync — a bad header checksum counts
  // the whole archive). Batch run of the same code path is the
  // oracle; the oracle SQL re-derives file counts and body volumes
  // from documents via t38's piece arithmetic.
  private[queries] val e22: Q = (s, d) => {
    val media = framedTarGzip(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.tarIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e22Sql =
    """WITH d AS (
      |  SELECT doc_id, source, length(text) AS len,
      |    1 + doc_id % 3 AS nmem,
      |    CASE WHEN doc_id % 11 = 7 THEN 1 ELSE 0 END AS bad,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_archives,
      |  CAST(SUM(bad) AS BIGINT) AS n_undecodable,
      |  CAST(SUM(CASE WHEN bad = 1 THEN 0 ELSE nmem END) AS BIGINT) AS n_files,
      |  CAST(SUM(CASE WHEN bad = 1 THEN 0 ELSE len END) AS BIGINT) AS text_chars
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e17: streaming WARC shard intake -------------------------------------
  // t28's read path joined to the streaming family (see
  // StreamingJobs.warcIntakeStream): `.warc.gz` shards member-walked
  // AS THEY ARRIVE, each member parsed as a strict ISO 28500 record,
  // response HTTP bodies extracted, both failure levels (undecodable
  // shard / malformed record) accounted per (hour window, source).
  // Batch run of the same code path is the oracle; the oracle SQL
  // re-derives record counts and body volumes from documents via
  // t28's piece arithmetic (a parser misreading one header or one
  // member boundary shifts a count and breaks the hash).
  private[queries] val e17: Q = (s, d) => {
    val media = framedWarcGzip(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.warcIntakeStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e17Sql =
    """WITH d AS (
      |  SELECT doc_id, source, text, length(text) AS len,
      |    1 + doc_id % 3 AS nrec,
      |    CASE WHEN doc_id % 11 = 7
      |         THEN (doc_id // 11) % (1 + doc_id % 3)
      |         ELSE -1 END AS badj,
      |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS hasreq,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
      |  FROM documents),
      |recs AS (
      |  SELECT doc_id, source, ts, text, len, nrec, badj, hasreq,
      |    unnest(range(0, nrec)) AS j
      |  FROM d),
      |perdoc AS (
      |  SELECT doc_id, source, ts,
      |    1 + MAX(hasreq)
      |      + SUM(CASE WHEN j = badj THEN 0 ELSE 1 END) AS n_records,
      |    SUM(CASE WHEN j = badj THEN 1 ELSE 0 END) AS n_malformed,
      |    SUM(CASE WHEN j = badj THEN 0 ELSE 1 END) AS n_responses,
      |    SUM(CASE WHEN j = badj THEN 0 ELSE
      |      length(substr(text, CAST(j * len // nrec AS INTEGER) + 1,
      |        CAST((j + 1) * len // nrec - j * len // nrec AS INTEGER)))
      |      END) AS n_chars
      |  FROM recs GROUP BY 1, 2, 3)
      |SELECT date_trunc('hour', ts) AS window_start, source,
      |  COUNT(*) AS n_shards,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(SUM(n_records) AS BIGINT) AS n_records,
      |  CAST(SUM(n_malformed) AS BIGINT) AS n_malformed,
      |  CAST(SUM(n_responses) AS BIGINT) AS n_responses,
      |  CAST(SUM(n_chars) AS BIGINT) AS body_chars
      |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e14: streaming audio sample QC --------------------------------------
  // m09's sample decode joined to the streaming family (see
  // StreamingJobs.audioQcStream): clips DECODED as they arrive,
  // loudness/clipping folded per (hour window, source). Batch run of
  // the same code path is the oracle; the oracle SQL re-derives the
  // samples from the generator formulas (m09's CTEs) and aggregates
  // the same exact integers up through the hour grid.
  private[queries] val e14: Q = (s, d) => {
    val media = framedPcmWav(s, d).toDF().withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.audioQcStream(media)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e14Sql =
    """WITH params AS (
      |  SELECT doc_id, source,
      |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts,
      |    CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
      |    CASE WHEN doc_id % 4 < 2 THEN 8 ELSE 16 END AS bits,
      |    CASE WHEN doc_id % 4 < 2 THEN 128 ELSE 32768 END AS fullscale
      |  FROM documents),
      |idx AS (
      |  SELECT doc_id, ch, bits, fullscale, unnest(range(0, 64 * ch)) AS i FROM params),
      |samp AS (
      |  SELECT doc_id, fullscale,
      |    CAST(i % ch AS INTEGER) AS channel,
      |    CAST((i // ch) // 16 AS INTEGER) AS win,
      |    CASE WHEN bits = 8 THEN (doc_id*7 + i*13) % 256 - 128
      |         WHEN (doc_id*7 + i*13) % 65536 >= 32768
      |           THEN (doc_id*7 + i*13) % 65536 - 65536
      |         ELSE (doc_id*7 + i*13) % 65536 END AS a
      |  FROM idx),
      |wstat AS (
      |  SELECT doc_id, fullscale, channel, win,
      |    COUNT(*) AS nf, SUM(a * a) AS energy, MAX(ABS(a)) AS peak
      |  FROM samp GROUP BY doc_id, fullscale, channel, win),
      |clip AS (
      |  SELECT doc_id, SUM(nf) AS samples, SUM(energy) AS energy,
      |    SUM(CASE WHEN peak >= fullscale THEN 1 ELSE 0 END) AS clipped,
      |    MAX(peak * 1000 // fullscale) AS peak_milli
      |  FROM wstat GROUP BY doc_id)
      |SELECT date_trunc('hour', p.ts) AS window_start, p.source,
      |  COUNT(*) AS n_clips, CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(SUM(c.samples) AS BIGINT) AS n_samples,
      |  CAST(SUM(c.energy) AS BIGINT) AS energy,
      |  CAST(SUM(c.clipped) AS BIGINT) AS clipped_windows,
      |  CAST(MAX(c.peak_milli) AS BIGINT) AS peak_milli_max
      |FROM clip c JOIN params p ON c.doc_id = p.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ======================= streaming batch-equivalents =====================

  // -- e01: tumbling-window agg (streaming job in graft.streaming) ---------
  private[queries] val e01: Q = (s, d) =>
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  private[queries] val e01Sql =
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  COUNT(*) AS cnt, ${sqlMoneySum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e02: watermark dedupe (first event per key) -------------------------
  private[queries] val e02: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  private[queries] val e02Sql =
    """SELECT user_id, event_type, event_id, ts FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // -- e03: stream-stream interval join (click→purchase attribution) -------
  // Runs graft.streaming.StreamingJobs.attributionJoin on batch frames
  // (withWatermark is a no-op in batch) — the exact code path the
  // streaming job executes, so this oracle certifies the stream too.
  private[queries] val e03: Q = (s, d) => {
    val ev = T.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    graft.streaming.StreamingJobs.attributionJoin(clicks, purchases)
      .orderBy(col("purchase_id"), col("click_id"))
  }

  private[queries] val e03Sql =
    """SELECT c.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.ts AS purchase_ts, c.ts AS click_ts, p.value
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin

  // -- e04: streaming curation gates + admission stats ---------------------
  // The continuous form of p01's gates: per-window per-language doc
  // counts and how many pass the language+quality admission. Runs
  // StreamingJobs.curateStream on a BATCH frame (withWatermark is a
  // no-op in batch) so the exact streaming code path is what the
  // oracle certifies — e03's trick; the MemoryStream spec proves the
  // incremental execution matches. Arrival time is synthesized
  // deterministically (doc_id minutes past a fixed epoch) in both
  // engines.
  private[queries] val e04: Q = (s, d) => {
    val (_, _, _, quality) = qualityParts
    val docs = T.documents(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.curateStream(docs, quality)
      .orderBy(col("window_start"), col("lang"))
  }

  private[queries] val e04Sql =
    s"""WITH d AS (
       |  SELECT lang, text,
       |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts,
       |    0.5 * least(1.0, len(string_split_regex(trim(text), '\\s+')) / 100.0)
       |      + 0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |          x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')))
       |      - 0.2 * CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
       |        / length(text) AS quality
       |  FROM documents)
       |SELECT date_trunc('hour', ts) AS window_start, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN lang = 'en' AND quality >= 0.55 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept
       |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e10: continuous learned-token volume accounting ---------------------
  // t17 joined to the streaming family: the vocab is fit OFFLINE
  // (the batch fit — deployed tokenizers are frozen artifacts, not
  // per-batch refits) and the intake stream prices every arriving
  // doc in real tokens (StreamingJobs.tokenVolumeStream). Batch run
  // of the same code path is the oracle (e04's certification class);
  // the oracle SQL re-derives the counts through t17's shared CTE
  // chain, so the stream, the batch path and the replay price with
  // ONE token definition.
  private[queries] val e10: Q = (s, d) => {
    val vocab = learnedVocab(s, d)
    val docs = T.documents(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
    graft.streaming.StreamingJobs.tokenVolumeStream(docs, vocab.toSeq)
      .orderBy(col("window_start"), col("source"))
  }

  private[queries] val e10Sql =
    s"""WITH RECURSIVE $learnedSegCtes,
       |agg AS (
       |  SELECT t.doc_id, CAST(SUM(p.pieces) AS BIGINT) AS learned
       |  FROM tk t JOIN wp p ON t.w = p.w
       |  GROUP BY t.doc_id),
       |d AS (
       |  SELECT doc_id, source,
       |    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
       |  FROM documents)
       |SELECT date_trunc('hour', d.ts) AS window_start, d.source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(COALESCE(a.learned, 0)) AS BIGINT) AS learned_tokens
       |FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e13: streaming SCD2 enrichment --------------------------------------
  // q35's validity intervals consumed on the INTAKE stream
  // (StreamingJobs.scd2EnrichStream): each arriving event picks up
  // the dimension version valid at its event time — the classic
  // "dimension lookup at event time" of a streaming warehouse ETL.
  // The dim is the SCD2 chain q35 derives (per customer: each order
  // opens a version carrying its priority; lead() closes it), the
  // stream is the raw event feed, the join is stream-static LEFT
  // with the interval predicate riding the user-key equi-join —
  // map-only, zero streaming state. Batch run of the same code path
  // is the oracle; StreamingSpec proves incremental == batch and
  // that pre-first-version events survive as UNVERSIONED.
  private[queries] val e13: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val dim = T.orders(s, d)
      .select(col("o_custkey").as("d_user_id"),
        col("o_orderkey").as("version_key"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"))
    val ev = T.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.streaming.StreamingJobs.scd2EnrichStream(ev, dim)
      .orderBy(col("event_id"))
  }

  private[queries] val e13Sql =
    """WITH dim AS (
      |  SELECT o_custkey AS d_user_id, o_orderkey AS version_key,
      |    o_orderpriority AS priority, o_orderdate AS valid_from,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS valid_to
      |  FROM orders)
      |SELECT e.event_id, e.user_id, e.ts, e.value,
      |  d.version_key, COALESCE(d.priority, 'UNVERSIONED') AS priority
      |FROM events e LEFT JOIN dim d
      |  ON e.user_id = d.d_user_id AND e.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
      |ORDER BY e.event_id""".stripMargin

  // -- e12: continuous score-distribution drift monitor --------------------
  // q87 joined to the streaming family (StreamingJobs.distDriftStream):
  // the baseline level distribution is fit OFFLINE on the 1997
  // results and FROZEN (e10's frozen-vocab pattern), and every
  // arriving window's level mix is chi-square-tested against it in
  // q87's exact integer micro-units — one streaming aggregation, the
  // fold is per-row arithmetic after it, so stream == batch == the
  // DuckDB replay bit-for-bit. Batch run of the same code path is
  // the oracle (e04's certification class); StreamingSpec proves the
  // incremental run matches and pins the term arithmetic by hand.
  private[queries] val e12: Q = (s, d) => {
    val li = when(col("o_totalprice") < 100000, 1)
      .when(col("o_totalprice") < 200000, 2)
      .when(col("o_totalprice") < 350000, 3).otherwise(4)
    // the offline baseline fit: 4 longs, the monitor's frozen config
    // (learnedVocab's bounded-collect class)
    val b = T.orders(s, d).filter(year(col("o_orderdate")) === 1997)
      .withColumn("li", li)
      .agg(
        sum(when(col("li") === 1, 1L).otherwise(0L)),
        sum(when(col("li") === 2, 1L).otherwise(0L)),
        sum(when(col("li") === 3, 1L).otherwise(0L)),
        sum(when(col("li") === 4, 1L).otherwise(0L)))
      .head()
    val baseline = Seq(b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    graft.streaming.StreamingJobs.distDriftStream(
      T.orders(s, d).select(col("o_orderdate").as("ts"),
        col("o_totalprice").as("price")), baseline)
      .orderBy(col("window_start"))
  }

  // The 30-day tumbling window replays as epoch-aligned floor
  // division (Spark's TimeWindow origin is 1970-01-01 UTC); the
  // chi-square terms replay in HUGEINT exactly as q87's.
  private[queries] val e12Sql =
    """WITH bc AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(SUM(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 350000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(SUM(CASE WHEN o_totalprice >= 350000 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |    CAST(COUNT(*) AS BIGINT) AS n1
      |  FROM orders WHERE year(o_orderdate) = 1997),
      |w AS (
      |  SELECT TIMESTAMP '1970-01-01 00:00:00' +
      |      ((CAST(epoch(o_orderdate) AS BIGINT) // 2592000) * 2592000)
      |      * INTERVAL 1 SECOND AS window_start,
      |    CAST(SUM(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
      |    CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS o2,
      |    CAST(SUM(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 350000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS o3,
      |    CAST(SUM(CASE WHEN o_totalprice >= 350000 THEN 1 ELSE 0 END) AS BIGINT) AS o4,
      |    CAST(COUNT(*) AS BIGINT) AS n_cur
      |  FROM orders GROUP BY 1),
      |t AS (SELECT w.*, bc.c1, bc.c2, bc.c3, bc.c4, bc.n1 FROM w, bc),
      |f AS (
      |  SELECT window_start, o1, o2, o3, o4, n_cur,
      |    CAST((CAST(o1 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n_cur)
      |      * (CAST(o1 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n_cur)
      |      * 1000000 // (CAST(c1 AS HUGEINT) * n1 * n_cur) AS BIGINT)
      |    + CAST((CAST(o2 AS HUGEINT) * n1 - CAST(c2 AS HUGEINT) * n_cur)
      |      * (CAST(o2 AS HUGEINT) * n1 - CAST(c2 AS HUGEINT) * n_cur)
      |      * 1000000 // (CAST(c2 AS HUGEINT) * n1 * n_cur) AS BIGINT)
      |    + CAST((CAST(o3 AS HUGEINT) * n1 - CAST(c3 AS HUGEINT) * n_cur)
      |      * (CAST(o3 AS HUGEINT) * n1 - CAST(c3 AS HUGEINT) * n_cur)
      |      * 1000000 // (CAST(c3 AS HUGEINT) * n1 * n_cur) AS BIGINT)
      |    + CAST((CAST(o4 AS HUGEINT) * n1 - CAST(c4 AS HUGEINT) * n_cur)
      |      * (CAST(o4 AS HUGEINT) * n1 - CAST(c4 AS HUGEINT) * n_cur)
      |      * 1000000 // (CAST(c4 AS HUGEINT) * n1 * n_cur) AS BIGINT)
      |      AS chi2_micro
      |  FROM t)
      |SELECT window_start, o1, o2, o3, o4, n_cur, chi2_micro,
      |  chi2_micro / 1000000.0 AS chi2,
      |  chi2_micro > 7814728 AS drift
      |FROM f ORDER BY window_start""".stripMargin

  // ------------------------------------------------------------------------
  // -- e06: continuous OLAP aggregate maintenance --------------------------
  // The read path of StreamingJobs.olapMigrateStream (RDW Migrate
  // OLAP as a stream): the mart stores algebraic partials (exact
  // decimal sum + count), reads derive sum/avg via olapDerive. This
  // entry certifies EXACTLY those shared helpers on a batch frame —
  // the oracle is the full recompute, and StreamingSpec proves a mart
  // maintained across micro-batch merges (with a crash replay in the
  // middle) byte-equals this same derivation.
  private[queries] val e06: Q = (s, d) => {
    val ev = T.events(s, d).withColumn("mart_hour", date_trunc("hour", col("ts")))
    graft.streaming.StreamingJobs.olapDerive(
      graft.streaming.StreamingJobs.olapPartials(
        ev, Seq("mart_hour", "event_type"), "value"),
      Seq("mart_hour", "event_type"))
      .orderBy(col("mart_hour"), col("event_type"))
  }

  private[queries] val e06Sql =
    """SELECT date_trunc('hour', ts) AS mart_hour, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- e07: stateful sessionization, oracle-certified ----------------------
  // The flatMapGroupsWithState sessionizer run in BATCH mode (end of
  // input closes the trailing session, playing the watermark's role)
  // against a declarative SQL oracle — a custom arbitrary-state
  // operator certified by DuckDB, not just by a parity spec. All
  // engine-sensitive arithmetic happens OUTSIDE the state function:
  // Catalyst casts value → DECIMAL(12,2) cents and epoch-µs on the way
  // in, timestamp_micros / one division on the way out; the state
  // holds only exact longs.
  private[queries] val e07: Q = (s, d) => {
    import s.implicits._
    val rows = T.events(s, d).select(col("user_id"), col("ts"),
      (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .as[graft.streaming.StreamingJobs.SessRow]
    graft.streaming.StreamingJobs.sessionizeExact(rows, gapSeconds = 1800)
      .toDF()
      .select(col("user_id"),
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"),
        col("n_events"),
        (col("cents").cast(DoubleType) / 100.0).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  private[queries] val e07Sql =
    """WITH e AS (
      |  SELECT user_id, ts, CAST(value AS DECIMAL(12,2)) AS v FROM events),
      |l AS (
      |  SELECT user_id, ts, v,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, v,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM l)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events, CAST(CAST(SUM(v) AS DECIMAL(30,2)) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // -- e05: streaming near-dup detection (SimHash chunk buckets) -----------
  // The continuous form of d05: per-(chunk, value) buckets hold the
  // docs within a 1 h event-time horizon and every new arrival is
  // checked against its bucket (hamming ≤ 3). Runs StreamingJobs
  // .nearDupStream on a BATCH frame (the same code path the stream
  // executes — flatMapGroupsWithState works in batch with empty
  // state); StreamingSpec additionally asserts this output == the
  // incremental MemoryStream run. GRADUATED to hash-exact in round 5:
  // the signature family replays in DuckDB since d05's round-4
  // graduation, and the stream's remaining semantics are plain
  // predicates — per-chunk emission, the 1 h horizon (arrival ts =
  // doc_id minutes past a fixed epoch ⇒ b_id − a_id ≤ 60), and
  // (ts, doc_id) pair orientation (⇒ a_id < b_id here).
  private[queries] val e05: Q = (s, d) => {
    val docs = T.documents(s, d).withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_dt_interval(0, 0, doc_id, 0)"))
      .select(col("doc_id"), col("ts"), col("text"))
    graft.streaming.StreamingJobs.nearDupStream(
      graft.streaming.StreamingJobs.simhashChunks(docs), horizonSeconds = 3600)
      .toDF()
      .orderBy(col("chunk"), col("a_id"), col("b_id"))
  }

  private[queries] val e05Sql: String =
    s"""WITH $simHashCtes,
       |pairs AS (
       |  SELECT a.chunk AS chunk, a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  WHERE b.doc_id - a.doc_id <= 60),
       |mm AS (SELECT p.chunk, p.a_id, p.b_id,
       |         CAST(SUM(CASE WHEN ba.bit <> bb2.bit THEN 1 ELSE 0 END) AS INTEGER) AS hamming
       |       FROM pairs p
       |       JOIN bits ba ON ba.doc_id = p.a_id
       |       JOIN bits bb2 ON bb2.doc_id = p.b_id AND bb2.b = ba.b
       |       GROUP BY 1, 2, 3)
       |SELECT chunk, a_id, b_id, hamming FROM mm WHERE hamming <= 3
       |ORDER BY chunk, a_id, b_id""".stripMargin

  // -- e08: continuous heavy hitters (streaming count-min sketch) ----------
  // The continuous form of t10: the boilerplate/stopword gate runs on
  // the INTAKE stream, maintaining the depth×width counter table as
  // streaming aggregation state (bounded by construction — the key
  // space IS the counter table). Runs StreamingJobs.cmsStream on a
  // BATCH frame — the identical code path the stream executes, since
  // counters merge by addition in both — and probes it with the exact
  // top-20 as the verification set, t10's report shape. Different
  // geometry than t10 (depth 3 × width 512) so the two sketches are
  // independently checked. StreamingSpec proves the MemoryStream
  // incremental run lands on the same counter table.
  private[queries] val e08: Q = (s, d) => {
    val depth = 3; val width = 512
    // counters come from the STREAM code path (its own tokenization);
    // toks below feeds only the exact top-k, so no cache — each frame
    // is read once
    val toks = docsSpread(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val counters = graft.streaming.StreamingJobs.cmsStream(docsSpread(s, d), depth, width)
    val top = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
      .limit(20)
    val probes = top.select(col("tok"), col("exact_cnt"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"),
            graft.functions.TextFunctions.cmsBucket(col("tok"), r, width).as("bucket"))): _*)).as("rb"))
      .select(col("tok"), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes.join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cell")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("over_err"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  private[queries] val e08Sql =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tk AS (SELECT tok FROM toks WHERE tok <> ''),
      |rb AS (
      |  SELECT tok, r,
      |    CAST(('0x' || substr(md5(tok || '|' || CAST(r AS VARCHAR)), 1, 4)) AS INTEGER)
      |      % 512 AS bucket
      |  FROM tk, (SELECT unnest(generate_series(0, 2)) AS r)),
      |counters AS (SELECT r, bucket, COUNT(*) AS cell FROM rb GROUP BY 1, 2),
      |top AS (SELECT tok, COUNT(*) AS exact_cnt FROM tk GROUP BY tok
      |        ORDER BY exact_cnt DESC, tok LIMIT 20),
      |probes AS (
      |  SELECT t.tok, t.exact_cnt, r.r,
      |    CAST(('0x' || substr(md5(t.tok || '|' || CAST(r.r AS VARCHAR)), 1, 4)) AS INTEGER)
      |      % 512 AS bucket
      |  FROM top t, (SELECT unnest(generate_series(0, 2)) AS r) r)
      |SELECT p.tok, p.exact_cnt, MIN(c.cell) AS cms_est,
      |  MIN(c.cell) - p.exact_cnt AS over_err
      |FROM probes p JOIN counters c ON p.r = c.r AND p.bucket = c.bucket
      |GROUP BY p.tok, p.exact_cnt
      |ORDER BY p.exact_cnt DESC, p.tok""".stripMargin

  // -- e09: continuous latency monitor (stateful, oracle-certified) --------
  // The q62/q63 created→updated derivation as a flatMapGroupsWithState
  // operator (StreamingJobs.latencyExact): one long of state per user,
  // each processed result emits its latency on arrival. The batch run
  // of the SAME code path — one sorted pass per user — equals the
  // declarative carried-forward window (including (ts, event_id) tie
  // order), so the custom stateful operator itself hash-matches the
  // DuckDB oracle, e07's certification class. StreamingSpec proves
  // cross-batch state carry (click in batch 1, purchase in batch 2).
  private[queries] val e09: Q = (s, d) => {
    import s.implicits._
    val rows = T.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[graft.streaming.StreamingJobs.LatRow]
    graft.streaming.StreamingJobs.latencyExact(rows).toDF()
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(ts_us)").as("processed_ts"), col("proc_sec"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private[queries] val e09Sql =
    """WITH w AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      |  FROM events)
      |SELECT user_id, event_id, ts AS processed_ts,
      |  (epoch_us(ts) - epoch_us(last_click)) // 1000000 AS proc_sec
      |FROM w WHERE event_type = 'purchase' AND last_click IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin

}
