package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.QUtil._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Operators

/** Corpus-curation family (p01–p14, minus the multimodal p05):
  * curation, sequence packing (greedy, learned, BPE-costed), mixing,
  * train ordering, dataset cards, token budgets, release diffs,
  * shard manifests, water-filling, leakage-safe splits, epoch
  * schedules. */
private[graft] trait PipelinePack extends PipelineMultimodal {
  // ======================= corpus curation (end-to-end) ====================

  // -- p01: flagship curation chain ----------------------------------------
  // The full training-data curation pass as ONE declarative plan:
  //   1. metadata language gate (keep claimed lang = 'en'),
  //   2. quality gate (t02's score ≥ 0.55),
  //   3. exact dedup (d01's content hash, keeper = lowest doc_id),
  //   4. per-source token budget (cumulative BPE-ish tokens ≤ 400 —
  //      the per-stratum cap of a mixture recipe).
  // Stages 1–2 are map-only and fuse into the scan; stage 3–4 are one
  // shuffle each (hash partition, then source partition). Catalyst
  // sees the whole chain, so filters push below the windows where
  // legal — the composition costs nothing vs hand-fused stages.
  /** p01's curated set as a frame — ONE definition of the gates,
    * shared by the registered p01 and the p15 end-to-end build (so
    * the composition can never drift from the certified stage). */
  private[queries] def p01Curated(s: SparkSession, d: String): DataFrame = {
    val (_, _, _, quality) = qualityParts
    val wDedup = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val wBudget = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.documents(s, d)
      .filter(col("lang") === "en")
      .withColumn("quality", quality)
      .filter(col("quality") >= 0.55)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
      .withColumn("bpe_tokens",
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]")))
      .withColumn("cum_tokens", sum(col("bpe_tokens")).over(wBudget))
      .filter(col("cum_tokens") <= 400)
      .select(col("doc_id"), col("source"), col("quality"),
        col("bpe_tokens"), col("cum_tokens"))
  }

  private[queries] val p01: Q = (s, d) =>
    p01Curated(s, d).orderBy(col("doc_id"))

  private[queries] val p01Sql =
    s"""WITH gated AS (
       |  SELECT doc_id, source, text,
       |    0.5 * least(1.0, len(string_split_regex(trim(text), '\\s+')) / 100.0)
       |      + 0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |          x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')))
       |      - 0.2 * CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
       |        / length(text) AS quality
       |  FROM documents WHERE lang = 'en'),
       |q AS (SELECT * FROM gated WHERE quality >= 0.55),
       |d AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q),
       |k AS (SELECT doc_id, source, quality,
       |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS bpe_tokens
       |  FROM d WHERE rn = 1),
       |c AS (SELECT doc_id, source, quality, bpe_tokens,
       |    CAST(SUM(bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM k)
       |SELECT doc_id, source, quality, bpe_tokens, cum_tokens
       |FROM c WHERE cum_tokens <= 400 ORDER BY doc_id""".stripMargin

  private[queries] val p02: Q = (s, d) => {
    val base = T.documents(s, d)
      .withColumn("bpe_tokens",
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]")))
      .withColumn("cost", col("bpe_tokens"))
    hierarchicalPack(base, budget = 512, shardSize = 512)
      .select(col("doc_id"), col("source"), col("bpe_tokens"),
        col("bin_id"), col("bin_offset"))
      .orderBy(col("doc_id"))
  }

  private[queries] val p02Sql =
    """WITH c AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_tokens,
      |    CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')))
      |      OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS cum
      |  FROM documents)
      |SELECT doc_id, source, bpe_tokens,
      |  (cum - bpe_tokens) // 512 AS bin_id,
      |  (cum - bpe_tokens) % 512 AS bin_offset
      |FROM c ORDER BY doc_id""".stripMargin

  // -- p03: temperature-based source mixing --------------------------------
  // α-sampling (the multilingual-LM mixture recipe): each source's
  // sampled mass scales as n^α with α = 1/2, i.e. per-doc admission
  // rate r_s = min(1, C/√n_s) — big sources are downsampled hard,
  // small sources kept whole, which is exactly how pretraining
  // mixtures rebalance a web-scale crawl against small curated
  // sources. Two deliberate exactness choices:
  //   * no cross-source normalizer — r_s uses only √ and ÷, both
  //     IEEE-correctly-rounded, so Spark and DuckDB compute the SAME
  //     double (a normalizer would sum doubles across sources in
  //     engine-dependent order);
  //   * admission is t07's deterministic salted-hash test at a
  //     per-source VARIABLE rate: u(doc) = first 8 md5 hex chars vs a
  //     threshold string lpad(hex(⌊r·2³²⌋)) — layout-independent,
  //     backfill-stable, replayable in the oracle.
  // Scale shape: the per-source stats are one bounded agg (|sources|
  // rows → broadcast); the admission test is map-side; one final
  // per-source agg. The fact table is never shuffled.
  private[queries] val p03: Q = (s, d) => {
    val c = 3.0
    val docs = T.documents(s, d)
      .withColumn("u", substring(
        md5(concat(col("doc_id").cast(StringType), lit("|mix"))), 1, 8))
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("samp_rate",
        least(lit(1.0), lit(c) / sqrt(col("n_docs").cast(DoubleType))))
      .withColumn("thresh", when(col("samp_rate") >= 1.0, lit("zzzzzzzz"))
        .otherwise(lower(lpad(
          hex(floor(col("samp_rate") * lit(4294967296.0))), 8, "0"))))
    docs.join(broadcast(stats), "source")
      .groupBy(col("source"), col("n_docs"), col("samp_rate"))
      .agg(sum(when(col("u") < col("thresh"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("samp_rate"), col("n_sampled"),
        (col("n_sampled").cast(DoubleType) / col("n_docs")).as("eff_rate"))
      .orderBy(col("source"))
  }

  private[queries] val p03Sql =
    """WITH st AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |r AS (SELECT source, n_docs,
      |        least(CAST(1.0 AS DOUBLE),
      |              CAST(3.0 AS DOUBLE) / sqrt(CAST(n_docs AS DOUBLE))) AS samp_rate
      |      FROM st),
      |t AS (SELECT source, n_docs, samp_rate,
      |        CASE WHEN samp_rate >= 1.0 THEN 'zzzzzzzz'
      |             ELSE printf('%08x', CAST(floor(samp_rate * 4294967296.0) AS BIGINT))
      |        END AS thresh
      |      FROM r),
      |a AS (SELECT d.source, t.n_docs, t.samp_rate,
      |        CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '|mix'), 1, 8) < t.thresh
      |             THEN 1 ELSE 0 END AS adm
      |      FROM documents d JOIN t USING (source))
      |SELECT source, n_docs, samp_rate, CAST(SUM(adm) AS BIGINT) AS n_sampled,
      |  CAST(SUM(adm) AS DOUBLE) / n_docs AS eff_rate
      |FROM a GROUP BY source, n_docs, samp_rate ORDER BY source""".stripMargin

  // -- p04: deterministic training order + shard assignment ----------------
  // The last step before writing training shards: a reproducible
  // global permutation (order by a salted content-independent hash —
  // the "global shuffle" every pretraining run needs so batches are
  // i.i.d.-ish) and a shard id so a 1000-worker loader can each read
  // one file. Hash-ordering IS a total sort — the one genuinely
  // global operation in the pipeline — and Spark's range-partitioned
  // sort is exactly the distributed machinery for it; the hash key
  // distributes uniformly by construction, so no skew.
  private[queries] val p04: Q = (s, d) => {
    val shards = 8
    docsSpread(s, d)
      .withColumn("order_hash", md5(concat(lit("ord1|"), col("doc_id").cast("string"))))
      .withColumn("shard",
        conv(substring(col("order_hash"), 1, 4), 16, 10).cast("int") % shards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("order_hash"), col("doc_id"))))
      .select(col("doc_id"), col("order_hash"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  private[queries] val p04Sql =
    """WITH h AS (
      |  SELECT doc_id, md5('ord1|' || CAST(doc_id AS VARCHAR)) AS order_hash
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, order_hash,
      |    CAST(('0x' || substr(order_hash, 1, 4)) AS INTEGER) % 8 AS shard
      |  FROM h)
      |SELECT doc_id, order_hash, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY order_hash, doc_id)
      |    AS INTEGER) AS pos
      |FROM sh ORDER BY shard, pos""".stripMargin

  // -- p09: packed-shard manifest ------------------------------------------
  // The artifact a training data-loader actually consumes: one row
  // per packed context window (m04's 8192-token multimodal bins) with
  // its document count, modality volumes, and fill ratio. A window's
  // tokens are whatever the packing placed in [bin·8192, (bin+1)·8192)
  // of the per-source stream, so a doc spanning a bin boundary
  // contributes to BOTH bins' fill — the overlap arithmetic is exact
  // integer clamping of [start, end) against the bin range. The last
  // (partial) bin of each source reports its true fill < 1.
  //
  // Scale: m04's packing shuffles + one (source, bin) partial agg;
  // a doc spans ≤ cost/8192 + 1 bins, so the explode is bounded by
  // total tokens / 8192 extra rows corpus-wide.
  private[queries] val p09: Q = (s, d) => shardManifest(m04(s, d), budget = 8192)

  /** p09's manifest derivation over ANY packed frame exposing
    * (source, n_images, cost, bin_id, bin_offset) — the token-cost
    * definition (regex-BPE, t17 learned, …) is whatever the packing
    * priced; the bin/overlap arithmetic is definition-independent
    * (spec-pinned). Precondition: cost ≥ 1 per row (a zero-cost doc
    * has no span to bin — callers price empty docs at ≥1 or filter). */
  private[graft] def shardManifest(packedIn: DataFrame, budget: Int): DataFrame = {
    val packed = packedIn
      .withColumn("start_tok", col("bin_id") * budget + col("bin_offset"))
      .withColumn("end_tok", col("start_tok") + col("cost"))
      .withColumn("bin", explode(sequence(col("bin_id"),
        expr(s"(end_tok - 1) div $budget"))))
      .withColumn("bin_start", col("bin") * budget)
      .withColumn("in_bin",
        least(col("end_tok"), col("bin_start") + budget) -
          greatest(col("start_tok"), col("bin_start")))
    packed.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("in_bin")).as("tokens_in_bin"),
        // images count once, in the doc's STARTING bin — a
        // boundary-spanning doc's TOKENS split across bins but its
        // images are atomic, and double-counting them would inflate
        // the summed modality volume (round-7 ADVICE)
        sum(when(col("bin") === col("bin_id"), col("n_images"))
          .otherwise(lit(0))).as("n_images"))
      .withColumn("fill_ratio",
        col("tokens_in_bin").cast(DoubleType) / budget)
      .orderBy(col("source"), col("bin"))
  }

  private[queries] val p09Sql =
    """WITH c AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER)
      |      AS text_tokens,
      |    CAST(least(octet_length(encode(text)) // 1000, 7) + 1 AS INTEGER) AS n_images
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, source, n_images,
      |    CAST(text_tokens + n_images * 576 AS BIGINT) AS cost,
      |    CAST(SUM(text_tokens + n_images * 576) OVER (
      |      PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM c),
      |spans AS (
      |  SELECT doc_id, source, n_images, cost,
      |    cum - cost AS start_tok, cum AS end_tok
      |  FROM w),
      |bins AS (
      |  SELECT source, b AS bin,
      |    least(end_tok, (b + 1) * 8192) - greatest(start_tok, b * 8192) AS in_bin,
      |    CASE WHEN b = start_tok // 8192 THEN n_images ELSE 0 END AS img_in_bin
      |  FROM spans, LATERAL unnest(generate_series(start_tok // 8192,
      |    (end_tok - 1) // 8192)) AS u(b))
      |SELECT source, bin, COUNT(*) AS n_docs,
      |  CAST(SUM(in_bin) AS BIGINT) AS tokens_in_bin,
      |  CAST(SUM(img_in_bin) AS BIGINT) AS n_images,
      |  CAST(SUM(in_bin) AS DOUBLE) / 8192 AS fill_ratio
      |FROM bins GROUP BY source, bin ORDER BY source, bin""".stripMargin

  // -- p06: dataset card (per-source datasheet) ----------------------------
  // The "datasheet for datasets" rollup a corpus release ships: per
  // source — volume (docs, tokens), language spread, exact-duplicate
  // rate. All measures are exact-integer-derived (t05's policy): the
  // only doubles are single IEEE divisions of exact ints, so the card
  // is hash-stable across engines and partitionings. Dup counting is
  // d01's content-hash window scoped per source (a doc is a dup if an
  // earlier doc_id in the SAME source has identical text — the
  // release-grain question; cross-source dups are d09/d11 territory).
  //
  // Scale: one window shuffle on (source, content_hash), one
  // partial-agg shuffle on source; output = #sources rows.
  private[queries] val p06: Q = (s, d) => {
    val wDup = Window.partitionBy(col("source"), col("content_hash"))
      .orderBy(col("doc_id"))
    T.documents(s, d)
      .withColumn("bpe_tokens",
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]")))
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(wDup))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("bpe_tokens")).as("total_tokens"),
        (sum(col("bpe_tokens")).cast(DoubleType) / count(lit(1))).as("avg_tokens"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_exact_dups"))
      .withColumn("dup_share", col("n_exact_dups").cast(DoubleType) / col("n_docs"))
      .orderBy(col("source"))
  }

  private[queries] val p06Sql =
    """WITH d AS (
      |  SELECT source, lang, doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens,
      |    row_number() OVER (PARTITION BY source, md5(text) ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens,
      |  CAST(CAST(SUM(bpe_tokens) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_tokens,
      |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
      |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    / CAST(COUNT(*) AS DOUBLE) AS dup_share
      |FROM d GROUP BY source
      |ORDER BY source""".stripMargin

  // -- p07: token-budget sampling ------------------------------------------
  // The budgeted-corpus draw every pretraining mix ends with: a TOTAL
  // token budget (¼ of the corpus here — scale-free, exact integer
  // div) is allocated across sources by √-temperature weights
  // (p03's flattening, on tokens instead of docs: share_s =
  // ⌊√tokens_s⌋ / Σ⌊√tokens⌋ — the isqrt keeps the weight sum exact
  // integer, so no cross-source double summation whose order could
  // differ between engines), and each source admits documents in a
  // deterministic salted-hash order until its budget is full — the
  // PREFIX rule: a document is selected iff the running token total
  // through it stays ≤ the source budget.
  //
  // The implementation is the scalable two-level order statistic, not
  // the naive global window: docs land in 256 buckets by the first
  // byte of their draw (bucket order == draw order, it's a prefix),
  // per-(source, bucket) token sums roll up to a bucket-level running
  // total (≤ 256·|sources| rows — broadcastable), which classifies
  // every bucket as fully-admitted / fully-rejected / boundary; ONLY
  // the single boundary bucket per source needs a doc-level cumsum
  // window (~1/256 of the source). The ORACLE is the naive
  // per-source window over every doc — hash-equality proves the
  // bucketed plan computes exactly the naive semantics.
  //
  // Scale: one partial-agg shuffle to (source, bucket), one broadcast
  // of the bucket spine, one window over boundary-bucket docs only.
  // No global sort, no per-source whole-corpus window.
  private[queries] val p07: Q = (s, d) => tokenBudgetSample(
    T.documents(s, d).select(col("doc_id"), col("source"),
      size(TF.tokens(col("text"))).cast(LongType).as("n_tokens")))

  /** p07's two-level budgeted draw over ANY (doc_id, source,
    * n_tokens) frame — the token definition is the caller's choice
    * (whitespace here, t17 learned in the spec); the √-temperature
    * allocation and bucketed prefix-draw arithmetic are
    * definition-independent (spec-pinned). */
  private[graft] def tokenBudgetSample(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .withColumn("u",
        substring(md5(concat(col("doc_id").cast(StringType), lit("|budget"))), 1, 8))
      .withColumn("bucket", conv(substring(col("u"), 1, 2), 16, 10).cast(LongType))
    val srcTok = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens_s"))
      .withColumn("isq", floor(sqrt(col("tokens_s").cast(DoubleType))).cast(LongType))
    val tot = srcTok.agg(sum(col("tokens_s")).as("tot_tokens"),
      sum(col("isq")).as("tot_isq")) // one row: corpus totals
    // budget_s = ⌊(tot/4) · isq_s / Σisq⌋ — one double mul + div +
    // floor, identical op order in the oracle
    val budgets = srcTok.crossJoin(broadcast(tot))
      .select(col("source"),
        // tot/4.0 is a power-of-two division (exact) so floor == the
        // oracle's integer tot_tokens // 4; then one double mul + div
        floor(floor(col("tot_tokens") / lit(4L)).cast(DoubleType) *
          col("isq").cast(DoubleType) / col("tot_isq").cast(DoubleType))
          .cast(LongType).as("budget_s"))
    val wB = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val spine = docs.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("run_before",
        coalesce(sum(col("btok")).over(wB.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(budgets, "source")
    val withSpine = docs.join(broadcast(spine), Seq("source", "bucket"))
    val full = withSpine
      .filter(col("run_before") + col("btok") <= col("budget_s"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
    val wD = Window.partitionBy(col("source"))
      .orderBy(col("u"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = withSpine
      .filter(col("run_before") <= col("budget_s") &&
        col("run_before") + col("btok") > col("budget_s"))
      .withColumn("cum", col("run_before") + sum(col("n_tokens")).over(wD))
      .filter(col("cum") <= col("budget_s"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
    full.unionByName(boundary).orderBy(col("source"), col("doc_id"))
  }

  // The naive semantics the bucketed plan must equal: per source,
  // order by (draw, doc_id), running token sum, keep the prefix that
  // fits the budget.
  private[queries] val p07Sql =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    substr(md5(CAST(doc_id AS VARCHAR) || '|budget'), 1, 8) AS u
      |  FROM documents),
      |st AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens_s FROM docs GROUP BY source),
      |si AS (SELECT source, tokens_s,
      |         CAST(floor(sqrt(CAST(tokens_s AS DOUBLE))) AS BIGINT) AS isq FROM st),
      |tot AS (SELECT CAST(SUM(tokens_s) AS BIGINT) AS tot_tokens,
      |          CAST(SUM(isq) AS BIGINT) AS tot_isq FROM si),
      |b AS (SELECT source,
      |        CAST(floor(CAST(tot_tokens // 4 AS DOUBLE) * CAST(isq AS DOUBLE)
      |          / CAST(tot_isq AS DOUBLE)) AS BIGINT) AS budget_s
      |      FROM si CROSS JOIN tot),
      |c AS (SELECT d.source, d.doc_id, d.n_tokens, b.budget_s,
      |        CAST(SUM(d.n_tokens) OVER (PARTITION BY d.source
      |          ORDER BY d.u, d.doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM docs d JOIN b USING (source))
      |SELECT source, doc_id, n_tokens FROM c
      |WHERE cum <= budget_s
      |ORDER BY source, doc_id""".stripMargin

  // -- p08: release diff ----------------------------------------------------
  // deterministic curation policies over the same raw corpus — A
  // keeps docs ≥ 150 chars as-is; B tightens the gate to ≥ 200 and
  // truncates at 400 chars (a max-length policy change) — and the
  // diff is a doc_id full-outer join comparing content hashes:
  // added / removed / changed / unchanged per source, plus the exact
  // released-char volumes both sides. The q42/q76 reconcile shape
  // applied at the corpus-release grain.
  //
  // Scale: one co-partitioned full-outer join on the uniform doc_id
  // key (hashes computed map-side, so the exchange moves one hash +
  // one int per side, never text), one #sources partial agg.
  private[queries] val p08: Q = (s, d) => {
    val docs = T.documents(s, d)
    val relA = docs.filter(col("n_chars") >= 150)
      .select(col("doc_id"), col("source").as("src_a"),
        md5(col("text")).as("ha"), col("n_chars").cast(LongType).as("ca"))
    val relB = docs.filter(col("n_chars") >= 200)
      .select(col("doc_id"), col("source").as("src_b"),
        md5(substring(col("text"), 1, 400)).as("hb"),
        least(col("n_chars"), lit(400)).cast(LongType).as("cb"))
    relA.join(relB, Seq("doc_id"), "full_outer")
      .withColumn("source", coalesce(col("src_a"), col("src_b")))
      .withColumn("status",
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(coalesce(col("ca"), lit(0L))).as("chars_a"),
        sum(coalesce(col("cb"), lit(0L))).as("chars_b"))
      .orderBy(col("source"))
  }

  private[queries] val p08Sql =
    """WITH a AS (
      |  SELECT doc_id, source AS src_a, md5(text) AS ha,
      |    CAST(n_chars AS BIGINT) AS ca
      |  FROM documents WHERE n_chars >= 150),
      |b AS (
      |  SELECT doc_id, source AS src_b, md5(substr(text, 1, 400)) AS hb,
      |    CAST(least(n_chars, 400) AS BIGINT) AS cb
      |  FROM documents WHERE n_chars >= 200),
      |j AS (
      |  SELECT COALESCE(src_a, src_b) AS source,
      |    CASE WHEN ha IS NULL THEN 'added'
      |         WHEN hb IS NULL THEN 'removed'
      |         WHEN ha <> hb THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      |  FROM a FULL OUTER JOIN b USING (doc_id))
      |SELECT source,
      |  CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
      |  CAST(SUM(ca) AS BIGINT) AS chars_a,
      |  CAST(SUM(cb) AS BIGINT) AS chars_b
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // -- p13: sequence packing priced in TRAINED-BPE tokens ------------------
  // The costing family is now parameterized over all three token
  // definitions through ONE packing arithmetic: p02 (regex proxy),
  // p10 (learned-vocab greedy), p13 (t20's trained merge table via
  // t23's apply). Same hierarchicalPack, same windows — only the
  // per-doc cost column changes, which is exactly the contract a
  // data-loader swap needs. Scale: t23's broadcast vocab join + one
  // per-doc agg, then p02's two bounded window shuffles.
  private[queries] val p13: Q = (s, d) => {
    val docs = T.documents(s, d)
    val cost = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(bpeWordTok(docs)), "w")
      .groupBy(col("doc_id")).agg(sum(col("tok")).as("bpe"))
    val base = docs.select(col("doc_id"), col("source"))
      .join(cost, Seq("doc_id"), "left")
      .withColumn("bpe_tokens", coalesce(col("bpe"), lit(0L)))
      .withColumn("cost", col("bpe_tokens"))
    hierarchicalPack(base, budget = 8192, shardSize = 512)
      .select(col("doc_id"), col("source"), col("bpe_tokens"),
        col("bin_id"), col("bin_offset"))
      .orderBy(col("doc_id"))
  }

  private[queries] val p13Sql: String =
    s"""WITH $bpeWtokCtes,
      |agg AS (
      |  SELECT d.doc_id, CAST(SUM(wt.tok) AS BIGINT) AS bpe
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) d
      |  JOIN wtok wt ON d.w = wt.w WHERE d.w <> ''
      |  GROUP BY d.doc_id),
      |c AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(COALESCE(a.bpe, 0) AS BIGINT) AS bpe_tokens
      |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
      |w AS (
      |  SELECT doc_id, source, bpe_tokens,
      |    CAST(SUM(bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM c)
      |SELECT doc_id, source, bpe_tokens,
      |  (cum - bpe_tokens) // 8192 AS bin_id,
      |  (cum - bpe_tokens) % 8192 AS bin_offset
      |FROM w ORDER BY doc_id""".stripMargin

  // -- p14: multi-epoch schedule (without-replacement across epochs) -------
  // The schedule a data-constrained run (p11's regime) actually
  // executes: E epochs where each epoch draws a per-source QUOTA of
  // docs WITHOUT replacement ACROSS epochs — epoch e takes the next
  // wrap-around slice of the source's one fixed permutation, so a
  // source smaller than its cumulative budget restarts (the
  // Muennighoff repeat regime) while a large source contributes
  // fresh data every epoch — and each epoch is then re-shuffled by
  // its OWN salted hash (p04's reproducible global shuffle, salted
  // per epoch, so no two epochs present the data in the same order —
  // the property epoch reshuffling exists for).
  //
  // Deterministic end to end: the source permutation and every
  // epoch's presentation order are salted-md5 ranks (t07/p04's
  // idiom); slice membership is pure integer arithmetic on the rank.
  // Invariants spec-pinned: a doc appears ≤ once per epoch; every
  // epoch emits exactly its quota per source; consecutive epochs'
  // slices are disjoint until the source wraps.
  //
  // Scale: two window shuffles on uniform salted keys — the per-
  // source rank (p04's class) and the per-(epoch, shard) position
  // (sharded exactly like p04 so no global sort appears at any
  // scale); output ≈ E × Σ quota rows, the training manifest itself.
  private[queries] val p14: Q = (s, d) => {
    import s.implicits._
    val epochs = 4; val shards = 8
    val ranked = docsSpread(s, d)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          md5(concat(lit("p14|"), col("doc_id").cast("string"))), col("doc_id"))) - 1)
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("quota", expr("(n_src + 1) div 2")) // ceil(n/2), exact integer div

    val sched = ranked
      .crossJoin(broadcast((0 until epochs).toList.toDF("epoch")))
      // epoch e admits ranks in the wrap-around window [e·q, e·q + q)
      .filter((col("r") - col("epoch") * col("quota") % col("n_src") + col("n_src"))
        % col("n_src") < col("quota"))
      .withColumn("order_hash",
        md5(concat(lit("p14e"), col("epoch").cast("string"), lit("|"),
          col("doc_id").cast("string"))))
      .withColumn("shard",
        conv(substring(col("order_hash"), 1, 4), 16, 10).cast("int") % shards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("order_hash"), col("doc_id"))))
    sched.select(col("epoch"), col("shard"), col("doc_id"), col("source"), col("pos"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  private[queries] val p14Sql =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY
      |      md5('p14|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) - 1 AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      |  FROM documents),
      |q14 AS (SELECT *, (n_src + 1) // 2 AS quota FROM ranked),
      |sched AS (
      |  SELECT doc_id, source, e.epoch
      |  FROM q14, (SELECT unnest([0, 1, 2, 3]) AS epoch) e
      |  WHERE ((r - e.epoch * quota % n_src + n_src) % n_src) < quota),
      |h AS (
      |  SELECT epoch, doc_id, source,
      |    md5('p14e' || CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))
      |      AS order_hash
      |  FROM sched),
      |sh AS (
      |  SELECT epoch, doc_id, source, order_hash,
      |    CAST(('0x' || substr(order_hash, 1, 4)) AS INTEGER) % 8 AS shard
      |  FROM h)
      |SELECT epoch, shard, doc_id, source,
      |  CAST(row_number() OVER (PARTITION BY epoch, shard
      |    ORDER BY order_hash, doc_id) AS INTEGER) AS pos
      |FROM sh ORDER BY epoch, shard, pos""".stripMargin

  // -- p10: sequence packing priced in LEARNED tokens ----------------------
  // The re-pricing the verdict asked t17 to enable: p02/m04's packing
  // arithmetic (the SAME hierarchicalPack definition — nothing about
  // bins changes) with the per-doc cost measured by the learned-vocab
  // tokenizer instead of the regex proxy. At a mean ratio of 1.5×,
  // regex-priced 8192-token windows would physically overflow a real
  // tokenizer's context by ~50% — this operator is what a training
  // data-loader would actually consume. Scale: t17's map-only scan +
  // p02's two bounded window shuffles; the fit is one explode-agg +
  // TakeOrdered over the distinct-word frame.
  private[queries] val p10: Q = (s, d) => {
    val vocab = learnedVocab(s, d)
    val st = graft.functions.GraftColumns.learnedTokenStats(col("text"), vocab.toSeq)
    val base = T.documents(s, d)
      .withColumn("learned_tokens", st.getField("learned_tokens"))
      .withColumn("cost", col("learned_tokens"))
    hierarchicalPack(base, budget = 8192, shardSize = 512)
      .select(col("doc_id"), col("source"), col("learned_tokens"),
        col("bin_id"), col("bin_offset"))
      .orderBy(col("doc_id"))
  }

  private[queries] val p10Sql =
    s"""WITH RECURSIVE $learnedSegCtes,
       |agg AS (
       |  SELECT t.doc_id, CAST(SUM(p.pieces) AS BIGINT) AS learned
       |  FROM tk t JOIN wp p ON t.w = p.w
       |  GROUP BY t.doc_id),
       |c AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(COALESCE(a.learned, 0) AS BIGINT) AS learned_tokens
       |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
       |w AS (
       |  SELECT doc_id, source, learned_tokens,
       |    CAST(SUM(learned_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM c)
       |SELECT doc_id, source, learned_tokens,
       |  (cum - learned_tokens) // 8192 AS bin_id,
       |  (cum - learned_tokens) % 8192 AS bin_offset
       |FROM w ORDER BY doc_id""".stripMargin

  // -- p11: epoch-capped mixture allocation (water-filling) ----------------
  // p03 answers "what share should each source get"; p11 answers the
  // question a real data-mixture controller faces NEXT: sources are
  // FINITE, and repeating data past a few epochs stops helping
  // (Muennighoff et al. 2023, "Scaling Data-Constrained Language
  // Models" — public arXiv 2305.16264), so the target mixture must be
  // re-allocated under per-source capacity caps (corpus tokens ×
  // max-epochs). That is exactly the water-filling problem: allocate
  // B tokens proportionally to weights w_s, cap each source at its
  // capacity, and redistribute the overflow to uncapped sources —
  // alloc_s = min(capacity_s, λ·w_s) with λ the common water level.
  // The classic closed form: sort sources by capacity/w ascending;
  // the capped set is a PREFIX of that order, identified positionally
  // by the exact integer predicate capacity·suffix_w ≤ (B −
  // prefix_capacity)·w. Weights are integer-quantized temperature-0.5
  // shares (⌊√tokens⌋ — the IntLloyd replayability discipline), every
  // sum is an exact LONG, and the only doubles are the final water
  // level division and the per-source epoch ratio (correctly-rounded,
  // engine-identical). Budget = 2× corpus tokens, priced in t17's
  // LEARNED tokens — the real-token costing this family runs on.
  //
  // Scale: the corpus-sized work is the t17 costing scan + ONE
  // partial-agg shuffle to #sources cells; everything after (ranking
  // windows, capped-set totals, the allocation itself) runs on a
  // #sources-row frame — constant as the corpus grows. The integer
  // capped-predicate products need B·max(w) < 2^63 (holds through
  // ~10^12-token corpora); past that the predicate evaluates in
  // correctly-rounded doubles — still deterministic, quantized at the
  // knife-edge only.
  /** The water-filling closed form over a (source, cap_tokens,
    * capacity, w) frame — p11's algorithm, factored so RandomizedSpec
    * can drive it on adversarial frames: budget = Σcap_tokens ×
    * budgetFactor; sort by capacity/w; the capped set is the prefix
    * satisfying the exact integer predicate; the water level is one
    * double division; uncapped alloc = ⌊λ·w⌋. */
  private[graft] def waterfill(base: DataFrame, budgetFactor: Long): DataFrame = {
    val totals = base.agg(
      (sum(col("cap_tokens")) * budgetFactor).as("budget"),
      sum(col("w")).as("total_w"))
    val ord = Window
      .orderBy(col("capacity").cast(DoubleType) / col("w").cast(DoubleType),
        col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flags = base.crossJoin(broadcast(totals))
      .withColumn("prefix_cap", coalesce(sum(col("capacity")).over(ord), lit(0L)))
      .withColumn("prefix_w", coalesce(sum(col("w")).over(ord), lit(0L)))
      .withColumn("is_capped",
        col("capacity") * (col("total_w") - col("prefix_w")) <=
          (col("budget") - col("prefix_cap")) * col("w"))
    val cappedTotals = flags.agg(
      sum(when(col("is_capped"), col("capacity")).otherwise(0L)).as("used_cap"),
      sum(when(col("is_capped"), col("w")).otherwise(0L)).as("used_w"))
    flags.crossJoin(broadcast(cappedTotals))
      .withColumn("alloc_tokens", when(col("is_capped"), col("capacity"))
        .otherwise(floor(
          (col("budget") - col("used_cap")).cast(DoubleType) /
            (col("total_w") - col("used_w")).cast(DoubleType) *
            col("w").cast(DoubleType)).cast(LongType)))
      .withColumn("epochs", when(col("cap_tokens") === 0L, lit(0.0))
        .otherwise(col("alloc_tokens").cast(DoubleType) /
          col("cap_tokens").cast(DoubleType)))
      .select(col("source"), col("cap_tokens"), col("capacity"),
        col("w").as("weight"), col("is_capped"), col("alloc_tokens"),
        col("epochs"))
  }

  private[queries] val p11: Q = (s, d) => {
    val maxEpochs = 3L
    val vocab = learnedVocab(s, d)
    val st = graft.functions.GraftColumns.learnedTokenStats(col("text"), vocab.toSeq)
    val perSrc = T.documents(s, d)
      .withColumn("tok", st.getField("learned_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("tok")).as("cap_tokens"))
      .withColumn("capacity", col("cap_tokens") * maxEpochs)
      .withColumn("w", greatest(lit(1L),
        floor(sqrt(col("cap_tokens").cast(DoubleType))).cast(LongType)))
    waterfill(perSrc, budgetFactor = 2L).orderBy(col("source"))
  }

  private[queries] val p11Sql =
    s"""WITH RECURSIVE $learnedSegCtes,
       |agg AS (
       |  SELECT t.doc_id, CAST(SUM(p.pieces) AS BIGINT) AS learned
       |  FROM tk t JOIN wp p ON t.w = p.w GROUP BY t.doc_id),
       |base AS (
       |  SELECT d.source,
       |    CAST(SUM(COALESCE(a.learned, 0)) AS BIGINT) AS cap_tokens,
       |    CAST(SUM(COALESCE(a.learned, 0)) AS BIGINT) * 3 AS capacity,
       |    GREATEST(1, CAST(floor(sqrt(CAST(CAST(SUM(COALESCE(a.learned, 0))
       |      AS BIGINT) AS DOUBLE))) AS BIGINT)) AS w
       |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |  GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cap_tokens) AS BIGINT) * 2 AS budget,
       |               CAST(SUM(w) AS BIGINT) AS total_w FROM base),
       |flags AS (
       |  SELECT b.source, b.cap_tokens, b.capacity, b.w, t.budget, t.total_w,
       |    CAST(COALESCE(SUM(b.capacity) OVER (
       |      ORDER BY CAST(b.capacity AS DOUBLE)/CAST(b.w AS DOUBLE), b.source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS prefix_cap,
       |    CAST(COALESCE(SUM(b.w) OVER (
       |      ORDER BY CAST(b.capacity AS DOUBLE)/CAST(b.w AS DOUBLE), b.source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS prefix_w
       |  FROM base b, tot t),
       |fl AS (
       |  SELECT *, capacity * (total_w - prefix_w) <=
       |    (budget - prefix_cap) * w AS is_capped
       |  FROM flags),
       |ct AS (
       |  SELECT CAST(SUM(CASE WHEN is_capped THEN capacity ELSE 0 END)
       |           AS BIGINT) AS used_cap,
       |         CAST(SUM(CASE WHEN is_capped THEN w ELSE 0 END)
       |           AS BIGINT) AS used_w
       |  FROM fl),
       |alloc AS (
       |  SELECT f.source, f.cap_tokens, f.capacity, f.w AS weight, f.is_capped,
       |    CASE WHEN f.is_capped THEN f.capacity
       |         ELSE CAST(floor(CAST(f.budget - c.used_cap AS DOUBLE) /
       |           CAST(f.total_w - c.used_w AS DOUBLE) *
       |           CAST(f.w AS DOUBLE)) AS BIGINT) END AS alloc_tokens
       |  FROM fl f, ct c)
       |SELECT source, cap_tokens, capacity, weight, is_capped, alloc_tokens,
       |  CASE WHEN cap_tokens = 0 THEN 0.0
       |       ELSE CAST(alloc_tokens AS DOUBLE) / CAST(cap_tokens AS DOUBLE)
       |  END AS epochs
       |FROM alloc ORDER BY source""".stripMargin

  // -- p12: leakage-safe train/val/test split ------------------------------
  // The split every training pipeline ends with, with the constraint
  // naive per-doc draws violate: near-duplicate documents must land in
  // the SAME split, or the eval set leaks the training set (the
  // contamination d09 hunts, created at split time). Components over
  // d04's LSH-banded candidate pairs (d14's scale-safe graph), then
  // the split draw runs on the CLUSTER label — unclustered docs draw
  // on their own id — via t07's salted-md5 bucket test (80/10/10 on
  // the 256-bucket hex prefix, layout-independent and backfill-stable
  // like every other draw in the engine). The output publishes the
  // per-split volumes AND the audit that makes the guarantee
  // checkable: cross_split_pairs, the number of candidate pairs whose
  // ends landed in different splits — 0 by construction, MEASURED,
  // not asserted.
  //
  // Scale: the pair graph is LSH-banded (sublinear — d04's story);
  // components touch docs-in-pairs only; the draw is map-only over
  // the corpus after ONE co-partitioned left join on the uniform
  // doc_id key; the audit join is bounded by the pair count. No
  // corpus window, no global sort before the 3-row output.
  private[queries] val p12: Q = (s, d) => {
    val pairs = d04(s, d).filter(col("est_jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"))
      .transform(graft.CacheScope.cached) // components + the audit both read it
    val comps = Operators.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val assigned = T.documents(s, d).select(col("doc_id"), col("n_chars"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", substring(
        md5(concat(col("split_key").cast(StringType), lit("|graft-split"))), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cd", "train")
          .when(col("bucket") < "e7", "val")
          .otherwise("test"))
      .transform(graft.CacheScope.cached) // summary + both audit probes
    val ends = assigned.select(col("doc_id"), col("split"))
    val cross = pairs
      .join(ends.toDF("a_id", "split_a"), "a_id")
      .join(ends.toDF("b_id", "split_b"), "b_id")
      .agg(sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
        .as("cross_split_pairs"))
      .na.fill(0L, Seq("cross_split_pairs"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        count(col("cluster_id")).as("n_clustered_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(cross))
      .orderBy(col("split"))
  }

  private[queries] val p12Sql =
    s"""WITH RECURSIVE dpairs AS (
       |  SELECT a_id, b_id FROM ($d04Sql) WHERE est_jaccard >= 0.5),
       |e AS (SELECT a_id AS src, b_id AS dst FROM dpairs
       |      UNION ALL SELECT b_id, a_id FROM dpairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       |comp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |         FROM reach GROUP BY src),
       |assigned AS (
       |  SELECT d.doc_id, d.n_chars, c.cluster_id,
       |    CASE WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)
       |        || '|graft-split'), 1, 2) < 'cd' THEN 'train'
       |      WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)
       |        || '|graft-split'), 1, 2) < 'e7' THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
       |cross_cnt AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS cross_split_pairs
       |  FROM dpairs p
       |  JOIN assigned a ON p.a_id = a.doc_id
       |  JOIN assigned b ON p.b_id = b.doc_id)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       |  CAST(COUNT(cluster_id) AS BIGINT) AS n_clustered_docs,
       |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |  (SELECT cross_split_pairs FROM cross_cnt) AS cross_split_pairs
       |FROM assigned GROUP BY split ORDER BY split""".stripMargin

  // -- p15: the END-TO-END certified pretrain build -------------------------
  // Every stage of the §2 ladder is individually oracle-exact; p15 is
  // the integration proof (round-11 verdict #3): ONE registered query
  // running the full pretrain data build as ONE declarative plan —
  //   1. CURATE: p01's gates verbatim (p01Curated — one definition);
  //   2. NEAR-DUP KEEPER: d14's quality-keeper rule over d04's banded
  //      candidates at the DELETE threshold (est_jaccard ≥ 0.8 —
  //      aggressive removal only for near-exact copies);
  //   3. DECONTAMINATE: d09's n-gram benchmark overlap — flagged docs
  //      AND the benchmark members themselves (doc_id % 20 = 0) leave
  //      the training corpus;
  //   4. LEAKAGE-SAFE SPLIT: p12's component draw over the SAME
  //      banded pair graph at the looser GROUPING threshold (≥ 0.5 —
  //      surviving near-dups must co-locate in one split);
  //   5. PRICE: t23's trained-BPE apply (bpeWordTok — the one apply
  //      definition t20/t23/p13 share);
  //   6. PACK: p13's packing arithmetic over the train split
  //      (hierarchicalPack, budget 8192);
  //   7. SCHEDULE: p14's wrap-around slice policy at E=4 — each train
  //      doc's FIRST epoch from its salted per-source rank.
  // Output: one row per surviving doc — the training manifest — with
  // split, BPE price, bin placement and first epoch (−1 outside the
  // train split). The oracle composes the stages' own CTE chains, so
  // hash equality certifies the COMPOSITION: a drift in any stage
  // definition, join, or threshold moves rows.
  //
  // Scale: every stage keeps its own documented shape — map-only
  // gates, banded pair graph (computed ONCE, reused at both
  // thresholds via CacheScope), O(diameter) components over pairs
  // only, broadcast vocab pricing, hierarchical prefix-sum packing,
  // two bounded windows for the schedule. Nothing new materializes
  // beyond the stages' own frames.
  private[queries] val p15: Q = (s, d) => pretrainBuild(s, d, semantic = false)

  /** The build with the SEMANTIC gate composed in (round-12 verdict
    * #4): p16 = p15 with stage 3b — d16's embedding-space
    * decontamination (benchmark side broadcast, the deployed
    * asymmetry) removing flagged docs AND the semantic benchmark
    * members (doc_id % 13 = 7) after the n-gram gate. One builder,
    * one flag: the two manifests share every stage definition, so
    * PipelineScaleSpec can pin ids(p16) == ids(p15) minus d16's own
    * flagged set minus the held-out items. */
  private[queries] val p16: Q = (s, d) => pretrainBuild(s, d, semantic = true)

  private def pretrainBuild(s: SparkSession, d: String,
                            semantic: Boolean): DataFrame = {
    val docs = T.documents(s, d)
    // The BPE vocabulary (stage 5's broadcast side) trains through
    // ~80 driver-launched rounds and depends on nothing but `docs`,
    // while stages 1–4 run their own driver-side component fixpoints —
    // two independent chains of small actions, so train the vocab on
    // a second driver thread and let the scheduler overlap them
    // (guide §2.6). Same vocab, same join, same rows.
    val vocabPool = graft.CacheScope.pool(1)
    val fVocab = vocabPool.submit(new java.util.concurrent.Callable[DataFrame] {
      def call(): DataFrame = bpeWordTok(docs)
    })
    // 1. curate
    val kept1 = p01Curated(s, d).select(col("doc_id"), col("source"))
      .transform(graft.CacheScope.cached) // keeper restrict + survivor base
    val k1 = kept1.select(col("doc_id"))
    // the banded candidate graph, computed once for stages 2 and 4
    val pairsAll = d04(s, d).transform(graft.CacheScope.cached)
    // 2. near-dup keeper at the delete threshold
    val keepPairs = pairsAll.filter(col("est_jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"))
      .join(k1.toDF("a_id"), Seq("a_id"), "left_semi")
      .join(k1.toDF("b_id"), Seq("b_id"), "left_semi")
    val dropped = qualityKeeper(keepPairs, docs)
      .filter(!col("is_keeper")).select(col("doc_id"))
    val c2 = kept1.join(dropped, Seq("doc_id"), "left_anti")
    // 3. decontaminate: flagged overlaps out, benchmark members out
    val flagged = d09(s, d).select(col("corpus_id").as("doc_id")).distinct()
    val c3ngram = c2.filter(col("doc_id") % 20 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
    // 3b (p16 only). SEMANTIC decontaminate: d16's embedding-space
    // gate — paraphrased benchmark items share no 16-gram shingles
    // but sit next to the original in embedding space; d16 flags
    // them against the BROADCAST benchmark side, and the held-out
    // items themselves (doc_id % 13 = 7) leave the corpus, exactly
    // as the n-gram benchmark members did in stage 3
    val c3 = (if (!semantic) c3ngram
              else {
                val semFlagged = d16(s, d)
                  .select(col("vec_id").as("doc_id")).distinct()
                c3ngram.filter(col("doc_id") % 13 =!= 7)
                  .join(semFlagged, Seq("doc_id"), "left_anti")
              })
      .transform(graft.CacheScope.cached) // split restrict + manifest base
    val c3ids = c3.select(col("doc_id"))
    // 4. leakage-safe split at the grouping threshold
    val splitPairs = pairsAll.filter(col("est_jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"))
      .join(c3ids.toDF("a_id"), Seq("a_id"), "left_semi")
      .join(c3ids.toDF("b_id"), Seq("b_id"), "left_semi")
    val comps = Operators.connectedComponents(splitPairs, "a_id", "b_id")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val assigned = c3.join(comps, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", substring(
        md5(concat(col("split_key").cast(StringType), lit("|graft-split"))), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cd", "train")
          .when(col("bucket") < "e7", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
    // 5. price in trained-BPE tokens
    val vocab = try fVocab.get() finally vocabPool.shutdown()
    val cost = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(vocab), "w")
      .groupBy(col("doc_id")).agg(sum(col("tok")).as("bpe"))
    val priced = assigned.join(cost, Seq("doc_id"), "left")
      .withColumn("bpe_tokens", coalesce(col("bpe"), lit(0L)))
      .select(col("doc_id"), col("source"), col("split"), col("bpe_tokens"))
      .transform(graft.CacheScope.cached) // packing + schedule + manifest
    val train = priced.filter(col("split") === "train")
    // 6. pack the train split
    val packed = hierarchicalPack(
      train.withColumn("cost", col("bpe_tokens")), budget = 8192, shardSize = 512)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"))
    // 7. first epoch under p14's wrap-around slice policy (E=4,
    // quota = ceil(n/2) per source)
    val ranked = train
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("p15|"), col("doc_id").cast(StringType))),
          col("doc_id"))) - 1)
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("quota", expr("(n_src + 1) div 2"))
    def adm(e: Int) =
      pmod(col("r") - lit(e.toLong) * col("quota"), col("n_src")) < col("quota")
    val sched = ranked.select(col("doc_id"),
      when(adm(0), 0L).when(adm(1), 1L).when(adm(2), 2L).when(adm(3), 3L)
        .otherwise(-1L).as("first_epoch"))
    priced
      .join(packed, Seq("doc_id"), "left")
      .join(sched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("split"), col("bpe_tokens"),
        coalesce(col("bin_id"), lit(-1L)).as("bin_id"),
        coalesce(col("bin_offset"), lit(-1L)).as("bin_offset"),
        coalesce(col("first_epoch"), lit(-1L)).as("first_epoch"))
      .orderBy(col("doc_id"))
  }

  // The composition oracle: the stages' own CTE chains, composed.
  // p01Sql / d04Sql / d09Sql (and, under the semantic flag, d16Sql)
  // embed as subqueries (their own WITHs are scoped); the keeper,
  // components, split, pricing, packing and schedule arithmetic
  // restate the certified stages' SQL verbatim. ONE builder emits
  // both p15Sql and p16Sql so the chains cannot drift.
  private[queries] val p15Sql: String = pretrainBuildSql(semantic = false)
  private[queries] val p16Sql: String = pretrainBuildSql(semantic = true)

  private def pretrainBuildSql(semantic: Boolean): String = {
    val c3Ctes =
      if (!semantic)
        """c3 AS (SELECT doc_id, source FROM c2
          |       WHERE doc_id % 20 <> 0
          |         AND doc_id NOT IN (SELECT doc_id FROM flagged)),""".stripMargin
      else
        s"""c3n AS (SELECT doc_id, source FROM c2
           |        WHERE doc_id % 20 <> 0
           |          AND doc_id NOT IN (SELECT doc_id FROM flagged)),
           |semflag AS (SELECT DISTINCT vec_id AS doc_id FROM ($d16Sql)),
           |c3 AS (SELECT doc_id, source FROM c3n
           |       WHERE doc_id % 13 <> 7
           |         AND doc_id NOT IN (SELECT doc_id FROM semflag)),""".stripMargin
    s"""WITH RECURSIVE
       |kept1 AS (SELECT doc_id, source FROM ($p01Sql)),
       |dp AS MATERIALIZED (SELECT a_id, b_id, est_jaccard FROM ($d04Sql)),
       |kpairs AS (
       |  SELECT a_id, b_id FROM dp WHERE est_jaccard >= 0.8
       |    AND a_id IN (SELECT doc_id FROM kept1)
       |    AND b_id IN (SELECT doc_id FROM kept1)),
       |ke AS (SELECT a_id AS src, b_id AS dst FROM kpairs
       |       UNION ALL SELECT b_id, a_id FROM kpairs),
       |kreach(src, dst) AS (
       |  SELECT src, dst FROM ke
       |  UNION
       |  SELECT r.src, e.dst FROM kreach r JOIN ke e ON r.dst = e.src),
       |kcomp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |          FROM kreach GROUP BY src),
       |qual AS (
       |  SELECT doc_id,
       |    0.5 * least(1.0, len(string_split_regex(trim(text), '\\s+')) / 100.0)
       |      + 0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |          x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')))
       |      - 0.2 * CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
       |        / length(text) AS quality
       |  FROM documents),
       |dropped AS (
       |  SELECT doc_id FROM (
       |    SELECT c.doc_id, row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.quality DESC, c.doc_id) AS krn
       |    FROM kcomp c JOIN qual q USING (doc_id))
       |  WHERE krn > 1),
       |c2 AS (SELECT doc_id, source FROM kept1
       |       WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
       |flagged AS (SELECT DISTINCT corpus_id AS doc_id FROM ($d09Sql)),
       |$c3Ctes
       |spairs AS (
       |  SELECT a_id, b_id FROM dp WHERE est_jaccard >= 0.5
       |    AND a_id IN (SELECT doc_id FROM c3)
       |    AND b_id IN (SELECT doc_id FROM c3)),
       |se AS (SELECT a_id AS src, b_id AS dst FROM spairs
       |       UNION ALL SELECT b_id, a_id FROM spairs),
       |sreach(src, dst) AS (
       |  SELECT src, dst FROM se
       |  UNION
       |  SELECT r.src, e.dst FROM sreach r JOIN se e ON r.dst = e.src),
       |scomp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |          FROM sreach GROUP BY src),
       |assigned AS (
       |  SELECT c.doc_id, c.source,
       |    CASE WHEN substr(md5(CAST(COALESCE(sc.cluster_id, c.doc_id) AS VARCHAR)
       |        || '|graft-split'), 1, 2) < 'cd' THEN 'train'
       |      WHEN substr(md5(CAST(COALESCE(sc.cluster_id, c.doc_id) AS VARCHAR)
       |        || '|graft-split'), 1, 2) < 'e7' THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM c3 c LEFT JOIN scomp sc ON c.doc_id = sc.doc_id),
       |$bpeWtokCtes,
       |agg AS (
       |  SELECT d.doc_id, CAST(SUM(wt.tok) AS BIGINT) AS bpe
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) d
       |  JOIN wtok wt ON d.w = wt.w WHERE d.w <> ''
       |  GROUP BY d.doc_id),
       |priced AS (
       |  SELECT a.doc_id, a.source, a.split,
       |    CAST(COALESCE(g.bpe, 0) AS BIGINT) AS bpe_tokens
       |  FROM assigned a LEFT JOIN agg g ON a.doc_id = g.doc_id),
       |packw AS (
       |  SELECT doc_id, bpe_tokens,
       |    CAST(SUM(bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM priced WHERE split = 'train'),
       |packed AS (
       |  SELECT doc_id, (cum - bpe_tokens) // 8192 AS bin_id,
       |    (cum - bpe_tokens) % 8192 AS bin_offset
       |  FROM packw),
       |tr AS (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5('p15|' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS r,
       |    COUNT(*) OVER (PARTITION BY source) AS n_src
       |  FROM priced WHERE split = 'train'),
       |sched AS (
       |  SELECT doc_id,
       |    CASE WHEN ((r - 0 * q) % n_src + n_src) % n_src < q THEN 0
       |         WHEN ((r - 1 * q) % n_src + n_src) % n_src < q THEN 1
       |         WHEN ((r - 2 * q) % n_src + n_src) % n_src < q THEN 2
       |         WHEN ((r - 3 * q) % n_src + n_src) % n_src < q THEN 3
       |         ELSE -1 END AS first_epoch
       |  FROM (SELECT doc_id, r, n_src, (n_src + 1) // 2 AS q FROM tr))
       |SELECT p.doc_id, p.source, p.split, p.bpe_tokens,
       |  CAST(COALESCE(pk.bin_id, -1) AS BIGINT) AS bin_id,
       |  CAST(COALESCE(pk.bin_offset, -1) AS BIGINT) AS bin_offset,
       |  CAST(COALESCE(sd.first_epoch, -1) AS BIGINT) AS first_epoch
       |FROM priced p
       |LEFT JOIN packed pk ON p.doc_id = pk.doc_id
       |LEFT JOIN sched sd ON p.doc_id = sd.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

}
