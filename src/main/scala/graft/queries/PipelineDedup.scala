package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.QUtil._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Operators

/** Deduplication family (d01–d17): exact/fingerprint hashing,
  * n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine (blocked
  * and IVF-celled), winnowing, line/substring/semantic dedup,
  * decontamination (n-gram, semantic, inverted-list), and the
  * connected-components keeper pipelines. */
private[graft] trait PipelineDedup extends PipelineAnn {
  // ======================= dedup: documents ================================

  // -- d01: exact dedup via content hash -----------------------------------
  private[queries] val d01: Q = (s, d) =>
    T.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("content_hash"))

  private[queries] val d01Sql =
    """SELECT md5(text) AS content_hash, COUNT(*) AS dup_cnt, MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // -- d02: normalized-text fingerprint dedup ------------------------------
  private[queries] val d02: Q = (s, d) =>
    T.documents(s, d)
      .groupBy(md5(TF.canonicalize(col("text"))).as("fingerprint"))
      .agg(count(lit(1)).as("dup_cnt"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("fingerprint"))

  private[queries] val d02Sql =
    """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
      |  COUNT(*) AS dup_cnt, MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // -- d03: char-16-gram Jaccard near-dup pairs ----------------------------
  // Shingle self-join bucketed by the shingle value itself, with
  // stop-shingle pruning: a shingle present in > maxDf docs contributes
  // O(df²) join pairs but almost no discrimination — dropping them
  // bounds the worst-case join output per key, which is what keeps this
  // operator viable on a billion-document corpus. Jaccard is computed
  // over the pruned vocabulary, identically on both engines.
  private[queries] val d03: Q = (s, d) => {
    val maxDf = 100
    val shAll = docsSpread(s, d)
      .select(col("doc_id"),
        explode(graft.functions.GraftColumns.charShingles(col("text"), 16)).as("s"))
    // df-prune via a window count: ONE shuffle on s (vs groupBy +
    // join-back = three), and the persisted result keeps its
    // s-partitioning, which the self-join below reuses. The persist
    // is the inverted-index checkpoint every near-dup pipeline has.
    val sh = shAll
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDf)
      .transform(graft.CacheScope.cached)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // a df = 1 shingle cannot produce a pair (the self-join needs two
    // distinct docs on the same s), so drop singletons from the JOIN
    // input only — `sizes` above still counts them, so the jaccard
    // denominators are unchanged (guide §3.2 pre-filter the big side;
    // −28 % join input rows at sf0.1)
    val shj = sh.filter(col("df") >= 2).drop("df")
    val pairs = shj.as("a")
      .join(shj.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    // unrounded: a single IEEE division of exact ints is bit-identical
    // across engines, while round(x,4) can diverge on half-boundaries
    val jac = col("shared").cast(DoubleType) /
      (col("na") + col("nb") - col("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "sa_id").withColumnRenamed("n", "na"),
        col("a_id") === col("sa_id"))
      .join(sizes.withColumnRenamed("doc_id", "sb_id").withColumnRenamed("n", "nb"),
        col("b_id") === col("sb_id"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.3)
      .select("a_id", "b_id", "shared", "jaccard")
      .orderBy("a_id", "b_id")
  }

  private[queries] val d03Sql =
    """WITH sh_all AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(length(text) - 15, 1)),
      |      i -> substr(text, i, 16))) AS s
      |  FROM documents),
      |sh AS (SELECT doc_id, s FROM (
      |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM sh_all)
      |  WHERE df <= 100),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, shared,
      |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
      |FROM pairs JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.3
      |ORDER BY a_id, b_id""".stripMargin

  // -- d08: winnowed-fingerprint Jaccard near-dup pairs --------------------
  // d03 over a WINNOWED index (t06's MOSS-style fingerprints: k=8 gram
  // rolling hash, w=4 window minima) instead of every shingle — the
  // standard industrial mitigation when the full inverted index is too
  // large: ~2/(w+1) of the positions survive winnowing, guaranteed to
  // include each window's minimum, so containment still surfaces.
  // Same df-pruned equi-join shape as d03; jaccard is over fingerprint
  // sets (an estimate of shingle jaccard). Fully oracle-exact: the
  // DuckDB SQL replays the identical hash family and winnow.
  private[queries] val d08: Q = (s, d) => {
    val maxDf = 100
    val fp = docsSpread(s, d)
      .select(col("doc_id"),
        explode(graft.functions.GraftColumns.winnowFingerprint(col("text"), 8, 4)).as("h"))
    val pruned = fp
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= maxDf)
      .transform(graft.CacheScope.cached)
    val sizes = pruned.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // same singleton prune as d03: df = 1 fingerprints cannot pair,
    // and `sizes` above keeps counting them, so jaccard is unchanged
    val prj = pruned.filter(col("df") >= 2).drop("df")
    val pairs = prj.as("a")
      .join(prj.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast(DoubleType) /
      (col("na") + col("nb") - col("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "sa_id").withColumnRenamed("n", "na"),
        col("a_id") === col("sa_id"))
      .join(sizes.withColumnRenamed("doc_id", "sb_id").withColumnRenamed("n", "nb"),
        col("b_id") === col("sb_id"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.3)
      .select("a_id", "b_id", "shared", "jaccard")
      .orderBy("a_id", "b_id")
  }

  private[queries] val d08Sql =
    """WITH pos AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i
      |  FROM documents WHERE length(text) >= 8),
      |h AS (
      |  SELECT doc_id, i,
      |    list_reduce(list_transform(generate_series(0, 7),
      |      j -> CAST(unicode(substr(text, CAST(i + j AS INTEGER), 1)) AS BIGINT)),
      |      (acc, c) -> (acc * 131 + c) % 1000000007) AS hv
      |  FROM pos),
      |wnd AS (
      |  SELECT doc_id, i,
      |    min(hv) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
      |    count(*) OVER (PARTITION BY doc_id) AS ng
      |  FROM h),
      |fp AS (SELECT DISTINCT doc_id, sel FROM wnd WHERE i <= ng - 3),
      |pr AS (SELECT doc_id, sel FROM (
      |  SELECT doc_id, sel, COUNT(*) OVER (PARTITION BY sel) AS df FROM fp)
      |  WHERE df <= 100),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM pr GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
      |  FROM pr a JOIN pr b ON a.sel = b.sel AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, shared,
      |  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
      |FROM pairs JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.3
      |ORDER BY a_id, b_id""".stripMargin

  // -- d09: benchmark decontamination --------------------------------------
  // Training-set decontamination: find corpus documents that share ≥5
  // distinct 16-gram shingles with any document in a held-out
  // benchmark set (stand-in here: doc_id % 20 == 0 — in production
  // the eval-suite table). The benchmark index is TINY relative to
  // the corpus by construction (eval suites are ~1e5 docs vs 1e10),
  // so it is broadcast: the corpus side streams map-only through the
  // hash join, zero corpus shuffle before the pair aggregation.
  // Bench-side df pruning bounds fan-out if a boilerplate shingle
  // ever saturates the benchmark. Removal is then q15's anti-join on
  // the contaminated ids.
  private[queries] val d09: Q = (s, d) => {
    val maxBenchDf = 100
    val sh = docsSpread(s, d).select(col("doc_id"),
      explode(graft.functions.GraftColumns.charShingles(col("text"), 16)).as("s"))
    val benchPruned = sh.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("bench_id"), col("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxBenchDf).drop("df")
    val corpus = sh.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("corpus_id"), col("s"))
    corpus.join(broadcast(benchPruned), "s")
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .orderBy(col("corpus_id"), col("bench_id"))
  }

  private[queries] val d09Sql =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(length(text) - 15, 1)),
      |      i -> substr(text, i, 16))) AS s
      |  FROM documents),
      |bp AS (SELECT bench_id, s FROM (
      |  SELECT doc_id AS bench_id, s, COUNT(*) OVER (PARTITION BY s) AS df
      |  FROM sh WHERE doc_id % 20 = 0) WHERE df <= 100),
      |c AS (SELECT doc_id AS corpus_id, s FROM sh WHERE doc_id % 20 <> 0)
      |SELECT corpus_id, bench_id, COUNT(*) AS shared
      |FROM c JOIN bp USING (s)
      |GROUP BY 1, 2 HAVING COUNT(*) >= 5
      |ORDER BY corpus_id, bench_id""".stripMargin

  // -- d10: dedup clusters via connected components ------------------------
  // Pair lists (d03–d09) aren't what a dedup pass applies: the unit of
  // removal is the duplicate CLUSTER — keep one doc per connected
  // component of the near-dup graph (A~B, B~C ⇒ drop two of {A,B,C},
  // which no pairwise pass gets right). Distributed min-label
  // propagation: each vertex repeatedly takes the min component id
  // among itself and its neighbors until fixpoint — the standard
  // Pregel-style loop, O(cluster diameter) rounds of one equi-join +
  // one groupBy each. The driver loop is over ROUNDS (small, bounded
  // by the longest dup chain), never over rows. Pairs come from d06's
  // oracle-exact near-dup query; the oracle replays the closure with
  // a recursive CTE.
  private[queries] val d10: Q = (s, d) =>
    Operators.connectedComponents(
        d06(s, d).select(col("a_id"), col("b_id")), "a_id", "b_id")
      .select(col("id").as("vec_id"), col("comp").as("cluster_id"),
        (col("id") === col("comp")).as("is_keeper"))
      .orderBy(col("vec_id"))

  private[queries] val d10Sql =
    """WITH RECURSIVE
      |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |      FROM embeddings a JOIN embeddings b
      |        ON a.label = b.label AND a.vec_id < b.vec_id
      |      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.35),
      |e AS (SELECT a_id AS src, b_id AS dst FROM p
      |      UNION ALL SELECT b_id, a_id FROM p),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      |comp AS (SELECT src AS vec_id, least(src, MIN(dst)) AS cluster_id
      |         FROM reach GROUP BY src)
      |SELECT vec_id, cluster_id, vec_id = cluster_id AS is_keeper
      |FROM comp ORDER BY vec_id""".stripMargin

  // -- d04: MinHash + LSH band bucketing (ORACLE-EXACT) --------------------
  // Graduated from rows-only in round 4: the hash family is the
  // replayable affine-mod-prime construction (see MinHashShingles —
  // polynomial shingle hash + a_p·h+b_p mod 1e9+7 bijections), so the
  // whole signature → banding → candidate pipeline replays in DuckDB
  // as plain SQL: banding is just GROUP BY (band, band value).
  // Char indexing (here and d05): the native expressions iterate CODE
  // POINTS (round 14 — formerly UTF-16 charAt, a documented BMP-only
  // contract), so the SQL's unicode(substr) replay matches on ANY
  // text, emoji/CJK-extB included; FunctionsSpec pins native == HOF
  // on a supplementary-plane corpus.
  // est_jaccard is matches/32 — an exact power-of-two division, no
  // rounding (round() can diverge across engines on half-boundaries).
  private[queries] val d04: Q = (s, d) => {
    val numPerms = 32; val bands = 8; val rowsPerBand = 4
    // Native one-pass expression: interpreted HOF minhash costs
    // numPerms × shingles lambda evals per row — see MinHashShingles.
    val sigs = docsSpread(s, d)
      .select(col("doc_id"),
        graft.functions.GraftColumns.minHashShingles(col("text"), 8, numPerms).as("sig"))
    // band key = the 4 slot minima verbatim (comma-joined decimal —
    // the cross-engine-stable encoding); same ≤bands×docs key space
    // as a hashed band key
    val bandCols = (0 until bands).map { b =>
      val elems = (1 to rowsPerBand).map(j =>
        element_at(col("sig"), b * rowsPerBand + j).cast(StringType))
      struct(lit(b).as("band"), concat_ws(",", elems: _*).as("bv"))
    }
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    // est_jaccard is computed BEFORE the pair dedupe so the distinct
    // exchange moves three scalars per candidate, not two 32-long
    // signature arrays (same fix as s02's id-only dedupe: at corpus
    // scale the network dominates the recomputed fold).
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        (aggregate(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0),
          (acc, x) => acc + x).cast(DoubleType) / numPerms).as("est_jaccard"))
      .distinct()
      .orderBy("a_id", "b_id")
  }

  private[queries] val d04Sql: String = {
    import graft.functions.expressions.MinHashShingles.{aConst, bConst}
    val aList = (0 until 32).map(aConst).mkString(", ")
    val bList = (0 until 32).map(bConst).mkString(", ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id,
       |    CASE WHEN length(text) = 0 THEN 0 ELSE
       |      list_reduce(list_transform(generate_series(0, CAST(least(7, length(text) - i) AS INTEGER)),
       |        j -> CAST(unicode(substr(text, CAST(i + j AS INTEGER), 1)) AS BIGINT)),
       |        (acc, c) -> (acc * 131 + c) % 1000000007) END AS h
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
       |        FROM documents)),
       |perms AS (SELECT unnest(generate_series(0, 31)) AS p,
       |                 unnest([$aList]) AS a,
       |                 unnest([$bList]) AS b),
       |sig AS (SELECT doc_id, p, min((a * h + b) % 1000000007) AS mv
       |        FROM sh, perms GROUP BY doc_id, p),
       |bandv AS (SELECT doc_id, CAST(p // 4 AS INTEGER) AS band,
       |            string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS bv
       |          FROM sig GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bandv a JOIN bandv b
       |           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |mm AS (SELECT c.a_id, c.b_id, SUM(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS m
       |       FROM cand c
       |       JOIN sig sa ON sa.doc_id = c.a_id
       |       JOIN sig sb ON sb.doc_id = c.b_id AND sb.p = sa.p
       |       GROUP BY 1, 2)
       |SELECT a_id, b_id, CAST(m AS DOUBLE) / 32 AS est_jaccard
       |FROM mm ORDER BY a_id, b_id""".stripMargin
  }

  // -- d05: SimHash hamming-near pairs (ORACLE-EXACT) ----------------------
  // Graduated from rows-only in round 4: bit draws are parities of the
  // affine-mod-prime family (see SimHashTokens), so signature
  // construction, 16-bit chunk blocking AND hamming distances replay
  // in DuckDB — the chunk table is just (doc, b//16, Σ bit·2^(b%16)).
  private[queries] val d05: Q = (s, d) => {
    // Native one-pass simhash (64 interpreted folds/row otherwise).
    val sigs = docsSpread(s, d)
      .select(col("doc_id"),
        graft.functions.GraftColumns.simHashTokens(col("text")).as("sig"))
    // 4 chunks of 16 bits: equal-chunk bucketing finds every pair with
    // hamming <= 3 guaranteed (pigeonhole); wider pairs filtered below.
    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), 16 * c).bitwiseAND(lit(0xFFFFL)).as("cv"))
    }
    val chunked = sigs.select(col("doc_id"), col("sig"),
        explode(array(chunkCols: _*)).as("cc"))
      .select(col("doc_id"), col("sig"), col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
      .transform(graft.CacheScope.cached) // both self-join sides read this; simhash is 64 interpreted folds
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        TF.hamming64(col("a.sig"), col("b.sig")).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
      .orderBy("a_id", "b_id")
  }

  /** The shared SimHash replay (toks → token hash → affine-parity
    * bits → 16-bit chunks) — the d05 construction, reused verbatim by
    * e05's oracle (same signatures, same chunk blocking; e05 adds the
    * event-time horizon and per-chunk emission). */
  private[queries] def simHashCtes: String = {
    import graft.functions.expressions.SimHashTokens.{aConst, bConst}
    val aList = (0 until 64).map(aConst).mkString(", ")
    val bList = (0 until 64).map(bConst).mkString(", ")
    s"""toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
       |  FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    list_reduce(list_transform(generate_series(1, length(tok)),
       |        i -> CAST(unicode(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT)),
       |      (acc, c) -> (acc * 131 + c) % 1000000007) AS h
       |  FROM toks),
       |bitdef AS (SELECT unnest(generate_series(0, 63)) AS b,
       |                  unnest([$aList]) AS a,
       |                  unnest([$bList]) AS bb),
       |cnt AS (
       |  SELECT d.doc_id, p.b,
       |    SUM(CASE WHEN t.h IS NULL THEN 0
       |             WHEN ((p.a * t.h + p.bb) % 1000000007) % 2 = 1 THEN 1
       |             ELSE -1 END) AS c
       |  FROM documents d CROSS JOIN bitdef p LEFT JOIN th t ON t.doc_id = d.doc_id
       |  GROUP BY 1, 2),
       |bits AS (SELECT doc_id, b, CASE WHEN c > 0 THEN 1 ELSE 0 END AS bit FROM cnt),
       |chunks AS (
       |  SELECT doc_id, CAST(b // 16 AS INTEGER) AS chunk,
       |    SUM(bit * (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER))) AS cv
       |  FROM bits GROUP BY 1, 2)""".stripMargin
  }

  private[queries] val d05Sql: String =
    s"""WITH $simHashCtes,
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM chunks a JOIN chunks b
       |           ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id),
       |mm AS (SELECT c.a_id, c.b_id,
       |         CAST(SUM(CASE WHEN ba.bit <> bb2.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
       |       FROM cand c
       |       JOIN bits ba ON ba.doc_id = c.a_id
       |       JOIN bits bb2 ON bb2.doc_id = c.b_id AND bb2.b = ba.b
       |       GROUP BY 1, 2)
       |SELECT a_id, b_id, hamming FROM mm WHERE hamming <= 12
       |ORDER BY a_id, b_id""".stripMargin

  // -- d06: embedding-cosine near-dup pairs (blocked self-join) ------------
  // Embed → block → verify, the standard near-dup shape at corpus scale:
  // the blocking key turns the O(n²) all-pairs cosine into an equi-join
  // whose fan-out is bounded per block; exact cosine then verifies each
  // candidate. The `label` key here keeps the query ANSI-expressible
  // (oracle-exact); d07 is the warehouse-scale variant blocking on a
  // coarse-quantizer cluster id, whose count grows with the corpus. The data's minimum |cos − 0.35| margin (5e-5 at sf0.1)
  // dwarfs cross-engine ulp drift, so threshold membership is stable.
  private[queries] val d06: Q = (s, d) =>
    blockedCosinePairs(T.embeddings(s, d), "label", "vec_id", "embedding", 0.35)

  /** The block → self-join → exact-cosine-verify candidate-pair shape
    * shared by d06 (label blocks) and p05 (source blocks). One
    * definition so a threshold/margin/null-guard fix lands in every
    * near-dup family member at once. Emits the unrounded cosine — the
    * hash-exact gate depends on bit-identical doubles, and rounding
    * reintroduces the HALF_UP-vs-scaled-round boundary divergence. */
  private[graft] def blockedCosinePairs(emb: DataFrame, blockCol: String, idCol: String,
                                 vecCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol), col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = emb.select(col(blockCol), col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    // SORT-MERGE, pinned: a duplicate-heavy block (p05b's quantizer
    // cells at 100× hold entire identical-raster classes) makes a
    // shuffled-hash build side exceed task heap — SMJ's per-key
    // buffers spill instead (measured: p05b OOM'd under SHJ at 100×,
    // finishes under SMJ; sub-ms difference at sf0.1)
    a.hint("merge").join(b, Seq(blockCol))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", VF.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col(blockCol), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** [[blockedCosinePairs]] with HOT-CELL SALTING — the skew fallback
    * for duplicate-heavy blocking keys (round-12 verdict #6): a
    * quantizer cell holding an entire identical-content class grows
    * with the corpus, so the per-key join group does too — SMJ keeps
    * it on disk instead of heap, but the buffered side's PER-KEY
    * group is still O(cell), and at 100× that group alone strains
    * the task (the round-12 p05b finding). Cells whose member count
    * exceeds `cap` are salt-split for the pair join:
    *
    *  - the BUFFERED side keeps one row per member, keyed by
    *    (block, salt(id)) with nsalt = ceil(cnt / cap) salts — so a
    *    join key's buffered group is ≤ ~cap rows (cnt/nsalt ≤ cap,
    *    the documented bound, up to hash imbalance);
    *  - the STREAMED side replicates each member across all nsalt
    *    salts (map-side explode — rows, not memory);
    *  - cold cells have nsalt = 1 and degenerate to the unsalted
    *    join exactly.
    *
    * EXACTNESS: every unordered intra-cell pair {p, q} with
    * a_id < b_id appears under exactly ONE join key — (block,
    * salt(b_id)) — because the b side carries each member once at
    * its own salt and the a side meets it at every salt; the a<b
    * filter discards the mirrored (q, p) hit. The salted pair set
    * therefore EQUALS the unsalted one (spec-pinned in
    * MultimodalSpec at sf0.1 with a cap small enough to force real
    * splitting). */
  private[graft] def saltedBlockedCosinePairs(
      emb: DataFrame, blockCol: String, idCol: String,
      vecCol: String, threshold: Double, cap: Long,
      sort: Boolean = true): DataFrame = {
    val cnts = emb.groupBy(col(blockCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("nsalt",
        greatest(lit(1L), ceil(col("cnt").cast(DoubleType) / cap).cast(LongType)))
      .select(col(blockCol), col("nsalt")) // one row per block: broadcast
    val salted = emb.join(broadcast(cnts), Seq(blockCol))
    val a = salted
      .withColumn("t", explode(sequence(lit(0L), col("nsalt") - 1)))
      .select(col(blockCol), col("t"),
        col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = salted
      .withColumn("t", pmod(xxhash64(col(idCol)), col("nsalt")))
      .select(col(blockCol), col("t"),
        col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    val pairs = a.hint("merge").join(b, Seq(blockCol, "t"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", VF.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col(blockCol), col("cosine"))
    // sort=false for callers that dedup multi-probe hits first (d07)
    if (sort) pairs.orderBy(col("a_id"), col("b_id")) else pairs
  }

  private[queries] val d06Sql =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  // -- d07: embedding near-dup, coarse-quantizer blocking ------------------
  // ORACLE-EXACT since round 5: the quantizer is the replayable
  // integer Lloyd fit, so blocking, multi-probe and the exact-cosine
  // verify all re-derive in DuckDB (fit CTEs + the d06-proven
  // list_cosine_similarity bit-equality).
  // The warehouse-scale variant of d06: the blocking key is a KMeans
  // cluster id instead of `label`. With few distinct labels each d06
  // block is O(n²/|labels|); cluster count scales with the corpus
  // (k ≈ √n in practice), keeping per-block fan-out bounded no matter
  // how big the corpus grows. Pairs straddling one cluster boundary
  // are the classic recall loss of single-assignment blocking, so each
  // vector blocks under its TOP-2 nearest centroids (multi-probe):
  // the top-2 pick is a per-row array_sort over the broadcast centroid
  // literals — map-only, ×2 fan-out, no window shuffle. Same verify
  // step (exact cosine); duplicate pair hits from shared clusters
  // dedupe on bare ids. Recall vs the exact d06 output is
  // spec-checked in PipelineScaleSpec.
  //
  // k SCALES WITH THE CORPUS: k ≈ √n (floor 8) makes total candidate
  // pairs k·(n·probes/k)²/2 = n^1.5·probes²/2 — sub-quadratic — where
  // any FIXED k degrades to O(n²/k). Measured on a 10× corpus
  // (20k vectors): fixed k=8 took 100 s; adaptive k brings the same
  // run to seconds. n comes from parquet FOOTER metadata — a
  // driver-side lookup, no scan job — the planning-time read every
  // IVF index build does.
  private[queries] val d07: Q = (s, d) => {
    val probes = 3
    val n = T.embeddingsCount(s, d)
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    // centroids are driver-side (k × dim integer-valued doubles), held
    // inside the native NearestClusters expression — the top-`probes`
    // assignment is one compiled loop per row, no join, no shuffle, no
    // per-row literal re-evaluation (the HOF array_sort formulation
    // was the assignment hot spot once k scales as √n)
    val (_, cents) = kmeansAssign(s, d, k, n)
    val assigned = T.embeddings(s, d)
      .withColumn("cluster", explode(
        graft.functions.GraftColumns.nearestClusters(col("embedding"), cents, probes)))
      .select(col("vec_id"), col("embedding"), col("cluster"))
    // the pair join rides the HOT-CELL SALTING fallback (round-12
    // verdict #6 named d07 alongside p05b): a duplicate-heavy cell's
    // buffered join group stays ≤ ~cap rows, pair set provably
    // unchanged (the helper's exactness note); sort AFTER the
    // multi-probe distinct
    saltedBlockedCosinePairs(assigned, "cluster", "vec_id", "embedding",
      threshold = 0.35, cap = 1024L, sort = false)
      .select(col("a_id"), col("b_id"), col("cosine")) // unrounded: hash-exact gate
      .distinct() // a pair can co-block in several of its shared clusters
      .orderBy(col("a_id"), col("b_id"))
  }

  private[queries] val d07Sql: String =
    s"""WITH ${coarseFitSql(floorK = 8)},
       |${coarseAsgSql(maxRn = 3)},
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                           CAST(b.embedding AS DOUBLE[])) AS cosine
       |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])) >= 0.35)
       |SELECT a_id, b_id, cosine FROM pairs ORDER BY a_id, b_id""".stripMargin

  /** Non-overlapping 8-token segment hashes per doc — the "line"
    * unit of the C4-style sub-document dedup. ONE definition shared
    * by d11 (the report) and t14's line stage (the waterfall), so
    * the two can never disagree about what a segment is. Map-side
    * explode bounded by doc length. */
  private[queries] def segmentHashes(docs: org.apache.spark.sql.DataFrame) = docs
    .withColumn("tk", split(col("text"), " "))
    .withColumn("i", explode(sequence(lit(0), expr("(size(tk) + 7) div 8 - 1"))))
    .select(col("doc_id"),
      md5(array_join(slice(col("tk"), col("i") * 8 + 1, lit(8)), " ")).as("seg_hash"))

  // -- d11: line-level boilerplate dedup (C4-style) ------------------------
  // The C4/RefinedWeb preprocessing step that is NOT document-grain:
  // dedup at the LINE level — any line occurring in more than one
  // document is boilerplate (headers, navigation, license blurbs) and
  // gets dropped corpus-wide. The corpus has no newlines, so "lines"
  // are non-overlapping 8-token segments (same spirit: sub-document
  // content units). Report per doc: segment count, segments shared
  // with ≥1 other doc, shared share — the removal set a C4-style pass
  // would apply.
  //
  // Scale: 3 shuffles, all on uniform hash keys — segment partial-agg
  // on the md5 (the df table), the segs⋈df equi-join co-partitioned
  // on that same hash, one per-doc agg. This IS the documented cost
  // of C4's line dedup; no all-pairs anything. Segmentation is a
  // map-side explode bounded by doc length (t12's class).
  private[queries] val d11: Q = (s, d) => {
    val segs = segmentHashes(docsSpread(s, d))
      .transform(graft.CacheScope.cached) // read by the df build + the probe side
    val df = segs.groupBy(col("seg_hash"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    segs.join(df, "seg_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
      // unrounded single IEEE division of exact ints (q52/q54 policy)
      .withColumn("shared_share",
        col("n_shared").cast(DoubleType) / col("n_segments"))
      .orderBy(col("doc_id"))
  }

  private[queries] val d11Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_slice(tk, i*8+1, i*8+8), ' ')) AS seg_hash
      |  FROM toks, LATERAL unnest(generate_series(0, (len(tk)+7)//8 - 1)) AS g(i)),
      |df AS (SELECT seg_hash, COUNT(DISTINCT doc_id) AS ndocs FROM segs GROUP BY 1),
      |per_doc AS (
      |  SELECT s.doc_id, COUNT(*) AS n_segments,
      |    CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      |  FROM segs s JOIN df USING (seg_hash) GROUP BY 1)
      |SELECT doc_id, n_segments, n_shared,
      |  CAST(n_shared AS DOUBLE) / n_segments AS shared_share
      |FROM per_doc ORDER BY doc_id""".stripMargin

  // -- d12: exact substring dedup (repeated-span cover) --------------------
  // The ExactSubstr pass of "Deduplicating Training Data Makes
  // Language Models Better" (Lee et al. 2022), re-expressed for a
  // shuffle engine: any text span repeated VERBATIM anywhere in the
  // corpus — including elsewhere in the same document — is training
  // waste a trim pass removes. The paper's suffix-array formulation
  // is single-node; the distributed equivalent is a k-token SLIDING
  // gram cover: every repeated substring of ≥ k tokens contains a
  // repeated k-gram, and every flagged token sits inside a k-gram
  // occurring ≥ 2 times, so the cover detects exactly the ≥k-token
  // repeated spans at k-gram granularity. Per doc: contiguous
  // repeated runs (interval union via the gaps-and-islands window),
  // covered token count, repeated fraction.
  //
  // Scale: gram extraction is a map-side explode (n_tokens rows/doc,
  // k× d11's segment rows — same class); 3 shuffles, all on uniform
  // hash keys — gram partial-agg (the occurrence table), the
  // grams⋈occ equi-join co-partitioned on the gram hash, one doc
  // window+agg. A boilerplate gram with huge df joins against ONE
  // count row — nothing pairwise anywhere. This is what the suffix
  // array becomes when the corpus doesn't fit one machine.
  private[queries] val SubstrK = 8

  /** Sliding SubstrK-token gram positions per doc — ONE definition
    * shared by d12 (repeated-span cover) and t16 (novelty), so the
    * two can never disagree about what a gram is. The hashes come
    * from the native [[graft.functions.expressions.TokenGramHashes]]
    * pass (prefix-hash rolling, O(1)/gram, double-polynomial — the
    * md5-of-rebuilt-gram-string formulation it replaced re-hashed
    * O(k·|token|) chars per position); posexplode supplies the token
    * position. Map-side, n_tokens rows/doc. */
  private[queries] def slidingGramHashes(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      posexplode(graft.functions.GraftColumns.tokenGramHashes(col("text"), SubstrK)))
    .select(col("doc_id"), col("pos").cast(LongType).as("p"),
      col("col").as("gram_hash"))

  private[queries] def tokenizedDocs(s: SparkSession, d: String): DataFrame =
    docsSpread(s, d)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("total_tokens", size(col("tk")).cast(LongType))

  private[queries] val d12: Q = (s, d) => {
    val docs = tokenizedDocs(s, d)
    val grams = slidingGramHashes(docs)
      .transform(graft.CacheScope.cached) // read by the occ build + the probe side
    val occ = grams.groupBy(col("gram_hash")).agg(count(lit(1)).as("occ"))
    val rep = grams.join(occ, "gram_hash").filter(col("occ") >= 2)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val runs = rep
      .withColumn("prev_end", max(col("p") + (SubstrK - 1)).over(wPrev))
      .withColumn("new_run", when(
        col("prev_end").isNull || col("p") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("run_id", sum(col("new_run")).over(wRun))
      .groupBy(col("doc_id"), col("run_id"))
      // runs are contiguous by construction (a gram joins its run only
      // when it overlaps or abuts the running max end), so the union
      // of a run's intervals is the single range [min p, max p + k-1]
      .agg((max(col("p")) + (SubstrK - 1) - min(col("p")) + 1).as("covered"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("covered")).as("repeated_tokens"))
    docs.select(col("doc_id"), col("total_tokens"))
      .join(runs, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "repeated_tokens"))
      // unrounded single IEEE division of exact ints (q52/q54 policy)
      .withColumn("repeated_frac",
        col("repeated_tokens").cast(DoubleType) / col("total_tokens"))
      .orderBy(col("doc_id"))
  }

  private[queries] val d12Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |docs AS (
      |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS total_tokens, tk FROM toks),
      |gs AS (
      |  SELECT doc_id, i, array_to_string(list_slice(tk, i + 1, i + 8), ' ') AS g
      |  FROM docs, LATERAL unnest(generate_series(0, total_tokens - 8)) AS u(i)),
      |grams AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS p,
      |    list_reduce(list_transform(generate_series(1, length(g)),
      |        j -> CAST(unicode(substr(g, CAST(j AS INTEGER), 1)) AS BIGINT)),
      |      (acc, c) -> (acc * 131 + c) % 1000000007) * 1000000007 +
      |    list_reduce(list_transform(generate_series(1, length(g)),
      |        j -> CAST(unicode(substr(g, CAST(j AS INTEGER), 1)) AS BIGINT)),
      |      (acc, c) -> (acc * 137 + c) % 1000000007) AS gram_hash
      |  FROM gs),
      |occ AS (SELECT gram_hash, COUNT(*) AS occ FROM grams GROUP BY 1),
      |rep AS (SELECT doc_id, p FROM grams JOIN occ USING (gram_hash) WHERE occ >= 2),
      |marked AS (
      |  SELECT doc_id, p,
      |    max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM rep),
      |islands AS (
      |  SELECT doc_id, p,
      |    SUM(CASE WHEN prev_end IS NULL OR p > prev_end + 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY p) AS run_id
      |  FROM marked),
      |runs AS (
      |  SELECT doc_id, run_id, MAX(p) + 7 - MIN(p) + 1 AS covered
      |  FROM islands GROUP BY 1, 2),
      |per_doc AS (
      |  SELECT doc_id, COUNT(*) AS n_spans,
      |    CAST(SUM(covered) AS BIGINT) AS repeated_tokens
      |  FROM runs GROUP BY 1)
      |SELECT d.doc_id, d.total_tokens,
      |  COALESCE(n_spans, 0) AS n_spans,
      |  COALESCE(repeated_tokens, 0) AS repeated_tokens,
      |  CAST(COALESCE(repeated_tokens, 0) AS DOUBLE) / d.total_tokens AS repeated_frac
      |FROM docs d LEFT JOIN per_doc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // -- d13: quality-aware cluster keeper selection -------------------------
  // d10 answers "which docs are the same"; d13 answers the curation
  // question that follows: WHICH COPY TO KEEP. Min-id keepers (d10's
  // convention) are arbitrary — a real pass keeps the best-quality
  // member of each duplicate cluster. Components over d03's document
  // near-dup pairs (the same Operators.connectedComponents), then
  // keeper = argmax t02 quality (tie → min doc_id; quality doubles
  // are the t02-proven bit-identical expressions, so the argmax
  // replays). Emits every clustered doc with its cluster, quality,
  // and keep/drop verdict — the apply-side of the dedup ladder.
  //
  // Scale: components as d10 (vertex set = docs in pairs ≪ corpus);
  // the quality join touches clustered docs only (semi-join-sized);
  // the keeper window partitions by cluster — fan-in bounded by
  // cluster size, never corpus-wide.
  private[queries] val d13: Q = (s, d) =>
    qualityKeeper(d03(s, d).select(col("a_id"), col("b_id")), T.documents(s, d))

  /** The keeper rule shared by d13/d14: connected components over a
    * near-dup pair graph (ANY pair source — d03's full Jaccard graph,
    * d04's LSH-banded candidates), keeper = argmax t02 quality per
    * component (tie: lowest doc_id). The pair GRAPH is the cost knob;
    * the keeper arithmetic never changes. */
  private[graft] def qualityKeeper(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val comps = Operators.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val (_, _, _, quality) = qualityParts
    val scored = docs.select(col("doc_id"), quality.as("quality"))
    val wKeep = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    comps.join(scored, "doc_id")
      .withColumn("is_keeper", row_number().over(wKeep) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("is_keeper"))
      .orderBy(col("doc_id"))
  }

  // -- d14: quality keeper over the BANDED candidate graph -----------------
  // The round-7 verdict's watch item: d13 is input-bound on d03's
  // full n-gram Jaccard pair graph (501 s at 100×, pairs grow with
  // every mutually-near-dup decade). d14 is the same keeper rule fed
  // from d04's MinHash-banded candidates at est_jaccard ≥ 0.5 — the
  // pair graph LSH banding bounds sublinearly (a pair must agree on
  // all 4 rows of one band to surface at all), which is how a 100-TB
  // dedup actually runs: banding prunes the graph, the keeper applies
  // the policy. Same components operator, same quality argmax; only
  // the edge source changes.
  private[queries] val d14: Q = (s, d) =>
    qualityKeeper(
      d04(s, d).filter(col("est_jaccard") >= 0.5).select(col("a_id"), col("b_id")),
      T.documents(s, d))

  /** d13/d14's keeper oracle over any (a_id, b_id) pair SQL: the
    * recursive-reach components + quality argmax replay, shared so
    * both pair sources certify against ONE keeper semantics. */
  private[queries] def keeperSqlOver(dpairsSql: String) =
    s"""WITH RECURSIVE dpairs AS ($dpairsSql),
       |e AS (SELECT a_id AS src, b_id AS dst FROM dpairs
       |      UNION ALL SELECT b_id, a_id FROM dpairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       |comp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |         FROM reach GROUP BY src),
       |q AS (
       |  SELECT doc_id,
       |    0.5 * least(1.0, len(string_split_regex(trim(text), '\\s+')) / 100.0)
       |      + 0.3 * (1.0 - CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |          x -> x IN (${stopwords.map("'" + _ + "'").mkString(", ")}))) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')))
       |      - 0.2 * CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
       |        / length(text) AS quality
       |  FROM documents)
       |SELECT c.doc_id, c.cluster_id, q.quality,
       |  row_number() OVER (PARTITION BY c.cluster_id
       |    ORDER BY q.quality DESC, c.doc_id) = 1 AS is_keeper
       |FROM comp c JOIN q ON c.doc_id = q.doc_id
       |ORDER BY c.doc_id""".stripMargin

  private[queries] val d13Sql = keeperSqlOver(d03Sql)

  private[queries] val d14Sql = keeperSqlOver(
    s"SELECT a_id, b_id FROM ($d04Sql) WHERE est_jaccard >= 0.5")

  // -- d15: semantic dedup (SemDeDup) --------------------------------------
  // Abbas et al. 2023 (SemDeDup — public arXiv 2303.09540): content
  // dedup (d01–d12) can't see PARAPHRASES — same meaning, different
  // bytes — so dedupe in EMBEDDING space instead: k-means the
  // vectors, call within-cluster pairs above a cosine threshold
  // semantic duplicates, keep ONE per semantic group. The paper's
  // keeper is the example with the LOWEST cosine to its cluster
  // centroid (keep the outlier, drop the prototypical copies —
  // maximizes retained diversity, the opposite policy of d13/d14's
  // quality argmax and the reason this is its own operator, not a
  // keeperSqlOver reskin). d07's machinery re-scoped: the same
  // replayable IntLloyd coarse fit (k ≈ √n, absolute-capped sample),
  // SINGLE-assignment blocking (the paper dedupes strictly within
  // cells), components over the within-cell pair graph (the shared
  // connectedComponents operator), keeper = argmin centroid-cosine
  // (tie → min vec_id).
  //
  // Scale: fit sample-capped; assignment is the compiled
  // NearestClusters probe (map-only); the pair join is bounded per
  // cell (k ≈ √n keeps cells O(√n) — the d07 sub-quadratic argument);
  // centroid cosine rides a broadcast join against the k-row centroid
  // frame; components cost O(diameter) rounds over CLUSTERED vectors
  // only, and the keeper window fan-in is bounded by semantic-group
  // size. Nothing corpus-pairwise anywhere.
  private[queries] val d15: Q = (s, d) => {
    val n = T.embeddingsCount(s, d)
    val k = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val (assigned0, cents) = kmeansAssign(s, d, k, n)
    val assigned = assigned0.transform(graft.CacheScope.cached) // pair join + centroid probe
    val a = assigned.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("a_vec"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("b_vec"))
    // single assignment ⇒ a pair co-blocks in exactly one cell: no
    // d07-style distinct needed
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .filter(VF.cosine(col("a_vec"), col("b_vec")) >= 0.35)
      .select(col("a_id"), col("b_id"))
    val comps = Operators.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("vec_id"), col("comp").as("sem_cluster"))
    import s.implicits._
    val centFrame = cents.toSeq.zipWithIndex
      .map { case (cv, i) => (i, cv) }.toDF("cluster", "cv")
    val scored = assigned.join(broadcast(centFrame), "cluster")
      .withColumn("cent_cos", VF.cosine(col("embedding"), col("cv")))
      .select(col("vec_id"), col("cluster").cast(IntegerType).as("cluster"),
        col("cent_cos"))
    val wKeep = Window.partitionBy(col("sem_cluster"))
      .orderBy(col("cent_cos").asc, col("vec_id"))
    comps.join(scored, "vec_id")
      .withColumn("is_keeper", row_number().over(wKeep) === 1)
      .select(col("vec_id"), col("cluster"), col("sem_cluster"),
        col("cent_cos"), col("is_keeper"))
      .orderBy(col("vec_id"))
  }

  // The fit/assignment replay is d07's (IntLloyd CTEs + the shared
  // single-probe asg ranking); centroid cosine re-derives against the
  // SAME kmcent frame the assignment ranked, so keeper order replays
  // bit-exactly (list_cosine_similarity ≡ the native expression).
  private[queries] val d15Sql: String =
    s"""WITH RECURSIVE ${coarseFitSql(floorK = 8)},
       |${coarseAsgSql(maxRn = 1)},
       |p AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])) >= 0.35),
       |e AS (SELECT a_id AS src, b_id AS dst FROM p
       |      UNION ALL SELECT b_id, a_id FROM p),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       |comp AS (SELECT src AS vec_id, least(src, MIN(dst)) AS sem_cluster
       |         FROM reach GROUP BY src),
       |cent AS (
       |  SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
       |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), k.cv) AS cent_cos
       |  FROM asg a JOIN kmcent k ON a.cluster = k.cluster)
       |SELECT c.vec_id, ct.cluster, c.sem_cluster, ct.cent_cos,
       |  row_number() OVER (PARTITION BY c.sem_cluster
       |    ORDER BY ct.cent_cos ASC, c.vec_id) = 1 AS is_keeper
       |FROM comp c JOIN cent ct ON c.vec_id = ct.vec_id
       |ORDER BY c.vec_id""".stripMargin

  // -- p08: dataset release diff (governance card) -------------------------
  // The release-notes artifact a corpus publisher ships alongside
  // p06's datasheet: what changed between release A (yesterday's
  // curation policy) and release B (today's)? Releases here are two
  // -- d16: semantic decontamination (embedding space) ---------------------
  // d09's decontamination in EMBEDDING space — the check n-gram
  // overlap can't do: a paraphrased benchmark item shares no
  // 16-gram shingles but sits right next to the original in
  // embedding space (the SemDeDup observation applied to
  // decontamination, which is how modern pipelines actually audit
  // eval leakage). Corpus vectors whose cosine to ANY held-out
  // benchmark vector reaches τ are flagged with their best-match
  // benchmark id (deterministic tie-break) — the removal list plus
  // the evidence a release review needs.
  //
  // Scale: d09's asymmetry exactly — the benchmark set is tiny
  // (~1e5 items vs a 1e10 corpus), so it BROADCASTS and the corpus
  // pass is map-only; the only shuffle ranks the flagged matches
  // (bounded by contamination volume, not the corpus). At whale
  // scale the corpus side would probe through s03's inverted lists
  // (the d07-for-d06 story); the brute pass is the certified
  // baseline.
  private[queries] val d16: Q = (s, d) => {
    val tau = 0.4
    val emb = T.embeddings(s, d)
    // Measurement-only knob, gated on the BENCH code path (only
    // Bench.main ever sets BenchKnobs.d16BenchCap, from its own env):
    // the synthetic fixture grows the benchmark side with the corpus
    // (every 13th vector), which at 100× measures a fixture artifact
    // — a REAL eval suite is fixed-size. Capping bench_id < N holds
    // the benchmark side at the base-corpus size so the §4 scaling
    // row prices the broadcast asymmetry the operator is designed
    // around; the excluded copies' pseudo-benchmark vectors stay in
    // the corpus. Correctness runs cannot be affected: Verify and the
    // specs never write the knob, whatever the environment contains.
    val isBench = graft.BenchKnobs.d16BenchCap match {
      case Some(cap) => col("vec_id") % 13 === 7 && col("vec_id") < cap
      case None      => col("vec_id") % 13 === 7
    }
    val bench = emb.filter(isBench)
      .select(col("vec_id").as("bench_id"), col("embedding").as("b_vec"))
    val corpus = emb.filter(!isBench).select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("bench_id"))
    corpus.crossJoin(broadcast(bench))
      .withColumn("cosine", VF.cosine(col("embedding"), col("b_vec")))
      .filter(col("cosine") >= tau)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), col("cosine"))
      .orderBy(col("vec_id"))
  }

  // -- d17: d16 through the inverted-list bound (the whale path) -----------
  // d16's documentation NARRATES its 100-TB form ("the corpus side
  // probes s03's inverted lists"); d17 REGISTERS it, with the
  // strongest possible certificate: it shares d16's oracle verbatim,
  // so hash equality proves the pruned plan computes IDENTICAL
  // semantics — the s07 spherical-triangle admission is a proof, not
  // a heuristic, with the query/member roles swapped. The index is
  // built over the BENCHMARK side (the small side — k stays tiny and
  // every index frame broadcasts); each corpus vector then does
  // map-side admission against the k-row cell frame (cosine to k
  // centroids instead of |bench| members — the pruning win), and
  // only admitted (corpus, cell) pairs score the cell's members.
  //
  // Scale: corpus passes are map-only against broadcast k-row /
  // bench-sized frames (d16's asymmetry preserved); the only shuffle
  // ranks flagged matches, bounded by contamination volume. On a
  // clustered real corpus admission prunes most cells; on the
  // near-orthogonal fixture it admits honestly (s07's caveat).
  /** d17's core over arbitrary frames, exposed so the spec can drive
    * it on a clustered corpus (where the pruning actually bites) and
    * count admitted pairs. Returns (admitted corpus×cell pairs, the
    * final flagged frame). */
  /** The d17 build's cell count for a benchmark of `nBench` rows —
    * shared with D17Probe so the §4 row's "full grid" denominator is
    * the BUILD's k, not the (smaller) set of cells the admission
    * happens to populate. */
  private[graft] def decontamIvfCellCount(nBench: Long): Int =
    math.max(16, math.ceil(math.sqrt(nBench.toDouble)).toInt)

  private[graft] def decontamIvf(s: SparkSession, bench: DataFrame,
                                 corpus: DataFrame, tau: Double): (DataFrame, DataFrame) = {
    val nBench = bench.count() // build-time metadata (the build scans anyway)
    val k = decontamIvfCellCount(nBench)
    val (assignedB, cents) = kmeansAssignDf(bench, k, nBench)
    import s.implicits._
    val cells = cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cluster", "cv")
    val members = assignedB
      .select(col("vec_id").as("bench_id"), col("embedding").as("b_vec"),
        col("cluster"))
    val cellMeta = members.join(broadcast(cells), "cluster")
      .groupBy(col("cluster"))
      .agg(min(VF.cosine(col("b_vec"), col("cv"))).as("bmin"))
      .join(broadcast(cells), "cluster")
      .select(col("cluster"), col("cv"), col("bmin"))
    // map-side admission: corpus × k cells, cells broadcast (the
    // reverse orientation of rangeIvfAdmit — here the CORPUS is the
    // query side and must never be broadcast or shuffled)
    val a = col("a"); val bmin = col("bmin")
    val bound = a * bmin +
      sqrt(greatest(lit(0d), lit(1d) - a * a) *
           greatest(lit(0d), lit(1d) - bmin * bmin))
    val admitted = corpus
      .crossJoin(broadcast(cellMeta))
      .withColumn("a", VF.cosine(col("embedding"), col("cv")))
      .filter(a >= bmin || bound >= tau)
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("bench_id"))
    val flagged = admitted.join(broadcast(members), "cluster")
      .withColumn("cosine", VF.cosine(col("embedding"), col("b_vec")))
      .filter(col("cosine") >= tau)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), col("cosine"))
      .orderBy(col("vec_id"))
    (admitted, flagged)
  }

  private[queries] val d17: Q = (s, d) => {
    val tau = 0.4
    val emb = T.embeddings(s, d)
    val isBench = col("vec_id") % 13 === 7
    decontamIvf(s,
      emb.filter(isBench).select(col("vec_id"), col("embedding")),
      emb.filter(!isBench).select(col("vec_id"), col("embedding")), tau)._2
  }

  private[queries] val d16Sql =
    """WITH b AS (
      |  SELECT vec_id AS bench_id, embedding AS b_vec
      |  FROM embeddings WHERE vec_id % 13 = 7),
      |c AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE NOT (vec_id % 13 = 7)),
      |m AS (
      |  SELECT c.vec_id, b.bench_id,
      |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                           CAST(b.b_vec AS DOUBLE[])) AS cosine
      |  FROM c, b
      |  WHERE list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                               CAST(b.b_vec AS DOUBLE[])) >= 0.4),
      |r AS (
      |  SELECT vec_id, bench_id, cosine,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cosine DESC, bench_id) AS rn
      |  FROM m)
      |SELECT vec_id, bench_id, cosine FROM r WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

}
