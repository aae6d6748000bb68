package graft

/** Scale-shape assertions for the LLM-pipeline operators: the
  * properties the round-1 verdict flagged as `weak` are pinned here —
  * d07's quantizer blocking recalls most of d06's exact pairs, s02's
  * candidate dedup moves ids (not embedding arrays) through its
  * exchange, and the sampled KMeans fit stays deterministic.
  */
class PipelineScaleSpec extends SparkSpec {

  test("d07 quantizer blocking recovers most of d06's exact near-dup pairs") {
    val exact = SparkEntry.queries("d06_dedup_embedding")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = SparkEntry.queries("d07_dedup_embedding_ivf")(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "d06 found no pairs at sf0.001 — recall undefined")
    val recall = blocked.intersect(exact).size.toDouble / exact.size
    info(s"d07 recall vs d06: $recall (${blocked.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.5,
      s"cluster-blocked near-dup recall too low: $recall — quantizer not separating")
    // every reported pair is a true near-dup (precision of the verify step)
    val verified = SparkEntry.queries("d07_dedup_embedding_ivf")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("cosine") < 0.35).count()
    assert(verified == 0)
  }

  test("t19 intra-doc dedup removes repeated segments and reassembles in order") {
    import spark.implicits._
    // 8-token segments A B A with a 3-token tail; A repeats → dropped
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$segA $segB $segA tail one two"), // repeat of A dropped, tail kept
      (2L, s"$segA $segA $segA"),              // two copies dropped
      (3L, "short doc"),                       // no full segment: text unchanged
      (4L, segB))                              // single segment: unchanged
      .toDF("doc_id", "text")
    val out = graft.queries.Pipeline.intraDocDedup(docs).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(3) == 2 && byId(1L).getLong(4) == 1)
    assert(byId(1L).getString(5) == s"$segA $segB tail one two",
      "first occurrences survive in original order, tail rides along")
    assert(byId(2L).getLong(4) == 2 && byId(2L).getString(5) == segA)
    assert(byId(3L).getLong(2) == 0 && byId(3L).getString(5) == "short doc")
    assert(byId(4L).getLong(4) == 0 && byId(4L).getString(5) == segB)
    // the transform is token-conserving minus exactly the dropped segments
    out.foreach { r =>
      val cleanToks = r.getString(5).split(" ").count(_.nonEmpty)
      assert(cleanToks == r.getLong(1) - 8 * r.getLong(4), s"token accounting: $r")
    }
  }

  test("s07 IVF-probed range search equals exact s06 row-for-row (the bound is a proof)") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { d =>
      def rows(name: String) = SparkEntry.queries(name)(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = rows("s06_ann_range_search")
      val probed = rows("s07_ann_range_ivf")
      assert(exact.nonEmpty, s"s06 empty at $d — identity check vacuous")
      // identical rows INCLUDING the cosine values — recall 1.0 by
      // construction, never a sampled estimate
      assert(probed == exact,
        s"s07 must equal s06 at $d: missing=${exact.diff(probed).take(3)} " +
          s"extra=${probed.diff(exact).take(3)}")
    }
  }

  test("s07 admission prunes most cells on a clustered corpus, still exactly") {
    import org.apache.spark.sql.functions.col
    // 10 tight clusters of 64-dim vectors (unit direction + small
    // deterministic jitter): the geometry real embedding corpora
    // have, where the per-cell radius is small and the triangle
    // bound rejects far cells. vec_id 0-9 are one query per cluster.
    val rnd = new scala.util.Random(41)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Array[Float] =
      base(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val vecs = (0 until 10).map(c => (c.toLong, member(c))) ++
      (0 until 190).map(i => ((10 + i).toLong, member(i % 10)))
    val emb = spark.createDataFrame(vecs).toDF("vec_id", "embedding")
    val tau = 0.6
    val probed = graft.queries.Pipeline.rangeIvf(spark, emb, vecs.size.toLong, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force range search on the same frame = ground truth
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding"))
      .crossJoin(qs)
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine(col("q_vec"), col("embedding")))
      .filter(col("cosine") >= tau)
      .select(col("q_id"), col("cand_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size >= 100, s"clustered corpus must have in-radius pairs, got ${exact.size}")
    assert(probed == exact, "cell pruning dropped a qualifying pair — bound unsound")
    val (cands, admitted) = graft.queries.Pipeline.rangeIvfParts(
      spark, emb, vecs.size.toLong, tau)
    val populated = cands.select("cluster").distinct().count()
    val probePairs = admitted.count()
    info(s"s07 clustered: $probePairs probe pairs of ${10 * populated} (query × cell) grid")
    assert(probePairs * 2 <= 10 * populated,
      s"admission should prune at least half the grid on tight clusters: " +
        s"$probePairs of ${10 * populated}")
  }

  test("d17 admission prunes most cells on a clustered benchmark, flags exactly d16's rows") {
    import org.apache.spark.sql.functions.col
    // s07's geometry with the roles of d17: the BENCHMARK occupies 5
    // tight clusters; the corpus spreads over those 5 plus 5 more the
    // benchmark never visits — a corpus vector far from every
    // benchmark cluster should be rejected at the CELL level, never
    // scored against members.
    val rnd = new scala.util.Random(47)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Array[Float] =
      base(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val bench = (0 until 100).map(i => (1000L + i, member(i % 5)))
    val corpus = (0 until 200).map(i => (i.toLong, member(i % 10)))
    val benchDf = spark.createDataFrame(bench).toDF("vec_id", "embedding")
    val corpusDf = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
    val tau = 0.6
    val (admitted, flagged) = graft.queries.Pipeline.decontamIvf(
      spark, benchDf, corpusDf, tau)
    val got = flagged.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: d16's brute-force best-match-over-threshold
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("bench_id"))
    val exact = corpusDf.crossJoin(
        benchDf.select(col("vec_id").as("bench_id"), col("embedding").as("b_vec")))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("b_vec")))
      .filter(col("cosine") >= tau)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size >= 90, s"clustered fixture must flag most co-located corpus vecs, got ${exact.size}")
    assert(got == exact, "cell pruning changed the decontamination answer — bound unsound")
    // the pruning claim: corpus rows co-located with a benchmark
    // cluster admit few cells; rows in benchmark-free clusters admit
    // (ideally) none — at least half the corpus × cell grid must go
    val k = admitted.select("cluster").distinct().count()
    val pairs = admitted.count()
    info(s"d17 clustered: $pairs admitted of ${200 * k} (corpus × populated-cell) grid")
    assert(pairs * 2 <= 200 * k,
      s"admission should prune at least half the grid on tight clusters: $pairs of ${200 * k}")
  }

  test("d12 substring dedup flags exactly the repeated-span cover on a handcrafted corpus") {
    import org.apache.spark.sql.functions.col
    // doc 1 and doc 2 share the 8-token run w1..w8 (cross-doc repeat);
    // doc 3 contains q1..q8 twice (SAME-doc repeat, split by a gap);
    // doc 4 is all-unique. Token counts: 11 / 10 / 18 / 9.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 a1 a2 a3"),
      (2L, "b1 b2 w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 gap1 gap2 q1 q2 q3 q4 q5 q6 q7 q8"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d12").toString
    df.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d12_dedup_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    // (doc, total, n_spans, repeated_tokens): docs 1/2 each cover the
    // shared 8-gram once; doc 3's two copies are two separate runs
    // (the gap breaks contiguity); doc 4 clean.
    assert(out == List((1L, 11L, 1L, 8L), (2L, 10L, 1L, 8L),
      (3L, 18L, 2L, 16L), (4L, 9L, 0L, 0L)))
  }

  test("d12 merges overlapping repeated grams into one maximal span") {
    import org.apache.spark.sql.functions.col
    // docs share a 10-token run: 3 overlapping repeated 8-grams per
    // doc must merge into ONE span covering all 10 tokens.
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 x1 x2"),
      (2L, "y1 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"))
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d12b").toString
    df.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d12_dedup_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    assert(out == List((1L, 1L, 10L), (2L, 1L, 10L)))
  }

  test("t16 novelty: first doc scores 1.0, an exact duplicate scores 0, a mix in between") {
    import org.apache.spark.sql.functions.col
    val eight = "n1 n2 n3 n4 n5 n6 n7 n8"
    val docs = Seq(
      (1L, s"$eight a1 a2 a3"),            // first arrival: all novel
      (2L, s"$eight a1 a2 a3"),            // exact dup of 1: zero novel
      (3L, s"$eight b1 b2 b3 b4 b5 b6 b7")) // shares a prefix, adds new tail
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("t16").toString
    df.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t16_ngram_novelty")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) == 1.0, s"first arrival must be fully novel: ${out(1L)}")
    assert(out(2L) == 0.0, s"exact duplicate must add nothing: ${out(2L)}")
    assert(out(3L) > 0.0 && out(3L) < 1.0, s"partial overlap in between: ${out(3L)}")
  }

  test("p09 shard manifest conserves tokens and fills every non-final bin exactly") {
    import org.apache.spark.sql.functions._
    val manifest = SparkEntry.queries("p09_shard_manifest")(spark, sfDir)
      .transform(graft.CacheScope.cached)
    val packed = SparkEntry.queries("m04_multimodal_packing")(spark, sfDir)
    // conservation: every packed token lands in exactly one bin
    val perSourceBins = manifest.groupBy(col("source"))
      .agg(sum(col("tokens_in_bin")).as("t"), max(col("bin")).as("last_bin"))
    val perSourceCost = packed.groupBy(col("source")).agg(sum(col("cost")).as("c"))
    val joined = perSourceBins.join(perSourceCost, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getAs[Long]("t") == r.getAs[Long]("c"),
      s"source ${r.getString(0)}: binned ${r.getAs[Long]("t")} != packed ${r.getAs[Long]("c")}"))
    // every bin except each source's last is exactly full
    val notFull = manifest.join(
        perSourceBins.select(col("source"), col("last_bin")), "source")
      .filter(col("bin") < col("last_bin") && col("fill_ratio") =!= 1.0)
      .count()
    assert(notFull == 0, s"$notFull interior bins not exactly full")
    graft.CacheScope.drain()
  }

  test("s07 persisted index round-trips: probe on the loaded index equals exact s06") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("rangeivf").toString
    val emb = graft.Tables.embeddings(spark, sfDir)
    graft.operators.RangeIvfIndex.write(
      spark, emb, graft.Tables.embeddingsCount(spark, sfDir), dir)
    // the cells frame IS the metadata contract: one bmin per cell
    val (assigned, cells) = graft.operators.RangeIvfIndex.read(spark, dir)
    assert(cells.columns.toSet == Set("cluster", "cv", "bmin"))
    assert(cells.count() == assigned.select("cluster").distinct().count())
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probed = graft.operators.RangeIvfIndex.probe(spark, dir, qs, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = SparkEntry.queries("s06_ann_range_search")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(probed == exact,
      s"loaded-index probe must equal brute force: missing=${exact.diff(probed).take(3)} " +
        s"extra=${probed.diff(exact).take(3)}")
    // the same persisted index serves top-k: equals s01 row-for-row
    val topk = graft.operators.RangeIvfIndex.topk(spark, dir, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val s01 = SparkEntry.queries("s01_ann_bruteforce")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(topk == s01,
      s"loaded-index topk must equal s01: missing=${s01.diff(topk).take(3)} " +
        s"extra=${topk.diff(s01).take(3)}")
    graft.CacheScope.drain()
  }

  test("s08 IVF-probed top-k equals exact s01 row-for-row (seed-then-prove)") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { d =>
      def rows(name: String) = SparkEntry.queries(name)(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val exact = rows("s01_ann_bruteforce")
      val probed = rows("s08_ann_topk_ivf")
      assert(exact.nonEmpty, s"s01 empty at $d — identity check vacuous")
      assert(probed == exact,
        s"s08 must equal s01 at $d: missing=${exact.diff(probed).take(3)} " +
          s"extra=${probed.diff(exact).take(3)}")
    }
  }

  test("s08 admission prunes most cells on a clustered corpus, still exactly top-k") {
    import org.apache.spark.sql.functions.col
    // same 10-tight-cluster geometry as the s07 prune spec
    val rnd = new scala.util.Random(43)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Array[Float] =
      base(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val vecs = (0 until 10).map(c => (c.toLong, member(c))) ++
      (0 until 190).map(i => ((10 + i).toLong, member(i % 10)))
    val emb = spark.createDataFrame(vecs).toDF("vec_id", "embedding")
    val k = 5
    val probed = graft.queries.Pipeline.topkIvf(spark, emb, vecs.size.toLong, k, seedCells = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val exact = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding"))
      .crossJoin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("q_vec"), col("embedding")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("cand_id"),
        org.apache.spark.sql.functions.round(col("cos"), 4).as("cosine"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(probed == exact, "pruned top-k diverged from brute force — bound unsound")
  }

  test("s09 MIPS equals brute-force inner-product top-k row-for-row") {
    import org.apache.spark.sql.functions._
    Seq(sfDir, "/root/testdata/sf0.01").foreach { d =>
      val probed = SparkEntry.queries("s09_ann_mips")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val emb = graft.Tables.embeddings(spark, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("dot").desc, col("cand_id"))
      val exact = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding"))
        .crossJoin(broadcast(emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))))
        .withColumn("dot",
          graft.functions.VectorFunctions.dot(col("q_vec"), col("embedding")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_id"), col("cand_id"), round(col("dot"), 4).as("dot"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(exact.nonEmpty)
      assert(probed == exact,
        s"s09 must equal brute-force MIPS at $d: missing=${exact.diff(probed).take(3)} " +
          s"extra=${probed.diff(exact).take(3)}")
      graft.CacheScope.drain()
    }
  }

  test("s10 filtered ANN equals brute-force-within-filter row-for-row") {
    import org.apache.spark.sql.functions._
    Seq(sfDir, "/root/testdata/sf0.01").foreach { d =>
      val probed = SparkEntry.queries("s10_ann_filtered")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val emb = Tables.embeddings(spark, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
      val exact = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding"), col("label"))
        .join(broadcast(emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label"))), "label")
        .withColumn("cos",
          graft.functions.VectorFunctions.cosine(col("q_vec"), col("embedding")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_id"), col("cand_id"), round(col("cos"), 4).as("cosine"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(exact.nonEmpty)
      assert(probed == exact,
        s"s10 must equal filtered brute force at $d: missing=${exact.diff(probed).take(3)} " +
          s"extra=${probed.diff(exact).take(3)}")
      graft.CacheScope.drain()
    }
  }

  test("s04 PQ top-5 recalls a usable share of s01's exact top-5") {
    def top(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top("s01_ann_bruteforce")
    val pq = top("s04_ann_pq")
    assert(exact.nonEmpty)
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(s"s04 recall vs s01: $recall (${pq.intersect(exact).size}/${exact.size})")
    // recall@5 here = "is the true top-5 inside the PQ top-20
    // shortlist" (the re-rank stage scores the shortlist exactly, so
    // shortlist membership is the only loss). Gate well below the
    // observed value: 8 one-byte codes over 64 dims is still lossy
    // and the gate exists to catch degenerate codebooks, not to pin
    // the exact recall.
    assert(recall >= 0.5, s"PQ shortlist recall degenerate: $recall")
  }

  test("s05 IVF-PQ top-5 recalls a usable share of s01's exact top-5") {
    def top(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top("s01_ann_bruteforce")
    val ivfpq = top("s05_ann_ivfpq")
    assert(exact.nonEmpty)
    val recall = ivfpq.intersect(exact).size.toDouble / exact.size
    info(s"s05 recall vs s01: $recall (${ivfpq.intersect(exact).size}/${exact.size})")
    // Two stacked approximations (probe restriction × PQ shortlist),
    // each individually gated at 0.5 — the composition is gated lower:
    // the spec catches degenerate quantizers/codebooks, not the exact
    // recall number.
    assert(recall >= 0.4, s"IVF-PQ recall degenerate: $recall")
  }

  test("s19 residual IVF-PQ recalls a usable share of s01's exact top-5") {
    def top(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top("s01_ann_bruteforce")
    val res = top("s19_ann_ivfpq_residual")
    assert(exact.nonEmpty)
    val recall = res.intersect(exact).size.toDouble / exact.size
    val s05r = top("s05_ann_ivfpq").intersect(exact).size.toDouble / exact.size
    info(s"s19 recall vs s01: $recall (s05 spherical: $s05r)")
    // same composition gate as s05 (probe restriction × shortlist);
    // residual coding is the better-reconstruction variant, but the
    // gate only catches degenerate fits — the s11 grid publishes the
    // actual comparison
    assert(recall >= 0.4, s"residual IVF-PQ recall degenerate: $recall")
  }

  test("s02 candidate dedup exchanges bare ids, never embedding arrays") {
    val df = SparkEntry.queries("s02_ann_lsh")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val distinctAggs = plan.linesIterator
      .filter(_.contains("HashAggregate(keys=")).toSeq
    assert(distinctAggs.nonEmpty, s"expected a distinct HashAggregate in:\n$plan")
    distinctAggs.foreach { l =>
      assert(!l.contains("embedding") && !l.contains("q_vec"),
        s"embedding payload must not pass through the dedupe exchange:\n$l")
    }
  }

  test("sampled KMeans fit (s03/d07) is deterministic across runs") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { d =>
      def run() = SparkEntry.queries("s03_ann_ivf")(spark, d)
        .collect().map(_.toString).toSeq
      assert(run() == run(),
        s"seeded sample + seeded fit must reproduce identical output at $d")
    }
  }

  test("trainingSample is an absolute-row cap: ≈cap rows, layout-independent, identity under cap") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 10000).toDF("vec_id")
    val n = 10000L
    val cap = 1000L
    val sampled = graft.operators.IntLloyd.trainingSample(df, col("vec_id"), n, cap, "spec")
    val got = sampled.count()
    // binomial(10000, 0.1): ±40% of cap is a >6-sigma window
    assert(got > cap * 0.6 && got < cap * 1.4,
      s"expected ≈$cap rows from an absolute cap, got $got")
    // layout-independent: the admitted SET survives any repartitioning
    // (the property fraction-sampling lacks and the reason for the
    // salted-hash idiom)
    val re = graft.operators.IntLloyd.trainingSample(
      df.repartition(17), col("vec_id"), n, cap, "spec")
    assert(re.collect().map(_.getLong(0)).toSet ==
      sampled.collect().map(_.getLong(0)).toSet)
    // under the cap the corpus passes through whole
    val small = graft.operators.IntLloyd.trainingSample(df, col("vec_id"), 500L, cap, "spec")
    assert(small.count() == 10000L)
  }

  test("embeddings cardinality comes from parquet footers (matches count, no scan job)") {
    val meta = Tables.embeddingsCount(spark, sfDir)
    val scanned = Tables.embeddings(spark, sfDir).count()
    assert(meta == scanned, s"footer metadata count $meta != scan count $scanned")
  }

  test("d14 banded keeper equals d13's full-graph keeper on a clustered near-dup corpus") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 6 clusters × 5 near-dup copies. Cluster vocabularies are
    // disjoint (every 16-char shingle spans a word boundary and so
    // contains the cluster tag), so inter-cluster Jaccard is 0 under
    // BOTH pair definitions; intra-cluster copies differ only in a
    // short suffix (shingle Jaccard ≫ the 0.3/0.5 thresholds). Copy j
    // appends j commas so qualities are distinct and the keeper
    // choice is non-trivial.
    val docs = for (c <- 0 until 6; j <- 0 until 5) yield {
      val words = (0 until 8).map(w => s"w${c}q${w}zz")
      val base = (0 until 40).map(i => words(i % 8)).mkString(" ")
      val text = base + s" t${c}v${j}end" + ("," * j)
      ((c * 10 + j).toLong, text, "en", s"src$c", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("d14corpus").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rows(name: String) = SparkEntry.queries(name)(spark, dir)
      .select(col("doc_id"), col("cluster_id"), col("is_keeper"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val full = rows("d13_dedup_keeper_quality")
    val banded = rows("d14_dedup_keeper_banded")
    assert(full.size == 30, s"d13 must cluster all 30 docs, got ${full.size}")
    assert(full.count(_._3) == 6, "one keeper per cluster")
    assert(banded == full,
      s"banded keeper must equal the full-graph keeper on separable clusters: " +
        s"missing=${full.diff(banded).take(3)} extra=${banded.diff(full).take(3)}")
  }

  test("d15 semantic keeper: one keeper per group, the paper's argmin-centroid-cosine policy") {
    val rows = SparkEntry.queries("d15_dedup_semantic")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty, "sf0.001 must produce semantic duplicate groups")
    rows.groupBy(_._3).foreach { case (comp, ms) =>
      assert(ms.count(_._5) == 1, s"component $comp needs exactly one keeper")
      val keeper = ms.find(_._5).get
      // SemDeDup keeps the member FARTHEST from the centroid (argmin
      // cosine, tie → min vec_id) — the opposite of d13/d14's quality
      // argmax; this pin is what makes the policy difference testable
      val expected = ms.minBy(m => (m._4, m._1))
      assert(keeper == expected,
        s"component $comp keeper ${keeper._1} != argmin-centroid-cos ${expected._1}")
      assert(ms.map(_._2).distinct.size == 1,
        s"semantic group $comp spans k-means cells — single-assignment blocking broken")
      assert(comp == ms.map(_._1).min, "component id must be the min member id")
    }
  }

  test("hierarchicalPack is cost-definition-independent: any cost column equals the flat window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // a THIRD cost definition (n_chars — neither p02's regex count nor
    // p10's learned count): the packing arithmetic must not care what
    // priced the doc
    val base = Tables.documents(spark, sfDir)
      .withColumn("cost", col("n_chars").cast("long"))
    val packed = graft.queries.Pipeline.hierarchicalPack(base, budget = 777, shardSize = 64)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wFlat = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flat = base
      .withColumn("start_tok", coalesce(sum(col("cost")).over(wFlat), lit(0L)))
      .select(col("doc_id"), expr("start_tok div 777").as("bin_id"),
        pmod(col("start_tok"), lit(777)).as("bin_offset"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(packed == flat,
      "hierarchical prefix sum must equal the flat per-source window for ANY cost")
  }

  test("tokenBudgetSample accepts t17 learned counts and equals the naive prefix draw") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val vocab = graft.queries.Pipeline.learnedVocab(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", graft.functions.GraftColumns
        .learnedTokenStats(col("text"), vocab.toSeq).getField("learned_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
    val bucketed = graft.queries.Pipeline.tokenBudgetSample(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // naive semantics re-derived with LEARNED counts: per-source
    // (draw, doc_id) order, keep the prefix fitting the sqrt-tempered
    // budget — the same reference p07's oracle states for regex counts
    val withU = docs.withColumn("u",
      substring(md5(concat(col("doc_id").cast("string"), lit("|budget"))), 1, 8))
    val srcTok = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("tokens_s"))
      .withColumn("isq", floor(sqrt(col("tokens_s").cast("double"))).cast("long"))
    val tot = srcTok.agg(sum(col("tokens_s")).as("tot_tokens"), sum(col("isq")).as("tot_isq"))
    val budgets = srcTok.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(floor(col("tot_tokens") / lit(4L)).cast("double") *
          col("isq").cast("double") / col("tot_isq").cast("double"))
          .cast("long").as("budget_s"))
    val wNaive = Window.partitionBy(col("source")).orderBy(col("u"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = withU.join(broadcast(budgets), "source")
      .withColumn("cum", sum(col("n_tokens")).over(wNaive))
      .filter(col("cum") <= col("budget_s"))
      .select(col("source"), col("doc_id"), col("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "learned-cost budget draw selected nothing — vacuous")
    assert(bucketed == naive,
      "bucketed budget draw must equal the naive window under the learned definition")
  }

  test("shardManifest over learned-cost packing conserves tokens and fills interior bins") {
    import org.apache.spark.sql.functions._
    val vocab = graft.queries.Pipeline.learnedVocab(spark, sfDir)
    val st = graft.functions.GraftColumns.learnedTokenStats(col("text"), vocab.toSeq)
    val base = Tables.documents(spark, sfDir)
      .withColumn("n_images",
        (least(expr("octet_length(cast(text as binary)) div 1000"), lit(7)) + 1).cast("int"))
      .withColumn("cost", st.getField("learned_tokens") + col("n_images") * 576)
    val packed = graft.queries.Pipeline.hierarchicalPack(base, budget = 8192, shardSize = 512)
    val manifest = graft.queries.Pipeline.shardManifest(packed, budget = 8192)
      .transform(graft.CacheScope.cached)
    val perSrc = manifest.groupBy(col("source"))
      .agg(sum(col("tokens_in_bin")).as("t"), sum(col("n_images")).as("img"),
        max(col("bin")).as("last_bin"))
    val ref = packed.groupBy(col("source"))
      .agg(sum(col("cost")).as("c"), sum(col("n_images")).as("imgref"))
    val rows = perSrc.join(ref, "source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("t") == r.getAs[Long]("c"),
        s"${r.getString(0)}: learned-cost manifest lost tokens")
      // start-bin attribution: images sum to the corpus total, never more
      assert(r.getAs[Long]("img") == r.getAs[Long]("imgref"),
        s"${r.getString(0)}: image volume must be conserved (start-bin attribution)")
    }
    val notFull = manifest.join(
        perSrc.select(col("source"), col("last_bin")), "source")
      .filter(col("bin") < col("last_bin") && col("fill_ratio") =!= 1.0).count()
    assert(notFull == 0, s"$notFull interior bins not exactly full under learned costs")
    graft.CacheScope.drain()
  }

  test("s14 SQ8 quantized ranking recovers brute-force top-5 on a clustered corpus") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // same geometry as the s07 fixture: tight clusters, one query each
    val rnd = new scala.util.Random(43)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Array[Float] =
      base(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val vecs = (0 until 10).map(c => (c.toLong, member(c))) ++
      (0 until 190).map(i => ((10 + i).toLong, member(i % 10)))
    val dir = java.nio.file.Files.createTempDirectory("s14corpus").toString
    spark.createDataFrame(vecs).toDF("vec_id", "embedding")
      .withColumn("label", (col("vec_id") % 10).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("s14_ann_sq8")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val emb = Tables.embeddings(spark, dir)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
    val exact = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding"))
      .crossJoin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
      .withColumn("cos", graft.functions.VectorFunctions.cosine(col("q_vec"), col("embedding")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("q_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet && got.keySet.size == 10)
    got.keySet.foreach { q =>
      assert(got(q) == exact(q),
        s"q=$q sq8=${got(q)} exact=${exact(q)} — int8 ranking lost a true neighbor on tight clusters")
    }
  }

  test("s15 k-NN vote recovers the cluster label on a clustered corpus, deterministically") {
    import org.apache.spark.sql.functions.col
    // s14's geometry: 10 tight clusters, probe 0..19 = two per cluster
    val rnd = new scala.util.Random(47)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    def member(c: Int): Array[Float] =
      base(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val vecs = (0 until 200).map(i => (i.toLong, member(i % 10)))
    val dir = java.nio.file.Files.createTempDirectory("s15corpus").toString
    spark.createDataFrame(vecs).toDF("vec_id", "embedding")
      .withColumn("label", (col("vec_id") % 10).cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("s15_knn_classify")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(1) && r.getBoolean(4),
        s"probe ${r.getLong(0)}: predicted ${r.getInt(2)}, cluster ${r.getInt(1)}")
      assert(r.getLong(3) == 10L, "on tight clusters all k votes agree")
    }
    // run-stable: the vote is deterministic end to end
    val again = SparkEntry.queries("s15_knn_classify")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("t22 vocabulary growth curve: monotone, conserved, and checkpoint-complete") {
    val rows = SparkEntry.queries("t22_vocab_growth")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // prefix-sum columns are non-decreasing in j; new_words sums to the vocab
    val sorted = rows.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getInt(0) < b.getInt(0))
        assert(a.getLong(2) <= b.getLong(2) && a.getLong(3) <= b.getLong(3) &&
          a.getLong(4) <= b.getLong(4))
      case _ =>
    }
    assert(sorted.map(_.getLong(5)).sum == sorted.last.getLong(4))
    // the final checkpoint covers the corpus exactly
    val docs = Tables.documents(spark, sfDir)
    assert(sorted.last.getLong(2) == docs.count())
    val totalTokens = docs.selectExpr(
      "CAST(sum(size(filter(split(lower(text), ' '), w -> w <> ''))) AS BIGINT) t")
      .collect()(0).getLong(0)
    assert(sorted.last.getLong(3) == totalTokens)
    val totalVocab = docs.selectExpr("explode(filter(split(lower(text), ' '), w -> w <> '')) w")
      .distinct().count()
    assert(sorted.last.getLong(4) == totalVocab)
    // every checkpoint bucket is reachable: 2^(j-1) ≤ max doc_id+1 holds per row
    val maxId = docs.selectExpr("max(doc_id) m").collect()(0).getLong(0)
    sorted.foreach(r => assert(r.getInt(0) == 4 || (1L << (r.getInt(0) - 1)) <= maxId))
  }

  test("s20 beam search out-reaches the fixed 2-hop horizon on a chain-structured corpus") {
    import org.apache.spark.sql.functions.col
    // A 1-D angular chain: node i sits at angle i·Δ in a 2-D subspace
    // of the 64-dim space (+ tiny deterministic jitter so cosines
    // never tie). The k-NN graph the builder derives connects chain
    // neighbors; entry pivots are each cell's MIN-ID member = the
    // cell's leftmost node. A query near a cell's right edge is
    // several edge-hops from its entry, so the fixed 2-hop frontier
    // structurally cannot reach its true neighbors, while the greedy
    // beam walks toward rising cosine until it gets there — the
    // data-dependent depth is exactly what the beam buys over s16.
    val rnd = new scala.util.Random(47)
    val n = 200
    val delta = (math.Pi / 2) / n
    def at(pos: Double): Array[Float] = {
      val v = Array.fill(64)(0.003f * rnd.nextGaussian().toFloat)
      v(0) += math.cos(pos * delta).toFloat
      v(1) += math.sin(pos * delta).toFloat
      v
    }
    // chain nodes: ids 10..209 in chain order (builder keeps >= 10);
    // queries: ids 0..9 at positions just left of a right cell edge
    val chain = (0 until n).map(i => ((10 + i).toLong, at(i)))
    val queries = (0 until 10).map(j => (j.toLong, at(n * (j + 0.93) / 10)))
    val emb = spark.createDataFrame(chain ++ queries).toDF("vec_id", "embedding")
    val (edges0, piv) = graft.queries.Pipeline.graphIndexFrames(
      emb.select(col("vec_id"), col("embedding")), n.toLong)
    val edges = edges0.persist()
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = resultSet(graft.queries.Pipeline.graphProbe(edges, piv, q, emb, k = 5))
    val beam = resultSet(graft.queries.Pipeline.beamProbe(
      edges, piv, q, emb, k = 5, beam = 4, rounds = 6))
    CacheScope.drain()
    // ground truth: brute-force top-5 per query
    val exact = resultSet(SparkEntryHelpers.bruteTop5(spark, emb))
    def recall(got: Set[(Long, Long)]) = got.intersect(exact).size.toDouble / exact.size
    val (rFixed, rBeam) = (recall(fixed), recall(beam))
    info(s"s20 chain: fixed 2-hop recall $rFixed, beam recall $rBeam")
    assert(rBeam > rFixed,
      s"beam must out-reach the fixed horizon on the chain: $rBeam vs $rFixed")
    assert(rBeam >= 0.6, s"beam recall too low on the chain fixture: $rBeam")
    // price the DEPTH: recall@5 per round count at the registered
    // B=4, so s20's R=3 default is a measured knee, not a guess —
    // the curve (and the knee) is quoted in SURVEY §4's s20 row
    val curve = Seq(1, 2, 3, 4, 6).map { r =>
      val rec = recall(resultSet(graft.queries.Pipeline.beamProbe(
        edges, piv, q, emb, k = 5, beam = 4, rounds = r)))
      CacheScope.drain()
      r -> rec
    }
    info(s"s20 depth curve (beam=4): " +
      curve.map { case (r, rec) => s"R=$r:$rec" }.mkString(", "))
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must be non-decreasing in rounds: $curve")
    val byR = curve.toMap
    assert(byR(3) > byR(1),
      s"depth must buy recall on the chain: R=3 ${byR(3)} vs R=1 ${byR(1)}")
    assert(byR(3) >= 0.9 * byR(6),
      s"R=3 should sit at the knee (>=90% of the R=6 plateau): " +
        s"R=3 ${byR(3)} vs R=6 ${byR(6)}")
    edges.unpersist()
  }

  test("p15 end-to-end build: every stage's contract holds on the composed output") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("p15_pretrain_build")(spark, sfDir).collect()
    graft.CacheScope.drain()
    assert(out.nonEmpty, "p15 produced no manifest rows")
    val ids = out.map(_.getLong(0)).toSet
    // decontamination: no benchmark member (doc_id % 20 = 0) survives
    assert(ids.forall(_ % 20 != 0), "benchmark members leaked into training corpus")
    // curation: every survivor passed p01's gates
    val kept = SparkEntry.queries("p01_curate_corpus")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(ids.subsetOf(kept), "p15 emitted docs p01's gates rejected")
    // split/packing/schedule coherence: train rows are packed and
    // scheduled, non-train rows carry the -1 sentinels
    out.foreach { r =>
      val (split, bin, off, fe) =
        (r.getString(2), r.getLong(4), r.getLong(5), r.getLong(6))
      if (split == "train") {
        assert(bin >= 0 && off >= 0 && off < 8192, s"bad packing for train row $r")
        assert(fe >= 0 && fe <= 3, s"bad first_epoch for train row $r")
      } else {
        assert(bin == -1 && off == -1 && fe == -1, s"non-train row carries packing: $r")
      }
    }
    // keeper: no two survivors form a near-exact pair (>= 0.8); split
    // safety: no surviving >= 0.5 pair crosses splits (the p12
    // guarantee, re-checked on the COMPOSED output)
    val bySplit = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = SparkEntry.queries("d04_dedup_minhash")(spark, sfDir).collect()
    graft.CacheScope.drain()
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      if (ids(a) && ids(b)) {
        assert(j < 0.8, s"near-exact pair ($a,$b,$j) survived the keeper")
        if (j >= 0.5)
          assert(bySplit(a) == bySplit(b), s"pair ($a,$b,$j) crosses splits")
      }
    }
  }

  test("s24 IVF-seeded entry escapes the basin lock that pins s20 on clustered data") {
    // The round-12 finding, pinned: on a TIGHTLY CLUSTERED corpus
    // where a sqrt(n) coarse cell merges several true clusters, s20's
    // single per-cell pivot enters the wrong basin and greedy cannot
    // cross (edges only point to basin co-members), while s24's entry
    // from the query's own assigned cell members lands on true
    // neighbors. Deterministic fixture: G tight clusters, members =
    // center + small per-dim perturbation (integer-derived floats).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 64; val g = 40; val n = 400
    def vec(i: Long): Array[Float] = {
      val c = (i % g).toInt // query i lands in cluster i % g
      Array.tabulate(dim) { j =>
        val center = if (((c * 31 + j * 17) % 97) < 48) 1.0f else -1.0f
        center + 0.02f * (((i * 13 + j * 7) % 11).toInt - 5)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("s24clu").toString
    (0L until n).map(i => (i, vec(i), (i % g).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def recall(name: String): Double = {
      val exact = SparkEntry.queries("s01_ann_bruteforce")(spark, dir)
        .select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = SparkEntry.queries(name)(spark, dir)
        .select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.CacheScope.drain()
      got.intersect(exact).size.toDouble / exact.size
    }
    val r20 = recall("s20_ann_beam")
    val r24 = recall("s24_ann_beam_ivf_entry")
    info(s"clustered recall: s20 $r20 vs s24 $r24")
    assert(r24 >= r20, "IVF-seeded entry must never do worse than pivot entry here")
    assert(r24 >= 0.8, s"s24 must escape the basin lock on clustered data: $r24")
  }

  test("p16 = p15 minus exactly d16's flagged set and the semantic benchmark members") {
    // The composed semantic gate must remove PRECISELY what d16 flags
    // (plus the held-out items themselves) — nothing more, nothing
    // less — and every other column must still come from the shared
    // stage definitions (split/pack/schedule recompute over the
    // smaller survivor set, so only the ID-set invariant is stable).
    val p15Ids = SparkEntry.queries("p15_pretrain_build")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    val p16Ids = SparkEntry.queries("p16_pretrain_build_semantic")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    val semFlagged = SparkEntry.queries("d16_decontaminate_semantic")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    val removed = p15Ids.filter(id => id % 13 == 7) ++ (p15Ids intersect semFlagged)
    assert(p16Ids == p15Ids -- removed,
      s"semantic gate drift: extra=${p16Ids -- (p15Ids -- removed)} " +
        s"missing=${(p15Ids -- removed) -- p16Ids}")
    assert(p16Ids.size < p15Ids.size, "the gate must actually remove something here")
    info(s"p15 survivors ${p15Ids.size} -> p16 ${p16Ids.size} " +
      s"(flagged ${(p15Ids intersect semFlagged).size}, held-out ${p15Ids.count(_ % 13 == 7)})")
  }

  test("p17 survivors = all docs minus exactly the standalone p05b near-identical classes' non-keepers") {
    // The multimodal build's keeper stage must drop PRECISELY the
    // non-min members of the ≥ 0.9999 components of the standalone
    // p05b pair graph — tying the composed manifest to its certified
    // stage. Split/pack/schedule recompute over the survivor set, so
    // the ID-set invariant is the stable one (the p16 pin's shape).
    val manifest = SparkEntry.queries("p17_pretrain_build_multimodal")(spark, sfDir)
      .select("doc_id", "split").collect()
    graft.CacheScope.drain()
    val p17Ids = manifest.map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("p05b_multimodal_dedup_cells")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.CacheScope.drain()
    // brute-force the ≥ 0.9999 components and their min-id keepers
    val strong = pairs.filter(_._3 >= 0.9999).map(p => (p._1, p._2))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    strong.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = strong.flatMap(p => Seq(p._1, p._2)).toSet
    val nonKeepers = members.filter(id => find(id) != id)
    val allIds = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p17Ids == allIds -- nonKeepers,
      s"keeper drift: extra=${p17Ids -- (allIds -- nonKeepers)} " +
        s"missing=${(allIds -- nonKeepers) -- p17Ids}")
    assert(nonKeepers.nonEmpty, "the keeper must actually drop something here")
    // leakage-safety: no >= 0.995 pair straddles two splits
    val splitOf = manifest.map(r => r.getLong(0) -> r.getString(1)).toMap
    val leaks = pairs.filter { case (a, b, _) =>
      splitOf.contains(a) && splitOf.contains(b) && splitOf(a) != splitOf(b)
    }
    assert(leaks.isEmpty, s"near-dup pairs straddle splits: ${leaks.take(5).toSeq}")
    info(s"docs ${allIds.size} -> p17 survivors ${p17Ids.size} " +
      s"(dropped ${nonKeepers.size}); ${pairs.length} pairs, zero split leaks")
  }

  test("s26 code-routed walk re-ranks at full precision; clustered recall survives codes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // (a) every emitted cosine must be the EXACT cosine of that pair —
    // the rerank's full-precision contract (routing may be approximate,
    // the answer may not) — checked on the real table
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def exactCos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
    }
    val got = SparkEntry.queries("s26_ann_beam_pq_rerank")(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect()
    graft.CacheScope.drain()
    assert(got.nonEmpty)
    got.foreach { case (q, c, cos, _) =>
      val exp = BigDecimal(exactCos(emb(q), emb(c)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cos == exp, s"rerank must be full-precision: ($q,$c) $cos != $exp")
    }
    // (b) on the tight-cluster fixture (the s24 test's geometry), the
    // code-routed walk must keep the exact-routed walk's recall class:
    // within-basin reconstructions stay closer to the query than
    // cross-basin ones, so ADC ordering preserves the walk's decisions
    val dim = 64; val g = 40; val n = 400
    def vec(i: Long): Array[Float] = {
      val c = (i % g).toInt
      Array.tabulate(dim) { j =>
        val center = if (((c * 31 + j * 17) % 97) < 48) 1.0f else -1.0f
        center + 0.02f * (((i * 13 + j * 7) % 11).toInt - 5)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("s26clu").toString
    (0L until n).map(i => (i, vec(i), (i % g).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def recall(name: String): Double = {
      val exact = SparkEntry.queries("s01_ann_bruteforce")(spark, dir)
        .select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val res = SparkEntry.queries(name)(spark, dir)
        .select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.CacheScope.drain()
      res.intersect(exact).size.toDouble / exact.size
    }
    val r20 = recall("s20_ann_beam")
    val r26 = recall("s26_ann_beam_pq_rerank")
    info(s"clustered recall: s20 (exact routing) $r20 vs s26 (code routing) $r26")
    assert(r26 >= r20 - 0.2,
      s"code routing must stay in the exact-routed walk's recall class: $r26 vs $r20")
  }

  test("s25 geometry grid prices the graph family on both geometries in one frame") {
    // The round-12 verdict's #1, pinned structurally: the grid must
    // carry BOTH geometries for all FOUR graph-family rungs (round 14
    // added s26's PQ-routed walk per the round-13 verdict's #2), the
    // clustered re-geometry must reproduce the basin-lock finding
    // (s24 ≥ s20, s24 high) inside the SAME registered query, and
    // recall must equal hits/5 row by row (the exact join is the one
    // baseline).
    val rows = SparkEntry.queries("s25_ann_graph_geometry_grid")(spark, sfDir)
      .collect()
    graft.CacheScope.drain()
    val geoms = rows.map(_.getString(0)).toSet
    val methods = rows.map(_.getString(1)).toSet
    assert(geoms == Set("random", "clustered"))
    assert(methods == Set("s16_graph", "s20_beam", "s24_ivf_beam", "s26_pq_beam"))
    assert(rows.length == 2 * 4 * 10, s"2 geoms x 4 methods x 10 queries, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getDouble(5) == r.getLong(3).toDouble / 5,
        s"recall must be hits/5: $r")
      assert(r.getLong(4) >= r.getLong(3), s"cands must bound hits: $r")
    }
    def mean(g: String, m: String): Double = {
      val sel = rows.filter(r => r.getString(0) == g && r.getString(1) == m)
      sel.map(_.getDouble(5)).sum / sel.length
    }
    val c20 = mean("clustered", "s20_beam"); val c24 = mean("clustered", "s24_ivf_beam")
    info(s"clustered grid: s20 $c20 vs s24 $c24; random s24 ${mean("random", "s24_ivf_beam")}")
    assert(c24 >= c20, "the grid must show the IVF-seeded entry's clustered win")
    assert(c24 >= 0.8, s"s24 must escape the basin lock in the grid's re-geometry: $c24")
  }
}

/** Brute-force helper shared by graph-search specs. */
object SparkEntryHelpers {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  def bruteTop5(s: SparkSession, emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", graft.functions.VectorFunctions.cosine(col("q_vec"), col("embedding")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("q_id"), col("cand_id"))
  }
}
