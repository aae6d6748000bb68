package graft

import org.apache.spark.sql.SparkSession

/** Measurement main for SURVEY §4's d17 clustered row: runs d17's
  * inverted-list decontamination AND d16's brute baseline over
  * `<dir>/embeddings.parquet` (the registered vec_id % 13 == 7
  * benchmark split) and prints one JSON line with wall times, the
  * admitted corpus×cell pair count, the full grid size, and the
  * flagged-row counts of both paths — the prune ratio and the
  * equality check the §4 row quotes. Diagnostic tooling in the
  * Bench/Verify family; no query semantics live here.
  *
  * Timing discipline (the round-10 advice findings): d17_sec times
  * exactly ONE action — the flagged count, the real d17 shape — so
  * the k-means build and admission join run once inside the window,
  * same as d16's single-action count; the admitted/cell metadata is
  * collected UNTIMED afterwards off a persisted admitted frame; and
  * the "full grid" denominator is the BUILD's cell count
  * (decontamIvfCellCount — k cells fitted over the benchmark), not
  * the smaller set of cells the admission happens to populate, so
  * prune_ratio can only understate via rounding, never via an
  * empty-cell artifact.
  */
object D17Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100c")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col

    val tau = 0.4
    val emb = Tables.embeddings(spark, dir)
    val isBench = col("vec_id") % 13 === 7
    val bench = emb.filter(isBench).select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(!isBench).select(col("vec_id"), col("embedding"))

    // timed: the registered d17 shape end-to-end INCLUDING the
    // eager k-means fit inside decontamIvf (IntLloyd collects
    // centroids to the driver at call time — starting the clock
    // after the call would exclude the build cost the §4 d17-vs-d16
    // comparison claims to include; round-11 advice finding)
    val t0 = System.nanoTime()
    val (admitted, flagged) = graft.queries.Pipeline.decontamIvf(
      spark, bench, corpus, tau)
    val d17N = flagged.count()
    val tD17 = (System.nanoTime() - t0) / 1e9

    // untimed metadata for the §4 row: persist so the two reads run
    // the build + admission once more total, not once per count
    val adm = admitted.persist()
    val admittedN = adm.count()
    val cellsPopulated = adm.select("cluster").distinct().count()
    adm.unpersist()
    val corpusN = corpus.count()
    val cells = graft.queries.Pipeline.decontamIvfCellCount(bench.count())
    val grid = corpusN * cells

    // d16's brute pass on the same frames (the certified baseline) —
    // also a single timed action
    val t1 = System.nanoTime()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("bench_id"))
    val d16N = corpus
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        bench.select(col("vec_id").as("bench_id"), col("embedding").as("b_vec"))))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("b_vec")))
      .filter(col("cosine") >= tau)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .count()
    val tD16 = (System.nanoTime() - t1) / 1e9

    println(s"""{"dir":"$dir","corpus":$corpusN,"cells":$cells,""" +
      s""""cells_populated":$cellsPopulated,"admitted":$admittedN,""" +
      s""""grid":$grid,""" +
      s""""prune_ratio":${1.0 - admittedN.toDouble / grid},""" +
      s""""d17_flagged":$d17N,"d16_flagged":$d16N,""" +
      s""""d17_sec":$tD17,"d16_sec":$tD16}""")
    spark.stop()
  }
}
