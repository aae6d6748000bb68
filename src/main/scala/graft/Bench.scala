package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Methodology:
  * - noop sink, not count(): count() lets Catalyst prune the
  *   projections away, so half the work wouldn't be measured.
  * - one warmup pass at sf0.001 first so JIT/classloading cost isn't
  *   attributed to whichever query happens to run first.
  * - each query timed REPS times, median reported alongside min: a
  *   single shared-VM GC pause can otherwise multiply one query's
  *   number by 5× (seen in round 1: q28 13.3 s in-suite vs 2.25 s
  *   isolated).
  * - reps are ROUND-ROBINED across queries (rep r runs every query
  *   once before rep r+1): back-to-back reps let one noisy VM window
  *   own all of a query's samples — round 3's driver run reported
  *   3–5× medians for five queries that measured at baseline in
  *   isolation. Spreading a query's reps minutes apart makes a median
  *   artifact require three independent noise windows to hit the same
  *   query, and the per-query "min" exposes any that remain.
  * - a query that throws reports -1 (and its name under "failed") so
  *   downstream consumers never mistake a failure for a fast run.
  * - AQE on with skew-join handling — the same settings a cluster
  *   deployment would run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let AQE right-size CACHED plan output partitioning by bytes
      // (default false): cached intermediates (inverted indexes, pair
      // graphs, fixpoint state) otherwise materialize at the static
      // shuffle-partition count, and every later stage over them pays
      // that task count regardless of size — the r16 profile measured
      // ~1000 tasks per component-fixpoint round at sf0.1 (measured
      // -14% suite-slice wall with the flag; scale-adaptive by design:
      // AQE sizes by advisoryPartitionSizeInBytes at any corpus size).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measurement-only knobs live behind the bench entry point (see
    // BenchKnobs) — a correctness run never reads this env var
    BenchKnobs.d16BenchCap =
      sys.env.get("SPARK_GRAFT_D16_BENCH_CAP").map(_.toLong)

    def execute(name: String, dir: String): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // operators persist intermediates (inverted indexes etc.);
      // drop them so queries don't pressure each other's memory
      CacheScope.drain()
      spark.catalog.clearCache()
    }

    // Dev aid: SPARK_GRAFT_ONLY=name1,name2 restricts the set
    // (whitespace-tolerant — same parse as Verify's).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try execute(n, "/root/testdata/sf0.001")
      catch { case e: Throwable => System.err.println(s"[bench-warmup] $n: ${e.getMessage}") }
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          execute(name, sfDir)
          samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name: ${e.getMessage}")
        }
      }
    }
    val results = names.map { name =>
      val ts = samples(name)
      val median = if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2)
      val minT = if (ts.isEmpty) -1.0 else ts.min
      (name, median, minT)
    }
    val failed = results.collect { case (k, v, _) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, m) => "\"" + k + "\":" + m }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // mode tag distinguishes the driver's full-suite rows from
    // hand-launched isolated (fresh-JVM-per-query) triage rows in
    // bench_history.jsonl — see SURVEY §8h's regression protocol.
    // Whitelisted: a quote/backslash in the env var would corrupt
    // bench_results.json and every later bench_history append.
    val mode = sys.env.get("SPARK_GRAFT_BENCH_MODE")
      .filter(_.matches("[a-z0-9_]+")).getOrElse("suite")
    // sfDir is interpolated into JSON string literals below — escape
    // backslash/quote/control chars so an unusual path can't corrupt
    // the parseable line (round-11 advice: mode was whitelisted but
    // sfDir wasn't)
    val sfJson = sfDir.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"mode":"$mode","reps":$reps,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfJson"}"""
    println(line)
    // durable copy: the driver captures only a 2000-char stdout tail,
    // which truncates the per-query record past ~45 queries
    // (BENCH_r07.json parsed: null) — the file carries the whole line.
    // bench_history.jsonl additionally APPENDS every run (timestamped),
    // so round-over-round per-query diffs don't depend on anyone
    // remembering to copy bench_results.json to a per-round name.
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_results.json"), line + "\n")
      val stamped = s"""{"ts":"${java.time.Instant.now()}",""" + line.drop(1) + "\n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_history.jsonl"), stamped,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench artifacts: ${e.getMessage}")
    }
    // the driver keeps only a 2000-char stdout TAIL, so the full
    // per-query line above can never parse at 194 queries
    // (BENCH_r10.json "parsed": null). The LAST line is therefore a
    // compact summary — same contract fields, the slowest queries
    // only — that always fits the tail; the full record lives in
    // bench_results.json / bench_history.jsonl.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$slowest,"n_queries":${results.size},""" +
      s""""n_failed":${failed.size},"mode":"$mode","reps":$reps,"sf":"$sfJson",""" +
      s""""full":"bench_history.jsonl"}""")
    spark.stop()
  }
}
