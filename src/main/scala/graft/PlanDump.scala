package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization rounds: dump `explain("formatted")`
  * for the named queries (all when no args) into
  * $SPARK_GRAFT_PLAN_DIR/<name>_$SPARK_GRAFT_PLAN_TAG.txt — the plan
  * evidence committed under plans/rNN/. Session config matches
  * [[Bench]] so the captured plan is the plan the bench times.
  *
  * NOTE: invoking a query function executes any driver-side rounds
  * inside it (BPE training, Lloyd fits, component fixpoints), so a
  * dump run does real Spark work; don't run one next to a timed
  * bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r16")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // keep in lockstep with Bench/Verify: without it the captured
      // plan is not the plan the bench times (r16 advice)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
        System.err.println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      } finally {
        CacheScope.drain()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
