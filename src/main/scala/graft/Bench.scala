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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String, dir: String): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // operators persist intermediates (inverted indexes etc.);
      // drop them so queries don't pressure each other's memory
      spark.catalog.clearCache()
    }

    // Dev aid: SPARK_GRAFT_ONLY=name1,name2 restricts the set.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try execute(n, "/root/testdata/sf0.001")
      catch { case e: Throwable => System.err.println(s"[bench-warmup] $n: ${e.getMessage}") }
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      try execute(name, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
