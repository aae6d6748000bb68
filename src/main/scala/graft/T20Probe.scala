package graft

import org.apache.spark.sql.SparkSession

/** Measurement main for SURVEY §4's t20 scale row: trains the batched
  * BPE trainer at the registered production K (t20Merges = 512) over
  * `<dir>/documents.parquet` and prints one JSON line with the
  * corpus's word-type count, the merges actually reached (the sf0.1
  * fixture exhausts at 89 — a corpus with more types absorbs more),
  * the driver-round count, and the wall time. D17Probe's sibling:
  * diagnostic tooling, no query semantics.
  */
object T20Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, explode, split}

    val docs = Tables.documents(spark, dir)
    val types = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").select("w").distinct().count()

    val t0 = System.nanoTime()
    val merges = graft.queries.Pipeline.queries("t20_bpe_train")(spark, dir)
    val reached = merges.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // rounds are on the [t20] stderr line bpeTrainBatched prints; echo
    // the rest as one parseable line
    println(s"""{"dir":"$dir","word_types":$types,"k":512,""" +
      s""""merges_reached":$reached,"sec":$sec}""")
    spark.stop()
  }
}
