package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Reference semantics: RDW's warehouse tables (exams, students, orgs —
  * see /root/reference/docs/Architecture.md) map onto the TPC-H-ish star
  * schema here: org hierarchy → region/nation, students → customer,
  * assessments → part, exam results → orders/lineitem, event stream →
  * events (SURVEY.md §1).
  *
  * Scale note: these are plain parquet scans so Catalyst pushes filters
  * and prunes columns into the file source; at cluster scale the same
  * loaders work unchanged against a partitioned table root because the
  * path is the only binding.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default ([PARQUET_TYPE_ILLEGAL]). Read it as a nanosecond long via
    * the legacy flag and convert to a microsecond TimestampType — the
    * generator emits whole-microsecond values, so the ns→µs division is
    * lossless and matches DuckDB's reading of the same file. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integral DIV, not `/`: epoch-nanos (~1.7e18) overflows double precision
    eventsRaw(s, d).withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
