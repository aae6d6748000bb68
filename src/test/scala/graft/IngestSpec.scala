package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("name", StringType)))

  test("csv ingest splits malformed rows instead of failing") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath,
      "id,score,name\n1,95.5,alice\n2,notanumber,bob\n3,88.0,carol\n")
    val (valid, rejected) = Ingest.validationSplit(
      Ingest.readCsv(spark, f.getAbsolutePath, schema))
    assert(valid.count() == 2)
    assert(rejected.count() == 1)
    assert(rejected.select("_corrupt_record").as[String].head().contains("notanumber"))
  }

  test("json ingest enforces the schema with the same contract") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "in.jsonl")
    Files.writeString(f.toPath,
      """{"id":1,"score":90.0,"name":"a"}
        |{"id":"oops","score":{},"name":3
        |{"id":2,"score":70.5,"name":"b"}
        |""".stripMargin)
    val (valid, rejected) = Ingest.validationSplit(
      Ingest.readJson(spark, f.getAbsolutePath, schema))
    assert(valid.count() == 2)
    assert(rejected.count() == 1)
  }

  test("bucketed tables join without any shuffle exchange") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    Ingest.writeBucketed(orders, "graft_b_orders", "o_orderkey", 4)
    Ingest.writeBucketed(lineitem, "graft_b_lineitem", "l_orderkey", 4)
    val joined = spark.table("graft_b_orders")
      .join(spark.table("graft_b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == orders.join(lineitem,
      col("o_orderkey") === col("l_orderkey")).groupBy("o_orderkey").count().count())
  }

  test("partitioned mart write round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft_mart").toFile.getAbsolutePath + "/mart"
    val df = Seq((1L, 2023, 10.0), (2L, 2023, 20.0), (3L, 2024, 30.0))
      .toDF("id", "year", "v")
    Ingest.writePartitioned(df, out, Seq("year"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    // partition pruning: a year filter must not scan the other year's files
    val pruned = back.filter(col("year") === 2024)
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"expected partition filters in:\n$scan")
    // dynamic overwrite: rewriting 2024 leaves 2023 untouched
    Ingest.writePartitioned(Seq((9L, 2024, 99.0)).toDF("id", "year", "v"), out, Seq("year"))
    val after = spark.read.parquet(out)
    assert(after.filter(col("year") === 2023).count() == 2)
    assert(after.filter(col("year") === 2024).as[(Long, Double, Int)].collect()
      .map(_._1).toSeq == Seq(9L))
  }
}
