package graft

class TablesSpec extends SparkSpec {
  test("all tables load with their expected schemas") {
    Tables.all.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      assert(df.columns.toSet == Tables.expectedColumns(t).toSet, s"table $t")
    }
  }

  test("events ts arrives as microsecond TimestampType") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
  }

  test("registerAll exposes every table and native function to spark.sql") {
    import spark.implicits._
    Tables.registerAll(spark, sfDir)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head() > 0, t)
    }
    // the events view carries the ns→µs loader conversion
    assert(spark.sql("SELECT date_trunc('hour', ts) AS h FROM events LIMIT 1")
      .schema("h").dataType == org.apache.spark.sql.types.TimestampType)
    // native functions resolve through the same SQL surface
    val c = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 1")
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("schema drift fails fast with a named column list") {
    val bad = Tables.orders(spark, sfDir).drop("o_totalprice")
    val e = intercept[IllegalArgumentException] {
      // simulate a reload check on a dataframe missing a column
      val missing = Tables.expectedColumns("orders").filterNot(bad.columns.contains)
      require(missing.isEmpty, s"table orders is missing expected columns: $missing")
    }
    assert(e.getMessage.contains("o_totalprice"))
  }
}
