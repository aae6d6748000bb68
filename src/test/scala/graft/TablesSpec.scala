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
