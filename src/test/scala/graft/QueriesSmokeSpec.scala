package graft

/** Every registered query runs end-to-end at sf0.001 (analysis,
  * optimization, execution) and returns a sane row count. Exact value
  * parity with DuckDB is covered by the driver's oracle gate (and
  * scripts/check.py locally); this spec catches regressions fast. */
class QueriesSmokeSpec extends SparkSpec {

  // Queries whose result can legitimately be empty at tiny scale.
  private val mayBeEmpty = Set("q15_anti_join", "d03_dedup_ngram_jaccard",
    "d04_dedup_minhash", "d05_dedup_simhash", "d08_dedup_winnow_jaccard",
    "q24_having")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
