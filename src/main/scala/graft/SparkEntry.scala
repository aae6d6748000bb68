package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Monitoring, Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2/§7 + the builder
  * prompt. Every implemented operator is registered in [[queries]];
  * every SQL-expressible one has a DuckDB oracle in [[oracleSql]] with
  * identical column aliases.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Pipeline.queries ++ Monitoring.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 5 the rows-only set is EMPTY:
    * every registered query has a replayable oracle (the last holdouts
    * — KMeans-dependent s03/s04/s05/d07 — graduated via the
    * integer-quantized IntLloyd fit, which unrolls as DuckDB CTEs).
    * SurveySyncSpec asserts oracleSql.keySet == queries.keySet. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Pipeline.oracle ++ Monitoring.oracle
}
