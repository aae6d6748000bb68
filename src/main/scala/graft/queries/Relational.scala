package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QUtil, Tables => T}
import graft.QUtil._
import graft.operators.Operators

/** Relational / RDW ETL+reporting operator coverage (SURVEY.md §2,
  * q01–q32). Each query has a DuckDB oracle in [[oracle]] with
  * IDENTICAL column aliases and deterministic ORDER BY; numeric policy
  * per QUtil (exact decimal aggregation surfaced as double).
  *
  * Reference semantics sources (no code copied — reference is config/
  * docs only): /root/reference/docs/Architecture.md (aggregate
  * reporting measures), docs/Norms.md (percentile/norms tables),
  * docs/Runbook.md (latest-wins migrate), docs/StudentGroups.md
  * (membership joins).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // -- q01: TPC-H Q1 shape = RDW aggregate measures ------------------------
  private val q01: Q = (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlMoneySum("l_quantity")} AS sum_qty,
       |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       |  ${sqlMoneyAvg("l_quantity")} AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- q02: filtered scan w/ projection + pushdown -------------------------
  private val q02: Q = (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate").between(
        to_timestamp(lit("1996-01-01")), to_timestamp(lit("1996-12-31"))) &&
        col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // -- q03: 5-table star join, agg by org hierarchy ------------------------
  // Lineitem is pre-aggregated to order grain BELOW the join: the
  // orders⋈lineitem shuffle then moves one row per order instead of
  // ~4 line items — the decisive reduction at 100 TB, and exactly
  // equivalent because sum is associative (decimal, so order-free).
  private val q03: Q = (s, d) => {
    val perOrder = T.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))).as("rev"),
        count(lit(1)).as("items"))
    perOrder
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
        sum(col("items")).as("n_items"))
      .orderBy(col("r_name"), col("n_name"), col("o_year"))
  }

  private val q03Sql =
    """SELECT r_name, n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -- q04: fact ⋈ small-dim broadcast join --------------------------------
  private val q04: Q = (s, d) =>
    T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("p_brand"))

  private val q04Sql =
    s"""SELECT p_brand, ${sqlMoneySum("l_quantity")} AS sum_qty, COUNT(*) AS cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // -- q05: exact interpolated percentiles per group (Norms.md) ------------
  private val q05: Q = (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.50)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))
      .orderBy(col("l_returnflag"))

  private val q05Sql =
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
      |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |  ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- q06: rank per group (top performers per org) ------------------------
  private val q06: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    T.customer(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
      .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_mktsegment, c_custkey, c_name, c_acctbal, CAST(rnk AS INTEGER) AS rnk
      |FROM (SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
      |        rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |      FROM customer)
      |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin

  // -- q07: year-over-year trend via lag (longitudinal) --------------------
  private val q07: Q = (s, d) => {
    val rev = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(moneySum(col("o_totalprice")).as("rev"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("o_year"))
    rev.withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .withColumn("yoy_diff", col("rev") - col("prev_rev"))
      .orderBy(col("n_name"), col("o_year"))
  }

  private val q07Sql =
    s"""WITH rev AS (
       |  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |    ${sqlMoneySum("o_totalprice")} AS rev
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, o_year, rev,
       |  lag(rev) OVER (PARTITION BY n_name ORDER BY o_year) AS prev_rev,
       |  rev - lag(rev) OVER (PARTITION BY n_name ORDER BY o_year) AS yoy_diff
       |FROM rev ORDER BY n_name, o_year""".stripMargin

  // -- q08: pivot status × year (performance-level matrix) -----------------
  private val q08: Q = (s, d) =>
    T.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_year"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .orderBy(col("o_year"))

  private val q08Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q09: ROLLUP over org hierarchy --------------------------------------
  private val q09: Q = (s, d) =>
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q09Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS cnt, ${sqlMoneySum("c_acctbal")} AS sum_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // -- q10: CUBE over two dims ---------------------------------------------
  private val q10: Q = (s, d) =>
    T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q10Sql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
       |  ${sqlMoneySum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // -- q11: GROUPING SETS (custom dim combos) ------------------------------
  // Dataset-API groupingSets (no session temp views: fixed-name views
  // are shared catalog state — concurrent invocations would race).
  private val q11: Q = (s, d) =>
    T.customer(s, d)
      .join(T.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(T.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q11Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS cnt, ${sqlMoneySum("c_acctbal")} AS sum_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // -- q12: distinct students tested per org -------------------------------
  private val q12: Q = (s, d) =>
    T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("c_custkey")).as("students_tested"),
        count(lit(1)).as("n_results"))
      .orderBy(col("n_name"))

  private val q12Sql =
    """SELECT n_name, COUNT(DISTINCT c_custkey) AS students_tested, COUNT(*) AS n_results
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // -- q13: % meeting threshold (percent-at-performance-level) -------------
  private val q13: Q = (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(when(col("l_quantity") >= 30, 1).otherwise(0)).cast(DoubleType) / count(lit(1)))
          .as("rate_high_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  private val q13Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate_high_qty,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- q14: EXISTS (students with results) ---------------------------------
  private val q14: Q = (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val q14Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- q15: NOT EXISTS (students without urgent results) -------------------
  // Filtered anti join: at every tested SF each customer has *some*
  // order, so the unfiltered variant returns nothing — the urgent
  // filter keeps the operator's output observable.
  private val q15: Q = (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val q15Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // -- q16: latest-wins dedup (exam replace semantics) ---------------------
  private val q16: Q = (s, d) =>
    Operators.latestWins(T.orders(s, d),
        keys = Seq(col("o_custkey")),
        ordering = Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .orderBy("o_custkey")

  private val q16Sql =
    """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // -- q17: running total over time ----------------------------------------
  private val q17: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.orders(s, d)
      .withColumn("cum_spend", sum(money(col("o_totalprice"))).over(w).cast(DoubleType))
      .select("o_custkey", "o_orderkey", "o_orderdate", "cum_spend")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val q17Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // -- q18: cut-points → performance levels --------------------------------
  private val q18: Q = (s, d) =>
    T.orders(s, d)
      .withColumn("level",
        when(col("o_totalprice") < 100000, "L1_below")
          .when(col("o_totalprice") < 200000, "L2_approaching")
          .when(col("o_totalprice") < 350000, "L3_meets")
          .otherwise("L4_exceeds"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("level"))

  private val q18Sql =
    s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'L1_below'
       |  WHEN o_totalprice < 200000 THEN 'L2_approaching'
       |  WHEN o_totalprice < 350000 THEN 'L3_meets'
       |  ELSE 'L4_exceeds' END AS level,
       |  COUNT(*) AS cnt, ${sqlMoneySum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q19: top-k per group with deterministic tie-break -------------------
  private val q19: Q = (s, d) =>
    Operators.topKPerGroup(
        T.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        keys = Seq(col("o_custkey")),
        ordering = Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3)
      .orderBy(col("o_custkey"), col("rn"))

  private val q19Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // -- q20: union two sources + reconcile (import merge) -------------------
  private val q20: Q = (s, d) => {
    val o = T.orders(s, d)
    val a = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val b = o.filter(col("o_totalprice") > 300000)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    a.union(b).distinct().orderBy("o_orderkey")
  }

  private val q20Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |UNION
      |SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_totalprice > 300000
      |ORDER BY o_orderkey""".stripMargin

  // -- q21: range join (date-effective tier lookup) ------------------------
  private val q21: Q = (s, d) => {
    val sp = s; import sp.implicits._
    val tiers = Seq(("T1_low", 0.0, 50.0), ("T2_mid", 50.0, 150.0),
      ("T3_high", 150.0, 1000000.0)).toDF("tier", "lo", "hi")
    Operators.rangeLookup(T.events(s, d), tiers, col("value"), col("lo"), col("hi"))
      .groupBy(col("event_type"), col("tier"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .orderBy(col("event_type"), col("tier"))
  }

  private val q21Sql =
    s"""WITH tiers(tier, lo, hi) AS (VALUES
       |  ('T1_low', 0.0, 50.0), ('T2_mid', 50.0, 150.0), ('T3_high', 150.0, 1000000.0))
       |SELECT event_type, tier, COUNT(*) AS cnt, ${sqlMoneySum("value")} AS sum_value
       |FROM events JOIN tiers ON value >= lo AND value < hi
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q22: as-of join (latest prior error per user) -----------------------
  private val q22: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts")
    Operators.asOfJoin(purchases, errors, key = "user_id",
        leftTime = "ts", rightTime = "ts", rightCols = Seq("ts"))
      .withColumnRenamed("asof_ts", "last_error_ts")
      .select("user_id", "event_id", "ts", "value", "last_error_ts")
      .orderBy("event_id")
  }

  private val q22Sql =
    """SELECT p.user_id, p.event_id, p.ts, p.value,
      |  (SELECT max(e.ts) FROM events e
      |   WHERE e.user_id = p.user_id AND e.event_type = 'error' AND e.ts < p.ts) AS last_error_ts
      |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin

  // -- q23: gap-based sessionization ---------------------------------------
  private val q23: Q = (s, d) =>
    Operators.sessionize(T.events(s, d), "user_id", "ts", gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))

  private val q23Sql =
    s"""WITH x AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
       |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
       |         ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |y AS (
       |  SELECT user_id, ts, value,
       |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM x)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  ${sqlMoneySum("value")} AS sum_value
       |FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // -- q24: HAVING on aggregates -------------------------------------------
  private val q24: Q = (s, d) =>
    T.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_spend"))
      .filter(col("n_orders") >= 10 && col("total_spend") > 1000000)
      .orderBy(col("o_custkey"))

  private val q24Sql =
    s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlMoneySum("o_totalprice")} AS total_spend
       |FROM orders GROUP BY o_custkey
       |HAVING COUNT(*) >= 10 AND ${sqlMoneySum("o_totalprice")} > 1000000
       |ORDER BY o_custkey""".stripMargin

  // -- q25: string normalization (ingest validation) -----------------------
  private val q25: Q = (s, d) =>
    T.part(s, d)
      .withColumn("norm_name",
        trim(regexp_replace(regexp_replace(upper(col("p_name")), "[^A-Z0-9 ]", ""), " +", " ")))
      .select("p_partkey", "p_name", "norm_name")
      .orderBy("p_partkey")

  private val q25Sql =
    """SELECT p_partkey, p_name,
      |  trim(regexp_replace(regexp_replace(upper(p_name), '[^A-Z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_name
      |FROM part ORDER BY p_partkey""".stripMargin

  // -- q26: month truncation + agg -----------------------------------------
  private val q26: Q = (s, d) =>
    T.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType).as("o_month"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_month"))

  private val q26Sql =
    s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
       |  COUNT(*) AS cnt, ${sqlMoneySum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q27: coalesce/nullif semantics --------------------------------------
  private val q27: Q = (s, d) =>
    T.lineitem(s, d)
      .groupBy(coalesce(nullif(col("l_returnflag"), lit("N")), lit("NONE")).as("flag_or_none"))
      .agg(count(lit(1)).as("cnt"),
        count(nullif(col("l_linestatus"), lit("F"))).as("non_f_status"))
      .orderBy(col("flag_or_none"))

  private val q27Sql =
    """SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none,
      |  COUNT(*) AS cnt, COUNT(NULLIF(l_linestatus, 'F')) AS non_f_status
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q28: exact decimal revenue by year ----------------------------------
  // Same pre-aggregation-below-join shape as q03 (sum associativity on
  // exact decimals makes it value-identical).
  private val q28: Q = (s, d) => {
    val perOrder = T.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
        * (lit(1) + rate(col("l_tax")))).as("rev"),
        count(lit(1)).as("items"))
    perOrder
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
        sum(col("items")).as("n_items"))
      .orderBy(col("o_year"))
  }

  private val q28Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q29: rule-based validation split (exam processor) -------------------
  private val q29: Q = (s, d) =>
    T.orders(s, d)
      .withColumn("validation",
        when(col("o_totalprice") <= 0, "neg_price")
          .when(col("o_totalprice") > 450000, "suspicious_high")
          .when(!col("o_orderstatus").isin("F", "O", "P"), "bad_status")
          .otherwise("valid"))
      .groupBy(col("validation"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("validation"))

  private val q29Sql =
    s"""SELECT CASE WHEN o_totalprice <= 0 THEN 'neg_price'
       |  WHEN o_totalprice > 450000 THEN 'suspicious_high'
       |  WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 'bad_status'
       |  ELSE 'valid' END AS validation,
       |  COUNT(*) AS cnt, ${sqlMoneySum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q30: correlated subquery (TPC-H Q17 shape), decorrelated ------------
  private val q30: Q = (s, d) => {
    val li = T.lineitem(s, d)
    val th = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((moneyAvg(col("l_quantity")) * 0.2).as("thresh"))
    li.join(th, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("thresh"))
      .agg((moneySum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("cnt"))
  }

  private val q30Sql =
    s"""WITH th AS (
       |  SELECT l_partkey, (${sqlMoneyAvg("l_quantity")}) * 0.2 AS thresh
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT ${sqlMoneySum("l.l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS cnt
       |FROM lineitem l JOIN th ON l.l_partkey = th.l_partkey
       |WHERE l.l_quantity < th.thresh""".stripMargin

  // -- q31: norms lookup — score → percentile_rank via range join ----------
  private val q31: Q = (s, d) => {
    val o = T.orders(s, d)
    val taus = (0 to 10).map(_ / 10.0)
    val qs = o.agg(expr(s"percentile(o_totalprice, array(${taus.mkString(",")}))").as("q"))
    val norms = qs.select(explode(expr(
      """transform(sequence(0, 9), i -> struct(
        |  i AS decile,
        |  element_at(q, i + 1) AS lo,
        |  CASE WHEN i = 9 THEN element_at(q, 11) + 1 ELSE element_at(q, i + 2) END AS hi))"""
        .stripMargin)).as("n")).select("n.*")
    Operators.rangeLookup(o, norms, col("o_totalprice"), col("lo"), col("hi"))
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("decile") * 10).as("percentile_rank"))
      .orderBy(col("o_orderkey"))
  }

  private val q31Sql =
    """WITH qs AS (
      |  SELECT quantile_cont(o_totalprice, [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS q
      |  FROM orders),
      |norms AS (
      |  SELECT CAST(i AS INTEGER) AS decile, q[i + 1] AS lo,
      |    CASE WHEN i = 9 THEN q[11] + 1 ELSE q[i + 2] END AS hi
      |  FROM qs, generate_series(0, 9) t(i))
      |SELECT o_orderkey, o_totalprice, CAST(decile * 10 AS INTEGER) AS percentile_rank
      |FROM orders JOIN norms ON o_totalprice >= lo AND o_totalprice < hi
      |ORDER BY o_orderkey""".stripMargin

  // -- q32: high-cardinality agg (AQE/skew path) ---------------------------
  private val q32: Q = (s, d) =>
    T.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        moneySum(col("value")).as("sum_value"),
        moneyAvg(col("value")).as("avg_value"))
      .orderBy(col("user_id"), col("event_type"))

  private val q32Sql =
    s"""SELECT user_id, event_type, COUNT(*) AS cnt,
       |  ${sqlMoneySum("value")} AS sum_value, ${sqlMoneyAvg("value")} AS avg_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q33: HLL approx distinct (OLAP sketch; ORACLE-EXACT) ----------------
  // A full HyperLogLog built from first principles so the sketch itself
  // replays in DuckDB (t10's trick, applied to HLL): md5-derived 32-bit
  // hash, m = 256 registers from the top 8 bits, rank = leading-zero
  // count of the low 24 bits via length(bin(x)) — pure integer
  // arithmetic both engines. The register harmonic sum is kept EXACT by
  // scaling to 2^25 (every 2^(25-rank) term is an integer; Σ fits a
  // long), so the only floating-point ops are one constant-folded alpha,
  // one division, and the small-range linear-counting branch — each a
  // single correctly-rounded IEEE op, hence hash-identical across
  // engines after round(·,4). Paired with the exact count so sketch
  // accuracy is visible (spec gates ≤10%).
  //
  // The register build runs through the native [[graft.functions
  // .expressions.HllRegisters]] TypedImperativeAggregate: the 256-byte
  // max-rank buffer IS the aggregation state, merged map-side, so the
  // exchange moves one sketch per group per task — no (group,
  // register) intermediate shuffle at all. That is the property that
  // makes HLL the 100-TB count-distinct (the exact column here is the
  // expensive one; a warehouse deployment would drop it). The
  // declarative (group × register) formulation is bit-equal by
  // construction and kept as the spec parity oracle (FunctionsSpec).
  private val q33: Q = (s, d) => {
    val base = T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    base
      .withColumn("hv",
        conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .groupBy(col("n_name"))
      .agg(graft.functions.GraftColumns.hllRegisters(col("hv")).as("hll"),
        countDistinct(col("c_custkey")).as("exact_students"))
      .withColumn("s_total", col("hll.s_total"))
      .withColumn("v_zero", col("hll.v_zero").cast("long"))
      .withColumn("e_raw", alpha * lit(2199023255552.0) / col("s_total"))
      .withColumn("approx_students",
        round(when(col("e_raw") <= 640.0 && col("v_zero") > 0,
          lit(256.0) * log(lit(256.0) / col("v_zero")))
          .otherwise(col("e_raw")), 4))
      .withColumn("err_pct", round(lit(100.0) *
        abs(col("approx_students") - col("exact_students").cast("double")) /
        col("exact_students"), 4))
      .select("n_name", "approx_students", "exact_students", "err_pct")
      .orderBy(col("n_name"))
  }

  // Same HLL replayed in DuckDB: identical hash family (md5 hex → int),
  // identical integer register/rank arithmetic, identical
  // double-literal constants. SUM casts through BIGINT (DuckDB sums to
  // HUGEINT) and every double constant is CAST explicitly (DuckDB
  // parses decimal literals as DECIMAL, whose arithmetic differs).
  private val q33Sql =
    """WITH base AS (
      |  SELECT n_name, c_custkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |h AS (
      |  SELECT n_name,
      |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
      |  FROM base),
      |rr AS (
      |  SELECT n_name, hv // 16777216 AS r,
      |    CASE WHEN hv % 16777216 = 0 THEN 25
      |         ELSE 25 - length(bin(hv % 16777216)) END AS rho
      |  FROM h),
      |regs AS (SELECT n_name, r, MAX(rho) AS mj FROM rr GROUP BY 1, 2),
      |sk AS (
      |  SELECT n_name,
      |    CAST(SUM(CAST(1 AS BIGINT) << (25 - mj)) AS BIGINT)
      |      + (256 - COUNT(*)) * 33554432 AS s_total,
      |    256 - COUNT(*) AS v_zero
      |  FROM regs GROUP BY 1),
      |est AS (
      |  SELECT n_name, v_zero,
      |    CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)
      |      * CAST(2199023255552 AS DOUBLE) / s_total AS e_raw
      |  FROM sk),
      |apx AS (
      |  SELECT n_name,
      |    round(CASE WHEN e_raw <= 640.0 AND v_zero > 0
      |          THEN 256.0 * ln(256.0 / v_zero) ELSE e_raw END, 4) AS approx_students
      |  FROM est),
      |ex AS (SELECT n_name, COUNT(DISTINCT c_custkey) AS exact_students
      |       FROM base GROUP BY 1)
      |SELECT a.n_name, a.approx_students, x.exact_students,
      |  round(100.0 * abs(a.approx_students - CAST(x.exact_students AS DOUBLE))
      |    / x.exact_students, 4) AS err_pct
      |FROM apx a JOIN ex x ON a.n_name = x.n_name
      |ORDER BY a.n_name""".stripMargin

  // -- q34: approx percentile sketch (ORACLE-EXACT) ------------------------
  // A 128-bin equal-width histogram percentile estimator built from
  // first principles so the sketch replays in DuckDB (the q33/t10
  // move, applied to quantiles): bin assignment is pure integer
  // arithmetic (((vi-mn)*128) DIV width), the per-bin cumulative
  // counts are exact longs, and the estimate is linear interpolation
  // inside the covering bin — a handful of IEEE ops over exact
  // integers, written with identical parenthesization in both engines,
  // hence hash-identical after round(·,4). Paired with the exact
  // interpolated percentile (q05's oracle-proven idiom) so sketch
  // error is visible; spec gates ≤5%.
  //
  // Scale: the histogram is ONE partial-aggregated shuffle with ≤128
  // cells per group regardless of row count, and the cells are
  // mergeable by addition — the single-pass / streamable property
  // that replaces a full sort at 100 TB (same role as a t-digest,
  // with a deterministic replayable construction).
  private val q34: Q = (s, d) => {
    val li = T.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast("bigint").as("vi"))
    val stats = li.groupBy("l_returnflag").agg(
      min(col("vi")).as("mn"), max(col("vi")).as("mx"), count(lit(1)).as("n"))
    val hist = li.join(broadcast(stats), Seq("l_returnflag"))
      .withColumn("bin", expr("((vi - mn) * 128) DIV (mx - mn + 1)"))
      .groupBy(col("l_returnflag"), col("bin")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val taus = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95))
    val tgt = stats.select(col("l_returnflag"), col("mn"), col("mx"), col("n"),
        explode(array(taus.map { case (l, t) =>
          struct(lit(l).as("lbl"), lit(t).as("tau")) }: _*)).as("tt"))
      .select(col("l_returnflag"), col("mn"), col("mx"),
        col("tt.lbl").as("lbl"),
        (col("tt.tau") * (col("n") - 1).cast("double") + lit(1.0)).as("t"))
    // first (lowest) bin whose cumulative count covers the target rank
    val sel = tgt.join(cum, Seq("l_returnflag"))
      .filter(col("cum").cast("double") >= col("t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag"), col("lbl")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
    val wbin = (col("mx") - col("mn") + 1).cast("double") / lit(128.0)
    val est = (col("mn").cast("double") + col("bin").cast("double") * wbin) +
      ((col("t") - col("cum_prev").cast("double")) / col("cnt").cast("double")) * wbin
    val aggCols = taus.map { case (l, _) =>
      max(when(col("lbl") === l, col("ap"))).as(s"approx_$l") }
    val approx = sel.withColumn("ap", round(est, 4))
      .groupBy(col("l_returnflag"))
      .agg(aggCols.head, aggCols.tail: _*)
    val exact = T.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75, 0.95))").as("eq"))
      .select(Seq(col("l_returnflag")) ++
        Seq("25" -> 1, "50" -> 2, "75" -> 3, "95" -> 4).map { case (p, i) =>
          round(element_at(col("eq"), i), 4).as(s"exact_p$p") }: _*)
    approx.join(exact, Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
  }

  // Same histogram replayed in DuckDB: identical integer binning,
  // identical interpolation parenthesization; window SUM casts through
  // DOUBLE only at comparison/arithmetic points (DuckDB widens to
  // HUGEINT where Spark stays long — values never exceed 2^53 so the
  // double images coincide).
  private val q34Sql =
    """WITH li AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS vi FROM lineitem),
      |st AS (SELECT l_returnflag, MIN(vi) AS mn, MAX(vi) AS mx, COUNT(*) AS n
      |       FROM li GROUP BY 1),
      |hist AS (
      |  SELECT l.l_returnflag, ((l.vi - s.mn) * 128) // (s.mx - s.mn + 1) AS bin,
      |    COUNT(*) AS cnt
      |  FROM li l JOIN st s ON l.l_returnflag = s.l_returnflag GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, bin, cnt,
      |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
      |  FROM hist),
      |tt AS (SELECT * FROM (VALUES
      |  ('p25', CAST(0.25 AS DOUBLE)), ('p50', CAST(0.5 AS DOUBLE)),
      |  ('p75', CAST(0.75 AS DOUBLE)), ('p95', CAST(0.95 AS DOUBLE))) AS t(lbl, tau)),
      |tgt AS (
      |  SELECT s.l_returnflag, s.mn, s.mx, tt.lbl,
      |    tt.tau * CAST(s.n - 1 AS DOUBLE) + 1.0 AS t
      |  FROM st s CROSS JOIN tt),
      |sel AS (
      |  SELECT g.l_returnflag, g.mn, g.mx, g.lbl, g.t, c.bin, c.cnt,
      |    c.cum - c.cnt AS cum_prev,
      |    row_number() OVER (PARTITION BY g.l_returnflag, g.lbl ORDER BY c.bin) AS rn
      |  FROM tgt g JOIN cum c ON g.l_returnflag = c.l_returnflag
      |  WHERE CAST(c.cum AS DOUBLE) >= g.t),
      |est AS (
      |  SELECT l_returnflag, lbl,
      |    round((CAST(mn AS DOUBLE)
      |        + CAST(bin AS DOUBLE) * (CAST(mx - mn + 1 AS DOUBLE) / 128.0))
      |      + ((t - CAST(cum_prev AS DOUBLE)) / CAST(cnt AS DOUBLE))
      |        * (CAST(mx - mn + 1 AS DOUBLE) / 128.0), 4) AS ap
      |  FROM sel WHERE rn = 1),
      |apx AS (
      |  SELECT l_returnflag,
      |    MAX(CASE WHEN lbl = 'p25' THEN ap END) AS approx_p25,
      |    MAX(CASE WHEN lbl = 'p50' THEN ap END) AS approx_p50,
      |    MAX(CASE WHEN lbl = 'p75' THEN ap END) AS approx_p75,
      |    MAX(CASE WHEN lbl = 'p95' THEN ap END) AS approx_p95
      |  FROM est GROUP BY 1),
      |ex AS (
      |  SELECT l_returnflag,
      |    ROUND(quantile_cont(l_quantity, 0.25), 4) AS exact_p25,
      |    ROUND(quantile_cont(l_quantity, 0.50), 4) AS exact_p50,
      |    ROUND(quantile_cont(l_quantity, 0.75), 4) AS exact_p75,
      |    ROUND(quantile_cont(l_quantity, 0.95), 4) AS exact_p95
      |  FROM lineitem GROUP BY 1)
      |SELECT a.l_returnflag, a.approx_p25, a.approx_p50, a.approx_p75, a.approx_p95,
      |  x.exact_p25, x.exact_p50, x.exact_p75, x.exact_p95
      |FROM apx a JOIN ex x ON a.l_returnflag = x.l_returnflag
      |ORDER BY a.l_returnflag""".stripMargin

  // -- q35: SCD-2 history build (validity intervals via lead) --------------
  // RDW keeps full import history; a latest-state row plus effective
  // ranges is the standard warehouse shape. valid_to = next change's
  // date (null = current), one window pass.
  private val q35: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"),
        (lead(col("o_orderdate"), 1).over(w).isNull).as("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
  }

  private val q35Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER w AS valid_to,
      |  lead(o_orderdate) OVER w IS NULL AS is_current
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin

  // -- q36: as-of join via the custom AsOfJoinExec SparkPlan ---------------
  // Same semantics and oracle as q22, but planned through graft's
  // sort-merge as-of operator (AsOfJoinPlan/Strategy/Exec) instead of
  // the composed union+window — the oracle certifies the custom
  // physical operator end-to-end.
  private val q36: Q = (s, d) => {
    val ev = T.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts")
    Operators.asOfJoinNative(purchases, errors, key = "user_id",
        leftTime = "ts", rightTime = "ts", rightCols = Seq("ts"))
      .withColumnRenamed("asof_ts", "last_error_ts")
      .select("user_id", "event_id", "ts", "value", "last_error_ts")
      .orderBy("event_id")
  }

  // -- q37: reconciliation report (import vs migrate consistency) ----------
  // RDW's Task Service generates a daily import reconciliation report
  // (reference /root/reference/docs/Architecture.md "Task Service");
  // here: orders⇄lineitem referential consistency + volume counts, via
  // two anti-join probes unioned with totals.
  private val q37: Q = (s, d) => {
    val o = T.orders(s, d); val l = T.lineitem(s, d)
    val orphanOrders = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).select(lit("orders_without_items").as("check_name"), col("cnt"))
    val orphanItems = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).select(lit("items_without_order").as("check_name"), col("cnt"))
    val totals = o.agg(count(lit(1)).as("cnt")).select(lit("total_orders").as("check_name"), col("cnt"))
      .union(l.agg(count(lit(1)).as("cnt")).select(lit("total_items").as("check_name"), col("cnt")))
    orphanOrders.union(orphanItems).union(totals).orderBy(col("check_name"))
  }

  private val q37Sql =
    """SELECT 'orders_without_items' AS check_name, COUNT(*) AS cnt FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |UNION ALL
      |SELECT 'items_without_order' AS check_name, COUNT(*) AS cnt FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'total_orders' AS check_name, COUNT(*) AS cnt FROM orders
      |UNION ALL
      |SELECT 'total_items' AS check_name, COUNT(*) AS cnt FROM lineitem
      |ORDER BY check_name""".stripMargin

  // -- q38: set operations — cohort retention/churn (import diff) ----------
  // RDW's migrate step diffs the imported state against the reporting
  // mart to decide inserts/updates/deletes (reference
  // /root/reference/docs/Runbook.md "migrate"); the set-op shape:
  // INTERSECT = unchanged/retained keys, EXCEPT each way = churned vs
  // acquired. Distinct key sets shuffle once each; the set ops are
  // key-only semi/anti-style comparisons, no payload duplication.
  private val q38: Q = (s, d) => {
    val o = T.orders(s, d)
    def cohort(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("custkey")).distinct()
    val a = cohort(1995); val b = cohort(1996)
    a.intersect(b).withColumn("cohort", lit("retained"))
      .union(a.except(b).withColumn("cohort", lit("churned")))
      .union(b.except(a).withColumn("cohort", lit("acquired")))
      .select(col("cohort"), col("custkey"))
      .orderBy(col("cohort"), col("custkey"))
  }

  private val q38Sql =
    """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995),
      |     b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996)
      |SELECT 'retained' AS cohort, custkey FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
      |UNION ALL
      |SELECT 'churned' AS cohort, custkey FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
      |UNION ALL
      |SELECT 'acquired' AS cohort, custkey FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
      |ORDER BY cohort, custkey""".stripMargin

  // -- q39: ntile quartile bands per group (percentile-band report) --------
  // RDW reports band students into quartiles/quintiles per org (reference
  // /root/reference/docs/Norms.md percentile bands). ntile over a TOTAL
  // order (balance, then unique key) is deterministic and both engines
  // implement the SQL-standard remainder distribution. One shuffle on
  // the partition key; the band agg reuses the window's partitioning.
  private val q39: Q = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    T.customer(s, d)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("c_nationkey"), col("quartile"))
      .agg(count(lit(1)).as("cnt"), moneyAvg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("c_nationkey"), col("quartile"))
  }

  private val q39Sql =
    s"""SELECT c_nationkey, quartile, COUNT(*) AS cnt,
       |  ${sqlMoneyAvg("c_acctbal")} AS avg_bal
       |FROM (SELECT c_nationkey, c_acctbal,
       |        CAST(ntile(4) OVER (PARTITION BY c_nationkey
       |          ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
       |      FROM customer)
       |GROUP BY c_nationkey, quartile
       |ORDER BY c_nationkey, quartile""".stripMargin

  // -- q40: soft-delete migrate (tombstone-aware latest-wins) --------------
  // RDW bulk-deletes exams by marking deleted=1 in the warehouse and
  // letting migrate drop them from the marts (reference
  // /root/reference/docs/Runbook.BulkDeleteExams.md:32-33,104). The
  // orders log is treated as the per-customer change stream: each
  // order is a new version of that customer's latest exam, status 'F'
  // plays the tombstone. Split into a "current" batch and an
  // "updates" batch to exercise the real migrate path — the result
  // must equal latest-wins over the full log with tombstones dropped
  // AFTER the merge (dropping before would resurrect prior versions).
  private val q40: Q = (s, d) => {
    val base = T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), (col("o_orderstatus") === "F").as("deleted"))
    val current = base.filter(col("o_orderdate") < to_date(lit("1996-01-01")))
    val updates = base.filter(col("o_orderdate") >= to_date(lit("1996-01-01")))
    Operators.migrateWithDeletes(current, updates,
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .orderBy(col("o_custkey"))
  }

  private val q40Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |    (o_orderstatus = 'F') AS deleted,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1 AND NOT deleted
      |ORDER BY o_custkey""".stripMargin

  // -- q41: norms interval-overlap validation ------------------------------
  // Loading a percentile table whose [start_date, end_date] overlaps
  // an existing one for the same assessment is a validation error
  // (reference /root/reference/docs/Norms.md:31 "the date ranges for a
  // given assessment may not overlap"). Each order models a 30-day
  // norms window per customer; the operator reports the offending
  // pairs. Self-join on the entity key — fan-out bounded by
  // versions-per-entity, no cartesian.
  private val q41: Q = (s, d) => {
    val intervals = T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("start_date"),
        date_add(col("o_orderdate"), 30).as("end_date"))
    Operators.overlappingIntervals(intervals, key = "o_custkey",
        id = "o_orderkey", start = "start_date", end = "end_date")
      .orderBy(col("o_custkey"), col("a_id"), col("b_id"))
  }

  private val q41Sql =
    """WITH iv AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_date,
      |              CAST(o_orderdate AS DATE) + 30 AS end_date FROM orders)
      |SELECT a.o_custkey, a.o_orderkey AS a_id, b.o_orderkey AS b_id,
      |  a.start_date AS a_start, a.end_date AS a_end,
      |  b.start_date AS b_start, b.end_date AS b_end
      |FROM iv a JOIN iv b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      | AND a.start_date <= b.end_date AND b.start_date <= a.end_date
      |ORDER BY a.o_custkey, a_id, b_id""".stripMargin

  // -- q42: audit change-log diff (old vs new values per change) -----------
  // RDW audits exam/student modifications and documents querying
  // who-changed-what with the old and new values (reference
  // /root/reference/docs/Runbook.Audit.md:1-15). lag over the natural
  // key's version order; rows where any tracked value changed survive
  // with (old_, new_) pairs — the WHAT to q35's SCD-2 WHEN.
  private val q42: Q = (s, d) =>
    Operators.auditDiff(
        T.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
        keys = Seq("o_custkey"),
        versionCols = Seq("o_orderdate", "o_orderkey"),
        tracked = Seq("o_totalprice", "o_orderstatus"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))

  private val q42Sql =
    """SELECT o_custkey, o_orderdate, o_orderkey,
      |  old_o_totalprice, o_totalprice AS new_o_totalprice,
      |  old_o_orderstatus, o_orderstatus AS new_o_orderstatus
      |FROM (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
      |    lag(o_totalprice) OVER w AS old_o_totalprice,
      |    lag(o_orderstatus) OVER w AS old_o_orderstatus,
      |    lag(1) OVER w AS has_prior
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |WHERE has_prior IS NOT NULL
      |  AND (old_o_totalprice IS DISTINCT FROM o_totalprice
      |       OR old_o_orderstatus IS DISTINCT FROM o_orderstatus)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // -- q43: student-group batch replace ------------------------------------
  // A new group file REPLACES the whole membership — members absent
  // from the new file are removed (reference
  // /root/reference/docs/StudentGroups.md batch-replace semantics).
  // Current membership and the incoming file are both modeled from
  // customer; the query is the replace reconciliation report
  // (added / removed / kept per member). Full-outer join on
  // (group, member) — key-only payloads.
  private val q43: Q = (s, d) => {
    val c = T.customer(s, d)
    val current = c.filter(col("c_acctbal") > 5000)
      .select(col("c_mktsegment"), col("c_custkey"))
    val incoming = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_mktsegment"), col("c_custkey"))
    Operators.groupReplace(current, incoming, "c_mktsegment", "c_custkey")
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  private val q43Sql =
    """WITH inc AS (SELECT c_mktsegment, c_custkey FROM customer WHERE c_custkey % 3 = 0),
      |     cur AS (SELECT c_mktsegment, c_custkey FROM customer WHERE c_acctbal > 5000
      |             AND c_mktsegment IN (SELECT c_mktsegment FROM inc))
      |SELECT COALESCE(cur.c_mktsegment, inc.c_mktsegment) AS c_mktsegment,
      |       COALESCE(cur.c_custkey, inc.c_custkey) AS c_custkey,
      |       CASE WHEN cur.c_custkey IS NULL THEN 'added'
      |            WHEN inc.c_custkey IS NULL THEN 'removed'
      |            ELSE 'kept' END AS action
      |FROM cur FULL OUTER JOIN inc
      |  ON cur.c_mktsegment = inc.c_mktsegment AND cur.c_custkey = inc.c_custkey
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // -- q44: embargo / report-availability gate -----------------------------
  // Results are visible only once their embargo is Released (status 2)
  // — reference /root/reference/docs/Runbook.ManualDataModifications.md
  // :23-30. Settings are derived per school year here (year % 3 plays
  // the admin-set status); the engine path exercises the broadcast
  // left-join + visibility gate, the oracle states the released set
  // directly.
  private val q44: Q = (s, d) => {
    val o = T.orders(s, d).withColumn("school_year", year(col("o_orderdate")))
    val settings = o.select(col("school_year")).distinct()
      .withColumn("embargo", pmod(col("school_year"), lit(3)))
    Operators.embargoFilter(o, settings, Seq("school_year"), "embargo",
        visibleStatuses = Seq(2))
      .groupBy(col("school_year"))
      .agg(count(lit(1)).as("visible_results"))
      .orderBy(col("school_year"))
  }

  private val q44Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS school_year,
      |  COUNT(*) AS visible_results
      |FROM orders WHERE year(o_orderdate) % 3 = 2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q45: missing-data (field completeness) report -----------------------
  // RDW ships a missing_data_report that computes, per administration
  // year and assessment, the percent of results with each functionally-
  // required-but-technically-optional field populated (reference
  // /root/reference/docs/Runbook.DataSpecifications.md:96-128).
  // o_orderpriority's '4-NOT SPECIFIED' is the unpopulated sentinel
  // here. Integer counts divided in ONE IEEE division then rounded —
  // bit-identical across engines (same policy as q13).
  private val q45: Q = (s, d) =>
    T.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast(IntegerType)
          .as("test_administration_year"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("total_results"),
        round(lit(100.0) *
          sum(when(col("o_orderpriority") =!= "4-NOT SPECIFIED", 1L)
            .otherwise(0L)) / count(lit(1)), 4).as("pct_with_priority"))
      .orderBy(col("test_administration_year"), col("o_orderstatus"))

  private val q45Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS test_administration_year,
      |  o_orderstatus, COUNT(*) AS total_results,
      |  round(100.0 * CAST(SUM(CASE WHEN o_orderpriority <> '4-NOT SPECIFIED'
      |    THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*), 4) AS pct_with_priority
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q46: stable pseudonymization (de-identification) --------------------
  // "StudentIdentifier may be de-identified but must be the same year
  // over year" (reference /root/reference/docs/Runbook.DataSpecifications
  // .md:18): pseudonyms must be deterministic so longitudinal joins
  // still work after de-identification. Salted SHA-256 of the natural
  // key — map-only, layout-independent, and the grouping across years
  // below IS the year-over-year joinability proof (one pseudo_id per
  // customer regardless of year).
  private val q46: Q = (s, d) =>
    T.orders(s, d)
      .withColumn("pseudo_id",
        sha2(concat(lit("tenant1|"), col("o_custkey").cast(StringType)), 256))
      .groupBy(col("pseudo_id"),
        year(col("o_orderdate")).cast(IntegerType).as("school_year"))
      .agg(count(lit(1)).as("n_results"))
      .orderBy(col("pseudo_id"), col("school_year"))

  private val q46Sql =
    """SELECT sha256('tenant1|' || CAST(o_custkey AS VARCHAR)) AS pseudo_id,
      |  CAST(year(o_orderdate) AS INTEGER) AS school_year,
      |  COUNT(*) AS n_results
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q47: incremental aggregate maintenance ------------------------------
  // RDW's Migrate OLAP keeps the aggregate mart current by applying
  // deltas, not recomputing (reference /root/reference/docs/
  // Architecture.md "watches the data warehouse for changes and
  // copies any changes"; Runbook.ImportMigrate.md). The engine
  // property that makes this sound: the mart stores ALGEBRAIC partial
  // aggregates (exact decimal sum + count), so merging a delta batch
  // is a re-aggregation of partials — work scales with |delta| + |mart|,
  // never the 100-TB fact history. The oracle is the full recompute;
  // hash-equality IS the maintenance-correctness proof. Derived
  // measures (avg) come from merged partials at read time.
  private val q47: Q = (s, d) => {
    val o = T.orders(s, d).withColumn("school_year",
      year(col("o_orderdate")).cast(IntegerType))
    val cut = to_timestamp(lit("1997-01-01"))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("school_year"), col("o_orderstatus"))
      .agg(sum(money(col("o_totalprice"))).as("sum_price_dec"),
        count(lit(1)).as("n_results"))
    val stored = partials(o.filter(col("o_orderdate") < cut))   // the mart
    val delta = partials(o.filter(col("o_orderdate") >= cut))   // the changes
    stored.unionByName(delta)
      .groupBy(col("school_year"), col("o_orderstatus"))
      .agg(sum(col("sum_price_dec")).as("merged_dec"),
        sum(col("n_results")).as("n_results"))
      .select(col("school_year"), col("o_orderstatus"),
        col("merged_dec").cast(DoubleType).as("sum_price"),
        col("n_results"),
        (col("merged_dec").cast(DoubleType) / col("n_results")).as("avg_price"))
      .orderBy(col("school_year"), col("o_orderstatus"))
  }

  private val q47Sql =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS school_year, o_orderstatus,
       |  ${sqlMoneySum("o_totalprice")} AS sum_price,
       |  COUNT(*) AS n_results,
       |  ${sqlMoneyAvg("o_totalprice")} AS avg_price
       |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q48: payload-hash idempotent import ---------------------------------
  // "Import payloads are hashed and duplicate content is detected,
  // returning any previous import request for the given content"
  // (reference /root/reference/docs/API.md:263) — resubmitting a
  // payload must no-op and map to the original import. Each order
  // plays an import request whose payload hash is the exam content;
  // the earliest import per hash is the canonical one. One window
  // shuffle on the hash; the hash itself is map-side, so detection
  // cost is q16's latest-wins shape.
  private val q48: Q = (s, d) => {
    val w = Window.partitionBy(col("payload_hash"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(s, d)
      .withColumn("payload_hash", md5(concat_ws("|",
        col("o_custkey").cast(StringType), col("o_orderstatus"),
        col("o_orderpriority"))))
      .withColumn("first_import_id", first(col("o_orderkey")).over(w))
      .withColumn("is_duplicate", col("first_import_id") =!= col("o_orderkey"))
      .select(col("o_orderkey"), col("payload_hash"),
        col("first_import_id"), col("is_duplicate"))
      .orderBy(col("o_orderkey"))
  }

  private val q48Sql =
    """SELECT o_orderkey,
      |  md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
      |    o_orderpriority)) AS payload_hash,
      |  first_value(o_orderkey) OVER w AS first_import_id,
      |  first_value(o_orderkey) OVER w <> o_orderkey AS is_duplicate
      |FROM orders
      |WINDOW w AS (PARTITION BY md5(concat_ws('|', CAST(o_custkey AS VARCHAR),
      |  o_orderstatus, o_orderpriority)) ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // -- q49: claim-score summary per org -------------------------------------
  // RDW exams carry per-claim scale scores and performance levels, with
  // the levels "depend[ing] on the subject being pre-configured with its
  // claim scores" (reference /root/reference/docs/Runbook.BulkDeleteExams
  // .md:30 — exam_score holds the Opportunity's claims ScaleScore and
  // PerformanceLevel; cut points come from subject config, Runbook
  // .ImportMigrate.md:20 item_difficulty_cuts). Lineitem rows play the
  // claim scores (l_linenumber 1..4 = claim index, l_extendedprice =
  // scale score); the claim-specific cut-point table is the subject
  // config, broadcast onto the fact scan; output is the claim score
  // summary the aggregate service renders — per org × claim: count,
  // money-exact average score, % at/above standard.
  //
  // Scale: cut points are config (4 rows, broadcast — a map-side
  // CASE); the summary is ONE partial-aggregated shuffle keyed
  // (org, claim) — 25×4 cells. Same shape at 100 TB.
  /** The claim cut-point payload q49 ingests — the assessment-package
    * (tabulator CSV) shape of API.md:693; inlined so the query stays a
    * pure (spark, dir) function while still exercising the strict
    * package-config parse end-to-end. */
  private[graft] val q49ClaimConfigCsv: String =
    """claim,cut_low,cut_high
      |1,25000.0,45000.0
      |2,30000.0,50000.0
      |3,35000.0,55000.0
      |4,40000.0,60000.0""".stripMargin

  /** The same cut-point config as a subject-definition XML payload
    * (reference /root/reference/deploy/Math_subject.xml shape): claims
    * ride the file's native (key, cut_low, cut_high) pair element —
    * ItemDifficulty — whose three-band semantics (below moderateLowEnd
    * / below difficultLowEnd / above) are exactly the claim-level
    * CASE. IngestSpec proves this path yields the identical config
    * frame as the tabulator CSV path. */
  private[graft] val q49SubjectXml: String =
    """<Subject code="Math" name="Math">
      |  <AssessmentTypes>
      |    <AssessmentType code="sum" name="Summative" longName="Summative Assessment">
      |      <OverallScoring name="Overall" minScore="1000" maxScore="3500">
      |        <PerformanceLevels standardCutoff="3">
      |          <PerformanceLevel level="1" name="Level 1" shortName="Level 1" color="maroon"/>
      |          <PerformanceLevel level="2" name="Level 2" shortName="Level 2" color="gray-darkest"/>
      |          <PerformanceLevel level="3" name="Level 3" shortName="Level 3" color="green-dark"/>
      |          <PerformanceLevel level="4" name="Level 4" shortName="Level 4" color="blue-dark"/>
      |        </PerformanceLevels>
      |      </OverallScoring>
      |      <ClaimScoring name="Claim">
      |        <PerformanceLevels>
      |          <PerformanceLevel level="1" name="Below Standard" shortName="Below" color="sb-iab-red"/>
      |          <PerformanceLevel level="2" name="Near Standard" shortName="Near" color="sb-iab-yellow"/>
      |          <PerformanceLevel level="3" name="Above Standard" shortName="Above" color="sb-iab-green"/>
      |        </PerformanceLevels>
      |      </ClaimScoring>
      |    </AssessmentType>
      |  </AssessmentTypes>
      |  <ItemDifficulties>
      |    <ItemDifficulty gradeCode="01" moderateLowEnd="25000.0" difficultLowEnd="45000.0"/>
      |    <ItemDifficulty gradeCode="02" moderateLowEnd="30000.0" difficultLowEnd="50000.0"/>
      |    <ItemDifficulty gradeCode="03" moderateLowEnd="35000.0" difficultLowEnd="55000.0"/>
      |    <ItemDifficulty gradeCode="04" moderateLowEnd="40000.0" difficultLowEnd="60000.0"/>
      |  </ItemDifficulties>
      |</Subject>""".stripMargin

  /** q49's cut config sourced from the subject XML — identical frame
    * to `parseClaimConfigCsv(q49ClaimConfigCsv)` (spec-asserted), so
    * either config channel drives the same hash-exact report. */
  private[graft] def q49CutsFromXml(s: SparkSession): DataFrame =
    graft.sources.Ingest.subjectItemDifficulties(s, q49SubjectXml)
      .select(col("grade_code").cast(IntegerType).as("claim"),
        col("moderate_low_end").as("cut_low"),
        col("difficult_low_end").as("cut_high"))

  private val q49: Q = (s, d) => {
    // config arrives through the package-processor ingest path — the
    // subject-definition XML (FAILFAST from_xml parse of the
    // Math_subject.xml shape); the tabulator CSV path
    // (Ingest.parseClaimConfigCsv) yields the same frame, spec-proven
    val cuts = q49CutsFromXml(s)
    T.lineitem(s, d)
      .filter(col("l_linenumber") <= 4)
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(cuts), col("l_linenumber") === col("claim"))
      .withColumn("level", when(col("l_extendedprice") < col("cut_low"), 1)
        .when(col("l_extendedprice") < col("cut_high"), 2).otherwise(3))
      .groupBy(col("n_name"), col("claim"))
      .agg(count(lit(1)).as("n_scores"),
        round(QUtil.moneyAvg(col("l_extendedprice")), 4).as("avg_score"),
        round(lit(100.0) * sum(when(col("level") >= 2, 1L).otherwise(0L)) /
          count(lit(1)), 4).as("pct_at_above"))
      .orderBy(col("n_name"), col("claim"))
  }

  private val q49Sql =
    s"""WITH cuts AS (SELECT * FROM (VALUES
      |  (1, 25000.0, 45000.0), (2, 30000.0, 50000.0),
      |  (3, 35000.0, 55000.0), (4, 40000.0, 60000.0)) AS t(claim, cut_low, cut_high)),
      |scored AS (
      |  SELECT n_name, l_linenumber AS claim, l_extendedprice,
      |    CASE WHEN l_extendedprice < cut_low THEN 1
      |         WHEN l_extendedprice < cut_high THEN 2 ELSE 3 END AS level
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN cuts ON l_linenumber = claim
      |  WHERE l_linenumber <= 4)
      |SELECT n_name, claim, COUNT(*) AS n_scores,
      |  ROUND(${QUtil.sqlMoneyAvg("l_extendedprice")}, 4) AS avg_score,
      |  ROUND(100.0 * CAST(SUM(CASE WHEN level >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    / COUNT(*), 4) AS pct_at_above
      |FROM scored GROUP BY n_name, claim
      |ORDER BY n_name, claim""".stripMargin

  // -- q50: norms import rank-row/identity structural validation -----------
  // Every norms CSV load runs the Norms.md:32-36 row-structure checks
  // and gates the WHOLE import on the result ("No percentile tables
  // are loaded if there are any errors", Norms.md:37) — the engine
  // validated interval overlap (q41) but not row structure until now.
  // The import file is modeled from orders: percentile table id =
  // o_orderpriority, global file position = o_orderkey, rank/score
  // from order fields (naturally non-monotonic → real rank/score/
  // contiguity violations); the identity field derives from the table
  // key so identity_mismatch stays a spec-covered class rather than
  // data noise. One window pass per table — see
  // [[Operators.validateNormsImport]].
  private val q50: Q = (s, d) => {
    val file = T.orders(s, d)
      .filter(col("o_orderkey") % 64 === 0)
      .select(col("o_orderpriority").as("assessment_id"),
        col("o_orderkey").as("line_no"),
        (col("o_orderkey") % 97).cast("int").as("percentile_rank"),
        col("o_totalprice").as("score"),
        substring(col("o_orderpriority"), 1, 1).as("subject_code"))
    Operators.validateNormsImport(file, Seq("assessment_id"), "line_no",
        Seq("subject_code"), "percentile_rank", "score")
      .orderBy(col("assessment_id"), col("line_no"), col("violation"))
  }

  private val q50Sql =
    """WITH file AS (
      |  SELECT o_orderpriority AS assessment_id, o_orderkey AS line_no,
      |    CAST(o_orderkey % 97 AS INTEGER) AS percentile_rank,
      |    o_totalprice AS score,
      |    substr(o_orderpriority, 1, 1) AS subject_code
      |  FROM orders WHERE o_orderkey % 64 = 0),
      |flags AS (
      |  SELECT assessment_id, line_no,
      |    lag(line_no) OVER w IS NOT NULL AS has_prev,
      |    lag(percentile_rank) OVER w AS prev_pr, percentile_rank,
      |    lag(score) OVER w AS prev_sc, score,
      |    first_value(subject_code) OVER w AS first_subj, subject_code,
      |    min(line_no) OVER t AS tbl_min, max(line_no) OVER t AS tbl_max,
      |    count(*) OVER t AS tbl_cnt
      |  FROM file
      |  WINDOW w AS (PARTITION BY assessment_id ORDER BY line_no),
      |         t AS (PARTITION BY assessment_id))
      |SELECT assessment_id, line_no, violation FROM (
      |  SELECT assessment_id, line_no, 'missing_required_field' AS violation
      |  FROM flags WHERE percentile_rank IS NULL OR score IS NULL
      |  UNION ALL
      |  SELECT assessment_id, line_no, 'rank_not_increasing'
      |  FROM flags WHERE has_prev AND prev_pr IS NOT NULL AND percentile_rank <= prev_pr
      |  UNION ALL
      |  SELECT assessment_id, line_no, 'score_decreasing'
      |  FROM flags WHERE has_prev AND prev_sc IS NOT NULL AND score < prev_sc
      |  UNION ALL
      |  SELECT assessment_id, line_no, 'identity_mismatch'
      |  FROM flags WHERE has_prev AND subject_code <> first_subj
      |  UNION ALL
      |  SELECT assessment_id, line_no, 'too_few_ranks'
      |  FROM flags WHERE line_no = tbl_min AND tbl_cnt < 3
      |  UNION ALL
      |  SELECT assessment_id, line_no, 'table_not_contiguous'
      |  FROM flags WHERE line_no = tbl_min AND tbl_max - tbl_min + 1 <> tbl_cnt)
      |ORDER BY assessment_id, line_no, violation""".stripMargin

  // -- q51: ART organization sync (daily upsert-diff) ----------------------
  // The Task Service "synchronizes organization data from ART (daily)"
  // (reference /root/reference/docs/Runbook.md:199, Architecture.md
  // "Task Service"): an incoming org snapshot diffs against the current
  // hierarchy into a create/update/no-op decision per org plus the
  // applied latest state — q43's full-outer reconcile shape with q42's
  // attribute-change detection. Orgs modeled from customer (org id,
  // name, parent = nation, type = segment); the incoming snapshot
  // omits some orgs (→ retain) and resyncs some attributes (→ update).
  //
  // Scale: one full-outer shuffle on org_id; attribute compare is
  // map-side. Org registries are dimension-sized, but the same plan
  // holds if they weren't.
  private val q51: Q = (s, d) => {
    val cur = T.customer(s, d).filter(col("c_custkey") % 10 =!= 0)
      .select(col("c_custkey").as("org_id"), col("c_name").as("cur_name"),
        col("c_nationkey").as("cur_parent"), col("c_mktsegment").as("cur_type"))
    val inc = T.customer(s, d).filter(col("c_custkey") % 9 =!= 4)
      .select(col("c_custkey").as("org_id"), col("c_name").as("inc_name"),
        col("c_nationkey").as("inc_parent"),
        when(col("c_custkey") % 7 === 0, lit("RESYNCED"))
          .otherwise(col("c_mktsegment")).as("inc_type"))
    cur.join(inc, Seq("org_id"), "full_outer")
      .withColumn("decision",
        when(col("cur_name").isNull, lit("create"))
          .when(col("inc_name").isNull, lit("retain"))
          .when(col("cur_name") =!= col("inc_name") ||
            col("cur_parent") =!= col("inc_parent") ||
            col("cur_type") =!= col("inc_type"), lit("update"))
          .otherwise(lit("noop")))
      .select(col("org_id"), col("decision"),
        coalesce(col("inc_name"), col("cur_name")).as("org_name"),
        coalesce(col("inc_parent"), col("cur_parent")).as("parent_id"),
        coalesce(col("inc_type"), col("cur_type")).as("org_type"))
      .orderBy(col("org_id"))
  }

  private val q51Sql =
    """WITH cur AS (
      |  SELECT c_custkey AS org_id, c_name AS cur_name,
      |    c_nationkey AS cur_parent, c_mktsegment AS cur_type
      |  FROM customer WHERE c_custkey % 10 <> 0),
      |inc AS (
      |  SELECT c_custkey AS org_id, c_name AS inc_name,
      |    c_nationkey AS inc_parent,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'RESYNCED' ELSE c_mktsegment END AS inc_type
      |  FROM customer WHERE c_custkey % 9 <> 4)
      |SELECT COALESCE(cur.org_id, inc.org_id) AS org_id,
      |  CASE WHEN cur_name IS NULL THEN 'create'
      |       WHEN inc_name IS NULL THEN 'retain'
      |       WHEN cur_name <> inc_name OR cur_parent <> inc_parent
      |            OR cur_type <> inc_type THEN 'update'
      |       ELSE 'noop' END AS decision,
      |  COALESCE(inc_name, cur_name) AS org_name,
      |  COALESCE(inc_parent, cur_parent) AS parent_id,
      |  COALESCE(inc_type, cur_type) AS org_type
      |FROM cur FULL OUTER JOIN inc ON cur.org_id = inc.org_id
      |ORDER BY org_id""".stripMargin

  /** The accessibility-configuration payload q52 ingests (reference
    * /root/reference/docs/API.md:622 — XML raw body); codes map onto
    * the event stream's type values, with 'error' deliberately
    * unregistered to exercise the unknown-code validation bucket. */
  private val q52AccommodationsXml: String =
    """<AccessibilityConfig>
      |  <Accommodation code="click" description="pointer input"/>
      |  <Accommodation code="view" description="screen magnification"/>
      |  <Accommodation code="purchase" description="extended time"/>
      |  <Accommodation code="signup" description="text to speech"/>
      |</AccessibilityConfig>""".stripMargin

  // -- q52: accommodations ingest + frequency report -----------------------
  // The Accommodations entity (API.md:622): ingest the code registry
  // (XML payload → Ingest.parseAccommodationsXml), validate result
  // codes against it (unregistered codes land in an UNKNOWN bucket
  // instead of dropping rows), and report per-code frequency: result
  // count, distinct students, share of all results.
  //
  // Scale: registry is broadcast (it is a config payload); one
  // partial-agg shuffle on the code; the share window runs over the
  // aggregated frame (rows = #codes, not #results).
  private val q52: Q = (s, d) => {
    val registry = graft.sources.Ingest
      .parseAccommodationsXml(s, q52AccommodationsXml)
    val ev = T.events(s, d)
    ev.join(broadcast(registry), ev("event_type") === registry("code"), "left")
      .select(
        coalesce(col("code"), lit("UNKNOWN")).as("acc_code"),
        coalesce(col("description"), lit("unregistered code")).as("acc_desc"),
        col("user_id"))
      .groupBy(col("acc_code"), col("acc_desc"))
      .agg(count(lit(1)).as("n_results"),
        countDistinct(col("user_id")).as("n_students"))
      // unrounded: one IEEE division of exactly-representable operands
      // is bit-identical across engines, while round(x,4) can diverge
      // on a .00005 half-boundary (HALF_UP vs half-even — the q54 fix)
      .withColumn("pct_of_results",
        lit(100.0) * col("n_results") /
          sum(col("n_results")).over(Window.partitionBy()))
      .orderBy(col("acc_code"))
  }

  private val q52Sql =
    """WITH registry AS (SELECT * FROM (VALUES
      |  ('click', 'pointer input'), ('view', 'screen magnification'),
      |  ('purchase', 'extended time'), ('signup', 'text to speech'))
      |  AS t(code, description)),
      |tagged AS (
      |  SELECT COALESCE(code, 'UNKNOWN') AS acc_code,
      |    COALESCE(description, 'unregistered code') AS acc_desc, user_id
      |  FROM events LEFT JOIN registry ON event_type = code),
      |agg AS (
      |  SELECT acc_code, acc_desc, COUNT(*) AS n_results,
      |    COUNT(DISTINCT user_id) AS n_students
      |  FROM tagged GROUP BY 1, 2)
      |SELECT acc_code, acc_desc, n_results, n_students,
      |  CAST(100.0 AS DOUBLE) * n_results / SUM(n_results) OVER () AS pct_of_results
      |FROM agg ORDER BY acc_code""".stripMargin

  // -- q53: resubmit unprocessed results (daily task) ----------------------
  // The Task Service's third daily duty: "Resubmitting unprocessed
  // test results (daily)" (reference /root/reference/docs/
  // Runbook.md:199) — q51 covers org sync and q37 the reconciliation
  // report. Import requests modeled from orders: a non-final status
  // ('F' = fully processed) that has aged past the stuck threshold
  // (30 days before the newest request in the system — "now" must be
  // data-derived to stay replayable) is selected for resubmission,
  // oldest first.
  //
  // Scale: one agg to a scalar (the reference clock), broadcast back
  // over a pushdown-friendly filtered scan — no shuffle of the fact
  // table beyond the output sort.
  private val q53: Q = (s, d) => {
    val clock = T.orders(s, d).agg(max(col("o_orderdate")).as("as_of"))
    T.orders(s, d)
      .filter(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(clock))
      .withColumn("age_days", datediff(col("as_of"), col("o_orderdate")))
      .filter(col("age_days") > 30)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("age_days"))
      .orderBy(col("age_days").desc, col("o_orderkey"))
  }

  private val q53Sql =
    """WITH clock AS (SELECT max(o_orderdate) AS as_of FROM orders)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(as_of AS DATE)) AS INTEGER) AS age_days
      |FROM orders, clock
      |WHERE o_orderstatus <> 'F'
      |  AND date_diff('day', CAST(o_orderdate AS DATE), CAST(as_of AS DATE)) > 30
      |ORDER BY age_days DESC, o_orderkey""".stripMargin

  // -- q54: target report with configured exclusions -----------------------
  // Target-level aggregate reporting (reference /root/reference/docs/
  // Runbook.SystemConfiguration.md:150 "Target Exclusions"): targets
  // are the finer grain under claims, and coverage-poor targets are
  // EXCLUDED via a configured (assessment, target) table, on top of
  // the structural restrictions — summative assessments only, claim-1
  // targets only ("target reports are only available for summative
  // assessments, only claim 1 math targets are included"). Modeled:
  // assessment = p_brand, claim = l_linenumber, target = supplier mod
  // 10, summative = urgent priority.
  //
  // Scale: the exclusion table is config-sized → broadcast LEFT ANTI,
  // so the fact table never shuffles for the exclusion; one
  // partial-agg shuffle on (assessment, target).
  /** The target-exclusion config payload (reference
    * /root/reference/docs/Runbook.SystemConfiguration.md:150 "Target
    * Exclusions" — admin-configured per-assessment target list),
    * ingested through the same strict FAILFAST config contract as
    * q49's package CSV so the "configured" claim is exercised
    * end-to-end rather than via an inline literal frame. */
  private[graft] val q54ExclusionCsv: String =
    """ex_brand,ex_target
      |Brand#45,3
      |Brand#51,7
      |Brand#12,0""".stripMargin

  private val q54: Q = (s, d) => {
    val exclusions = graft.sources.Ingest.parseConfigCsv(s, q54ExclusionCsv,
      StructType.fromDDL("ex_brand string not null, ex_target int not null"))
    T.lineitem(s, d)
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("o_orderpriority") === "1-URGENT") // summative only
      .filter(col("l_linenumber") === 1)             // claim 1 only
      .withColumn("target", (col("l_suppkey") % 10).cast("int"))
      .join(broadcast(exclusions),
        col("p_brand") === col("ex_brand") && col("target") === col("ex_target"),
        "left_anti")
      .groupBy(col("p_brand"), col("target"))
      // unrounded: the exact-decimal sum divided once is bit-identical
      // across engines, while round(x,4) diverged on a half-boundary
      // at sf0.1 (56875.42575 -> .4257 vs .4258)
      .agg(count(lit(1)).as("n_scores"),
        QUtil.moneyAvg(col("l_extendedprice")).as("avg_score"))
      .orderBy(col("p_brand"), col("target"))
  }

  private val q54Sql =
    s"""WITH ex AS (SELECT * FROM (VALUES
      |  ('Brand#45', 3), ('Brand#51', 7), ('Brand#12', 0)) AS t(ex_brand, ex_target)),
      |facts AS (
      |  SELECT p_brand, CAST(l_suppkey % 10 AS INTEGER) AS target, l_extendedprice
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE o_orderpriority = '1-URGENT' AND l_linenumber = 1)
      |SELECT p_brand, target, COUNT(*) AS n_scores,
      |  ${QUtil.sqlMoneyAvg("l_extendedprice")} AS avg_score
      |FROM facts
      |WHERE NOT EXISTS (SELECT 1 FROM ex
      |  WHERE ex_brand = p_brand AND ex_target = target)
      |GROUP BY p_brand, target
      |ORDER BY p_brand, target""".stripMargin

  // ========================================================================
  // Item-level exam results (q55–q57) — the exam_item data family:
  // RDW stores per-item attributes and responses in `exam_item`, with
  // items pre-loaded from the assessment package and mapped to
  // common-core standards (`item_common_core_standard`) and other
  // targets (`item_other_target`) — reference /root/reference/docs/
  // Runbook.BulkDeleteExams.md:28 (exam_item), :202-204 (the item →
  // standard/target mapping tables in the delete cascade), and
  // Runbook.DataSpecifications.md:51 (TRTs carry optional ExamItems).
  // Model on the testdata: exam = orders (o_orderkey, student =
  // o_custkey), exam_item = lineitem (exam_id = l_orderkey, item_id =
  // l_partkey, position = l_linenumber, item score = l_quantity, full
  // credit at >= 30 — q13's threshold), item dim = part
  // (item_common_core_standard derived as CCSS.<first word of
  // p_type>.<p_size mod 4 + 1>; item_other_target as p_size mod 10).

  /** The item → common-core-standard mapping, derived deterministically
    * from the item dim (split_part/substring_index agree across
    * engines on single-space-delimited p_type). */
  private def itemStandard = concat(lit("CCSS."),
    substring_index(col("p_type"), " ", 1), lit("."),
    (col("p_size") % 4 + 1).cast(IntegerType))

  // -- q55: per-item difficulty / response distribution --------------------
  // The item-statistics report teachers drill into: response count,
  // average item score, % full credit, and a difficulty band per item.
  //
  // Scale: lineitem pre-aggregates to item grain BELOW the dim join
  // (q03's trick — the join then moves one row per ITEM, not one per
  // response), and the item dim broadcasts (plan-asserted): the fact
  // table shuffles once, on the item key.
  private val q55: Q = (s, d) => {
    val perItem = T.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_responses"),
        moneyAvg(col("l_quantity")).as("avg_score"),
        sum(when(col("l_quantity") >= 30, 1L).otherwise(0L)).as("n_full"))
    perItem
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("pct_full_credit",
        lit(100.0) * col("n_full") / col("n_responses"))
      .select(col("l_partkey").as("item_id"), col("p_brand").as("asmt"),
        col("n_responses"), col("avg_score"), col("pct_full_credit"),
        when(col("pct_full_credit") < 25.0, "hard")
          .when(col("pct_full_credit") < 60.0, "moderate")
          .otherwise("easy").as("difficulty"))
      .orderBy(col("item_id"))
  }

  private val q55Sql =
    s"""WITH per_item AS (
       |  SELECT l_partkey, COUNT(*) AS n_responses,
       |    ${sqlMoneyAvg("l_quantity")} AS avg_score,
       |    SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS n_full
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT l_partkey AS item_id, p_brand AS asmt, n_responses, avg_score,
       |  CAST(100.0 AS DOUBLE) * n_full / n_responses AS pct_full_credit,
       |  CASE WHEN CAST(100.0 AS DOUBLE) * n_full / n_responses < 25.0 THEN 'hard'
       |       WHEN CAST(100.0 AS DOUBLE) * n_full / n_responses < 60.0 THEN 'moderate'
       |       ELSE 'easy' END AS difficulty
       |FROM per_item JOIN part ON l_partkey = p_partkey
       |ORDER BY item_id""".stripMargin

  // -- q56: item → standard rollup -----------------------------------------
  // Aggregate item results up the standards hierarchy (q09's rollup
  // shape on item_common_core_standard): per (standard, item) plus the
  // per-standard and grand-total levels.
  //
  // Scale: responses pre-aggregate to item grain below the broadcast
  // dim join (decimal partials re-aggregate exactly through ROLLUP's
  // Expand — sums add); the rollup shuffle then moves item-grain rows.
  private val q56: Q = (s, d) => {
    // partials stay DECIMAL through the rollup (a double here would
    // make the re-aggregation order-dependent); cast at the end only
    val perItem = T.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(money(col("l_quantity"))).as("s"))
    perItem
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("standard", itemStandard)
      .rollup(col("standard"), col("l_partkey").as("item_id"))
      .agg(sum(col("n")).as("n_responses"),
        sum(col("s")).cast(DoubleType).as("sum_score"))
      .orderBy(col("standard").asc_nulls_first, col("item_id").asc_nulls_first)
  }

  private val q56Sql =
    """WITH per_item AS (
      |  SELECT l_partkey, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s
      |  FROM lineitem GROUP BY l_partkey),
      |mapped AS (
      |  SELECT 'CCSS.' || split_part(p_type, ' ', 1) || '.'
      |           || CAST(p_size % 4 + 1 AS INTEGER) AS standard,
      |    l_partkey AS item_id, n, s
      |  FROM per_item JOIN part ON l_partkey = p_partkey)
      |SELECT standard, item_id, CAST(SUM(n) AS BIGINT) AS n_responses,
      |  CAST(SUM(s) AS DOUBLE) AS sum_score
      |FROM mapped GROUP BY ROLLUP (standard, item_id)
      |ORDER BY standard ASC NULLS FIRST, item_id ASC NULLS FIRST""".stripMargin

  // -- q57: student item-level drill-down ----------------------------------
  // The "student-responses" UI query: every item response of one
  // student's exams, with item metadata and the standard/target
  // mappings joined in.
  //
  // Scale: the student's exams are a pushdown-filtered handful →
  // broadcast; lineitem is probed map-only by the broadcast hash join
  // (no fact shuffle at all), and the item dim broadcasts too. The
  // response rows for ONE student are UI-sized at any corpus scale.
  private val q57: Q = (s, d) => {
    val exams = T.orders(s, d).filter(col("o_custkey") === 7)
    T.lineitem(s, d)
      .join(broadcast(exams), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("student_id"), col("o_orderkey").as("exam_id"),
        col("o_orderdate").as("exam_date"), col("l_linenumber").as("position"),
        col("l_partkey").as("item_id"), col("p_brand").as("asmt"),
        money(col("l_quantity")).cast(DoubleType).as("score"),
        (col("l_quantity") >= 30).as("full_credit"),
        itemStandard.as("standard"),
        (col("p_size") % 10).cast(IntegerType).as("target"))
      .orderBy(col("exam_id"), col("position"))
  }

  private val q57Sql =
    """SELECT o_custkey AS student_id, o_orderkey AS exam_id,
      |  o_orderdate AS exam_date, l_linenumber AS position,
      |  l_partkey AS item_id, p_brand AS asmt,
      |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS score,
      |  l_quantity >= 30 AS full_credit,
      |  'CCSS.' || split_part(p_type, ' ', 1) || '.'
      |    || CAST(p_size % 4 + 1 AS INTEGER) AS standard,
      |  CAST(p_size % 10 AS INTEGER) AS target
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE o_custkey = 7
      |ORDER BY exam_id, position""".stripMargin

  // -- q58: instructional resource links -----------------------------------
  // Admin-managed per-assessment/performance-level resource URLs joined
  // into reports (reference /root/reference/docs/Runbook.md:275 Admin
  // Service "instructional resource links", Architecture.md "Admin").
  // The link table is admin CONFIG → it arrives through the strict
  // config-CSV contract and broadcasts; levels from q18-style cut
  // bucketing. A level with no configured resource keeps its report
  // row (LEFT join) with a NULL url — the UI hides the link, the
  // report never loses data.
  //
  // Scale: one partial-agg shuffle on (asmt, level); the config join
  // runs broadcast AFTER aggregation (#asmt × #levels rows, not facts).
  private[graft] val q58ResourceCsv: String =
    """asmt,level,resource_url
      |Brand#13,1,https://resources.example.org/b13/remediation
      |Brand#13,3,https://resources.example.org/b13/enrichment
      |Brand#42,2,https://resources.example.org/b42/practice""".stripMargin

  private val q58: Q = (s, d) => {
    val resources = graft.sources.Ingest.parseConfigCsv(s, q58ResourceCsv,
      StructType.fromDDL("asmt string not null, level int not null, resource_url string not null"))
    val leveled = T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("level",
        when(col("l_quantity") < 20, 1).when(col("l_quantity") < 40, 2).otherwise(3))
      .groupBy(col("p_brand").as("asmt"), col("level"))
      .agg(count(lit(1)).as("n_results"))
    leveled
      .join(broadcast(resources), Seq("asmt", "level"), "left")
      .select(col("asmt"), col("level"), col("n_results"), col("resource_url"))
      .orderBy(col("asmt"), col("level"))
  }

  private val q58Sql =
    """WITH resources AS (SELECT * FROM (VALUES
      |  ('Brand#13', 1, 'https://resources.example.org/b13/remediation'),
      |  ('Brand#13', 3, 'https://resources.example.org/b13/enrichment'),
      |  ('Brand#42', 2, 'https://resources.example.org/b42/practice'))
      |  AS t(asmt, level, resource_url)),
      |leveled AS (
      |  SELECT p_brand AS asmt,
      |    CASE WHEN l_quantity < 20 THEN 1 WHEN l_quantity < 40 THEN 2 ELSE 3 END AS level,
      |    COUNT(*) AS n_results
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2)
      |SELECT l.asmt, l.level, l.n_results, r.resource_url
      |FROM leveled l LEFT JOIN resources r ON l.asmt = r.asmt AND l.level = r.level
      |ORDER BY l.asmt, l.level""".stripMargin

  // -- q59: item discrimination (item-total correlation) -------------------
  // The classic item-statistics report alongside q55's difficulty:
  // per item, the Pearson correlation between the item score and the
  // exam TOTAL score (point-biserial shape) — items that don't track
  // the total are flagged for review. Standard psychometrics over the
  // exam_item grain the reference stores (Runbook.BulkDeleteExams
  // .md:28).
  //
  // Exactness: scores are integral, so every sufficient statistic
  // (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT on both engines;
  // the correlation is then a fixed sequence of IEEE ops on exact
  // inputs — bit-identical. Zero-variance items emit NULL (decided on
  // the exact integer variance, not a float compare). At warehouse
  // scale the sums move to DECIMAL (same plan; long range covers
  // ~1e14 score-units² here).
  //
  // Scale: two passes over the fact at item/exam grain — exam totals
  // (1 shuffle on the exam key), join back (the totals frame is
  // already partitioned by the join key), then one shuffle of
  // six-long partials per item. No window, no driver math.
  private val q59: Q = (s, d) => {
    val x = col("l_quantity").cast(LongType)
    // Stats-based per-query partition pin — the measured fix for the
    // 100× spill, localized (the global initialPartitionNum lever
    // fixed q59's 60M-row run but tripled the sf0.1 shingle
    // self-joins, so it stays a deployment knob while q59 sizes its
    // own exchanges). Cores-sized partitions spill on this query's
    // two fact shuffles at ~3.75M fact rows/core (measured: 25.9 s at
    // 60M rows/16 threads; pinned 8×cores partitions → 15.3 s); below
    // ~400k rows/core pinning COSTS instead — the explicit
    // repartition adds a full-fact exchange where AQE's
    // broadcast-totals plan needs none (measured at 10×: 3.6 s
    // unpinned vs 4.7 s pinned). The threshold sits between the two
    // measured regimes at 1M rows/core, ~4× under the spill point.
    // The row count is parquet footer metadata (driver-side,
    // no scan job) — the table-statistics read every cost-based
    // planner does. When pinned, the repartition satisfies both the
    // totals aggregate's and the join-back's required distribution
    // (each branch column-prunes its own copy), and an explicit
    // partition count is exempt from AQE coalescing by design —
    // that is the pin.
    val cores = s.sparkContext.defaultParallelism
    val pin = T.parquetRowCount(s, s"$d/lineitem.parquet") > 1000000L * cores
    val base = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), x.as("x"))
    val items =
      if (pin) base.repartition(8 * cores, col("l_orderkey")) else base
    val totals = items.groupBy(col("l_orderkey"))
      .agg(sum(col("x")).as("y"))
    val stats = items.join(totals, "l_orderkey")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val varx = col("n") * col("sxx") - col("sx") * col("sx")
    val vary = col("n") * col("syy") - col("sy") * col("sy")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    stats
      .select(col("l_partkey").as("item_id"), col("n").as("n_responses"),
        when(varx === 0L || vary === 0L, lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType) /
            (sqrt(varx.cast(DoubleType)) * sqrt(vary.cast(DoubleType))))
          .as("discrimination"))
      .orderBy(col("item_id"))
  }

  private val q59Sql =
    """WITH items AS (
      |  SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS x
      |  FROM lineitem),
      |totals AS (SELECT l_orderkey, CAST(SUM(x) AS BIGINT) AS y
      |           FROM items GROUP BY l_orderkey),
      |stats AS (
      |  SELECT l_partkey, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM items JOIN totals USING (l_orderkey)
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS item_id, n AS n_responses,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS discrimination
      |FROM stats ORDER BY item_id""".stripMargin

  // -- q60: school-year purge audit ----------------------------------------
  // The documented "Delete School Year" runbook procedure (reference
  // /root/reference/docs/Runbook.BulkDeleteExams.md "Delete School
  // Year"): purging a year cascades across the item/assessment tables
  // (item_other_target → item_common_core_standard → item → asmt) and
  // the exam tables (exam_item → exam), and the procedure's
  // post-validation step COUNTS each table before/after ("Count the
  // number of records and compare"). This query IS that audit: one
  // row per cascade table with rows_before / rows_deleted /
  // rows_after for the purge year. Exam year = year(o_orderdate);
  // the assessment (brand) carries the year (modeled as 1992 +
  // min-partkey mod 7) and ITEMS CASCADE FROM THEIR ASSESSMENT — a
  // purged asmt deletes all of its items, never a subset, so the
  // emitted counts are ones a referential cascade can actually
  // produce. The item mapping tables are 1:1 with items (q56's
  // derived standard, q57's target) and share ONE scan+aggregate,
  // exploded into their three audit rows.
  //
  // Scale: four count-aggregates (each one partial-agg shuffle of a
  // single row) unioned — the audit touches no payload columns, so
  // every scan prunes to the key/date column it counts on; the asmt
  // year dim (|brands| rows) broadcasts onto the item scan.
  private val q60: Q = (s, d) => {
    val purgeYear = 1995
    def row(table: String, df: DataFrame, deleted: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("rows_before"),
          sum(when(deleted, 1L).otherwise(0L)).as("rows_deleted"))
        .select(lit(table).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    val exams = T.orders(s, d)
    val examYear = year(col("o_orderdate")) === purgeYear
    val examItems = T.lineitem(s, d)
      .join(exams.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val items = T.part(s, d)
    val asmts = items.groupBy(col("p_brand"))
      .agg((lit(1992) + min(col("p_partkey")) % 7).as("asmt_year"))
    val asmtDel = col("asmt_year") === purgeYear
    val itemsWithYear = items.select(col("p_brand"))
      .join(broadcast(asmts), Seq("p_brand"))
    val itemRows = itemsWithYear
      .agg(count(lit(1)).as("rows_before"),
        sum(when(asmtDel, 1L).otherwise(0L)).as("rows_deleted"))
      .select(explode(array(lit("1_item_other_target"),
          lit("2_item_common_core_standard"), lit("3_item"))).as("table_name"),
        col("rows_before"), col("rows_deleted"),
        (col("rows_before") - col("rows_deleted")).as("rows_after"))
    itemRows
      .unionByName(row("4_asmt", asmts, asmtDel))
      .unionByName(row("5_exam_item", examItems, examYear))
      .unionByName(row("6_exam", exams, examYear))
      .orderBy(col("table_name"))
  }

  private val q60Sql =
    """WITH ey AS (SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) = 1995 AS del
      |           FROM orders),
      |ay AS (SELECT p_brand, 1992 + min(p_partkey) % 7 AS asmt_year
      |       FROM part GROUP BY p_brand),
      |ic AS (SELECT COUNT(*) AS rows_before,
      |         CAST(SUM(CASE WHEN ay.asmt_year = 1995 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS rows_deleted
      |       FROM part JOIN ay USING (p_brand)),
      |rows_ AS (
      |  SELECT t.table_name, ic.rows_before, ic.rows_deleted
      |  FROM ic CROSS JOIN (VALUES ('1_item_other_target'),
      |    ('2_item_common_core_standard'), ('3_item')) AS t(table_name)
      |  UNION ALL
      |  SELECT '4_asmt', COUNT(*),
      |    CAST(SUM(CASE WHEN asmt_year = 1995 THEN 1 ELSE 0 END) AS BIGINT) FROM ay
      |  UNION ALL
      |  SELECT '5_exam_item', COUNT(*),
      |    CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem JOIN ey ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT '6_exam', COUNT(*),
      |    CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) FROM ey)
      |SELECT table_name, rows_before, rows_deleted,
      |  rows_before - rows_deleted AS rows_after
      |FROM rows_ ORDER BY table_name""".stripMargin

  // -- q68: duplicate-organization detection + guarded cleanup -------------
  // The documented "Duplicate Schools" incident workflow (reference
  // /root/reference/docs/Troubleshooting.md:360): ART sync creates
  // malformed org records whose natural id carries the SCHOOL id in
  // the district slot and '0000000' in the school slot; the runbook's
  // detection query matches each bad record to its real counterpart
  // by substring (bad's first 7 chars = real's last 7), and the
  // cleanup DELETE is guarded — only unreferenced records may go
  // (`NOT EXISTS` probes; the reference checks exams and student
  // groups — both collapse to reference-probes, modeled as the exam
  // probe). Registry modeled from supplier: well-formed ids are
  // district(7)||school(7); the s_suppkey % 5 subset has a malformed
  // twin, and the % 10 subset of those is still referenced by exams
  // (the "Pioneer High" rows that had accumulated results and must
  // NOT be auto-deleted).
  //
  // Scale: the registry is dim-sized → broadcast both sides of the
  // substring self-join; exam counts pre-aggregate the fact table per
  // org key (1 partial-agg shuffle) before the probe join.
  private val q68: Q = (s, d) => {
    val real = T.supplier(s, d).select(
      concat(lpad(col("s_nationkey").cast("string"), 7, "0"),
        lpad(col("s_suppkey").cast("string"), 7, "0")).as("org_id"),
      col("s_name").as("org_name"),
      col("s_suppkey").as("exam_key"))
    val badTwins = T.supplier(s, d).filter(col("s_suppkey") % 5 === 0).select(
      concat(lpad(col("s_suppkey").cast("string"), 7, "0"), lit("0000000")).as("org_id"),
      col("s_name").as("org_name"),
      when(col("s_suppkey") % 10 === 0, col("s_suppkey")).as("exam_key"))
    val registry = real.unionByName(badTwins)
    val bad = registry.filter(substring(col("org_id"), 8, 7) === "0000000")
      .select(col("org_id").as("bad_id"), col("org_name").as("bad_name"),
        col("exam_key"))
    val good = registry.filter(substring(col("org_id"), 8, 7) =!= "0000000")
      .select(col("org_id").as("real_id"), col("org_name").as("real_name"))
    val perOrg = T.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    bad
      .join(broadcast(good),
        substring(col("bad_id"), 1, 7) === substring(col("real_id"), 8, 7))
      .join(perOrg, col("exam_key") === col("l_suppkey"), "left")
      .withColumn("exam_count", coalesce(col("n"), lit(0L)))
      .withColumn("decision",
        when(col("exam_count") > 0, lit("keep_referenced")).otherwise(lit("delete")))
      .select(col("bad_id"), col("bad_name"), col("real_id"), col("real_name"),
        col("exam_count"), col("decision"))
      .orderBy(col("bad_id"))
  }

  private val q68Sql =
    """WITH reg AS (
      |  SELECT lpad(CAST(s_nationkey AS VARCHAR), 7, '0')
      |      || lpad(CAST(s_suppkey AS VARCHAR), 7, '0') AS org_id,
      |    s_name AS org_name, s_suppkey AS exam_key
      |  FROM supplier
      |  UNION ALL
      |  SELECT lpad(CAST(s_suppkey AS VARCHAR), 7, '0') || '0000000',
      |    s_name, CASE WHEN s_suppkey % 10 = 0 THEN s_suppkey END
      |  FROM supplier WHERE s_suppkey % 5 = 0),
      |bad AS (SELECT org_id AS bad_id, org_name AS bad_name, exam_key
      |        FROM reg WHERE substr(org_id, 8, 7) = '0000000'),
      |good AS (SELECT org_id AS real_id, org_name AS real_name
      |         FROM reg WHERE substr(org_id, 8, 7) <> '0000000'),
      |per_org AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
      |SELECT bad_id, bad_name, real_id, real_name,
      |  COALESCE(n, 0) AS exam_count,
      |  CASE WHEN COALESCE(n, 0) > 0 THEN 'keep_referenced' ELSE 'delete' END AS decision
      |FROM bad
      |JOIN good ON substr(bad_id, 1, 7) = substr(real_id, 8, 7)
      |LEFT JOIN per_org ON exam_key = l_suppkey
      |ORDER BY bad_id""".stripMargin

  // -- q69: writing trait scores (per-item trait distribution) -------------
  // The writing-trait-scores report (reference /root/reference/docs/
  // Runbook.Localization.md:133,195 — the "item-writing-trait-score"
  // and "writing-trait-scores" UI components): extended-writing items
  // carry per-trait points (evidence / organization / conventions)
  // alongside the item score, reported per item × trait. The
  // per-response trait columns UNPIVOT into (trait, points) rows —
  // the inverse of q08's pivot, a map-side Expand, no shuffle — then
  // one partial-agg on (item, trait). Trait points derive from the
  // response measures; the conventions derivation rounds l_discount
  // ×100 FIRST on both engines (the raw double sits within 1e-12 of
  // an integer, so HALF_UP-vs-half-even cannot diverge, while a bare
  // int cast would: Spark truncates 5.999..9 to 5, DuckDB rounds to
  // 6).
  //
  // Scale: output bounded by item catalog × 3 traits regardless of
  // response volume; the unpivot triples rows map-side BEFORE the
  // partial agg, so the one shuffle still ships ≤ cells per task.
  private val q69: Q = (s, d) => {
    val wer = T.lineitem(s, d).filter(col("l_partkey") % 7 === 0)
      .select(col("l_partkey").as("item_id"),
        (col("l_quantity").cast("long") % 5).cast("int").as("evidence"),
        (col("l_linenumber") % 5).cast("int").as("organization"),
        (round(col("l_discount") * 100).cast("long") % 3).cast("int").as("conventions"))
    wer.unpivot(
        Array(col("item_id")),
        Array(col("evidence"), col("organization"), col("conventions")),
        "trait", "points")
      .groupBy(col("item_id"), col("trait"))
      .agg(count(lit(1)).as("n_scored"),
        // unrounded single IEEE division of exact ints (q52/q54 policy)
        (sum(col("points")).cast(DoubleType) / count(lit(1))).as("avg_points"),
        sum(when(col("points") === 0, 1L).otherwise(0L)).as("n_zero"))
      .orderBy(col("item_id"), col("trait"))
  }

  private val q69Sql =
    """WITH wer AS (
      |  SELECT l_partkey AS item_id,
      |    CAST(CAST(l_quantity AS BIGINT) % 5 AS INTEGER) AS evidence,
      |    CAST(l_linenumber % 5 AS INTEGER) AS organization,
      |    CAST(CAST(round(l_discount * 100) AS BIGINT) % 3 AS INTEGER) AS conventions
      |  FROM lineitem WHERE l_partkey % 7 = 0),
      |tr AS (
      |  SELECT item_id, 'evidence' AS trait, evidence AS points FROM wer
      |  UNION ALL
      |  SELECT item_id, 'organization', organization FROM wer
      |  UNION ALL
      |  SELECT item_id, 'conventions', conventions FROM wer)
      |SELECT item_id, trait, COUNT(*) AS n_scored,
      |  CAST(CAST(SUM(points) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_points,
      |  CAST(SUM(CASE WHEN points = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      |FROM tr GROUP BY item_id, trait
      |ORDER BY item_id, trait""".stripMargin

  // -- q70: ingest-pipeline regression tests -------------------------------
  // The Pipeline script system (reference /root/reference/docs/
  // Runbook.Pipeline.md): admin-authored pre-process scripts are
  // VERSIONED, each pipeline points at its active_version (or none),
  // and the `pipeline_test` table (:119 "Database") holds
  // example_input → expected_output regression rows the UI runs
  // before a version can be published. This query IS that harness:
  // resolve each pipeline's active script (version 2 = the documented
  // bankKey remap fix-up, version 1 = identity, none = tests are
  // skipped), apply it to every test's example_input, and report
  // pass / fail / skipped per test with the actual-output hash as the
  // audit trail. The pipeline/pipeline_test fixtures model WAREHOUSE
  // TABLES (admin UI writes rows; the reference defines no file-ingest
  // contract for them — unlike config CSV/XML payloads, which ride
  // Ingest.parseConfigCsv/parseAccommodationsXml here), so inline
  // frames are the honest model.
  //
  // Scale: both fixture tables are admin-sized; the transform is the
  // same codegen'd regexp_replace the ingest path runs map-side over
  // payloads — this harness costs #tests rows.
  private val q70: Q = (s, d) => {
    import s.implicits._
    val pipelines = Seq(
      ("exam", "xml", Some(2)), ("assessment", "csv", Option.empty[Int]))
      .toDF("code", "input_type", "active_version")
    val tests = Seq(
      ("exam", "remap_simple",
        """<Item bankKey="200" key="5"/>""", """<Item bankKey="7829" key="5"/>"""),
      ("exam", "remap_other_value",
        """<Item bankKey="300" key="6"/>""", """<Item bankKey="300" key="6"/>"""),
      ("exam", "quote_aware",
        """<Item name="a>b" bankKey="200"/>""", """<Item name="a>b" bankKey="7829"/>"""),
      ("exam", "other_element_untouched",
        """<Other bankKey="200"/>""", """<Other bankKey="200"/>"""),
      ("exam", "stale_expectation",
        """<Item bankKey="200" x="1"/>""", """<Item bankKey="200" x="1"/>"""),
      ("exam", "hyphen_element_untouched",
        """<Item-foo bankKey="200"/>""", """<Item-foo bankKey="200"/>"""),
      ("exam", "hyphen_attr_untouched",
        """<Item data-bankKey="200"/>""", """<Item data-bankKey="200"/>"""),
      ("assessment", "header_fix",
        "id,name\n1,x", "id,name\n1,x"))
      .toDF("pipeline_code", "test_name", "example_input", "expected_output")
    val remap = graft.sources.Ingest.xmlAttributeRemap("Item", "bankKey", "200", "7829")
    tests
      .join(broadcast(pipelines), col("pipeline_code") === col("code"), "left")
      .withColumn("actual",
        when(col("active_version") === 2, remap(col("example_input")))
          .when(col("active_version") === 1, col("example_input")))
      .withColumn("status",
        when(col("active_version").isNull, lit("skipped"))
          .when(col("actual") === col("expected_output"), lit("pass"))
          .otherwise(lit("fail")))
      .select(col("pipeline_code"), col("test_name"), col("status"),
        md5(col("actual")).as("actual_hash"))
      .orderBy(col("pipeline_code"), col("test_name"))
  }

  private val q70Sql =
    """WITH pipelines AS (SELECT * FROM (VALUES
      |  ('exam', 'xml', 2), ('assessment', 'csv', NULL))
      |  AS t(code, input_type, active_version)),
      |tests AS (SELECT * FROM (VALUES
      |  ('exam', 'remap_simple',
      |   '<Item bankKey="200" key="5"/>', '<Item bankKey="7829" key="5"/>'),
      |  ('exam', 'remap_other_value',
      |   '<Item bankKey="300" key="6"/>', '<Item bankKey="300" key="6"/>'),
      |  ('exam', 'quote_aware',
      |   '<Item name="a>b" bankKey="200"/>', '<Item name="a>b" bankKey="7829"/>'),
      |  ('exam', 'other_element_untouched',
      |   '<Other bankKey="200"/>', '<Other bankKey="200"/>'),
      |  ('exam', 'stale_expectation',
      |   '<Item bankKey="200" x="1"/>', '<Item bankKey="200" x="1"/>'),
      |  ('exam', 'hyphen_element_untouched',
      |   '<Item-foo bankKey="200"/>', '<Item-foo bankKey="200"/>'),
      |  ('exam', 'hyphen_attr_untouched',
      |   '<Item data-bankKey="200"/>', '<Item data-bankKey="200"/>'),
      |  ('assessment', 'header_fix',
      |   'id,name' || chr(10) || '1,x', 'id,name' || chr(10) || '1,x'))
      |  AS t(pipeline_code, test_name, example_input, expected_output)),
      |run AS (
      |  SELECT pipeline_code, test_name, expected_output, active_version,
      |    CASE WHEN active_version = 2 THEN
      |      regexp_replace(example_input,
      |        '(<Item\s(?:(?:[^>"]|"[^"]*")*\s)?bankKey=")200(")', '\17829\2', 'g')
      |    WHEN active_version = 1 THEN example_input END AS actual
      |  FROM tests LEFT JOIN pipelines ON pipeline_code = code)
      |SELECT pipeline_code, test_name,
      |  CASE WHEN active_version IS NULL THEN 'skipped'
      |       WHEN actual = expected_output THEN 'pass'
      |       ELSE 'fail' END AS status,
      |  md5(actual) AS actual_hash
      |FROM run
      |ORDER BY pipeline_code, test_name""".stripMargin

  // -- q71: sandbox data-set generation ------------------------------------
  // Sandboxes are "simulation environment[s] with generated data"
  // (reference /root/reference/docs/Architecture.md "Multi-Tenancy";
  // Runbook.MultiTenancy.md "Creating Sandbox Data Sets" documents the
  // generator pipeline: subject/assessment definitions + an
  // institution hierarchy → generated test results). This query IS
  // that generator, warehouse-style: every (student, assessment) pair
  // from the real dims passes a salted-md5 admission test (t07's
  // deterministic sampling idiom — reproducible across runs and
  // partitionings, unlike rand()), admitted pairs get a hash-derived
  // scale score in the subject's [2000, 2800) range and a performance
  // level from the q18 cut-point class. Deterministic ⇒ the generated
  // data set is itself oracle-exact — a sandbox can be regenerated
  // bit-identically from its configuration.
  //
  // Scale: generation is a broadcast cross join over two dims with
  // map-side hashing — zero shuffles before the output sort; at
  // warehouse scale the student dim partitions and the assessment
  // side broadcasts, so generating billions of results is
  // embarrassingly parallel.
  private val q71: Q = (s, d) => {
    val students = T.customer(s, d).select(col("c_custkey").as("student_id"))
    // the offered catalog is a few dozen assessments (a student sits a
    // handful per year, not the whole part table) — the brand + size
    // predicate models the package selection the generator is fed
    val asmts = T.part(s, d)
      .filter(col("p_brand") === "Brand#13" && col("p_size") <= 10)
      .select(col("p_partkey").as("asmt_id"))
    // The draw hash is the engine's replayable affine-mod-prime
    // family (d04/d05's construction — pure integer arithmetic, a
    // plain SQL expression in DuckDB): an md5-based draw measured
    // 5–6 s at sf0.1 because ~2M hex-string hashes dominate the
    // generation, while the affine draw is a handful of integer ops
    // per pair (1.4 s in-suite, same admission rate). Constants are fixed
    // splitmix64-derived literals < p = 1e9+7; products stay < 2^63.
    // Pair enumeration is explode-over-a-collected-catalog rather
    // than a cross JOIN: a filter below a BroadcastNestedLoopJoin is
    // pushed into the join CONDITION, where Spark evaluates it with
    // an interpreted per-pair predicate — Generate → Filter → Project
    // stay inside one whole-stage-codegen stage instead.
    val P = 1000000007L
    val h = (lit(736338717L) * col("student_id")
      + lit(564123457L) * col("asmt_id") + lit(285577155L)) % P
    // integral h div 10 without Spark's double division: (h − h%10)/10
    // divides an exact multiple of 10 (quotient < 2^27 ⇒ the double is
    // exact), so the cast back to long is exact on both engines
    val score = (lit(2000) + ((h - h % 10) / 10).cast("long") % 800).cast("int")
    val asmtArr = asmts.agg(collect_list(col("asmt_id")).as("asmt_ids"))
    students.crossJoin(broadcast(asmtArr))
      .select(col("student_id"), explode(col("asmt_ids")).as("asmt_id"))
      .filter(h % 10 === 0) // ~10% admission, deterministic
      .select(col("student_id"), col("asmt_id"),
        score.as("score"),
        when(score < 2300, 1).when(score < 2500, 2)
          .when(score < 2650, 3).otherwise(4).as("perf_level"))
      .orderBy(col("student_id"), col("asmt_id"))
  }

  private val q71Sql =
    """WITH students AS (SELECT c_custkey AS student_id FROM customer),
      |a AS (SELECT p_partkey AS asmt_id FROM part
      |      WHERE p_brand = 'Brand#13' AND p_size <= 10),
      |p AS (
      |  SELECT student_id, asmt_id,
      |    (736338717 * student_id + 564123457 * asmt_id + 285577155)
      |      % 1000000007 AS h
      |  FROM students, a)
      |SELECT student_id, asmt_id,
      |  CAST(2000 + (h // 10) % 800 AS INTEGER) AS score,
      |  CASE WHEN 2000 + (h // 10) % 800 < 2300 THEN 1
      |       WHEN 2000 + (h // 10) % 800 < 2500 THEN 2
      |       WHEN 2000 + (h // 10) % 800 < 2650 THEN 3
      |       ELSE 4 END AS perf_level
      |FROM p WHERE h % 10 = 0
      |ORDER BY student_id, asmt_id""".stripMargin

  // -- q72: Bloom runtime filter (replayable) ------------------------------
  // The classic big-join reduction: before shuffling a 100-TB fact
  // table into a join, broadcast a COMPACT membership summary of the
  // dim side and discard non-matching fact rows map-side (Spark's AQE
  // injects this as "runtime bloom filters"; d09's broadcast bench
  // index is the same asymmetry). Spark's built-in bloom_filter_agg
  // uses an engine-private hash, so this operator builds the filter
  // from first principles on the replayable affine-mod-prime family:
  // k=3 affine bucket draws into m=4096 bits, the occupied-bit set
  // materialized as a ≤m-row table that broadcasts, fact rows probe
  // it with three O(1) broadcast-hash-join lookups. The report
  // quantifies the technique honestly: rows pruned, false positives
  // that survive to the exact join, and the false-positive rate among
  // true non-members (one IEEE division of exact ints).
  //
  // Scale: the bit string is 4 KB regardless of data; probing is
  // map-side codegen; only bloom-passing rows reach the exact
  // semi-join — the summary row is the proof of how few that is.
  private val q72: Q = (s, d) => {
    val m = 4096
    val P = 1000000007L
    // three independent affine draws (splitmix64-derived constants)
    val A = Seq(902395121L, 657812387L, 398291747L)
    val B = Seq(193877777L, 846210293L, 554433221L)
    def bucket(key: org.apache.spark.sql.Column, i: Int) =
      (lit(A(i)) * key + lit(B(i))) % P % m
    val dimKeys = T.part(s, d).filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey").as("k"))
    // the occupied-bit set (≤ m rows, a few KB) — a Bloom bit array
    // does not know which hash set a bit, so ONE distinct table
    // serves all three probes. Shipping it as a per-row 4 KB bit
    // STRING measured 12 s at sf0.1 (a broadcast crossJoin copies the
    // string into every fact row, and building it via a
    // transform×array_contains HOF is interpreted); three broadcast
    // hash joins against the bit table are O(1) hash probes per row
    // inside codegen — the shape Spark's own runtime filters lower
    // to (1.0 s at sf0.1, same result).
    val bitsT = dimKeys
      .select(explode(array((0 until 3).map(i => bucket(col("k"), i)): _*)).as("bit"))
      .distinct()
    // three broadcast-hash probes + the exact membership join, as
    // DataFrame joins (no session temp views: fixed-name views are
    // shared catalog state — concurrent invocations would race)
    val probed = (0 until 3)
      .foldLeft(T.lineitem(s, d).select(col("l_partkey"))) { (f, i) =>
        f.join(broadcast(bitsT.select(col("bit").as(s"bit$i"))),
          bucket(col("l_partkey"), i) === col(s"bit$i"), "left")
      }
      .join(broadcast(dimKeys), col("l_partkey") === col("k"), "left")
      .select(
        (col("bit0").isNotNull && col("bit1").isNotNull &&
          col("bit2").isNotNull).as("pass"),
        col("k").isNotNull.as("member"))
    probed
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("pass") && col("member"), 1L).otherwise(0L)).as("n_true"))
      .select(col("n_fact"), col("n_pass"), col("n_true"),
        (col("n_pass") - col("n_true")).as("n_false_pos"),
        (col("n_fact") - col("n_pass")).as("n_pruned"),
        ((col("n_pass") - col("n_true")).cast("double") /
          (col("n_fact") - col("n_true"))).as("fp_rate"))
  }

  private val q72Sql =
    """WITH dim AS (SELECT p_partkey AS k FROM part WHERE p_brand = 'Brand#13'),
      |bits AS (
      |  SELECT DISTINCT (a * k + b) % 1000000007 % 4096 AS bit
      |  FROM dim, (VALUES (902395121, 193877777), (657812387, 846210293),
      |                    (398291747, 554433221)) AS t(a, b)),
      |probed AS (
      |  SELECT l_partkey,
      |    EXISTS (SELECT 1 FROM bits WHERE bit =
      |      (902395121 * l_partkey + 193877777) % 1000000007 % 4096)
      |    AND EXISTS (SELECT 1 FROM bits WHERE bit =
      |      (657812387 * l_partkey + 846210293) % 1000000007 % 4096)
      |    AND EXISTS (SELECT 1 FROM bits WHERE bit =
      |      (398291747 * l_partkey + 554433221) % 1000000007 % 4096) AS pass
      |  FROM lineitem),
      |totals AS (
      |  SELECT COUNT(*) AS n_fact,
      |    CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      |  FROM probed),
      |tp AS (
      |  SELECT CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true
      |  FROM probed LEFT JOIN dim ON l_partkey = k
      |  WHERE pass)
      |SELECT n_fact, n_pass, n_true,
      |  n_pass - n_true AS n_false_pos,
      |  n_fact - n_pass AS n_pruned,
      |  CAST(n_pass - n_true AS DOUBLE) / (n_fact - n_true) AS fp_rate
      |FROM totals, tp""".stripMargin

  // -- q73: alt-score aggregate report -------------------------------------
  // ELPAC-class subjects score ALT composites (Oral/Written Language)
  // beside the overall score (reference /root/reference/deploy/
  // ELPAC_subject.xml:17-25 AltScoring, :33-40 AltScores; the
  // reporting UI renders per-alt achievement-level aggregates). The
  // subject file is the config source three times over: the AltScores
  // registry names the alt grain, AltScoring's min/max range
  // normalizes raw scores, and its performance-level registry drives
  // the banding (level = 1 + (score-min)·nLevels div range — the
  // count of configured levels IS the band count) and labels the
  // rows. Alt results ride lineitem lines 5-6 (the claim family owns
  // 1-4 in q49), so one exam contributes one row per alt composite.
  //
  // Scale: one partial-agg fact shuffle to ≤ orgs × alts × levels
  // cells; the n_scores/avg_score window and both registry joins run
  // over that aggregated frame (q52's precedent) — facts are touched
  // once, map-side.
  private[graft] val q73SubjectXml: String =
    """<Subject code="ELPAC" name="ELPAC">
      |  <AssessmentTypes>
      |    <AssessmentType code="sum" name="Summative" longName="Summative ELPAC">
      |      <OverallScoring name="Overall" minScore="1150" maxScore="1950">
      |        <PerformanceLevels>
      |          <PerformanceLevel level="1" name="Level 1" shortName="Level 1" color="maroon"/>
      |          <PerformanceLevel level="2" name="Level 2" shortName="Level 2" color="orange"/>
      |          <PerformanceLevel level="3" name="Level 3" shortName="Level 3" color="blue"/>
      |          <PerformanceLevel level="4" name="Level 4" shortName="Level 4" color="green"/>
      |        </PerformanceLevels>
      |      </OverallScoring>
      |      <AltScoring name="Composite" minScore="1150" maxScore="1950">
      |        <PerformanceLevels>
      |          <PerformanceLevel level="1" name="Level 1" shortName="Level 1" color="maroon"/>
      |          <PerformanceLevel level="2" name="Level 2" shortName="Level 2" color="orange"/>
      |          <PerformanceLevel level="3" name="Level 3" shortName="Level 3" color="blue"/>
      |          <PerformanceLevel level="4" name="Level 4" shortName="Level 4" color="green"/>
      |        </PerformanceLevels>
      |      </AltScoring>
      |    </AssessmentType>
      |  </AssessmentTypes>
      |  <AltScores>
      |    <AltScore code="1" name="Oral Language" displayOrder=" 1">
      |      <Icon>fa-comment</Icon>
      |    </AltScore>
      |    <AltScore code="2" name="Written Language" displayOrder=" 2">
      |      <Icon>fa-edit</Icon>
      |    </AltScore>
      |  </AltScores>
      |</Subject>""".stripMargin

  private val q73: Q = (s, d) => {
    val alts = graft.sources.Ingest.subjectAltScores(s, q73SubjectXml)
      .select(col("alt_code"), col("alt_name"), col("display_order"))
    val lv = graft.sources.Ingest.subjectPerformanceLevels(s, q73SubjectXml)
      .filter(col("scoring") === "alt")
    // config scalars (one config-sized driver read, q71's collected-
    // catalog precedent): the alt score range + configured band count
    val cfg = lv.agg(min(col("min_score")), max(col("max_score")),
      count(lit(1))).head()
    val (minS, rangeS, nLv) =
      (cfg.getInt(0), cfg.getInt(1) - cfg.getInt(0) + 1, cfg.getLong(2))
    val lvNames = lv.select(col("level"), col("level_name"))
    val perLevel = T.lineitem(s, d)
      .filter(col("l_linenumber").isin(5, 6))
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("alt_code", (col("l_linenumber") - 4).cast("string"))
      .withColumn("alt_score", (lit(minS) +
        round(col("l_extendedprice") * 100).cast("long") % rangeS).cast("int"))
      .withColumn("level",
        expr(s"CAST(1 + ((alt_score - $minS) * $nLv) div $rangeS AS INT)"))
      .groupBy(col("n_name"), col("alt_code"), col("level"))
      .agg(count(lit(1)).as("n_at_level"),
        sum(col("alt_score")).as("sum_at_level"))
    val w = Window.partitionBy(col("n_name"), col("alt_code"))
    perLevel
      .withColumn("n_scores", sum(col("n_at_level")).over(w))
      .withColumn("pct_at_level",
        (col("n_at_level") * lit(100L)).cast("double") / col("n_scores"))
      .withColumn("avg_score",
        sum(col("sum_at_level")).over(w).cast("double") / col("n_scores"))
      .join(broadcast(alts), Seq("alt_code"))
      .join(broadcast(lvNames), Seq("level"))
      .select(col("n_name"), col("alt_code"), col("alt_name"),
        col("display_order"), col("level"), col("level_name"),
        col("n_at_level"), col("pct_at_level"), col("n_scores"),
        col("avg_score"))
      .orderBy(col("n_name"), col("display_order"), col("level"))
  }

  private val q73Sql =
    """WITH alts AS (SELECT * FROM (VALUES
      |  ('1', 'Oral Language', 1), ('2', 'Written Language', 2))
      |  AS t(alt_code, alt_name, display_order)),
      |lvnames AS (SELECT * FROM (VALUES
      |  (1, 'Level 1'), (2, 'Level 2'), (3, 'Level 3'), (4, 'Level 4'))
      |  AS t(level, level_name)),
      |facts AS (
      |  SELECT n_name, CAST(l_linenumber - 4 AS VARCHAR) AS alt_code,
      |    CAST(1150 + CAST(round(l_extendedprice * 100) AS BIGINT) % 801
      |      AS INTEGER) AS alt_score
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE l_linenumber IN (5, 6)),
      |agg AS (
      |  SELECT n_name, alt_code,
      |    CAST(1 + ((alt_score - 1150) * 4) // 801 AS INTEGER) AS level,
      |    COUNT(*) AS n_at_level,
      |    CAST(SUM(alt_score) AS BIGINT) AS sum_at_level
      |  FROM facts GROUP BY 1, 2, 3),
      |win AS (
      |  SELECT n_name, alt_code, level, n_at_level,
      |    CAST(SUM(n_at_level) OVER w AS BIGINT) AS n_scores,
      |    CAST(SUM(sum_at_level) OVER w AS BIGINT) AS sum_scores
      |  FROM agg WINDOW w AS (PARTITION BY n_name, alt_code))
      |SELECT n_name, alt_code, alt_name, display_order, level, level_name,
      |  n_at_level,
      |  CAST(n_at_level * 100 AS DOUBLE) / n_scores AS pct_at_level,
      |  n_scores,
      |  CAST(sum_scores AS DOUBLE) / n_scores AS avg_score
      |FROM win JOIN alts USING (alt_code) JOIN lvnames USING (level)
      |ORDER BY n_name, display_order, level""".stripMargin

  // -- q74: ISR batch data assembly ----------------------------------------
  // The Report Processor's workload (reference /root/reference/docs/
  // Architecture.md "Report Processor", deploy/wkhtmltopdf-service.yml):
  // batch-assemble per-student Individual Student Report payloads for
  // one student GROUP — each student's exams with the overall score +
  // performance level, the per-claim levels (q49's claim config),
  // every item response (q57's join tree), and the matched
  // instructional resource link (q58's config). PDF rendering is out
  // of engine scope; this is the data-assembly query that feeds it.
  // Group membership is an import file (StudentGroups.md), so it
  // rides the strict config-CSV contract and broadcasts.
  //
  // Scale: ZERO fact shuffles — orders and lineitem are each probed
  // map-only against broadcast group-sized frames (q57's pattern,
  // widened from one student to the group); the only hash exchange
  // aggregates the group's OWN claim rows (≤ group exams × claims) —
  // plan-pinned in PlanQualitySpec: every join is a broadcast join.
  private[graft] val q74GroupCsv: String =
    """group_id,student_id
      |G-204,7
      |G-204,19
      |G-204,23
      |G-204,42
      |G-204,101
      |G-204,256
      |G-204,311
      |G-204,499""".stripMargin

  private val q74: Q = (s, d) => isrAssembly(s, d, q74GroupCsv, "G-204")

  /** q74's body, parameterized by the group-membership import file and
    * the group to assemble (round-6 verdict polish: the group id rides
    * the config-CSV contract instead of a hardcoded fixture — the
    * Report Processor runs this once per requested group). The
    * membership file may hold many groups; the filter narrows it
    * BEFORE the broadcast, so the probe frames stay group-sized no
    * matter how large the import file is. */
  private[graft] def isrAssembly(s: SparkSession, d: String,
                                 membersCsv: String, groupId: String): DataFrame = {
    val members = graft.sources.Ingest.parseConfigCsv(s, membersCsv,
      StructType.fromDDL("group_id string not null, student_id bigint not null"))
      .filter(col("group_id") === groupId)
    val cuts = q49CutsFromXml(s)
    val resources = graft.sources.Ingest.parseConfigCsv(s, q58ResourceCsv,
      StructType.fromDDL("asmt string not null, level int not null, resource_url string not null"))
    // the group's exams: fact scan probed map-only by the broadcast
    // membership; overall level from the q18 cut-point class
    val exams = T.orders(s, d)
      .join(broadcast(members), col("o_custkey") === col("student_id"))
      .select(col("group_id"), col("student_id"),
        col("o_orderkey").as("exam_id"), col("o_orderdate").as("exam_date"),
        money(col("o_totalprice")).cast(DoubleType).as("overall_score"),
        when(col("o_totalprice") < 100000, 1)
          .when(col("o_totalprice") < 250000, 2).otherwise(3).as("overall_level"))
    // item responses: q57's tree, one student widened to the group
    val items = T.lineitem(s, d)
      .join(broadcast(exams), col("l_orderkey") === col("exam_id"))
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
    // per-exam claim levels (claims ride lines 1-4, q49's contract):
    // group-sized rollup — the one hash exchange in the plan
    val claims = items
      .filter(col("l_linenumber") <= 4)
      .join(broadcast(cuts), col("l_linenumber") === col("claim"))
      .withColumn("claim_level", when(col("l_extendedprice") < col("cut_low"), 1)
        .when(col("l_extendedprice") < col("cut_high"), 2).otherwise(3))
      .groupBy(col("exam_id").as("cl_exam_id"))
      .agg(
        max(when(col("claim") === 1, col("claim_level"))).as("claim1_level"),
        max(when(col("claim") === 2, col("claim_level"))).as("claim2_level"),
        max(when(col("claim") === 3, col("claim_level"))).as("claim3_level"),
        max(when(col("claim") === 4, col("claim_level"))).as("claim4_level"))
    items
      .join(broadcast(claims), col("exam_id") === col("cl_exam_id"), "left")
      .join(broadcast(resources),
        col("p_brand") === col("asmt") && col("overall_level") === col("level"), "left")
      .select(col("group_id"), col("student_id"), col("exam_id"),
        col("exam_date"), col("overall_score"), col("overall_level"),
        col("claim1_level"), col("claim2_level"), col("claim3_level"),
        col("claim4_level"), col("l_linenumber").as("position"),
        col("l_partkey").as("item_id"), col("p_brand").as("item_asmt"),
        money(col("l_quantity")).cast(DoubleType).as("item_score"),
        itemStandard.as("standard"), col("resource_url"))
      .orderBy(col("student_id"), col("exam_id"), col("position"))
  }

  private val q74Sql =
    """WITH members AS (SELECT * FROM (VALUES
      |  ('G-204', 7), ('G-204', 19), ('G-204', 23), ('G-204', 42),
      |  ('G-204', 101), ('G-204', 256), ('G-204', 311), ('G-204', 499))
      |  AS t(group_id, student_id)),
      |cuts AS (SELECT * FROM (VALUES
      |  (1, 25000.0, 45000.0), (2, 30000.0, 50000.0),
      |  (3, 35000.0, 55000.0), (4, 40000.0, 60000.0)) AS t(claim, cut_low, cut_high)),
      |resources AS (SELECT * FROM (VALUES
      |  ('Brand#13', 1, 'https://resources.example.org/b13/remediation'),
      |  ('Brand#13', 3, 'https://resources.example.org/b13/enrichment'),
      |  ('Brand#42', 2, 'https://resources.example.org/b42/practice'))
      |  AS t(asmt, level, resource_url)),
      |exams AS (
      |  SELECT group_id, CAST(student_id AS BIGINT) AS student_id,
      |    o_orderkey AS exam_id, o_orderdate AS exam_date,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS overall_score,
      |    CASE WHEN o_totalprice < 100000 THEN 1
      |         WHEN o_totalprice < 250000 THEN 2 ELSE 3 END AS overall_level
      |  FROM orders JOIN members ON o_custkey = student_id),
      |claims AS (
      |  SELECT l_orderkey AS cl_exam_id,
      |    MAX(CASE WHEN claim = 1 THEN claim_level END) AS claim1_level,
      |    MAX(CASE WHEN claim = 2 THEN claim_level END) AS claim2_level,
      |    MAX(CASE WHEN claim = 3 THEN claim_level END) AS claim3_level,
      |    MAX(CASE WHEN claim = 4 THEN claim_level END) AS claim4_level
      |  FROM (
      |    SELECT l_orderkey, claim,
      |      CASE WHEN l_extendedprice < cut_low THEN 1
      |           WHEN l_extendedprice < cut_high THEN 2 ELSE 3 END AS claim_level
      |    FROM lineitem
      |    JOIN exams ON l_orderkey = exam_id
      |    JOIN cuts ON l_linenumber = claim
      |    WHERE l_linenumber <= 4)
      |  GROUP BY 1)
      |SELECT group_id, student_id, exam_id, exam_date, overall_score,
      |  overall_level, claim1_level, claim2_level, claim3_level,
      |  claim4_level, l_linenumber AS position, l_partkey AS item_id,
      |  p_brand AS item_asmt,
      |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS item_score,
      |  'CCSS.' || split_part(p_type, ' ', 1) || '.'
      |    || CAST(p_size % 4 + 1 AS INTEGER) AS standard,
      |  resource_url
      |FROM lineitem
      |JOIN exams ON l_orderkey = exam_id
      |JOIN part ON l_partkey = p_partkey
      |LEFT JOIN claims ON exam_id = cl_exam_id
      |LEFT JOIN resources ON p_brand = asmt AND overall_level = level
      |ORDER BY student_id, exam_id, position""".stripMargin

  // -- q75: tenant configuration overlay resolution ------------------------
  // Multi-tenancy in the reference is CONFIG-driven: a tenant's
  // application.yml overlays the instance-level config (reference
  // /root/reference/docs/Runbook.MultiTenancy.md "Configuration" — "A
  // tenant's configuration is layered on top of the instance-level
  // configuration"; config/tenant-OT/application.yml is the shape the
  // fixtures model: school-year/state/student-field/archive/datasource
  // overrides + the tenant-new tenantProperties block). This query IS
  // "resolve effective config for tenant OT": override wins per key,
  // base falls through, tenant-only keys survive, other tenants' (TS)
  // rows never leak in — with per-key provenance for the admin UI.
  // The same operator (Ingest.resolveTenantConfig) feeds q61's status
  // registry under a tenant parameter.
  //
  // Scale: config frames are admin-sized; the full-outer merge
  // broadcasts however many tenants overlay one base.
  private[graft] val q75BaseCsv: String =
    """key,value
      |archive.path-prefix,main
      |datasources.reporting.database,reporting
      |reporting.client,SBAC
      |reporting.school-year,2018
      |reporting.state.code,CA
      |reporting.state.name,California
      |reporting.student-fields.Ethnicity,Enabled
      |reporting.student-fields.Section504,Enabled""".stripMargin

  private[graft] val q75TenantCsv: String =
    """tenant,key,value
      |OT,tenantProperties.tenants.OT.name,Other (sample tenant)
      |OT,reporting.school-year,2019
      |OT,reporting.state.code,OT
      |OT,reporting.state.name,Other
      |OT,reporting.student-fields.Section504,Disabled
      |OT,archive.path-prefix,OT
      |OT,datasources.reporting.database,reporting_ot
      |TS,reporting.state.code,TS
      |TS,reporting.school-year,2020""".stripMargin

  private val q75: Q = (s, _) => {
    val base = graft.sources.Ingest.parseConfigCsv(s, q75BaseCsv,
      StructType.fromDDL("key string not null, value string not null"))
    val overrides = graft.sources.Ingest.parseConfigCsv(s, q75TenantCsv,
      StructType.fromDDL(
        "tenant string not null, key string not null, value string not null"))
    graft.sources.Ingest.resolveTenantConfig(base, overrides, "OT")
      .orderBy(col("key"))
  }

  private val q75Sql =
    """WITH base AS (SELECT * FROM (VALUES
      |  ('archive.path-prefix', 'main'),
      |  ('datasources.reporting.database', 'reporting'),
      |  ('reporting.client', 'SBAC'),
      |  ('reporting.school-year', '2018'),
      |  ('reporting.state.code', 'CA'),
      |  ('reporting.state.name', 'California'),
      |  ('reporting.student-fields.Ethnicity', 'Enabled'),
      |  ('reporting.student-fields.Section504', 'Enabled')) AS t(key, value)),
      |ov AS (SELECT * FROM (VALUES
      |  ('OT', 'tenantProperties.tenants.OT.name', 'Other (sample tenant)'),
      |  ('OT', 'reporting.school-year', '2019'),
      |  ('OT', 'reporting.state.code', 'OT'),
      |  ('OT', 'reporting.state.name', 'Other'),
      |  ('OT', 'reporting.student-fields.Section504', 'Disabled'),
      |  ('OT', 'archive.path-prefix', 'OT'),
      |  ('OT', 'datasources.reporting.database', 'reporting_ot'),
      |  ('TS', 'reporting.state.code', 'TS'),
      |  ('TS', 'reporting.school-year', '2020')) AS t(tenant, key, value)),
      |o AS (SELECT key, value AS override_value FROM ov WHERE tenant = 'OT')
      |SELECT COALESCE(b.key, o.key) AS key,
      |  COALESCE(o.override_value, b.value) AS value,
      |  CASE WHEN o.override_value IS NOT NULL AND b.value IS NOT NULL
      |         THEN 'override'
      |       WHEN o.override_value IS NOT NULL THEN 'tenant-new'
      |       ELSE 'base' END AS config_source
      |FROM base b FULL OUTER JOIN o ON b.key = o.key
      |ORDER BY key""".stripMargin

  // -- q76: archive restore reconciliation ---------------------------------
  // The Archive runbook's full cycle as one warehouse query (reference
  // /root/reference/docs/Runbook.Archive.md: snapshot → bulk delete →
  // restore → "Querying the restored snapshot of a database for
  // information"): reconcile the RESTORED pre-purge snapshot against
  // the LIVE post-purge warehouse, per cascade table of q60's year
  // purge. One full-outer join of the per-side GROUPED frames per
  // table yields all four measures in a single pass: rows_archive /
  // rows_live / rows_archived_only (the purged content a restore can
  // recover — spec-tied to q60's rows_deleted) / rows_drifted (row
  // content present live but NOT in the snapshot — the runbook
  // requires the purge run "while the system is quiescent", and this
  // column is the audit that it actually was: drift must be 0).
  // Snapshot and live are independent scans — physically distinct
  // sources in deployment (restored instance vs live instance), which
  // is why the reconcile is a join, not filter arithmetic.
  //
  // The reconcile is a MULTISET comparison (EXCEPT ALL semantics) over
  // full rows, not a keyed diff: the exam_item grain has no unique
  // natural key in this model ((l_orderkey, l_linenumber) repeats), so
  // each side groups by the entire row and the join compares
  // multiplicities — exact under duplicate rows, no uniqueness
  // assumption anywhere.
  //
  // Scale: per table, one partial-agg shuffle per side (map-side
  // combine on the row group) + one co-partitioned full-outer join of
  // the grouped frames (≤ distinct rows, not rows) + a single-row agg;
  // the scans prune to the compared columns.
  private val q76: Q = (s, d) => {
    val purgeYear = 1995
    def audit(table: String, archive: DataFrame, live: DataFrame,
              cols: Seq[String]): DataFrame = {
      def grouped(df: DataFrame, cnt: String) =
        df.select(cols.map(col): _*).groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as(cnt))
      val ac = coalesce(col("_a_cnt"), lit(0L))
      val lc = coalesce(col("_l_cnt"), lit(0L))
      grouped(archive, "_a_cnt").join(grouped(live, "_l_cnt"), cols, "full_outer")
        .agg(sum(ac).as("rows_archive"), sum(lc).as("rows_live"),
          sum(greatest(ac - lc, lit(0L))).as("rows_archived_only"),
          sum(greatest(lc - ac, lit(0L))).as("rows_drifted"))
        .select(lit(table).as("table_name"), col("rows_archive"),
          col("rows_live"), col("rows_archived_only"), col("rows_drifted"))
    }
    val exams = T.orders(s, d)
    val liveExams = exams.filter(year(col("o_orderdate")) =!= purgeYear)
    val examItems = T.lineitem(s, d)
      .join(exams.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val liveExamItems = examItems.filter(year(col("o_orderdate")) =!= purgeYear)
    // the item cascade follows its assessment's year (q60's derivation)
    val asmts = T.part(s, d).groupBy(col("p_brand"))
      .agg((lit(1992) + min(col("p_partkey")) % 7).as("asmt_year"))
    val items = T.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .join(broadcast(asmts), Seq("p_brand"))
    val liveItems = items.filter(col("asmt_year") =!= purgeYear)
    audit("1_item", items, liveItems,
        Seq("p_partkey", "p_brand", "p_retailprice"))
      .unionByName(audit("2_exam_item", examItems, liveExamItems,
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")))
      .unionByName(audit("3_exam", exams, liveExams,
        Seq("o_orderkey", "o_orderstatus", "o_totalprice")))
      .orderBy(col("table_name"))
  }

  private val q76Sql =
    """WITH ey AS (SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice,
      |             CAST(year(o_orderdate) AS INTEGER) <> 1995 AS live
      |           FROM orders),
      |ei AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, ey.live
      |       FROM lineitem JOIN ey ON l_orderkey = o_orderkey),
      |ay AS (SELECT p_brand, 1992 + min(p_partkey) % 7 AS asmt_year
      |       FROM part GROUP BY p_brand),
      |it AS (SELECT p_partkey, part.p_brand, p_retailprice,
      |         ay.asmt_year <> 1995 AS live
      |       FROM part JOIN ay ON part.p_brand = ay.p_brand),
      |rows_ AS (
      |  SELECT '1_item' AS table_name, COUNT(*) AS rows_archive,
      |    CAST(COUNT(*) FILTER (live) AS BIGINT) AS rows_live,
      |    CAST(COUNT(*) FILTER (NOT live) AS BIGINT) AS rows_archived_only,
      |    CAST(0 AS BIGINT) AS rows_drifted
      |  FROM it
      |  UNION ALL
      |  SELECT '2_exam_item', COUNT(*),
      |    CAST(COUNT(*) FILTER (live) AS BIGINT),
      |    CAST(COUNT(*) FILTER (NOT live) AS BIGINT), CAST(0 AS BIGINT)
      |  FROM ei
      |  UNION ALL
      |  SELECT '3_exam', COUNT(*),
      |    CAST(COUNT(*) FILTER (live) AS BIGINT),
      |    CAST(COUNT(*) FILTER (NOT live) AS BIGINT), CAST(0 AS BIGINT)
      |  FROM ey)
      |SELECT * FROM rows_ ORDER BY table_name""".stripMargin

  // -- q77: translation overlay coverage -----------------------------------
  // The Language Support runbook's i18n layering as a report (reference
  // /root/reference/docs/Runbook.LanguageSupport.md: "the application
  // ships with English as a default embedded language", "tenants may
  // install an en.json file to override any display text", "A
  // translation JSON file is not required to be complete"): the
  // effective message for (language, key) is
  // coalesce(xx.json, tenant en.json, embedded en) — which is
  // [[graft.sources.Ingest.resolveTenantConfig]] applied TWICE, the
  // q75 overlay operator composing: first the tenant's en.json onto
  // the embedded registry (→ effective English), then each installed
  // language file onto that. The report is the admin's per-language
  // coverage view: translated / en-fallback / orphan counts + share
  // (orphans are keys only the language file declares — the doc's
  // cross-reference drift warning). Fixture keys mirror the runbook's
  // own examples (common-ngx.footer override, languages.es=Español,
  // report-download display names).
  //
  // Scale: translation registries are config-sized; the one exact
  // IEEE division per row rides #languages × 3 output rows.
  private[graft] val q77EmbeddedCsv: String =
    """key,value
      |common-ngx.footer,Smarter Balanced Assessment Consortium
      |common-ngx.languages.es,es
      |common-ngx.languages.vi,vi
      |report-download.form.language-option.es,es
      |report-download.form.language-option.vi,vi
      |report.grade.label,Grade
      |report.target.title,Target Report
      |welcome.title,Welcome""".stripMargin

  private[graft] val q77FilesCsv: String =
    """lang,key,value
      |en,common-ngx.footer,(c) My Organization - Smarter Balanced Assessment Consortium
      |en,common-ngx.languages.es,Español
      |en,common-ngx.languages.vi,Tiếng Việt
      |en,report-download.form.language-option.es,Spanish
      |en,report-download.form.language-option.vi,Vietnamese
      |es,common-ngx.languages.es,Español
      |es,report-download.form.language-option.es,Español
      |es,report-download.form.language-option.vi,Vietnamita
      |es,report.grade.label,Grado
      |es,report.target.title,Informe de objetivos
      |vi,common-ngx.languages.vi,Tiếng Việt
      |vi,report-download.form.language-option.vi,Tiếng Việt
      |vi,report.legacy.note,Ghi chú cũ""".stripMargin

  private[graft] def q77Resolved(s: SparkSession, lang: String): DataFrame = {
    val embedded = graft.sources.Ingest.parseConfigCsv(s, q77EmbeddedCsv,
      StructType.fromDDL("key string not null, value string not null"))
    val files = graft.sources.Ingest.parseConfigCsv(s, q77FilesCsv,
      StructType.fromDDL(
        "lang string not null, key string not null, value string not null"))
    val enEff = graft.sources.Ingest
      .resolveTenantConfig(embedded, files, "en", tenantCol = "lang")
      .select(col("key"), col("value"))
    graft.sources.Ingest
      .resolveTenantConfig(enEff, files, lang, tenantCol = "lang")
  }

  private val q77: Q = (s, _) => {
    val perLang = Seq("es", "vi").map { lang =>
      q77Resolved(s, lang).withColumn("language", lit(lang))
    }.reduce(_ unionByName _)
      .withColumn("status",
        when(col("config_source") === "override", "translated")
          .when(col("config_source") === "tenant-new", "orphan")
          .otherwise("en_fallback"))
    val universe = q77Resolved(s, "es").filter(col("config_source") =!= "tenant-new")
      .agg(count(lit(1)).as("n_keys"))
    perLang.groupBy(col("language"), col("status"))
      .agg(count(lit(1)).as("keys"))
      .crossJoin(broadcast(universe)) // 1-row scalar: the en key universe
      .select(col("language"), col("status"), col("keys"),
        (col("keys").cast(DoubleType) / col("n_keys").cast(DoubleType)).as("share"))
      .orderBy(col("language"), col("status"))
  }

  private val q77Sql =
    """WITH emb AS (SELECT * FROM (VALUES
      |  ('common-ngx.footer', 'Smarter Balanced Assessment Consortium'),
      |  ('common-ngx.languages.es', 'es'),
      |  ('common-ngx.languages.vi', 'vi'),
      |  ('report-download.form.language-option.es', 'es'),
      |  ('report-download.form.language-option.vi', 'vi'),
      |  ('report.grade.label', 'Grade'),
      |  ('report.target.title', 'Target Report'),
      |  ('welcome.title', 'Welcome')) AS t(key, value)),
      |files AS (SELECT * FROM (VALUES
      |  ('en', 'common-ngx.footer', '(c) My Organization - Smarter Balanced Assessment Consortium'),
      |  ('en', 'common-ngx.languages.es', 'Español'),
      |  ('en', 'common-ngx.languages.vi', 'Tiếng Việt'),
      |  ('en', 'report-download.form.language-option.es', 'Spanish'),
      |  ('en', 'report-download.form.language-option.vi', 'Vietnamese'),
      |  ('es', 'common-ngx.languages.es', 'Español'),
      |  ('es', 'report-download.form.language-option.es', 'Español'),
      |  ('es', 'report-download.form.language-option.vi', 'Vietnamita'),
      |  ('es', 'report.grade.label', 'Grado'),
      |  ('es', 'report.target.title', 'Informe de objetivos'),
      |  ('vi', 'common-ngx.languages.vi', 'Tiếng Việt'),
      |  ('vi', 'report-download.form.language-option.vi', 'Tiếng Việt'),
      |  ('vi', 'report.legacy.note', 'Ghi chú cũ')) AS t(lang, key, value)),
      |en_eff AS (
      |  SELECT COALESCE(e.key, o.key) AS key, COALESCE(o.value, e.value) AS value
      |  FROM emb e FULL OUTER JOIN (SELECT key, value FROM files WHERE lang = 'en') o
      |  ON e.key = o.key),
      |lang_es AS (
      |  SELECT 'es' AS language, COALESCE(b.key, o.key) AS key,
      |    CASE WHEN o.value IS NOT NULL AND b.value IS NOT NULL THEN 'translated'
      |         WHEN o.value IS NOT NULL THEN 'orphan'
      |         ELSE 'en_fallback' END AS status
      |  FROM en_eff b FULL OUTER JOIN
      |    (SELECT key, value FROM files WHERE lang = 'es') o ON b.key = o.key),
      |lang_vi AS (
      |  SELECT 'vi' AS language, COALESCE(b.key, o.key) AS key,
      |    CASE WHEN o.value IS NOT NULL AND b.value IS NOT NULL THEN 'translated'
      |         WHEN o.value IS NOT NULL THEN 'orphan'
      |         ELSE 'en_fallback' END AS status
      |  FROM en_eff b FULL OUTER JOIN
      |    (SELECT key, value FROM files WHERE lang = 'vi') o ON b.key = o.key),
      |fixed AS (
      |  SELECT * FROM lang_es UNION ALL SELECT * FROM lang_vi),
      |u AS (SELECT COUNT(*) AS n_keys FROM en_eff)
      |SELECT language, status, COUNT(*) AS keys,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(n_keys AS DOUBLE) AS share
      |FROM fixed, u
      |GROUP BY language, status, n_keys
      |ORDER BY language, status""".stripMargin

  // -- q78: IRT ability estimation (2PL MLE, integer-quantized) ------------
  // The scoring step the reference's assessment packages parameterize
  // but its warehouse never re-runs: the item CSV carries per-item IRT
  // measurement-model parameters (reference /root/reference/docs/
  // API.md:719 — "MeasurementModel, Weight, ScorePoints, a, b0_b,
  // b1_c…"), and an analytics engine over the same data should be
  // able to re-estimate a student's ability θ from their item
  // responses. This is per-exam maximum-likelihood under a 2PL-style
  // model: three Newton steps of θ' = θ + Σa(u−P) / Σa²·P', started
  // at θ=0, clamped to [−4, 4] (the standard HOT/LOT bounds).
  //
  // Replayability is the design constraint, solved the IntLloyd way:
  // a logistic P needs exp() (not exactly rounded IEEE — engines
  // disagree in the last ulp) and double SUMs are addition-order-
  // dependent, so the whole iteration runs in INTEGER micro-units —
  // the link is the algebraic sigmoid P = ½ + z/(2(1+|z|)) (same
  // sigmoid shape, rational arithmetic), quantized as
  //   Pµ  = 500000 + sgn·(|zµ|·500000 div (1000000+|zµ|)),
  //   dpµ = 5e17 div (1000000+|zµ|)²,
  // and the score/information sums are exact LONG sums — associative,
  // partition-order-free, bit-identical in DuckDB. Item params derive
  // deterministically from the item dim: a (discrimination, ×100) =
  // 50 + (p_size % 10)·15, b (difficulty, µ) from p_retailprice's
  // cent value mod 2e5 recentred to [−1, 1]; u = 1 iff l_quantity >
  // 25. All scales chosen so every product stays within LONG range
  // (documented per term below).
  //
  // Scale: the item frame joins the θ frame on exam_id three times —
  // co-partitioned equi-joins on one uniform key, each followed by a
  // partial-agg on the same key, so the exchange partitioning is
  // reused across iterations; the item-param derivation is map-side
  // under the broadcast part join. This is the honest shape of
  // iterative ML on a warehouse: O(iterations) passes, zero driver
  // loops over data.
  /** q78's fitting machinery, factored so q88's item-fit statistics
    * consume the same items frame and final θ (one definition of the
    * model across estimation and diagnostics): returns (items
    * carrying item_id, fitted θ per exam). */
  private[graft] def irtParts(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // items: (exam_id, a2 ∈ [50,185] (a×100), bmu ∈ [−1e6,1e6] (b×1e6), u)
    // q59's stats-based pin: every iteration shuffles the item frame
    // on exam_id, and cores-sized partitions spill past ~1M fact
    // rows/core (measured: 66 s at 60M rows/16 threads unpinned);
    // pinning 8×cores pre-partitions the CACHED frame on the join
    // key once, so all three iteration joins + aggs reuse the
    // distribution. Footer-metadata row count — no scan job.
    val cores = s.sparkContext.defaultParallelism
    val pin = T.parquetRowCount(s, s"$d/lineitem.parquet") > 1000000L * cores
    val itemsBase = T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("exam_id"),
        col("l_partkey").as("item_id"),
        (lit(50L) + (col("p_size") % 10).cast(LongType) * 15L).as("a2"),
        ((expr("CAST(round(p_retailprice * 100) AS BIGINT)") % 200000L) * 10L
          - 1000000L).as("bmu"),
        when(col("l_quantity") > 25, 1000000L).otherwise(0L).as("umu"))
    val items =
      (if (pin) itemsBase.repartition(8 * cores, col("exam_id")) else itemsBase)
        .transform(graft.CacheScope.cached) // read by all three iterations
    // One Newton step over an item frame that already carries θµ.
    // Iteration 1 enters with a LITERAL θµ=0 — no join, the whole
    // first score/information pass is map-side into the agg —
    // iterations 2 and 3 join the previous θ frame on exam_id.
    def step(withTheta: DataFrame): DataFrame = {
      // zint = a2·(θµ−bµ) ≤ 185·5e6 ≈ 9.3e8 (scale 1e8); zµ = zint/100
      val zint = col("a2") * (col("theta_mu") - col("bmu"))
      val zmu = signum(zint).cast(LongType) * expr("abs(zint) div 100")
      val denom = lit(1000000L) + abs(zmu)
      // Pµ: nonneg div only (sign split) — trunc == floor, engine-safe
      val pmu = lit(500000L) + signum(zmu).cast(LongType) *
        expr("(abs(zmu) * 500000) div (1000000 + abs(zmu))")
      // dpµ = 5e17 div denom² (denom ≤ ~1.1e7 ⇒ denom² ≤ 1.2e14 fits)
      val dpmu = expr("500000000000000000 div (denom * denom)")
      withTheta
        .withColumn("zint", zint).withColumn("zmu", zmu)
        .withColumn("denom", denom).withColumn("pmu", pmu)
        .withColumn("dpmu", dpmu)
        // score term a2·(uµ−Pµ) ≤ 185·1e6 ≈ 2e8/item; info term
        // a2²·dpµ ≤ 3.4e4·5e5 ≈ 1.7e10/item — LONG sums stay exact
        .groupBy(col("exam_id"))
        .agg(first(col("theta_mu")).as("theta_prev"),
          sum(col("a2") * (col("umu") - col("pmu"))).as("sint"),
          sum(col("a2") * col("a2") * col("dpmu")).as("iint"),
          count(lit(1)).as("n_items"))
        // Δθµ = (Sint/1e8)/(Iint/1e10)·1e6 = Sint·1e8 div Iint
        // (Sint ≤ ~1.3e9 ⇒ Sint·1e8 ≤ 1.3e17 fits); Iint > 0 since
        // a2 ≥ 50 and dpµ ≥ 5e17 div 2.4e18·… ≥ 0 — guard anyway
        .withColumn("delta", signum(col("sint")).cast(LongType) *
          expr("(abs(sint) * 100000000) div greatest(iint, 1)"))
        .select(col("exam_id"),
          greatest(lit(-4000000L), least(lit(4000000L),
            col("theta_prev") + col("delta"))).as("theta_mu"),
          col("n_items"))
    }
    def joined(prev: DataFrame): DataFrame =
      items.join(prev.select(col("exam_id"), col("theta_mu")), "exam_id")
    val t1 = step(items.withColumn("theta_mu", lit(0L)))
    (items, step(joined(step(joined(t1)))))
  }

  private val q78: Q = (s, d) => {
    val (_, fitted) = irtParts(s, d)
    fitted
      .select(col("exam_id"), col("n_items"), col("theta_mu"),
        (col("theta_mu").cast(DoubleType) / 1000000d).as("theta"))
      .orderBy(col("exam_id"))
  }

  /** q78's CTE chain through the final θ frame (`t3`), shared with
    * q88's item-fit replay — one SQL definition of the model. */
  private val irtThetaCtes =
    """items AS (
      |  SELECT l_orderkey AS exam_id, l_partkey AS item_id,
      |    50 + (p_size % 10) * 15 AS a2,
      |    (CAST(round(p_retailprice * 100) AS BIGINT) % 200000) * 10
      |      - 1000000 AS bmu,
      |    CASE WHEN l_quantity > 25 THEN 1000000 ELSE 0 END AS umu
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |t0 AS (
      |  SELECT exam_id, CAST(0 AS BIGINT) AS theta_mu, COUNT(*) AS n_items
      |  FROM items GROUP BY 1),
      |s1 AS (
      |  SELECT i.exam_id, t.theta_mu,
      |    CASE WHEN z < 0 THEN -1 ELSE CASE WHEN z > 0 THEN 1 ELSE 0 END END
      |      * (abs(z) // 100) AS zmu,
      |    i.a2, i.umu
      |  FROM items i JOIN t0 t ON i.exam_id = t.exam_id,
      |    LATERAL (SELECT i.a2 * (t.theta_mu - i.bmu) AS z) lz),
      |g1 AS (
      |  SELECT exam_id, MIN(theta_mu) AS theta_prev,
      |    CAST(SUM(a2 * (umu - pmu)) AS BIGINT) AS sint,
      |    CAST(SUM(a2 * a2 * dpmu) AS BIGINT) AS iint,
      |    COUNT(*) AS n_items
      |  FROM (
      |    SELECT exam_id, theta_mu, a2, umu,
      |      500000 + CASE WHEN zmu < 0 THEN -1 WHEN zmu > 0 THEN 1 ELSE 0 END
      |        * ((abs(zmu) * 500000) // (1000000 + abs(zmu))) AS pmu,
      |      500000000000000000 // ((1000000 + abs(zmu)) * (1000000 + abs(zmu))) AS dpmu
      |    FROM s1) GROUP BY 1),
      |t1 AS (
      |  SELECT exam_id,
      |    GREATEST(-4000000, LEAST(4000000, theta_prev +
      |      CASE WHEN sint < 0 THEN -1 WHEN sint > 0 THEN 1 ELSE 0 END
      |        * ((abs(sint) * 100000000) // GREATEST(iint, 1)))) AS theta_mu,
      |    n_items
      |  FROM g1),
      |s2 AS (
      |  SELECT i.exam_id, t.theta_mu,
      |    CASE WHEN z < 0 THEN -1 ELSE CASE WHEN z > 0 THEN 1 ELSE 0 END END
      |      * (abs(z) // 100) AS zmu,
      |    i.a2, i.umu
      |  FROM items i JOIN t1 t ON i.exam_id = t.exam_id,
      |    LATERAL (SELECT i.a2 * (t.theta_mu - i.bmu) AS z) lz),
      |g2 AS (
      |  SELECT exam_id, MIN(theta_mu) AS theta_prev,
      |    CAST(SUM(a2 * (umu - pmu)) AS BIGINT) AS sint,
      |    CAST(SUM(a2 * a2 * dpmu) AS BIGINT) AS iint,
      |    COUNT(*) AS n_items
      |  FROM (
      |    SELECT exam_id, theta_mu, a2, umu,
      |      500000 + CASE WHEN zmu < 0 THEN -1 WHEN zmu > 0 THEN 1 ELSE 0 END
      |        * ((abs(zmu) * 500000) // (1000000 + abs(zmu))) AS pmu,
      |      500000000000000000 // ((1000000 + abs(zmu)) * (1000000 + abs(zmu))) AS dpmu
      |    FROM s2) GROUP BY 1),
      |t2 AS (
      |  SELECT exam_id,
      |    GREATEST(-4000000, LEAST(4000000, theta_prev +
      |      CASE WHEN sint < 0 THEN -1 WHEN sint > 0 THEN 1 ELSE 0 END
      |        * ((abs(sint) * 100000000) // GREATEST(iint, 1)))) AS theta_mu,
      |    n_items
      |  FROM g2),
      |s3 AS (
      |  SELECT i.exam_id, t.theta_mu,
      |    CASE WHEN z < 0 THEN -1 ELSE CASE WHEN z > 0 THEN 1 ELSE 0 END END
      |      * (abs(z) // 100) AS zmu,
      |    i.a2, i.umu
      |  FROM items i JOIN t2 t ON i.exam_id = t.exam_id,
      |    LATERAL (SELECT i.a2 * (t.theta_mu - i.bmu) AS z) lz),
      |g3 AS (
      |  SELECT exam_id, MIN(theta_mu) AS theta_prev,
      |    CAST(SUM(a2 * (umu - pmu)) AS BIGINT) AS sint,
      |    CAST(SUM(a2 * a2 * dpmu) AS BIGINT) AS iint,
      |    COUNT(*) AS n_items
      |  FROM (
      |    SELECT exam_id, theta_mu, a2, umu,
      |      500000 + CASE WHEN zmu < 0 THEN -1 WHEN zmu > 0 THEN 1 ELSE 0 END
      |        * ((abs(zmu) * 500000) // (1000000 + abs(zmu))) AS pmu,
      |      500000000000000000 // ((1000000 + abs(zmu)) * (1000000 + abs(zmu))) AS dpmu
      |    FROM s3) GROUP BY 1),
      |t3 AS (
      |  SELECT exam_id,
      |    GREATEST(-4000000, LEAST(4000000, theta_prev +
      |      CASE WHEN sint < 0 THEN -1 WHEN sint > 0 THEN 1 ELSE 0 END
      |        * ((abs(sint) * 100000000) // GREATEST(iint, 1)))) AS theta_mu,
      |    n_items
      |  FROM g3)""".stripMargin

  private val q78Sql =
    s"""WITH $irtThetaCtes
       |SELECT exam_id, n_items, theta_mu,
       |  CAST(theta_mu AS DOUBLE) / 1000000 AS theta
       |FROM t3 ORDER BY exam_id""".stripMargin

  // -- q88: IRT item-fit statistics (outfit/infit mean-squares) ------------
  // The diagnostic a psychometrics shop runs the morning after q78's
  // calibration (classic Rasch/IRT fit analysis — public-textbook
  // Wright/Masters mean-squares): does each ITEM behave as the model
  // predicts across all examinees? Per response, the standardized
  // residual z² = (u−P)²/(P(1−P)) at the FINAL θ; per item,
  //   outfit MSQ = mean z²   (outlier-sensitive),
  //   infit MSQ = Σ(u−P)² / ΣP(1−P)  (information-weighted),
  // with the conventional misfit flag outside [0.5, 1.5]. Same
  // replayability discipline as q78: P is the algebraic sigmoid in
  // integer micro-units, z² is ONE exact integer floor division per
  // response ((u−P)² ≤ 1e12 so the 1e6-scaled numerator stays in
  // LONG), the per-item sums are exact (infit's scaled numerator
  // crosses into DECIMAL(38)/HUGEINT), and each emitted double is
  // one IEEE division. One model definition end to end: q88 consumes
  // irtParts' items frame and θ, and its oracle extends q78's own
  // CTE chain.
  //
  // Scale: one more co-partitioned join on the exam_id key q78's
  // cached frame is already distributed by, then ONE partial-agg
  // shuffle of four longs per item — the q59 two-pass class, with
  // the second pass catalog-sized.
  private val q88: Q = (s, d) => {
    val (items, fitted) = irtParts(s, d)
    val zint = col("a2") * (col("theta_mu") - col("bmu"))
    val zmu = signum(col("zint")).cast(LongType) * expr("abs(zint) div 100")
    val pmu = lit(500000L) + signum(col("zmu")).cast(LongType) *
      expr("(abs(zmu) * 500000) div (1000000 + abs(zmu))")
    items.join(fitted.select(col("exam_id"), col("theta_mu")), "exam_id")
      .withColumn("zint", zint)
      .withColumn("zmu", zmu)
      .withColumn("pmu", pmu)
      .withColumn("sq", expr("(umu - pmu) * (umu - pmu)"))
      .withColumn("w", expr("pmu * (1000000 - pmu)"))
      .withColumn("z2", expr("(sq * 1000000) div w"))
      .groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_responses"),
        sum(col("z2")).as("z2_sum"),
        sum(col("sq")).as("sq_sum"),
        sum(col("w")).as("w_sum"))
      .withColumn("outfit_micro", expr("z2_sum div n_responses"))
      .withColumn("infit_micro", expr(
        "CAST(CAST(sq_sum AS DECIMAL(38,0)) * 1000000 div CAST(w_sum AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("item_id"), col("n_responses"),
        col("outfit_micro"),
        (col("outfit_micro") / lit(1000000.0)).as("outfit"),
        col("infit_micro"),
        (col("infit_micro") / lit(1000000.0)).as("infit"),
        (col("outfit_micro") < 500000L || col("outfit_micro") > 1500000L)
          .as("misfit"))
      .orderBy(col("item_id"))
  }

  private val q88Sql =
    s"""WITH $irtThetaCtes,
       |resp AS (
       |  SELECT r.item_id, r.umu,
       |    500000 + CASE WHEN r.zmu < 0 THEN -1 WHEN r.zmu > 0 THEN 1 ELSE 0 END
       |      * ((abs(r.zmu) * 500000) // (1000000 + abs(r.zmu))) AS pmu
       |  FROM (
       |    SELECT i.item_id, i.umu,
       |      CASE WHEN z < 0 THEN -1 ELSE CASE WHEN z > 0 THEN 1 ELSE 0 END END
       |        * (abs(z) // 100) AS zmu
       |    FROM items i JOIN t3 t ON i.exam_id = t.exam_id,
       |      LATERAL (SELECT i.a2 * (t.theta_mu - i.bmu) AS z) lz) r),
       |terms AS (
       |  SELECT item_id,
       |    (umu - pmu) * (umu - pmu) AS sq,
       |    pmu * (1000000 - pmu) AS w,
       |    ((umu - pmu) * (umu - pmu) * 1000000) // (pmu * (1000000 - pmu)) AS z2
       |  FROM resp),
       |fit AS (
       |  SELECT item_id, COUNT(*) AS n_responses,
       |    CAST(SUM(z2) AS BIGINT) AS z2_sum,
       |    CAST(SUM(sq) AS HUGEINT) AS sq_sum,
       |    CAST(SUM(w) AS HUGEINT) AS w_sum
       |  FROM terms GROUP BY 1)
       |SELECT item_id, n_responses,
       |  z2_sum // n_responses AS outfit_micro,
       |  CAST(z2_sum // n_responses AS DOUBLE) / 1000000.0 AS outfit,
       |  CAST(sq_sum * 1000000 // w_sum AS BIGINT) AS infit_micro,
       |  CAST(CAST(sq_sum * 1000000 // w_sum AS BIGINT) AS DOUBLE) / 1000000.0
       |    AS infit,
       |  z2_sum // n_responses < 500000 OR z2_sum // n_responses > 1500000
       |    AS misfit
       |FROM fit ORDER BY item_id""".stripMargin

  // -- q79: student growth percentile (SGP-lite) ---------------------------
  // THE longitudinal metric of this domain (reference README
  // "longitudinal trends"; the Aggregate service's year-over-year
  // lens): a student's growth percentile is their current-year
  // standing among the PEER GROUP of students who started from the
  // same prior-year score band. Bands are fixed score ranges (the
  // q18/q49 cut-point philosophy — configured, not data-derived,
  // which is also what kills the global-ntile scale cliff).
  //
  // Scale: percent_rank within band would window over millions of
  // students in a handful of band partitions — the q65-class fix is
  // computing the rank from the band's SCORE DISTRIBUTION instead:
  // one (band, score) agg (distinct scores ≪ students), a prefix-sum
  // window over that bounded frame, and a co-partitioned join back.
  // growth_pct = cnt_less / (n_band − 1) IS percent_rank's
  // definition — the oracle states the textbook percent_rank() and
  // hash-equality proves the distribution-frame plan equals it.
  private val q79: Q = (s, d) => {
    val byYear = T.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1997, 1998))
      .groupBy(col("o_custkey").as("student_id"), col("yr"))
      .agg(sum(money(col("o_totalprice"))).as("score"))
    val prior = byYear.filter(col("yr") === 1997)
      .select(col("student_id"), col("score").as("prior_score"))
    val curr = byYear.filter(col("yr") === 1998)
      .select(col("student_id"), col("score").as("curr_score"))
    // band from exact CENTS (decimal×100 is integral, so the
    // decimal→long cast is exact in both engines; a direct decimal
    // div/cast would truncate in Spark and round in DuckDB)
    val paired = prior.join(curr, "student_id")
      .withColumn("band",
        expr("CAST((CAST(prior_score * 100 AS BIGINT)) div 10000000 AS INT)"))
      .transform(graft.CacheScope.cached) // distribution build + rank probe
    sgpFromDistribution(paired, Seq("band"))
      .select(col("student_id"), col("prior_score").cast(DoubleType).as("prior_score"),
        col("curr_score").cast(DoubleType).as("curr_score"),
        col("band"), col("growth_pct"))
      .orderBy(col("student_id"))
  }

  /** The scale-safe percent_rank q79 pioneered, over an ARBITRARY
    * conditioning key (one band for q79, the two-prior-year band
    * matrix for q80): one (bands…, curr_score) distribution agg
    * (distinct scores ≪ students), a bounded prefix-sum window over
    * that frame, and a co-partitioned join back. growth_pct =
    * cnt_less / (n_band − 1) IS percent_rank's definition — each
    * caller's oracle states the textbook window and hash-equality
    * proves this plan equals it. */
  private def sgpFromDistribution(paired: DataFrame,
                                  bandCols: Seq[String]): DataFrame = {
    val bands = bandCols.map(col)
    val dist = paired.groupBy(bands :+ col("curr_score"): _*)
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(bands: _*).orderBy(col("curr_score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(bands: _*)
    val ranked = dist
      .withColumn("cnt_less", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("n_band", sum(col("cnt")).over(wTot))
    paired.join(ranked, bandCols :+ "curr_score")
      .withColumn("growth_pct", when(col("n_band") === 1, lit(0d))
        .otherwise(col("cnt_less").cast(DoubleType) / (col("n_band") - 1)))
  }

  // -- q80: multi-year student growth percentile ---------------------------
  // The real SGP conditions on the student's FULL score history, not
  // one prior year (Betebenner's quantile-regression SGP uses every
  // available prior; the band-matrix form here is its contingency-
  // table analogue): the peer group is students who took the same
  // path through BOTH prior-year bands, and the percentile is the
  // student's current-year standing within that path cohort. Same
  // distribution-frame machinery as q79 (one shared
  // sgpFromDistribution definition) with a composite (band96,
  // band97) key — the conditioning matrix multiplies cells, not
  // shuffle passes: still one bounded agg + two windows over the
  // distribution frame + one co-partitioned join back.
  private val q80: Q = (s, d) => {
    val byYear = T.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997, 1998))
      .groupBy(col("o_custkey").as("student_id"), col("yr"))
      .agg(sum(money(col("o_totalprice"))).as("score"))
    def yearScores(yr: Int, as: String) = byYear.filter(col("yr") === yr)
      .select(col("student_id"), col("score").as(as))
    val paired = yearScores(1996, "prior96_score")
      .join(yearScores(1997, "prior97_score"), "student_id")
      .join(yearScores(1998, "curr_score"), "student_id")
      .withColumn("band96",
        expr("CAST((CAST(prior96_score * 100 AS BIGINT)) div 10000000 AS INT)"))
      .withColumn("band97",
        expr("CAST((CAST(prior97_score * 100 AS BIGINT)) div 10000000 AS INT)"))
      .transform(graft.CacheScope.cached) // distribution build + rank probe
    sgpFromDistribution(paired, Seq("band96", "band97"))
      .select(col("student_id"),
        col("prior96_score").cast(DoubleType).as("prior96_score"),
        col("prior97_score").cast(DoubleType).as("prior97_score"),
        col("curr_score").cast(DoubleType).as("curr_score"),
        col("band96"), col("band97"), col("growth_pct"))
      .orderBy(col("student_id"))
  }

  // -- q81: cohort retention matrix ----------------------------------------
  // The classic warehouse cohort analysis (every BI deployment of the
  // reference's Reporting.md slice-by-first-seen shape): cohort = the
  // year of a customer's FIRST order; for each (cohort, year) the
  // count of cohort members still active and the retention share.
  //
  // Scale: one distinct (customer, year) partial agg (map-side
  // combine collapses a customer's orders per year before the
  // shuffle), one per-customer min agg for the cohort — both shuffle
  // on the uniform customer key and the activity join back is
  // co-partitioned on it (zero extra exchange under AQE); the cohort
  // size frame is #years rows, broadcast. No window over the fact,
  // no distinct-count over (cohort, year) pairs — the customer-grain
  // dedupe happened before anything grouped.
  private val q81: Q = (s, d) => {
    val active = T.orders(s, d)
      .select(col("o_custkey").as("cust"),
        year(col("o_orderdate")).as("yr"))
      .distinct()
      .transform(graft.CacheScope.cached) // cohort derivation + activity probe
    val first = active.groupBy(col("cust")).agg(min(col("yr")).as("cohort"))
    val cohortSize = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_n"))
    active.join(first, "cust")
      .groupBy(col("cohort"), col("yr"))
      .agg(count(lit(1)).as("active_n"))
      .join(broadcast(cohortSize), "cohort")
      .withColumn("years_since", col("yr") - col("cohort"))
      .withColumn("retention",
        col("active_n").cast(DoubleType) / col("cohort_n"))
      .select(col("cohort"), col("yr"), col("years_since"),
        col("active_n"), col("cohort_n"), col("retention"))
      .orderBy(col("cohort"), col("yr"))
  }

  private val q81Sql =
    """WITH active AS (
      |  SELECT DISTINCT o_custkey AS cust,
      |    CAST(year(o_orderdate) AS INTEGER) AS yr
      |  FROM orders),
      |first AS (SELECT cust, MIN(yr) AS cohort FROM active GROUP BY cust),
      |cs AS (SELECT cohort, COUNT(*) AS cohort_n FROM first GROUP BY cohort)
      |SELECT f.cohort, a.yr, a.yr - f.cohort AS years_since,
      |  COUNT(*) AS active_n, ANY_VALUE(cs.cohort_n) AS cohort_n,
      |  CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(cs.cohort_n) AS retention
      |FROM active a JOIN first f USING (cust) JOIN cs ON f.cohort = cs.cohort
      |GROUP BY f.cohort, a.yr ORDER BY f.cohort, a.yr""".stripMargin

  private val q80Sql =
    """WITH by_year AS (
      |  SELECT o_custkey AS student_id, year(o_orderdate) AS yr,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS score
      |  FROM orders WHERE year(o_orderdate) IN (1996, 1997, 1998)
      |  GROUP BY 1, 2),
      |paired AS (
      |  SELECT p6.student_id, p6.score AS prior96_score,
      |    p7.score AS prior97_score, c.score AS curr_score,
      |    CAST(CAST(p6.score * 100 AS BIGINT) // 10000000 AS INTEGER) AS band96,
      |    CAST(CAST(p7.score * 100 AS BIGINT) // 10000000 AS INTEGER) AS band97
      |  FROM (SELECT student_id, score FROM by_year WHERE yr = 1996) p6
      |  JOIN (SELECT student_id, score FROM by_year WHERE yr = 1997) p7
      |    USING (student_id)
      |  JOIN (SELECT student_id, score FROM by_year WHERE yr = 1998) c
      |    USING (student_id))
      |SELECT student_id,
      |  CAST(prior96_score AS DOUBLE) AS prior96_score,
      |  CAST(prior97_score AS DOUBLE) AS prior97_score,
      |  CAST(curr_score AS DOUBLE) AS curr_score,
      |  band96, band97,
      |  percent_rank() OVER (PARTITION BY band96, band97
      |    ORDER BY curr_score) AS growth_pct
      |FROM paired ORDER BY student_id""".stripMargin

  // The oracle is the TEXTBOOK percent_rank over each band — the
  // equality proves the distribution-frame prefix sum implements it.
  private val q79Sql =
    """WITH by_year AS (
      |  SELECT o_custkey AS student_id, year(o_orderdate) AS yr,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS score
      |  FROM orders WHERE year(o_orderdate) IN (1997, 1998)
      |  GROUP BY 1, 2),
      |paired AS (
      |  SELECT p.student_id, p.score AS prior_score, c.score AS curr_score,
      |    CAST(CAST(p.score * 100 AS BIGINT) // 10000000 AS INTEGER) AS band
      |  FROM (SELECT student_id, score FROM by_year WHERE yr = 1997) p
      |  JOIN (SELECT student_id, score FROM by_year WHERE yr = 1998) c
      |  USING (student_id))
      |SELECT student_id,
      |  CAST(prior_score AS DOUBLE) AS prior_score,
      |  CAST(curr_score AS DOUBLE) AS curr_score,
      |  band,
      |  percent_rank() OVER (PARTITION BY band ORDER BY curr_score) AS growth_pct
      |FROM paired ORDER BY student_id""".stripMargin

  // -- q82: arbitrary-depth org hierarchy rollup ---------------------------
  // The reference's org model is a TREE (state → district group →
  // district → school group → school — ApiSpec.md's organization
  // hierarchy), and every aggregate report rolls measures up SUBTREES,
  // not fixed levels: a district's number includes every school under
  // it however the tree nests. SQL's GROUP BY can't express "my
  // subtree" over a parent-pointer table; the warehouse form is the
  // BRIDGE TABLE — the (node, ancestor) closure — built here by the
  // reusable Operators.ancestorClosure pointer-doubling fixpoint
  // (O(log depth) join rounds; a 19-level tree converges in 5). The
  // org tree fixture derives the parent pointer from the customer key
  // (parent = key div 10 — depth grows with the corpus, exercising
  // multiple doubling rounds), the fact side pre-aggregates orders to
  // customer grain in exact cents BELOW the closure join, and the
  // subtree rollup groups the bridge by ancestor.
  //
  // Scale: closure size is nodes × avg-depth (output-bound, like any
  // bridge table — depth is log-like in org count); the closure join
  // fans a customer's pre-aggregated total out depth ways, never raw
  // orders; all sums are exact LONGs. The closure is built over the
  // org DIM, never facts.
  private val q82: Q = (s, d) => {
    val edges = T.customer(s, d)
      .select(col("c_custkey").as("node"))
      .withColumn("parent", when(col("node") >= 10, expr("node div 10")))
    val closure = Operators.ancestorClosure(edges, "node", "parent")
    val totals = T.orders(s, d)
      .groupBy(col("o_custkey").as("node"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
    closure.join(totals, Seq("node"), "left")
      .groupBy(col("anc").as("org_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(coalesce(col("cents"), lit(0L))).as("subtree_rev_cents"))
      .orderBy(col("org_id"))
  }

  // The oracle is the single-node form of the same fixpoint: a
  // recursive CTE walking parent pointers digit by digit.
  private val q82Sql =
    """WITH RECURSIVE nodes AS (SELECT c_custkey AS node FROM customer),
      |reach(node, anc) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT r.node, r.anc // 10 FROM reach r
      |  JOIN nodes n ON r.anc = n.node WHERE r.anc >= 10),
      |totals AS (
      |  SELECT o_custkey AS node,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT r.anc AS org_id, COUNT(*) AS n_members,
      |  CAST(SUM(COALESCE(t.cents, 0)) AS BIGINT) AS subtree_rev_cents
      |FROM reach r LEFT JOIN totals t ON r.node = t.node
      |GROUP BY r.anc ORDER BY org_id""".stripMargin

  // -- q83: per-org longitudinal trend line (exact-integer OLS) ------------
  // The reference's longitudinal reports draw a TREND LINE through an
  // org's yearly measure (README "longitudinal trends"; the Aggregate
  // service's year-over-year lens) — the statistic is ordinary least
  // squares over (year, measure) points. Floating-point OLS is a
  // replayability trap (Σxy over doubles is order-dependent), so this
  // is the IntLloyd/q78 discipline applied to regression: yearly
  // revenue in exact LONG cents, year index as a small LONG, and the
  // five sufficient statistics (n, Σx, Σy, Σxy, Σx²) as exact integer
  // sums — order-free, bit-identical in any engine — with slope and
  // intercept derived by two correctly-rounded double divisions at
  // the very end. Two-stage agg: facts partial-agg to (org, year)
  // cells first, so the second agg runs over ≤#years rows per org.
  //
  // Scale: one fact shuffle to (nation, year) cells (map-side
  // combine), the stats agg is #nations × #years rows, the nation dim
  // broadcasts. Customer joins via broadcast at this corpus (q03's
  // star-join contract; at warehouse scale it degrades to a
  // shuffle-hash join on the same key). x-variance > 0 needs ≥2
  // distinct years per org — the orders span guarantees 7.
  private val q83: Q = (s, d) => {
    val cells = T.orders(s, d)
      .join(broadcast(T.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .withColumn("x", (year(col("o_orderdate")) - lit(1992)).cast(LongType))
      .groupBy(col("c_nationkey"), col("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("y"))
    val stats = cells.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    stats
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("slope_cents_per_year", slope)
      .withColumn("intercept_cents",
        (col("sy").cast(DoubleType) -
          col("slope_cents_per_year") * col("sx").cast(DoubleType)) /
          col("n").cast(DoubleType))
      .select(col("n_name"), col("n").cast(IntegerType).as("n_years"),
        col("slope_cents_per_year"), col("intercept_cents"))
      .orderBy(col("n_name"))
  }

  private val q83Sql =
    """WITH cells AS (
      |  SELECT c_nationkey, CAST(year(o_orderdate) - 1992 AS BIGINT) AS x,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |stats AS (
      |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM cells GROUP BY 1)
      |SELECT n_name, CAST(n AS INTEGER) AS n_years,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |    AS slope_cents_per_year,
      |  (CAST(sy AS DOUBLE) -
      |     (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
      |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
      |FROM stats JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin

  // -- q84: performance-level transition matrix ----------------------------
  // THE growth artifact of an assessment warehouse (Reporting.md's
  // year-over-year lens; every state report card prints it): who
  // moved from level i to level j between two years? Per student, the
  // year's measure in exact cents → level by fixed cut-points (q18's
  // configured-cuts contract — no data-derived quantile cliff), then
  // the (from, to) contingency table with each cell's share of its
  // FROM row. One fact shuffle to (student, year) cells (map-side
  // combine), the self-join pairs the two years on the student key
  // co-partitioned, the matrix is ≤16 cells and the row-share window
  // runs over it — frame cost is nil at any corpus size.
  private val q84: Q = (s, d) => {
    val byYear = T.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1997, 1998))
      .groupBy(col("o_custkey").as("student_id"), col("yr"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
      .transform(graft.CacheScope.cached) // both year slices read it
    def lvl(c: org.apache.spark.sql.Column) =
      when(c < 10000000L, 1).when(c < 25000000L, 2)
        .when(c < 45000000L, 3).otherwise(4)
    val from = byYear.filter(col("yr") === 1997)
      .select(col("student_id"), lvl(col("cents")).as("level_from"))
    val to = byYear.filter(col("yr") === 1998)
      .select(col("student_id"), lvl(col("cents")).as("level_to"))
    val w = Window.partitionBy(col("level_from"))
    from.join(to, "student_id")
      .groupBy(col("level_from"), col("level_to"))
      .agg(count(lit(1)).as("n_students"))
      .withColumn("share_of_from", col("n_students").cast(DoubleType) /
        sum(col("n_students")).over(w).cast(DoubleType))
      .orderBy(col("level_from"), col("level_to"))
  }

  private val q84Sql =
    """WITH by_year AS (
      |  SELECT o_custkey AS student_id, year(o_orderdate) AS yr,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders WHERE year(o_orderdate) IN (1997, 1998) GROUP BY 1, 2),
      |lv AS (
      |  SELECT student_id, yr,
      |    CASE WHEN cents < 10000000 THEN 1 WHEN cents < 25000000 THEN 2
      |         WHEN cents < 45000000 THEN 3 ELSE 4 END AS lvl
      |  FROM by_year),
      |cells AS (
      |  SELECT f.lvl AS level_from, t.lvl AS level_to,
      |    CAST(COUNT(*) AS BIGINT) AS n_students
      |  FROM (SELECT student_id, lvl FROM lv WHERE yr = 1997) f
      |  JOIN (SELECT student_id, lvl FROM lv WHERE yr = 1998) t
      |  USING (student_id)
      |  GROUP BY 1, 2)
      |SELECT level_from, level_to, n_students,
      |  CAST(n_students AS DOUBLE) /
      |    CAST(CAST(SUM(n_students) OVER (PARTITION BY level_from) AS BIGINT)
      |      AS DOUBLE) AS share_of_from
      |FROM cells ORDER BY level_from, level_to""".stripMargin

  // -- q85: norms table construction ---------------------------------------
  // The reference SHIPS norms files (Norms.md's percentile tables —
  // q31 looks them up, q50 validates them); q85 is the missing
  // producer side: BUILD the percentile → cut-score table from the
  // score population. cut(p) is the textbook discrete percentile —
  // the smallest score whose cumulative population share reaches
  // p/100 — and the scale-safe plan never sorts the population:
  // scores partial-agg to exact-cent cells, the DISTINCT-score
  // distribution frame gets one bounded prefix-sum window, and each
  // distinct score row computes the RANGE of percentiles it serves by
  // integer arithmetic (p ∈ [⌊100·prev_cum/n⌋+1, ⌊100·cum/n⌋]) and
  // explodes to its ≤99 output rows. The oracle states the textbook
  // definition (min score with 100·cum ≥ p·n per spine percentile) —
  // hash equality proves the range-explode plan equals it. Everything
  // is exact integers; no doubles anywhere.
  //
  // Scale: one fact shuffle to score cells, one shuffle to the
  // distinct-score frame, and the prefix sum over THAT frame is
  // RANGE-PARTITIONED (round 16, closing the round-15 watch item:
  // distinct money-cent values can reach 10⁶–10⁷ at 100×, too big
  // for one ORDER BY window partition): distinct scores bucket by
  // score div 10⁶ (fixed $10k range cells — bucket count follows the
  // VALUE RANGE of a yearly customer spend, not data volume), the
  // in-bucket cumsum runs partitioned-parallel, and bucket offsets
  // come from one tiny prefix sum over the ≤~10³-row bucket-total
  // frame, broadcast back. Result rows are identical to the naive
  // global window (the unchanged oracle proves it). Output fixed at
  // ≤99 rows; the 1-row total broadcasts.
  private val q85: Q = (s, d) => {
    val scores = T.orders(s, d)
      .filter(year(col("o_orderdate")) === 1998)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("score"))
    val dist = scores.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
      .withColumn("bkt", expr("score div 1000000L"))
    val tot = dist.agg(sum(col("cnt")).as("n"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = dist.groupBy(col("bkt")).agg(sum(col("cnt")).as("bcnt"))
      .withColumn("off", coalesce(sum(col("bcnt")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("off"))
    dist
      .withColumn("lcum", sum(col("cnt")).over(wIn))
      .join(broadcast(offs), "bkt")
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("lcum") + col("off"))
      .withColumn("prev_cum", col("cum") - col("cnt"))
      .withColumn("p_low",
        greatest(expr("(prev_cum * 100) div n + 1"), lit(1L)))
      .withColumn("p_high", least(expr("(cum * 100) div n"), lit(99L)))
      .filter(col("p_low") <= col("p_high"))
      .select(explode(sequence(col("p_low"), col("p_high"))).as("p"),
        col("score").as("cut_score_cents"))
      .select(col("p").cast(IntegerType).as("percentile"),
        col("cut_score_cents"))
      .orderBy(col("percentile"))
  }

  private val q85Sql =
    """WITH scores AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS score
      |  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY 1),
      |dist AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt FROM scores GROUP BY 1),
      |cums AS (
      |  SELECT score, cnt,
      |    CAST(SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum,
      |    (SELECT CAST(SUM(cnt) AS BIGINT) FROM dist) AS n
      |  FROM dist),
      |spine AS (SELECT unnest(generate_series(1, 99)) AS percentile)
      |SELECT CAST(p.percentile AS INTEGER) AS percentile,
      |  MIN(c.score) AS cut_score_cents
      |FROM spine p JOIN cums c ON 100 * c.cum >= p.percentile * c.n
      |GROUP BY 1 ORDER BY percentile""".stripMargin

  // -- q86: minimum-n cell suppression -------------------------------------
  // The privacy gate every published aggregate report applies before
  // release (the reference's aggregate reports + embargo/admin release
  // controls — Architecture.md "Aggregate Reporting", "Admin"; the
  // min-n rule itself is the standard state-assessment reporting
  // practice): a (org × performance-level) cell whose student count is
  // below the configured minimum must not be published, and when
  // exactly ONE cell in an org's row is suppressed, the row total
  // would reveal it by subtraction — so the smallest remaining cell is
  // suppressed too (classic complementary suppression, deterministic
  // tie-break on level). Counts survive in the `suppressed`/`reason`
  // audit columns; the published `n_published` goes NULL.
  //
  // Scale: one fact partial-agg shuffle to (org, level) cells under
  // the broadcast dims; everything after — the primary flag, the
  // per-org suppressed-count, the smallest-unsuppressed rank — is
  // window arithmetic over the AGGREGATED frame (#orgs × #levels rows
  // at any corpus size). The suppression logic never sees facts.
  private val q86: Q = (s, d) => {
    val minN = 10L
    // the published grain is org × YEAR × level (aggregate reports
    // publish per administration year) — at the gate SFs the finer
    // grain means BOTH suppression branches actually fire and are
    // hash-certified, not just compiled
    val cells = T.orders(s, d)
      .join(T.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("level",
        when(col("o_totalprice") < 100000, "L1_below")
          .when(col("o_totalprice") < 200000, "L2_approaching")
          .when(col("o_totalprice") < 350000, "L3_meets")
          .otherwise("L4_exceeds"))
      .withColumn("yr", year(col("o_orderdate")).cast(IntegerType))
      .groupBy(col("n_name"), col("yr"), col("level"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("n_name"), col("yr"))
    val wRank = Window.partitionBy(col("n_name"), col("yr"))
      .orderBy(col("is_primary"), col("n"), col("level"))
    cells
      .withColumn("is_primary", col("n") < minN)
      .withColumn("n_suppressed", sum(when(col("is_primary"), 1L).otherwise(0L)).over(w))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("is_comp",
        col("n_suppressed") === 1L && !col("is_primary") && col("rk") === 1)
      .select(col("n_name"), col("yr"), col("level"), col("n"),
        when(col("is_primary") || col("is_comp"), lit(null).cast(LongType))
          .otherwise(col("n")).as("n_published"),
        (col("is_primary") || col("is_comp")).as("suppressed"),
        when(col("is_primary"), "primary")
          .when(col("is_comp"), "complementary")
          .otherwise(lit(null).cast(StringType)).as("reason"))
      .orderBy(col("n_name"), col("yr"), col("level"))
  }

  private val q86Sql =
    """WITH cells AS (
      |  SELECT n.n_name,
      |    CAST(year(o.o_orderdate) AS INTEGER) AS yr,
      |    CASE WHEN o.o_totalprice < 100000 THEN 'L1_below'
      |      WHEN o.o_totalprice < 200000 THEN 'L2_approaching'
      |      WHEN o.o_totalprice < 350000 THEN 'L3_meets'
      |      ELSE 'L4_exceeds' END AS level,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2, 3),
      |flagged AS (
      |  SELECT n_name, yr, level, n,
      |    n < 10 AS is_primary,
      |    CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY n_name, yr) AS BIGINT) AS n_suppressed,
      |    row_number() OVER (PARTITION BY n_name, yr
      |      ORDER BY n < 10, n, level) AS rk
      |  FROM cells),
      |marked AS (
      |  SELECT n_name, yr, level, n, is_primary,
      |    n_suppressed = 1 AND NOT is_primary AND rk = 1 AS is_comp
      |  FROM flagged)
      |SELECT n_name, yr, level, n,
      |  CASE WHEN is_primary OR is_comp THEN NULL ELSE n END AS n_published,
      |  is_primary OR is_comp AS suppressed,
      |  CASE WHEN is_primary THEN 'primary'
      |    WHEN is_comp THEN 'complementary' ELSE NULL END AS reason
      |FROM marked ORDER BY n_name, yr, level""".stripMargin

  // -- q90: empirical-Bayes shrunken org ranking ---------------------------
  // The league-table correction every small-n reporting shop needs
  // (public-textbook empirical Bayes / James-Stein shrinkage): a tiny
  // school's raw mean bounces, so ranked report cards shrink each
  // org's mean toward the population mean in proportion to its size —
  // shrunk = (n·x̄ + k·μ)/(n + k), prior strength k as config. The
  // replayable form keeps everything rational until ONE division:
  // with per-org exact cent sums (sum_i, n_i) and population totals
  // (S, N), shrunk_i = (N·sum_i + k·S) / (N·(n_i + k)) — numerator
  // and denominator exact DECIMAL(38)/HUGEINT integers, the double is
  // one exactly-rounded division, and the rank orders by that
  // bit-identical double (tie → org). Emitting raw vs shrunk rank
  // side by side shows exactly which small orgs the correction
  // demotes — the point of the report.
  //
  // Scale: one fact partial-agg shuffle to #org cells under the
  // broadcast dim; the 1-row population frame broadcasts back; both
  // rank windows run over the #orgs frame.
  private val q90: Q = (s, d) => {
    val k = 25L // prior strength: the classic "~25 observations" prior
    val cells = T.orders(s, d)
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"))
    val pop = cells.agg(sum(col("n")).as("big_n"), sum(col("sum_cents")).as("big_s"))
    val wRaw = Window.orderBy(col("raw_mean").desc, col("n_name"))
    val wShr = Window.orderBy(col("shrunk_mean").desc, col("n_name"))
    cells.crossJoin(broadcast(pop))
      .withColumn("raw_mean",
        (col("sum_cents").cast(DoubleType) / col("n")) / lit(100.0))
      .withColumn("shrunk_mean", expr(
        s"CAST(CAST(big_n AS DECIMAL(38,0)) * sum_cents + $k * CAST(big_s AS DECIMAL(38,0)) AS DOUBLE) " +
          s"/ CAST(CAST(big_n AS DECIMAL(38,0)) * (n + $k) AS DOUBLE) / 100.0"))
      .withColumn("raw_rank", row_number().over(wRaw))
      .withColumn("shrunk_rank", row_number().over(wShr))
      .select(col("n_name"), col("n"), col("raw_mean"), col("shrunk_mean"),
        col("raw_rank"), col("shrunk_rank"),
        (col("raw_rank") - col("shrunk_rank")).as("rank_delta"))
      .orderBy(col("shrunk_rank"))
  }

  private val q90Sql =
    """WITH cells AS (
      |  SELECT nn.n_name, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sum_cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation nn ON c.c_nationkey = nn.n_nationkey
      |  GROUP BY 1),
      |pop AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS big_n,
      |    CAST(SUM(sum_cents) AS BIGINT) AS big_s
      |  FROM cells),
      |t AS (
      |  SELECT c.n_name, c.n,
      |    CAST(c.sum_cents AS DOUBLE) / c.n / 100.0 AS raw_mean,
      |    CAST(CAST(p.big_n AS HUGEINT) * c.sum_cents + 25 * CAST(p.big_s AS HUGEINT)
      |      AS DOUBLE)
      |      / CAST(CAST(p.big_n AS HUGEINT) * (c.n + 25) AS DOUBLE) / 100.0
      |      AS shrunk_mean
      |  FROM cells c, pop p),
      |r AS (
      |  SELECT n_name, n, raw_mean, shrunk_mean,
      |    row_number() OVER (ORDER BY raw_mean DESC, n_name) AS raw_rank,
      |    row_number() OVER (ORDER BY shrunk_mean DESC, n_name) AS shrunk_rank
      |  FROM t)
      |SELECT n_name, n, raw_mean, shrunk_mean,
      |  CAST(raw_rank AS INTEGER) AS raw_rank,
      |  CAST(shrunk_rank AS INTEGER) AS shrunk_rank,
      |  CAST(raw_rank AS INTEGER) - CAST(shrunk_rank AS INTEGER) AS rank_delta
      |FROM r ORDER BY shrunk_rank""".stripMargin

  // -- q91: achievement-gap report (subgroup vs org overall) ---------------
  // The gap analysis an assessment warehouse publishes next to every
  // proficiency table (reference: docs/Architecture.md aggregate
  // reporting — subgroup dimensions over the same measures): for each
  // org × student subgroup, percent at/above the proficiency cut
  // (q18's L3 cut-point, one shared constant) side by side with the
  // org's OVERALL rate and the gap in percentage points. Exactness:
  // numerators/denominators are exact LONGs; each pct is ONE IEEE
  // division; the gap is a subtraction of two bit-identical doubles
  // times a literal — engine-identical end to end. The subgroup cells
  // REAGGREGATE to the org line (Σ n_prof = org NP by construction),
  // which the spec pins as the internal-consistency invariant real
  // gap reports are audited against.
  //
  // Scale: ONE fact partial-agg shuffle to #org × #segment cells
  // under the broadcast nation dim; the org-overall frame is a
  // re-agg of those cells (bounded), joined back on the org key —
  // the fact table is read once and never joined post-agg.
  private val q91: Q = (s, d) => {
    val cells = T.orders(s, d)
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_students"),
        sum(when(col("o_totalprice") >= 200000, 1L).otherwise(0L))
          .as("n_proficient"))
      // read twice (output rows + the org-overall re-agg): cache the
      // #org × #segment cell frame so the single-fact-scan claim holds
      // regardless of whether AQE lets ReuseExchange fire
      .transform(graft.CacheScope.cached)
    val overall = cells.groupBy(col("n_name"))
      .agg(sum(col("n_students")).as("org_n"),
        sum(col("n_proficient")).as("org_prof"))
    cells.join(broadcast(overall), Seq("n_name"))
      .withColumn("pct_proficient",
        col("n_proficient").cast(DoubleType) / col("n_students"))
      .withColumn("overall_pct",
        col("org_prof").cast(DoubleType) / col("org_n"))
      .withColumn("gap_pp",
        (col("pct_proficient") - col("overall_pct")) * lit(100.0))
      .select(col("n_name"), col("segment"), col("n_students"),
        col("n_proficient"), col("pct_proficient"), col("overall_pct"),
        col("gap_pp"))
      .orderBy(col("n_name"), col("segment"))
  }

  private val q91Sql =
    """WITH cells AS (
      |  SELECT nn.n_name, c.c_mktsegment AS segment,
      |    CAST(COUNT(*) AS BIGINT) AS n_students,
      |    CAST(SUM(CASE WHEN o.o_totalprice >= 200000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_proficient
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation nn ON c.c_nationkey = nn.n_nationkey
      |  GROUP BY 1, 2),
      |org AS (
      |  SELECT n_name, CAST(SUM(n_students) AS BIGINT) AS org_n,
      |    CAST(SUM(n_proficient) AS BIGINT) AS org_prof
      |  FROM cells GROUP BY 1)
      |SELECT c.n_name, c.segment, c.n_students, c.n_proficient,
      |  CAST(c.n_proficient AS DOUBLE) / c.n_students AS pct_proficient,
      |  CAST(o.org_prof AS DOUBLE) / o.org_n AS overall_pct,
      |  (CAST(c.n_proficient AS DOUBLE) / c.n_students
      |    - CAST(o.org_prof AS DOUBLE) / o.org_n) * 100.0 AS gap_pp
      |FROM cells c JOIN org o ON c.n_name = o.n_name
      |ORDER BY c.n_name, c.segment""".stripMargin

  // -- q92: cut-score what-if (level migration matrix) ----------------------
  // The standard-setting impact analysis run before any cut-score
  // change ships (reference: docs/Norms.md — cut scores are versioned
  // config): re-band every exam under a PROPOSED cut-point set and
  // cross-tabulate current level × proposed level, so the committee
  // sees exactly how many students each boundary shift moves and in
  // which direction. Proposed cuts here raise the L3 entry
  // (200000 → 220000, demotions) and lower the L4 entry
  // (350000 → 330000, promotions) — both directions exercised.
  // Exactness: the matrix is pure integer counts off ONE scan (both
  // CASE brandings are map-side over the same row); pct_of_current is
  // one IEEE division against the current-level total, re-aggregated
  // from the matrix cells themselves. Cut shifts move a row only to
  // an ADJACENT level PROVIDED each shifted boundary stays strictly
  // between its neighboring current cuts (true for this proposal:
  // 200000→220000 < 350000 and 100000 < 330000←350000); a proposal
  // crossing another current cut would move rows two levels — so the
  // precondition is require()d below, not assumed, and the spec pins
  // the adjacency invariant plus the row-sum identity (matrix
  // marginals = q18's current distribution).
  //
  // Scale: one partial-agg shuffle of map-side (old, new) partials to
  // ≤16 cells; the marginal frame is a re-agg of the matrix. The fact
  // table is scanned once, never joined.
  private val q92Levels = Seq("L1_below", "L2_approaching", "L3_meets", "L4_exceeds")
  private val q92CurrentCuts = Seq(100000L, 200000L, 350000L) // entry to L2/L3/L4
  private val q92ProposedCuts = Seq(100000L, 220000L, 330000L)

  private val q92: Q = (s, d) => {
    // Adjacency precondition, pinned: each proposed cut must stay
    // strictly inside the open interval of its neighboring CURRENT
    // cuts, else the "migrations land on an adjacent level" invariant
    // (and the spec that encodes it) silently breaks.
    q92ProposedCuts.zipWithIndex.foreach { case (p, i) =>
      val lo = if (i == 0) Long.MinValue else q92CurrentCuts(i - 1)
      val hi = if (i == q92CurrentCuts.size - 1) Long.MaxValue else q92CurrentCuts(i + 1)
      require(lo < p && p < hi,
        s"proposed cut $p crosses a neighboring current cut ($lo, $hi) — " +
          "adjacency invariant no longer holds; widen the what-if to a multi-level matrix")
    }
    def band(cuts: Seq[Long]) =
      cuts.zip(q92Levels).foldRight(lit(q92Levels.last)) { case ((c, lvl), e) =>
        when(col("o_totalprice") < c, lvl).otherwise(e)
      }
    val cur = band(q92CurrentCuts)
    val prop = band(q92ProposedCuts)
    val cellsDf = T.orders(s, d)
      .select(cur.as("current_level"), prop.as("proposed_level"))
      .groupBy(col("current_level"), col("proposed_level"))
      .agg(count(lit(1)).as("n"))
    val marg = cellsDf.groupBy(col("current_level"))
      .agg(sum(col("n")).as("current_total"))
    cellsDf.join(broadcast(marg), Seq("current_level"))
      .withColumn("pct_of_current",
        col("n").cast(DoubleType) / col("current_total"))
      .withColumn("moved", col("current_level") =!= col("proposed_level"))
      .select(col("current_level"), col("proposed_level"), col("n"),
        col("current_total"), col("pct_of_current"), col("moved"))
      .orderBy(col("current_level"), col("proposed_level"))
  }

  private val q92Sql =
    """WITH branded AS (
      |  SELECT
      |    CASE WHEN o_totalprice < 100000 THEN 'L1_below'
      |      WHEN o_totalprice < 200000 THEN 'L2_approaching'
      |      WHEN o_totalprice < 350000 THEN 'L3_meets'
      |      ELSE 'L4_exceeds' END AS current_level,
      |    CASE WHEN o_totalprice < 100000 THEN 'L1_below'
      |      WHEN o_totalprice < 220000 THEN 'L2_approaching'
      |      WHEN o_totalprice < 330000 THEN 'L3_meets'
      |      ELSE 'L4_exceeds' END AS proposed_level
      |  FROM orders),
      |cells AS (
      |  SELECT current_level, proposed_level, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM branded GROUP BY 1, 2),
      |marg AS (
      |  SELECT current_level, CAST(SUM(n) AS BIGINT) AS current_total
      |  FROM cells GROUP BY 1)
      |SELECT c.current_level, c.proposed_level, c.n, m.current_total,
      |  CAST(c.n AS DOUBLE) / m.current_total AS pct_of_current,
      |  c.current_level <> c.proposed_level AS moved
      |FROM cells c JOIN marg m ON c.current_level = m.current_level
      |ORDER BY c.current_level, c.proposed_level""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q91_achievement_gap" -> q91, "q92_cut_score_whatif" -> q92,
    "q90_shrunk_ranking" -> q90,
    "q86_cell_suppression" -> q86,
    "q79_growth_percentile" -> q79, "q80_growth_multi_year" -> q80,
    "q81_cohort_retention" -> q81, "q82_org_rollup" -> q82,
    "q83_trend_slope" -> q83, "q84_level_transition" -> q84,
    "q85_norms_build" -> q85,
    "q78_irt_theta" -> q78, "q88_item_fit" -> q88,
    "q77_translation_coverage" -> q77,
    "q76_archive_restore_audit" -> q76,
    "q75_tenant_config" -> q75,
    "q74_isr_assembly" -> q74,
    "q73_alt_scores" -> q73,
    "q72_bloom_runtime_filter" -> q72,
    "q71_sandbox_datagen" -> q71,
    "q70_pipeline_tests" -> q70,
    "q68_duplicate_org_cleanup" -> q68, "q69_writing_traits" -> q69,
    "q55_item_difficulty" -> q55, "q56_item_standard_rollup" -> q56,
    "q57_student_responses" -> q57, "q58_resource_links" -> q58,
    "q59_item_discrimination" -> q59, "q60_year_purge_audit" -> q60) ++ Map(
    "q40_soft_delete_migrate" -> q40, "q41_norms_overlap" -> q41,
    "q42_audit_diff" -> q42, "q43_group_replace" -> q43,
    "q44_embargo_gate" -> q44, "q45_missing_data" -> q45,
    "q46_pseudonymize" -> q46, "q47_incremental_agg" -> q47,
    "q48_import_dedup" -> q48, "q49_claim_scores" -> q49,
    "q50_norms_validate" -> q50, "q51_org_sync" -> q51,
    "q52_accommodations" -> q52, "q53_resubmit_unprocessed" -> q53,
    "q54_target_report" -> q54) ++ Map(
    "q33_approx_distinct" -> q33, "q34_approx_percentile" -> q34,
    "q35_scd2_history" -> q35, "q36_asof_native" -> q36,
    "q37_reconcile" -> q37, "q38_set_ops" -> q38, "q39_ntile_bands" -> q39) ++ Map(
    "q01_agg_summary" -> q01, "q02_filter_project" -> q02, "q03_star_join" -> q03,
    "q04_broadcast_join" -> q04, "q05_percentiles" -> q05, "q06_window_rank" -> q06,
    "q07_longitudinal" -> q07, "q08_pivot" -> q08, "q09_rollup" -> q09,
    "q10_cube" -> q10, "q11_grouping_sets" -> q11, "q12_distinct_count" -> q12,
    "q13_conditional_rates" -> q13, "q14_semi_join" -> q14, "q15_anti_join" -> q15,
    "q16_latest_wins" -> q16, "q17_running_total" -> q17, "q18_bucketing" -> q18,
    "q19_topk_per_group" -> q19, "q20_union_merge" -> q20, "q21_range_join" -> q21,
    "q22_asof_join" -> q22, "q23_sessionize" -> q23, "q24_having" -> q24,
    "q25_string_norm" -> q25, "q26_date_trunc" -> q26, "q27_null_handling" -> q27,
    "q28_revenue" -> q28, "q29_validate_split" -> q29, "q30_correlated_sub" -> q30,
    "q31_norms_lookup" -> q31, "q32_skew_agg" -> q32)

  val oracle: Map[String, String] = Map(
    "q91_achievement_gap" -> q91Sql, "q92_cut_score_whatif" -> q92Sql,
    "q79_growth_percentile" -> q79Sql, "q80_growth_multi_year" -> q80Sql,
    "q81_cohort_retention" -> q81Sql, "q82_org_rollup" -> q82Sql,
    "q83_trend_slope" -> q83Sql, "q84_level_transition" -> q84Sql,
    "q85_norms_build" -> q85Sql, "q86_cell_suppression" -> q86Sql,
    "q90_shrunk_ranking" -> q90Sql,
    "q78_irt_theta" -> q78Sql, "q88_item_fit" -> q88Sql,
    "q77_translation_coverage" -> q77Sql,
    "q76_archive_restore_audit" -> q76Sql,
    "q75_tenant_config" -> q75Sql,
    "q74_isr_assembly" -> q74Sql,
    "q73_alt_scores" -> q73Sql,
    "q72_bloom_runtime_filter" -> q72Sql,
    "q71_sandbox_datagen" -> q71Sql,
    "q70_pipeline_tests" -> q70Sql,
    "q68_duplicate_org_cleanup" -> q68Sql, "q69_writing_traits" -> q69Sql,
    "q55_item_difficulty" -> q55Sql, "q56_item_standard_rollup" -> q56Sql,
    "q57_student_responses" -> q57Sql, "q58_resource_links" -> q58Sql,
    "q59_item_discrimination" -> q59Sql, "q60_year_purge_audit" -> q60Sql,
    "q40_soft_delete_migrate" -> q40Sql, "q41_norms_overlap" -> q41Sql,
    "q42_audit_diff" -> q42Sql, "q43_group_replace" -> q43Sql,
    "q44_embargo_gate" -> q44Sql, "q45_missing_data" -> q45Sql,
    "q46_pseudonymize" -> q46Sql, "q47_incremental_agg" -> q47Sql,
    "q48_import_dedup" -> q48Sql, "q49_claim_scores" -> q49Sql,
    "q50_norms_validate" -> q50Sql, "q51_org_sync" -> q51Sql,
    "q52_accommodations" -> q52Sql, "q53_resubmit_unprocessed" -> q53Sql,
    "q54_target_report" -> q54Sql,
    "q35_scd2_history" -> q35Sql, "q36_asof_native" -> q22Sql,
    "q37_reconcile" -> q37Sql, "q38_set_ops" -> q38Sql,
    "q39_ntile_bands" -> q39Sql) ++ Map(
    "q01_agg_summary" -> q01Sql, "q02_filter_project" -> q02Sql, "q03_star_join" -> q03Sql,
    "q04_broadcast_join" -> q04Sql, "q05_percentiles" -> q05Sql, "q06_window_rank" -> q06Sql,
    "q07_longitudinal" -> q07Sql, "q08_pivot" -> q08Sql, "q09_rollup" -> q09Sql,
    "q10_cube" -> q10Sql, "q11_grouping_sets" -> q11Sql, "q12_distinct_count" -> q12Sql,
    "q13_conditional_rates" -> q13Sql, "q14_semi_join" -> q14Sql, "q15_anti_join" -> q15Sql,
    "q16_latest_wins" -> q16Sql, "q17_running_total" -> q17Sql, "q18_bucketing" -> q18Sql,
    "q19_topk_per_group" -> q19Sql, "q20_union_merge" -> q20Sql, "q21_range_join" -> q21Sql,
    "q22_asof_join" -> q22Sql, "q23_sessionize" -> q23Sql, "q24_having" -> q24Sql,
    "q25_string_norm" -> q25Sql, "q26_date_trunc" -> q26Sql, "q27_null_handling" -> q27Sql,
    "q28_revenue" -> q28Sql, "q29_validate_split" -> q29Sql, "q30_correlated_sub" -> q30Sql,
    "q31_norms_lookup" -> q31Sql, "q32_skew_agg" -> q32Sql,
    "q33_approx_distinct" -> q33Sql, "q34_approx_percentile" -> q34Sql)
}
