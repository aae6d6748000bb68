package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.operators.Operators

/** Operational-monitoring operator family (SURVEY.md §2, q61–q67).
  *
  * The reference documents the exact SQL its operators run against the
  * warehouse to monitor the system (reference
  * /root/reference/docs/Monitoring.md): import-status failure counts
  * (:37), ingest-speed histograms (:94), time-to-warehouse delay
  * distributions with dynamic hour/day buckets (:123), migrate-rate
  * statistics (:191), system-use-by-date adoption curves (:224),
  * organization activity (:259) and exam distribution (:278). Each
  * query here reproduces one of those reports Spark-first, with a
  * DuckDB oracle under the engine's exactness policy (integer counts,
  * integer time arithmetic via epoch-microsecond floor division, at
  * most one IEEE division per emitted double).
  *
  * Model mapping (SURVEY.md §1): import requests → orders (status =
  * o_orderstatus, created = o_orderdate), processing events → events
  * (created/updated timestamp pairs come from click→purchase, the one
  * table with real intra-day timestamps), migrate batches → gap
  * sessionized event runs, organizations → nation/supplier.
  */
object Monitoring {
  type Q = (SparkSession, String) => DataFrame

  // -- q61: import status monitor ------------------------------------------
  // Monitoring.md:37 "Import Status": count imports stuck in each
  // non-final status, decoded through the import_status name table,
  // with the reference's trailing TOTAL row (its UNION ... 'TOTAL'
  // query). The status-name registry arrives through the strict
  // config-CSV contract like every other admin-configured table.
  //
  // Scale: the fact scan pre-aggregates to ≤ #statuses partial rows
  // per task before the one shuffle; the dim join and the TOTAL
  // grouping-set run over the aggregated frame (#statuses rows), so
  // the GROUPING SETS expansion never sees facts.
  private[graft] val q61StatusCsv: String =
    """status_code,status_name
      |O,ACCEPTED
      |P,PARTIAL""".stripMargin

  /** Tenant overlay for the status registry (q75's resolution class):
    * tenant OT renames P and declares a tenant-only status. q61 runs
    * as tenant CA, which has no overlay → the resolver's base-fallback
    * path yields exactly the instance registry (IngestSpec proves the
    * OT view differs in just those rows). */
  private[graft] val q61TenantStatusCsv: String =
    """tenant,status_code,status_name
      |OT,P,PENDING
      |OT,X,EXPIRED""".stripMargin

  private val q61: Q = (s, d) => {
    val dim = graft.sources.Ingest.resolveTenantConfig(
      graft.sources.Ingest.parseConfigCsv(s, q61StatusCsv,
        StructType.fromDDL("status_code string not null, status_name string not null")),
      graft.sources.Ingest.parseConfigCsv(s, q61TenantStatusCsv,
        StructType.fromDDL("tenant string not null, status_code string not null, status_name string not null")),
      tenant = "CA", keyCol = "status_code", valueCol = "status_name")
      .select(col("status_code"), col("status_name"))
    val agg = T.orders(s, d)
      .filter(col("o_orderstatus") =!= "F") // non-final only
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(dim), col("o_orderstatus") === col("status_code"))
    // GROUPING SETS via the Dataset API (no session temp view: a
    // fixed-name createOrReplaceTempView mutates shared catalog state,
    // so two concurrent invocations in one session would race)
    agg.groupingSets(
        Seq(Seq(col("status_code"), col("status_name")), Seq.empty),
        col("status_code"), col("status_name"))
      .agg(sum(col("n")).as("n_imports"))
      .select(coalesce(col("status_code"), lit("*")).as("status_code"),
        coalesce(col("status_name"), lit("TOTAL")).as("status_name"),
        col("n_imports"))
      .orderBy(col("status_code"))
  }

  private val q61Sql =
    """WITH dim AS (SELECT * FROM (VALUES
      |  ('O', 'ACCEPTED'), ('P', 'PARTIAL')) AS t(status_code, status_name)),
      |agg AS (
      |  SELECT o_orderstatus AS code, COUNT(*) AS n
      |  FROM orders WHERE o_orderstatus <> 'F' GROUP BY 1),
      |j AS (SELECT status_code, status_name, n FROM agg JOIN dim ON code = status_code)
      |SELECT COALESCE(status_code, '*') AS status_code,
      |  COALESCE(status_name, 'TOTAL') AS status_name,
      |  CAST(SUM(n) AS BIGINT) AS n_imports
      |FROM j
      |GROUP BY GROUPING SETS ((status_code, status_name), ())
      |ORDER BY status_code""".stripMargin

  // Shared by q62/q63: for every processed result (purchase), the
  // timestamp of the LATEST prior submission event (click) by the same
  // user — the created/updated pair of Monitoring.md's import-timing
  // queries, built in ONE window pass (last-value-carried-forward, the
  // q16/q35 shape) instead of a self-join. Frame ends at 1 PRECEDING so
  // a row never matches itself; ordering (ts, event_id) is total, so
  // the frame — and therefore the max — is deterministic.
  private def withLastClick(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" && col("last_click").isNotNull)
      .withColumn("proc_sec",
        expr("(unix_micros(ts) - unix_micros(last_click)) div 1000000"))
  }

  private val lastClickSql =
    """SELECT *,
      |    (epoch_us(ts) - epoch_us(last_click)) // 1000000 AS proc_sec
      |  FROM (
      |    SELECT user_id, ts, event_type,
      |      max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      |    FROM events)
      |  WHERE event_type = 'purchase' AND last_click IS NOT NULL""".stripMargin

  // -- q62: ingest speed histogram -----------------------------------------
  // Monitoring.md:94 "Monitor Ingest Speed": the processing time of an
  // import is created→updated; the documented report is its histogram
  // (SELECT minutes, COUNT(*) ... GROUP BY minutes). Modeled on the
  // event stream: a result processed within the one-hour window
  // (e03's attribution interval) bucketed by whole minutes.
  //
  // Scale: one shuffle for the per-user window, then a ≤60-cell
  // partial-agg — the histogram shuffle moves ≤60 rows per task no
  // matter the event volume.
  private val q62: Q = (s, d) =>
    withLastClick(T.events(s, d))
      .filter(col("proc_sec") < 3600)
      .withColumn("proc_minutes", expr("proc_sec div 60"))
      .groupBy(col("proc_minutes"))
      .agg(count(lit(1)).as("n_imports"))
      .orderBy(col("proc_minutes"))

  private val q62Sql =
    s"""WITH processed AS (
      |  $lastClickSql)
      |SELECT proc_sec // 60 AS proc_minutes, COUNT(*) AS n_imports
      |FROM processed WHERE proc_sec < 3600
      |GROUP BY 1 ORDER BY proc_minutes""".stripMargin

  // -- q63: time-to-warehouse distribution (dynamic buckets) ---------------
  // Monitoring.md:123 "Monitor Time-To-Warehouse": delay between the
  // result's completed-at and its arrival, bucketed BY HOUR for the
  // first 24 hours and BY DAY beyond — the reference's two-granularity
  // CASE query (its "slow, use with care" variant needs a self-join;
  // here the carried-forward window pass makes it one scan).
  //
  // Scale: same one-window-pass + bounded-cell agg as q62; the output
  // cardinality is ≤ 24 hour-buckets + max-delay day-buckets.
  private val q63: Q = (s, d) =>
    withLastClick(T.events(s, d))
      .withColumn("delay_hours", expr("proc_sec div 3600"))
      .withColumn("bucket",
        when(col("delay_hours") < 24, lit("hour")).otherwise(lit("day")))
      .withColumn("delay",
        when(col("delay_hours") < 24, col("delay_hours"))
          .otherwise(expr("proc_sec div 86400")))
      .groupBy(col("bucket"), col("delay"))
      .agg(count(lit(1)).as("n_results"))
      .orderBy(col("bucket").desc, col("delay"))

  private val q63Sql =
    s"""WITH processed AS (
      |  $lastClickSql),
      |bucketed AS (
      |  SELECT CASE WHEN proc_sec // 3600 < 24 THEN 'hour' ELSE 'day' END AS bucket,
      |    CASE WHEN proc_sec // 3600 < 24 THEN proc_sec // 3600
      |         ELSE proc_sec // 86400 END AS delay
      |  FROM processed)
      |SELECT bucket, delay, COUNT(*) AS n_results
      |FROM bucketed GROUP BY bucket, delay
      |ORDER BY bucket DESC, delay""".stripMargin

  // -- q64: migrate rate report --------------------------------------------
  // Monitoring.md:191 "Monitor Migrate Rate": migrate batches are
  // timestamp ranges; the documented monitors are the per-day batch
  // runtimes, their average, and the slowest batches. Batches modeled
  // as gap-sessionized event runs (the migrate service processes
  // contiguous work then goes idle); one report row per day: batch
  // count, average runtime (one IEEE division of the exact integer
  // sum), slowest runtime.
  //
  // Scale: sessionize is one shuffle on the key; the per-session agg
  // reuses that partitioning (groupBy user_id, session_id), and the
  // daily rollup shuffles ≤ #days cells.
  private val q64: Q = (s, d) => {
    val sessions = Operators.sessionize(T.events(s, d), "user_id", "ts", 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("started"), max(col("ts")).as("finished"))
      .withColumn("runtime_sec",
        expr("(unix_micros(finished) - unix_micros(started)) div 1000000"))
    sessions
      .groupBy(to_date(col("started")).as("migrate_date"))
      .agg(count(lit(1)).as("n_migrates"),
        // unrounded: exact BIGINT sum, one IEEE division (the q52/q54
        // policy — round(x,4) can diverge on a half boundary)
        (sum(col("runtime_sec")).cast(DoubleType) / count(lit(1)))
          .as("avg_runtime_sec"),
        max(col("runtime_sec")).as("max_runtime_sec"))
      .orderBy(col("migrate_date"))
  }

  private val q64Sql =
    """WITH l AS (
      |  SELECT user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev IS NULL THEN 0
      |         WHEN epoch_us(ts) - epoch_us(prev) > 1800 * 1000000 THEN 1
      |         ELSE 0 END AS nf
      |  FROM l),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM f),
      |runs AS (
      |  SELECT user_id, session_id, min(ts) AS started, max(ts) AS finished,
      |    (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS runtime_sec
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT CAST(started AS DATE) AS migrate_date,
      |  COUNT(*) AS n_migrates,
      |  CAST(CAST(SUM(runtime_sec) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_runtime_sec,
      |  CAST(MAX(runtime_sec) AS BIGINT) AS max_runtime_sec
      |FROM runs GROUP BY 1 ORDER BY migrate_date""".stripMargin

  // -- q65: system use by date ---------------------------------------------
  // Monitoring.md:224 "System Use By Date": the adoption report — a
  // complete date spine (the reference builds one from digit-view
  // cross joins) left-joined with per-day exam counts and CUMULATIVE
  // unique students. The reference's cumulative query joins every
  // date to every earlier exam row (documented "may be a bit slow" —
  // it is O(dates × exams)); the engine computes each student's FIRST
  // date (one agg) and prefix-sums first-appearances over the spine,
  // so the cumulative-distinct needs two bounded shuffles total.
  //
  // Scale: 2 fact shuffles (daily counts, per-student min). The spine
  // and both joined frames are #dates/#students-first-dates rows; the
  // unpartitioned running-sum window is over the DATE SPINE, whose
  // cardinality is the calendar span — bounded by construction, the
  // q52/p02 class (plan-pinned in PlanQualitySpec).
  private val q65: Q = (s, d) => {
    val o = T.orders(s, d)
      .select(to_date(col("o_orderdate")).as("od"), col("o_custkey"))
    val spine = o.agg(min(col("od")).as("d0"), max(col("od")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("use_date"))
    val daily = o.groupBy(col("od")).agg(count(lit(1)).as("n"))
    val firstSeen = o.groupBy(col("o_custkey")).agg(min(col("od")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("ns"))
    val wCum = Window.orderBy(col("use_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(broadcast(daily), col("use_date") === col("od"), "left")
      .join(broadcast(firstSeen), col("use_date") === col("fd"), "left")
      .select(col("use_date"),
        coalesce(col("n"), lit(0L)).as("n_exams"),
        coalesce(col("ns"), lit(0L)).as("new_students"))
      .withColumn("cum_students", sum(col("new_students")).over(wCum))
      .orderBy(col("use_date"))
  }

  private val q65Sql =
    """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od, o_custkey FROM orders),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT min(od) FROM o), (SELECT max(od) FROM o),
      |    INTERVAL 1 DAY)) AS DATE) AS use_date),
      |daily AS (SELECT od, COUNT(*) AS n FROM o GROUP BY od),
      |fs AS (
      |  SELECT fd, COUNT(*) AS ns FROM (
      |    SELECT o_custkey, min(od) AS fd FROM o GROUP BY o_custkey)
      |  GROUP BY fd)
      |SELECT use_date,
      |  COALESCE(n, 0) AS n_exams,
      |  COALESCE(ns, 0) AS new_students,
      |  CAST(SUM(COALESCE(ns, 0)) OVER (ORDER BY use_date
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_students
      |FROM spine
      |LEFT JOIN daily ON use_date = od
      |LEFT JOIN fs ON use_date = fd
      |ORDER BY use_date""".stripMargin

  // -- q66: organization activity ------------------------------------------
  // Monitoring.md:259 "Organization Queries": which organizations are
  // actually used — schools with exam counts OMITTING empty schools
  // (the reference's HAVING count > 0), districts with counts
  // INCLUDING empty districts (its LEFT JOIN). One output, one row per
  // org with its level. Schools → supplier, districts → nation
  // (SURVEY.md §1 org-hierarchy mapping).
  //
  // Scale: the fact table pre-aggregates per supplier key BELOW the
  // dim joins (one partial-agg shuffle); both org dims broadcast; the
  // district rollup re-aggregates the #suppliers-row frame.
  private val q66: Q = (s, d) => {
    val perSupp = T.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val supp = T.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val joined = perSupp.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val schools = joined.select(
      lit("school").as("org_level"), col("s_suppkey").as("org_id"),
      col("s_name").as("org_name"), col("n").as("exam_count"))
    val districts = T.nation(s, d)
      .join(joined.groupBy(col("s_nationkey")).agg(sum(col("n")).as("dn")),
        col("n_nationkey") === col("s_nationkey"), "left")
      .select(lit("district").as("org_level"), col("n_nationkey").as("org_id"),
        col("n_name").as("org_name"), coalesce(col("dn"), lit(0L)).as("exam_count"))
    districts.union(schools).orderBy(col("org_level"), col("org_id"))
  }

  private val q66Sql =
    """WITH per_supp AS (
      |  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey),
      |j AS (
      |  SELECT s_suppkey, s_name, s_nationkey, n
      |  FROM per_supp JOIN supplier ON l_suppkey = s_suppkey),
      |schools AS (
      |  SELECT 'school' AS org_level, s_suppkey AS org_id, s_name AS org_name,
      |    n AS exam_count
      |  FROM j),
      |districts AS (
      |  SELECT 'district' AS org_level, n_nationkey AS org_id, n_name AS org_name,
      |    COALESCE(CAST(dn AS BIGINT), 0) AS exam_count
      |  FROM nation LEFT JOIN (
      |    SELECT s_nationkey, SUM(n) AS dn FROM j GROUP BY s_nationkey)
      |    ON n_nationkey = s_nationkey)
      |SELECT * FROM districts
      |UNION ALL
      |SELECT * FROM schools
      |ORDER BY org_level, org_id""".stripMargin

  // -- q67: exam distribution ----------------------------------------------
  // Monitoring.md:278 "Exam Distribution": exams by assessment type ×
  // administration condition — the reference pre-aggregates the exam
  // table by the two code ids, THEN joins the code dims (asmt_type,
  // administration_condition), exactly the agg-below-broadcast-join
  // shape the engine uses everywhere. Both code registries arrive via
  // the strict config-CSV contract.
  private[graft] val q67TypeCsv: String =
    """prio_code,asmt_type
      |1-URGENT,summative
      |2-HIGH,interim_ica
      |3-MEDIUM,interim_iab
      |4-NOT SPECIFIED,practice
      |5-LOW,diagnostic""".stripMargin

  private[graft] val q67AdminCsv: String =
    """status_code,admin_cond
      |O,NS
      |P,SD
      |F,Valid""".stripMargin

  private val q67: Q = (s, d) => {
    val typeDim = graft.sources.Ingest.parseConfigCsv(s, q67TypeCsv,
      StructType.fromDDL("prio_code string not null, asmt_type string not null"))
    val admDim = graft.sources.Ingest.parseConfigCsv(s, q67AdminCsv,
      StructType.fromDDL("status_code string not null, admin_cond string not null"))
    T.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_exams"))
      .join(broadcast(typeDim), col("o_orderpriority") === col("prio_code"))
      .join(broadcast(admDim), col("o_orderstatus") === col("status_code"))
      .select(col("asmt_type"), col("admin_cond"), col("n_exams"))
      .orderBy(col("asmt_type"), col("admin_cond"))
  }

  private val q67Sql =
    """WITH type_dim AS (SELECT * FROM (VALUES
      |  ('1-URGENT', 'summative'), ('2-HIGH', 'interim_ica'),
      |  ('3-MEDIUM', 'interim_iab'), ('4-NOT SPECIFIED', 'practice'),
      |  ('5-LOW', 'diagnostic')) AS t(prio_code, asmt_type)),
      |adm_dim AS (SELECT * FROM (VALUES
      |  ('O', 'NS'), ('P', 'SD'), ('F', 'Valid')) AS t(status_code, admin_cond)),
      |agg AS (
      |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_exams
      |  FROM orders GROUP BY 1, 2)
      |SELECT asmt_type, admin_cond, n_exams
      |FROM agg
      |JOIN type_dim ON o_orderpriority = prio_code
      |JOIN adm_dim ON o_orderstatus = status_code
      |ORDER BY asmt_type, admin_cond""".stripMargin

  // -- q87: score-distribution drift monitor -------------------------------
  // The data-quality monitor next to Monitoring.md's volume reports
  // (:278's distribution report run as a TEST, not a display): does an
  // org's performance-level distribution this year differ from last
  // year more than chance allows? Classic Pearson chi-square on the
  // (level) contingency row — with the q78/IntLloyd replayability
  // discipline applied to the statistic: each cell's term
  // (O−E)²/E = (O·N1 − C·N2)² / (C·N1·N2) is computed as ONE exact
  // integer floor division in micro-units (numerator and denominator
  // as exact DECIMAL(38) products — DuckDB replays them in HUGEINT),
  // so the per-org statistic is an order-free exact LONG sum — no
  // float fold order anywhere — and the drift decision is an integer
  // compare against the χ²₀.₀₅ critical value in the same micro-units
  // (a config constant per df). Levels with zero prior-year mass are
  // untestable (E = 0) and are reported instead as n_new_mass, the
  // audit column that keeps the partial statistic honest.
  //
  // Scale: one fact partial-agg shuffle to (org, year, level) cells
  // under the broadcast dims; the level spine completion, the
  // consecutive-year pairing and the per-org fold all run over the
  // AGGREGATED frame (#orgs × #years × 4 rows at any corpus size).
  private val q87: Q = (s, d) => {
    import s.implicits._
    val cells = T.orders(s, d)
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("level",
        when(col("o_totalprice") < 100000, "L1_below")
          .when(col("o_totalprice") < 200000, "L2_approaching")
          .when(col("o_totalprice") < 350000, "L3_meets")
          .otherwise("L4_exceeds"))
      .withColumn("yr", year(col("o_orderdate")).cast(IntegerType))
      .groupBy(col("n_name"), col("yr"), col("level"))
      .agg(count(lit(1)).as("cnt"))
      .transform(graft.CacheScope.cached) // read twice: spine totals + cells
    val totals = cells.groupBy(col("n_name"), col("yr"))
      .agg(sum(col("cnt")).as("n_total"))
    val levels = Seq("L1_below", "L2_approaching", "L3_meets", "L4_exceeds")
    val spine = totals.crossJoin(broadcast(levels.toDF("level")))
    val full = spine.join(cells, Seq("n_name", "yr", "level"), "left")
      .na.fill(0L, Seq("cnt"))
    val cur = full.select(col("n_name"), col("yr"), col("level"),
      col("cnt").as("o"), col("n_total").as("n2"))
    val pri = full.select(col("n_name"), (col("yr") + 1).as("yr"),
      col("level"), col("cnt").as("c"), col("n_total").as("n1"))
    cur.join(pri, Seq("n_name", "yr", "level"))
      // (O·N1 − C·N2)²·1e6 div (C·N1·N2): exact DECIMAL(38) products,
      // one integer floor division — DuckDB replays them in HUGEINT
      .withColumn("term_micro",
        when(col("c") > 0,
          expr("CAST((CAST(o AS DECIMAL(38,0)) * n1 - CAST(c AS DECIMAL(38,0)) * n2) " +
            "* (CAST(o AS DECIMAL(38,0)) * n1 - CAST(c AS DECIMAL(38,0)) * n2) " +
            "* 1000000 div (CAST(c AS DECIMAL(38,0)) * n1 * n2) AS BIGINT)"))
          .otherwise(lit(null).cast(LongType)))
      .groupBy(col("n_name"), col("yr"))
      .agg(
        min(col("n1")).as("n_prior"),
        min(col("n2")).as("n_cur"),
        sum(when(col("c") > 0, 1L).otherwise(0L)).as("cells_tested"),
        sum(when(col("c") === 0, col("o")).otherwise(0L)).as("n_new_mass"),
        sum(col("term_micro")).as("chi2_micro"))
      .withColumn("df", col("cells_tested") - 1)
      .withColumn("crit_micro",
        when(col("df") === 1, 3841459L).when(col("df") === 2, 5991465L)
          .when(col("df") === 3, 7814728L).otherwise(lit(null).cast(LongType)))
      .select(col("n_name"), (col("yr") - 1).as("yr_prior"), col("yr"),
        col("n_prior"), col("n_cur"), col("cells_tested"), col("n_new_mass"),
        col("chi2_micro"),
        (col("chi2_micro") / lit(1000000.0)).as("chi2"),
        (col("df") >= 1 && col("chi2_micro") > col("crit_micro")).as("drift"))
      .orderBy(col("n_name"), col("yr"))
  }

  private val q87Sql =
    """WITH cells AS (
      |  SELECT n.n_name,
      |    CAST(year(o.o_orderdate) AS INTEGER) AS yr,
      |    CASE WHEN o.o_totalprice < 100000 THEN 'L1_below'
      |      WHEN o.o_totalprice < 200000 THEN 'L2_approaching'
      |      WHEN o.o_totalprice < 350000 THEN 'L3_meets'
      |      ELSE 'L4_exceeds' END AS level,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2, 3),
      |totals AS (
      |  SELECT n_name, yr, CAST(SUM(cnt) AS BIGINT) AS n_total
      |  FROM cells GROUP BY 1, 2),
      |spine AS (
      |  SELECT t.n_name, t.yr, t.n_total, l.level
      |  FROM totals t CROSS JOIN (SELECT unnest(
      |    ['L1_below', 'L2_approaching', 'L3_meets', 'L4_exceeds']) AS level) l),
      |full_cells AS (
      |  SELECT s.n_name, s.yr, s.level, COALESCE(c.cnt, 0) AS cnt, s.n_total
      |  FROM spine s LEFT JOIN cells c
      |    ON s.n_name = c.n_name AND s.yr = c.yr AND s.level = c.level),
      |paired AS (
      |  SELECT cur.n_name, cur.yr, cur.level,
      |    cur.cnt AS o, cur.n_total AS n2, pri.cnt AS c, pri.n_total AS n1
      |  FROM full_cells cur JOIN full_cells pri
      |    ON cur.n_name = pri.n_name AND cur.level = pri.level
      |   AND cur.yr = pri.yr + 1),
      |terms AS (
      |  SELECT n_name, yr, n1, n2, c, o,
      |    CASE WHEN c > 0 THEN CAST(
      |      (CAST(o AS HUGEINT) * n1 - CAST(c AS HUGEINT) * n2)
      |      * (CAST(o AS HUGEINT) * n1 - CAST(c AS HUGEINT) * n2)
      |      * 1000000 // (CAST(c AS HUGEINT) * n1 * n2) AS BIGINT)
      |    ELSE NULL END AS term_micro
      |  FROM paired),
      |folded AS (
      |  SELECT n_name, yr,
      |    MIN(n1) AS n_prior, MIN(n2) AS n_cur,
      |    CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cells_tested,
      |    CAST(SUM(CASE WHEN c = 0 THEN o ELSE 0 END) AS BIGINT) AS n_new_mass,
      |    CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
      |  FROM terms GROUP BY 1, 2)
      |SELECT n_name, yr - 1 AS yr_prior, yr, n_prior, n_cur, cells_tested,
      |  n_new_mass, chi2_micro,
      |  chi2_micro / 1000000.0 AS chi2,
      |  cells_tested - 1 >= 1 AND chi2_micro > (CASE
      |    WHEN cells_tested - 1 = 1 THEN 3841459
      |    WHEN cells_tested - 1 = 2 THEN 5991465
      |    WHEN cells_tested - 1 = 3 THEN 7814728 END) AS drift
      |FROM folded ORDER BY n_name, yr""".stripMargin

  // -- q89: daily-volume anomaly monitor (exact-integer 3σ) ----------------
  // The alert behind Monitoring.md's volume reports: which days'
  // import volume departs from the fleet's own history by more than
  // 3 population standard deviations? The REPLAYABLE twist: the
  // anomaly DECISION never touches floating point. With n days,
  // S = Σx, SS = Σx², the 3σ test (x−μ)² > 9σ² multiplies out to
  //   (n·x − S)² > 9·(n·SS − S²)
  // — all exact integers (DECIMAL(38) here, HUGEINT in the replay),
  // so the flag is an integer compare with zero rounding surface.
  // The human-readable z-score IS emitted as a double — z =
  // (n·x − S)/√(n·SS − S²), one exactly-rounded sqrt + one division,
  // bit-identical in both engines — but nothing decides on it.
  //
  // Scale: one fact partial-agg shuffle to #days cells; the stats
  // frame is ONE row (broadcast back); everything after is per-day
  // arithmetic over the calendar-sized frame.
  private val q89: Q = (s, d) => {
    val daily = T.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss"))
    daily.crossJoin(broadcast(stats))
      .withColumn("dev", expr(
        "CAST(n AS DECIMAL(38,0)) * x - CAST(s AS DECIMAL(38,0))"))
      .withColumn("var_num", expr(
        "CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s"))
      .select(col("day"), col("x").as("n_orders"),
        (col("dev").cast(DoubleType) / sqrt(col("var_num").cast(DoubleType)))
          .as("z"),
        expr("dev * dev > 9 * var_num").as("anomaly"))
      .orderBy(col("day"))
  }

  private val q89Sql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
      |    CAST(SUM(x * x) AS BIGINT) AS ss
      |  FROM daily),
      |t AS (
      |  SELECT d.day, d.x,
      |    CAST(st.n AS HUGEINT) * d.x - st.s AS dev,
      |    CAST(st.n AS HUGEINT) * st.ss - CAST(st.s AS HUGEINT) * st.s AS var_num
      |  FROM daily d, st)
      |SELECT day, x AS n_orders,
      |  CAST(dev AS DOUBLE) / sqrt(CAST(var_num AS DOUBLE)) AS z,
      |  dev * dev > 9 * var_num AS anomaly
      |FROM t ORDER BY day""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q87_dist_drift" -> q87,
    "q89_volume_anomaly" -> q89,
    "q61_import_status_monitor" -> q61,
    "q62_ingest_speed" -> q62,
    "q63_time_to_warehouse" -> q63,
    "q64_migrate_rate" -> q64,
    "q65_system_use_by_date" -> q65,
    "q66_org_activity" -> q66,
    "q67_exam_distribution" -> q67)

  val oracle: Map[String, String] = Map(
    "q87_dist_drift" -> q87Sql,
    "q89_volume_anomaly" -> q89Sql,
    "q61_import_status_monitor" -> q61Sql,
    "q62_ingest_speed" -> q62Sql,
    "q63_time_to_warehouse" -> q63Sql,
    "q64_migrate_rate" -> q64Sql,
    "q65_system_use_by_date" -> q65Sql,
    "q66_org_activity" -> q66Sql,
    "q67_exam_distribution" -> q67Sql)
}
