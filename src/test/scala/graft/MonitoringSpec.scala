package graft

import org.apache.spark.sql.functions._

import graft.plans.PlanAudit

/** The q61–q67 operational-monitoring family (reference
  * /root/reference/docs/Monitoring.md): semantic invariants each
  * documented report must satisfy, plus the plan properties that make
  * each viable at warehouse scale (pre-agg below broadcast dim joins,
  * one-window-pass latency derivations, bounded-spine windows).
  */
class MonitoringSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q61 TOTAL row equals the sum of the per-status rows") {
    val rows = run("q61_import_status_monitor").collect()
    val total = rows.filter(_.getString(1) == "TOTAL")
    assert(total.length == 1, "exactly one TOTAL row")
    val statusSum = rows.filter(_.getString(1) != "TOTAL").map(_.getLong(2)).sum
    assert(total.head.getLong(2) == statusSum && statusSum > 0)
    // the TOTAL grouping set runs over the aggregated frame — the one
    // fact scan pre-aggregates (partial) before its single shuffle
    val a = PlanAudit.of(run("q61_import_status_monitor"))
    assert(a.partialAggregates >= 1 && a.scans == 1,
      s"status counts must partial-agg one fact scan: ${a.render}")
  }

  test("q62 ingest-speed histogram stays within the one-hour window") {
    val rows = run("q62_ingest_speed").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 60),
      "minutes bucket must be 0..59 inside the attribution hour")
    val p = run("q62_ingest_speed").queryExecution.executedPlan.toString
    assert(p.contains("Window") && !p.contains("Join"),
      s"created→updated must be one window pass, not a self-join:\n$p")
  }

  test("q63 dynamic buckets: hour rows < 24h, day rows >= 1 day, and " +
    "bucket totals cover every processed result") {
    val rows = run("q63_time_to_warehouse").collect()
    val hours = rows.filter(_.getString(0) == "hour")
    val days = rows.filter(_.getString(0) == "day")
    assert(hours.nonEmpty && days.nonEmpty, "both granularities present")
    assert(hours.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 24))
    assert(days.forall(_.getLong(1) >= 1))
    // cross-query containment: q62's universe is the <1h subset of the
    // same created→updated pairs, and q63's hour bucket (<24h) must
    // contain all of it — real set inequalities, not a rows>0 smoke
    val q62Total = run("q62_ingest_speed").collect().map(_.getLong(1)).sum
    val q63Total = rows.map(_.getLong(2)).sum
    val hourTotal = hours.map(_.getLong(2)).sum
    assert(q62Total > 0 && q63Total >= q62Total && hourTotal >= q62Total,
      s"containment violated: q62=$q62Total q63=$q63Total hour=$hourTotal")
  }

  test("q64 migrate-rate report: avg <= max per day, runtimes non-negative") {
    val rows = run("q64_migrate_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getDouble(2); val mx = r.getLong(3)
      assert(avg >= 0.0 && avg <= mx + 1e-9, s"avg $avg must be within [0, max=$mx]")
    }
    val p = run("q64_migrate_rate").queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"sessionized batches need no join:\n$p")
  }

  test("q65 spine is contiguous and cum_students ends at the distinct-student total") {
    val df = run("q65_system_use_by_date")
    val rows = df.orderBy(col("use_date")).collect()
    val expectDays = java.time.temporal.ChronoUnit.DAYS.between(
      rows.head.getDate(0).toLocalDate, rows.last.getDate(0).toLocalDate) + 1
    assert(rows.length == expectDays, "one row per calendar day, no gaps")
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cumulative is monotone")
    val distinctStudents = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(cums.last == distinctStudents,
      "first-appearance prefix sum must converge to the exact distinct count")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count(), "daily counts cover every exam")
  }

  test("q66 district totals equal school totals; empty districts are kept") {
    val rows = run("q66_org_activity").collect()
    val districts = rows.filter(_.getString(0) == "district")
    val schools = rows.filter(_.getString(0) == "school")
    assert(districts.map(_.getLong(3)).sum == schools.map(_.getLong(3)).sum,
      "the org hierarchy must conserve exam counts")
    val nNations = Tables.nation(spark, sfDir).count()
    assert(districts.length == nNations, "LEFT JOIN keeps zero-exam districts")
    assert(schools.forall(_.getLong(3) > 0), "HAVING > 0 omits empty schools")
    // facts pre-aggregate per supplier BELOW the broadcast dim joins
    val a = PlanAudit.of(run("q66_org_activity"))
    assert(a.broadcastHashJoins >= 1 && a.partialAggregates >= 1,
      s"expected partial-agg + broadcast dims: ${a.render}")
  }

  test("q67 decoded distribution conserves the exam count and broadcasts both code dims") {
    val rows = run("q67_exam_distribution").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.orders(spark, sfDir).count())
    val a = PlanAudit.of(run("q67_exam_distribution"))
    assert(a.broadcastHashJoins >= 2,
      s"both config dims must broadcast-join AFTER the agg: ${a.render}")
    assert(a.sortMergeJoins == 0 && a.nestedLoopJoins == 0, a.render)
  }
}
