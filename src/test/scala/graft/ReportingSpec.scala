package graft

/** Behavior invariants for the round-8 reporting additions (q91/q92):
  * the internal-consistency identities a published gap report and a
  * cut-score impact analysis are audited against.
  */
class ReportingSpec extends SparkSpec {

  test("q91 gap report: subgroup cells reaggregate to the org line exactly") {
    val rows = SparkEntry.queries("q91_achievement_gap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val n = cells.map(_.getLong(2)).sum
      val prof = cells.map(_.getLong(3)).sum
      val overall = cells.head.getDouble(5)
      // the org-overall rate the report prints IS the reaggregation of
      // its own subgroup cells — bit-exact, not approximately. This
      // bit-equality is an INTENTIONAL spec pin, sound because both
      // sides are ONE correctly-rounded IEEE division of the same
      // exactly-representable longs (counts < 2^53): if q91 is ever
      // refactored to a different division order, this line is the
      // alarm that the published rate changed, and only then should it
      // be relaxed to the ulp-scale tolerance used for wgap below.
      assert(overall == prof.toDouble / n)
      // every cell in an org carries the same overall_pct
      assert(cells.forall(_.getDouble(5) == overall))
      // gap_pp is exactly pct − overall in percentage points
      cells.foreach { r =>
        assert(r.getDouble(6) == (r.getDouble(4) - overall) * 100.0)
      }
      // weighted gaps cancel: Σ n_i·(p_i − P) = 0 up to fp accumulation
      val wgap = cells.map(r => r.getLong(2) * (r.getDouble(4) - overall)).sum
      assert(math.abs(wgap) < 1e-9 * n)
    }
  }

  test("q92 what-if matrix: marginals = q18 distribution, moves only from L3 to adjacent levels") {
    val m = SparkEntry.queries("q92_cut_score_whatif")(spark, sfDir).collect()
    val q18 = SparkEntry.queries("q18_bucketing")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty)
    // row sums over proposed = the current (q18) level distribution
    val marg = m.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    marg.foreach { case (lvl, n) => assert(q18(lvl) == n, s"marginal drift at $lvl") }
    // current_total column agrees with the recomputed marginal
    m.foreach(r => assert(r.getLong(3) == marg(r.getString(0))))
    val idx = Map("L1_below" -> 1, "L2_approaching" -> 2, "L3_meets" -> 3, "L4_exceeds" -> 4)
    m.filter(_.getBoolean(5)).foreach { r =>
      // this proposal only reshapes the two L3 boundaries, so every
      // migration starts at L3 and lands on an adjacent level
      assert(r.getString(0) == "L3_meets")
      assert(math.abs(idx(r.getString(1)) - idx(r.getString(0))) == 1)
    }
    // pct_of_current is one division of the printed integers
    m.foreach(r => assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(3)))
  }
}
