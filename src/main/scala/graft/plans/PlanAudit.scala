package graft.plans

import org.apache.spark.sql.DataFrame

/** Structured audit of a physical plan — the properties that decide
  * whether a query survives a 100× scale-up, extracted so operators
  * and CI can assert on them instead of eyeballing `.explain` output:
  * shuffle count, join strategies, map-side partial aggregation,
  * pushdown reaching the scans, and whole-stage-codegen coverage.
  *
  * PlanQualitySpec pins these per query; a deployment can run the same
  * audit against its own workloads (e.g. fail a release if a dim join
  * regressed from broadcast to sort-merge, or a scan lost its pushed
  * filters).
  */
case class PlanAudit(exchanges: Int, broadcastHashJoins: Int,
                     sortMergeJoins: Int, nestedLoopJoins: Int,
                     partialAggregates: Int, scansWithPushedFilters: Int,
                     scans: Int, codegenSpans: Int) {
  def render: String =
    s"exchanges=$exchanges broadcastHashJoins=$broadcastHashJoins " +
      s"sortMergeJoins=$sortMergeJoins nestedLoopJoins=$nestedLoopJoins " +
      s"partialAggregates=$partialAggregates " +
      s"scansWithPushedFilters=$scansWithPushedFilters/$scans " +
      s"codegenSpans=$codegenSpans"
}

object PlanAudit {
  private def count(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  /** Audit after actually running the query: under AQE the final
    * stages (and their codegen annotations) only exist once executed,
    * so run through a noop sink first — this is the audit a deployment
    * wires into its workload CI. */
  def executed(df: DataFrame): PlanAudit = {
    // drive THIS QueryExecution's RDD (a .write would build a separate
    // QueryExecution and leave this one's adaptive plan unfinalized)
    df.queryExecution.toRdd.foreachPartition(_ => ())
    of(df)
  }

  /** Audit the planned (possibly pre-execution) physical plan. */
  def of(df: DataFrame): PlanAudit = {
    val p = df.queryExecution.executedPlan.toString
    PlanAudit(
      // shuffle exchanges only: "Exchange hashpartitioning(…)" etc.
      // A bare "Exchange" count would also match BroadcastExchange and
      // ReusedExchange, so a plan that GAINED a broadcast dim join
      // would read as a shuffle regression — the inverse of the signal
      // a CI gate wants.
      exchanges = "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(p).length,
      broadcastHashJoins = count(p, "BroadcastHashJoin"),
      sortMergeJoins = count(p, "SortMergeJoin"),
      nestedLoopJoins = count(p, "NestedLoopJoin"),
      // anchored on "partial_" (the function-mode prefix): a bare
      // "partial" substring also matches unrelated tokens
      partialAggregates = count(p, "partial_"),
      scansWithPushedFilters =
        // a pushed-filter entry that is just "[]" pushed nothing
        "PushedFilters: \\[[^\\]]".r.findAllIn(p).length,
      scans = count(p, "FileScan") + count(p, "BatchScan"),
      // codegen'd operators print as "*(id) Op"; distinct ids = fused spans
      codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(p)
        .map(_.group(1)).toSet.size)
  }
}
