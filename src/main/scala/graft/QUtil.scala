package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers keeping Spark results bit-identical to the DuckDB
  * oracle (SURVEY.md §5).
  *
  * Money policy: cast to DECIMAL(12,2) *before* aggregation so sums are
  * exact and order-independent (float summation order differs between
  * Spark partial aggregation and DuckDB's sequential scan); cast the
  * exact decimal back to DOUBLE at the end so both sides emit the same
  * IEEE value and the same schema. Rates (discount/tax, always < 10)
  * use DECIMAL(4,2) so products stay within decimal precision 38 on
  * both engines.
  */
object QUtil {
  /** Exact money value: DECIMAL(12,2) covers < 10^10 absolute. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small rate (discount/tax) as exact DECIMAL(4,2). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Order-independent exact sum surfaced as DOUBLE. */
  def moneySum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum cast to double, then one
    * IEEE division by the bigint count — identical on both engines. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** SQL fragments mirroring the helpers above (DuckDB side). */
  def sqlMoneySum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(12,2))) AS DOUBLE)"
  def sqlMoneyAvg(expr: String): String =
    s"${sqlMoneySum(expr)} / COUNT(*)"

  /** Above this many driver-collected cell ids, a literal IN-list
    * prune becomes a broadcast join: a uniform tombstone/compaction
    * batch touches O(√n) cells (~10⁵ at 100 TB), and a 10⁵-literal
    * predicate bloats every plan that carries it. */
  val CellPruneInMax = 512

  /** Partition-prune `df` to (or, with `negate`, away from) a
    * driver-collected cell-id list. Small lists stay a literal
    * `isin` — STATIC partition pruning on the `cell=`/`cluster=`
    * directories; past [[CellPruneInMax]] the prune becomes a
    * broadcast semi-join (anti-join under negation) on a one-column
    * cell frame, with dynamic partition pruning handling the
    * directory read. Result rows are identical either way (IndexSpec
    * pins frame identity; PlanQualitySpec pins the big-batch plan). */
  def pruneCells(df: org.apache.spark.sql.DataFrame, column: String,
                 cells: Seq[Int], negate: Boolean = false):
      org.apache.spark.sql.DataFrame =
    if (cells.length <= CellPruneInMax) {
      val p = col(column).isin(cells: _*)
      df.filter(if (negate) !p else p)
    } else {
      val s = df.sparkSession
      import s.implicits._
      df.join(broadcast(cells.toDF(column)), Seq(column),
        if (negate) "left_anti" else "left_semi")
    }
}
