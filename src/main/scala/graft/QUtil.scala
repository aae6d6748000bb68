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
}
