package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Order-independent money aggregation.
  *
  * `round(sum(doubleCol), 2)` folds doubles in partition order, so a parallel
  * run can land the sum on either side of a half-cent boundary and flip the
  * rounded value — the one hash flake the round-1 driver gate caught
  * (`q_gap_sessions`). These helpers accumulate exact integer micro-units
  * instead (per-row `round(x * 1e6)` as BIGINT — commutative and exact, so
  * any summation order gives the same total), round to cents in integer
  * space, and emit the canonical double. The DuckDB twin ([[sumSql]]) uses
  * the same integer path, making Spark and the oracle bit-identical.
  *
  * Cross-engine notes (verified empirically): double→decimal CAST differs
  * between Spark (half-up) and DuckDB (truncate), which rules out decimal
  * sums; `round(double)` ties can only occur at exactly-representable `k.5`
  * doubles, where both engines round half away from zero.
  */
object Money {

  /** Exact micro-unit accumulator: per-row round to 1e-6, summed as long.
    * Safe to ~9.2e12 currency units per group (long max / 1e6). */
  def microsSum(e: Column): Column = sum(round(e * lit(1e6), 0).cast("long"))

  /** micros → cents (half-up in integer space) → canonical double. */
  def microsToMoney(m: Column): Column =
    floor((m + lit(5000L)) / lit(10000.0)) / lit(100.0)

  /** Drop-in, order-independent replacement for `round(sum(e), 2)`. */
  def moneySum(e: Column): Column = microsToMoney(microsSum(e))

  /** Windowed twin of [[moneySum]] for analytic frames. */
  def moneySumOver(e: Column, w: WindowSpec): Column =
    microsToMoney(sum(round(e * lit(1e6), 0).cast("long")).over(w))

  /** DuckDB oracle twin of [[moneySum]]. `over` carries an optional
    * `" OVER (...)"` clause for the windowed variant. */
  def sumSql(colExpr: String, over: String = ""): String =
    microsToMoneySql(microsSumSql(colExpr) + over)

  /** DuckDB twin of [[microsSum]] — for oracles that aggregate and emit in
    * separate query stages (top-N by revenue, coalesce-after-join). */
  def microsSumSql(colExpr: String): String =
    s"sum(CAST(round(($colExpr) * 1e6) AS BIGINT))"

  /** DuckDB twin of [[microsToMoney]]. */
  def microsToMoneySql(microsExpr: String): String =
    s"CAST(floor(($microsExpr + 5000) / 10000.0) AS BIGINT) / 100.0"
}
