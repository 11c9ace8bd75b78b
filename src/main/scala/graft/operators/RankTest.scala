package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Whitney U rank-sum test — the nonparametric two-sample test a
  * pipeline reaches for when value distributions are heavy-tailed:
  * compares purchase values on weekend vs weekday days with the
  * normal-approximation z including the tie correction:
  *
  *   U = R_A − n_A(n_A+1)/2,   μ_U = n_A·n_B/2
  *   σ²_U = n_A·n_B/12 · ((N+1) − Σ(t³−t)/(N(N−1)))
  *
  * Determinism: values rank as exact integer micros; AVERAGE ranks for
  * ties are carried DOUBLED (2·avg = first + last rank, an exact integer
  * from rank() + tie count), so every rank sum is an exact BIGINT; the
  * weekend flag is pure epoch-day arithmetic ((d+3) % 7 ≥ 5 — no
  * engine-specific day-of-week numbering); U, μ, σ and z are one replayed
  * double expression each, floor-6 output.
  *
  * Scale: one global rank window over PURCHASE rows only (a filtered
  * fraction of the fact table; acceptable as a reporting query — the same
  * envelope as the percentile operators), then an O(1) reduce.
  */
object RankTest {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** One row: (n_a, n_b, u2_a, z) — group A = weekend purchases; u2_a is
    * the exact integer 2·U_A.
    */
  def weekendRankSum(events: DataFrame): DataFrame = {
    val p = events
      .filter(col("event_type") === "purchase")
      .select(
        round(col("value") * lit(1e6), 0).cast("long").as("v"),
        (((expr("CAST(ts AS LONG) DIV 86400") + lit(3L)) % lit(7L)) >= lit(5L))
          .as("is_weekend"))
    val wAll = Window.orderBy(col("v"))
    val tie = Window.partitionBy(col("v"))
    // 2·avgrank = first + last = rank + (rank + cnt − 1) — exact integer.
    val ranked = p
      .withColumn("rk", rank().over(wAll).cast("long"))
      .withColumn("cnt", count(lit(1)).over(tie))
      .withColumn("r2", col("rk") * lit(2L) + col("cnt") - lit(1L))
    val ag = ranked.agg(
      sum(when(col("is_weekend"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_weekend"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("is_weekend"), col("r2")).otherwise(0L)).as("r2_a"))
    // tie-size sum Σ(t³−t) over distinct values
    val ties = ranked
      .groupBy("v").agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tcorr"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = (col("n_a") + col("n_b")).cast("double")
    // 2U = r2_a − n_a(n_a+1): exact integers throughout.
    val u2 = col("r2_a") - col("n_a") * (col("n_a") + lit(1L))
    val mu2 = na * nb // 2·μ_U
    val sig2 = na * nb / lit(12.0d) *
      ((nn + lit(1.0d)) - col("tcorr").cast("double") / (nn * (nn - lit(1.0d))))
    val z = (u2.cast("double") - mu2) / (lit(2.0d) * sqrt(sig2))
    ag.crossJoin(broadcast(ties))
      .select(col("n_a"), col("n_b"), u2.as("u2_a"), floor6(z).as("z"))
  }
}
