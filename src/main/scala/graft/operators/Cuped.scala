package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction — the standard experimentation trick: adjust
  * each user's experiment-period outcome by their PRE-period covariate,
  * y′ = y − θ(x − x̄) with θ = Cov(x,y)/Var(x), which strips the
  * between-user variance the covariate explains and leaves the arm
  * contrast unbiased. Here x = spend in the first half of the corpus time
  * range, y = spend in the second half, arms = the md5-48 assignment
  * ([[AbTest]]'s spelling).
  *
  * Determinism: the half-split point is integer epoch arithmetic; all
  * sufficient statistics (n, Σx, Σy, Σxy, Σx² — globally and per arm) are
  * exact integer micros sums, so θ, x̄ and both adjusted means are single
  * replayed double expressions; floor-6 outputs in dollar units. The
  * per-user adjusted outcome is NEVER materialized or float-summed — arm
  * means of y′ expand to (Σy_g − θ(Σx_g − n_g·x̄))/n_g, pure sufficient
  * statistics (the no-float-aggregation discipline).
  *
  * Scale: one groupBy(user) with conditional integer sums, one O(1)
  * reduce — no window, no sort.
  */
object Cuped {

  private def floor6(c: Column): Column =
    floor(c * lit(1000000.0d) + lit(0.5d)) / lit(1000000.0d)

  /** One row: (n_a, n_b, theta, lift_raw, lift_cuped) — lifts in dollar
    * units (cents / 100), B minus A.
    */
  def adjustedLift(events: DataFrame): DataFrame = {
    val bounds = events
      .agg(
        min(expr("CAST(ts AS LONG)")).as("t0"),
        max(expr("CAST(ts AS LONG)")).as("t1"))
      .select(expr("(t0 + t1) DIV 2").as("t_mid"))
    val per = events
      .filter(col("event_type") === "purchase")
      .crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(
        sum(when(expr("CAST(ts AS LONG)") < col("t_mid"),
          round(col("value") * lit(100.0d), 0).cast("long")).otherwise(0L)).as("x"),
        sum(when(expr("CAST(ts AS LONG)") >= col("t_mid"),
          round(col("value") * lit(100.0d), 0).cast("long")).otherwise(0L)).as("y"))
      .withColumn("arm", HashSplit.md548(col("user_id")) % lit(2L))
    val ag = per.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx_a"),
      sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx_b"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy_b"))
    def d(c: String): Column = col(c).cast("double")
    val xbar = d("sx") / d("n")
    // Cov·n = Σxy − Σx·Σy/n ; Var·n = Σx² − (Σx)²/n — shared 1/n cancels.
    val theta = (d("sxy") - d("sx") * d("sy") / d("n")) /
      (d("sxx") - d("sx") * d("sx") / d("n"))
    val meanA = d("sy_a") / d("n_a")
    val meanB = d("sy_b") / d("n_b")
    val adjA = (d("sy_a") - theta * (d("sx_a") - d("n_a") * xbar)) / d("n_a")
    val adjB = (d("sy_b") - theta * (d("sx_b") - d("n_b") * xbar)) / d("n_b")
    ag.select(
      col("n_a"), col("n_b"),
      floor6(theta).as("theta"),
      floor6((meanB - meanA) / lit(100.0d)).as("lift_raw"),
      floor6((adjB - adjA) / lit(100.0d)).as("lift_cuped"))
  }
}
