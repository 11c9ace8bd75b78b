package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the product-analytics staple: per entity,
  * the first time each step happened GIVEN the previous step had already
  * happened (first view, first click at-or-after that view, first
  * purchase at-or-after that click, ...), plus the stage reached.
  *
  * Spelled as chained conditional-min window columns over ONE user
  * partition: step i's condition reads step i−1's per-user timestamp, and
  * because every window shares the same partitioning, Catalyst plans a
  * single hash exchange with stacked Window operators — no self-joins, no
  * per-step shuffles, no row multiplication. Timestamps should be integer
  * units (micros here) so the arithmetic is engine-exact.
  *
  * Step semantics: `>=` — a step can complete at the same instant as its
  * predecessor (same-micro batch events count as progression).
  */
object Funnel {

  /** One row per entity: `t_step1..t_stepN` (null once the funnel broke),
    * `stage` = number of steps completed.
    */
  def ordered(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(typeCol), col(tsCol))
    val stepCols = steps.zipWithIndex.map { case (step, i) =>
      val name = s"t_step${i + 1}"
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) >= col(s"t_step$i")
      df = df.withColumn(name, min(when(cond, col(tsCol))).over(w))
      name
    }
    val stage: Column = stepCols
      .map(c => when(col(c).isNotNull, lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    df.groupBy(col(userCol))
      .agg(min(col(stepCols.head)).as(stepCols.head),
        stepCols.tail.map(c => min(col(c)).as(c)): _*)
      .withColumn("stage", stage)
  }
}
