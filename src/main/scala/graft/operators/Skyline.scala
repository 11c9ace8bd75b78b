package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped 2-D skyline (Pareto frontier; Börzsönyi et al. 2001): within
  * each group, the rows not DOMINATED on a (minimize, maximize) criterion
  * pair — here "no other part of the brand is both cheaper-or-equal and
  * strictly bigger" (price min, size max). The classic multi-criteria
  * shortlist operator.
  *
  * The 2-D case needs no pairwise dominance join: sort by (min-dim asc,
  * max-dim desc, id) and a row is on the frontier iff its max-dim value
  * exceeds the RUNNING MAX of all preceding rows — one window per group,
  * O(n log n), versus the naive O(n²) self-join. Ties that are exact
  * duplicates on both dimensions collapse to the lowest id (the sweep
  * keeps the first representative — a "distinct skyline").
  *
  * Scale shape: ONE shuffle on the group key; the running max is a
  * cumulative frame inside each group — never a global window, never a
  * cartesian dominance join. Ordering keys are raw stored values (no
  * arithmetic), so the frontier is engine-exact by construction.
  */
object Skyline {

  /** Frontier rows: `grp`, `id`, `minv`, `maxv`, `sky_rank` (1-based
    * position along the frontier in price order).
    */
  def frontier2d(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      minimizeCol: String,
      maximizeCol: String
  ): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(minimizeCol).as("minv"), col(maximizeCol).cast("long").as("maxv"))
    val order = Window.partitionBy(col("grp"))
      .orderBy(col("minv"), col("maxv").desc, col("id"))
    val sweep = base.withColumn("_runmax",
      max(col("maxv")).over(order.rowsBetween(Window.unboundedPreceding, -1)))
    sweep
      .filter(col("_runmax").isNull || col("maxv") > col("_runmax"))
      .withColumn("sky_rank",
        row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("minv"), col("maxv").desc, col("id"))).cast("long"))
      .select(col("grp"), col("id"), col("minv"), col("maxv"), col("sky_rank"))
  }
}
