package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.FreqSketch

/** Exact heavy hitters at sketch cost: the classic two-pass spelling.
  *
  * Pass 1 — a Misra–Gries summary per group (`expressions.FreqSketch`):
  * O(k) shuffle bytes per partition per group, independent of item
  * cardinality. Its keys are GUARANTEED a superset of every item with
  * frequency > n/(k+1) within its group.
  *
  * Pass 2 — broadcast the (≤ k per group) candidates, left-semi filter the
  * corpus down to candidate rows only, and count those exactly. Items whose
  * exact count clears the n/(k+1) threshold are precisely the true heavy
  * hitters — the sketch's approximation error is gone from the OUTPUT, it
  * only ever bounded the candidate set. The full `groupBy(item).count`
  * histogram (itself big data for high-cardinality items at 100 TB) is never
  * materialized: only candidate rows reach the second aggregate.
  *
  * Output: (groupCols..., item, n_item, n_group) for items with
  * `n_item * (k+1) > n_group` — deterministic for any input partitioning,
  * even though the intermediate summaries are not.
  */
object HeavyHitters {

  def heavyHitters(
      df: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val gc: Seq[Column] = groupCols.map(col)

    val sketch = df
      .groupBy(gc: _*)
      .agg(
        FreqSketch.freq_sketch(col(itemCol), k).as("_cand"),
        count(when(col(itemCol).isNotNull, 1)).as("n_group"))

    val candidates = sketch
      .select(gc :+ col("n_group") :+ explode(map_keys(col("_cand"))).as(itemCol): _*)

    val joinKeys = groupCols :+ itemCol
    df.join(broadcast(candidates.select(joinKeys.map(col): _*)), joinKeys, "left_semi")
      .groupBy(joinKeys.map(col): _*)
      .agg(count(lit(1)).as("n_item"))
      .join(broadcast(candidates.select(groupCols.map(col) :+ col("n_group"): _*).distinct()),
        groupCols)
      .filter(col("n_item") * (k + 1) > col("n_group"))
      .select(joinKeys.map(col) ++ Seq(col("n_item"), col("n_group")): _*)
  }
}
