package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension build — turn an append-only changelog into the
  * versioned validity-interval table a warehouse joins facts against:
  * one row per (key, version) with `[valid_from, valid_to)` bounds,
  * no-op changes (the tracked attributes did not actually change)
  * collapsed away first, so intervals are maximal.
  *
  *   key k: (t1, A) (t2, A) (t3, B) (t5, A)
  *     →   (k, A, [t1, t3), v1) (k, B, [t3, t5), v2) (k, A, [t5, ∞), v3 current)
  *
  * The companion lookup for "attribute as of fact time" is the existing
  * [[AsOfJoin]] — this operator builds the table; as-of joins consume it.
  *
  * Scale shape: ONE exchange on the key — the change-detection lag, the
  * interval lead, and the version row_number all run over the same
  * (key; ts, tiebreak) window partitioning, and Catalyst plans a single
  * sort+exchange for the three.
  *
  * Determinism: intervals derive from timestamps and attribute equality
  * only; same-instant changes order by the unique tiebreak column (the
  * q_asof tie discipline).
  */
object Scd2 {

  /** @param valueCols tracked attributes; a row opens a new version iff
    *                  the struct of these differs from the previous row's.
    * @return key + valueCols + (valid_from, valid_to (null = open),
    *         version, is_current).
    */
  def buildIntervals(
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val keyC = keyCols.map(col)
    val w = Window.partitionBy(keyC: _*).orderBy(col(tsCol), col(tieCol))
    val cur = struct(valueCols.map(col): _*)
    val changed = changelog
      .withColumn("_prev", lag(cur, 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= cur)
    val w2 = Window.partitionBy(keyC: _*).orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)
  }
}
