package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert apply — the step a production corpus build runs
  * between the release diff ([[IncrementalDedup]] admits new batches,
  * q_snapshot_diff audits releases) and re-dedup: fold a changelog batch
  * of inserts, updates and deletes (possibly several ops per key — CDC
  * batches carry every intermediate version) into a base snapshot. The
  * MERGE INTO shape: newest change per key wins, deletes are honored,
  * unchanged rows are preserved, an update on an absent key inserts
  * (WHEN NOT MATCHED THEN INSERT).
  *
  * Pure relational spelling: one window exchange on the key reduces the
  * changelog to its last-writer row, then ONE full-outer join against the
  * base and a precedence CASE classify every key. At 100 TB the batch is
  * normally ≪ the base, so the join's change side broadcasts or
  * shuffle-prunes; the base is read once — never per-op. Version history,
  * when wanted, is [[Scd2]] over the same changelog; this operator builds
  * the refreshed CURRENT snapshot.
  */
object MergeApply {

  /** Last-writer change row per key: `keyCol`, `_op`, `_new`. */
  private def latest(
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col(opCol).as("_op"), col(valueCol).as("_new"))
  }

  /** Merge audit — one row per key in base ∪ changes with the applied
    * action and the post-merge content hash (NULL when the key is absent
    * from the refreshed snapshot). Actions: `keep` (no change row),
    * `insert` (change on an absent key), `update` (value really changed),
    * `noop` (change row carried the identical value), `delete` (op 'D',
    * whether or not the key existed — a delete-miss still audits).
    */
  def audit(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCol: String
  ): DataFrame =
    base.select(col(keyCol), col(valueCol).as("_old"))
      .join(latest(changes, keyCol, seqCol, opCol, valueCol),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        // null-safe value compare (<=>): an upsert legally carrying a NULL
        // value must classify as update-to-NULL, not fall through ==='s
        // three-valued logic into a misreported class
        when(col("_op").isNull, "keep")
          .when(col("_op") === "D", "delete")
          .when(col("_old").isNull, "insert")
          .when(col("_old") <=> col("_new"), "noop")
          .otherwise("update").as("action"),
        // the POST-merge hash: md5(_new) whenever a change row won (NULL
        // value ⇒ NULL hash — the snapshot really holds NULL), md5(_old)
        // only for untouched keys
        when(col("_op") === "D", lit(null).cast("string"))
          .when(col("_op").isNull, md5(col("_old")))
          .otherwise(md5(col("_new"))).as("text_md5"))

  /** The refreshed snapshot itself: `keyCol` + `valueCol`, deletes
    * dropped, last-writer value for upserted keys, base value otherwise.
    */
  def snapshot(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCol: String
  ): DataFrame =
    base.select(col(keyCol), col(valueCol).as("_old"))
      .join(latest(changes, keyCol, seqCol, opCol, valueCol),
        Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      // a winning change row's value applies AS IS — coalesce would
      // silently resurrect the old value on a legal update-to-NULL
      .select(col(keyCol),
        when(col("_op").isNull, col("_old")).otherwise(col("_new")).as(valueCol))
}
