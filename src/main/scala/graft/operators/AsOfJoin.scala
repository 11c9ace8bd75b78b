package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark has no native spelling
  * for: for every left row, the single most recent right row of the same
  * key with `right.ts <= left.ts` (ties on ts resolved toward the larger
  * `rightOrderCol`, so the result is deterministic).
  *
  * The naive spelling is a key-equi + ts-range join whose candidate set per
  * left row is every earlier right row — quadratic per key and un-prunable.
  * This implementation is the scalable union-scan spelling instead: tag both
  * sides, union them, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over one (key, ts)-ordered window. Cost is ONE
  * shuffle on the key and a linear scan per partition — no row
  * multiplication anywhere, so it survives keys with millions of rows
  * (which break the range-join spelling long before 100 TB).
  */
object AsOfJoin {

  /** @param left          probe side (one output row per left row)
    * @param right         build side (its latest-at-or-before row is attached)
    * @param keyCol        equality key present on both sides
    * @param tsCol         event-time column present on both sides (any
    *                      totally-ordered type; use exact integer time —
    *                      e.g. epoch nanos — when tie semantics matter)
    * @param rightOrderCol deterministic tiebreak among right rows sharing
    *                      (key, ts): the largest value wins
    * @param payload       right columns to attach (null when no right row is
    *                      at or before the left row's ts)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightOrderCol: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    val rPayloadType = StructType(payload.map(c => right.schema(c)))
    val lRowType = StructType(leftOther.map(c => left.schema(c)))
    val rOrdType = right.schema(rightOrderCol).dataType

    val l = left.select(
      col(keyCol), col(tsCol),
      // _side orders right rows BEFORE left rows at equal ts → `<=` semantics
      lit(1).as("_side"),
      lit(null).cast(rPayloadType).as("_payload"),
      lit(null).cast(rOrdType).as("_rord"),
      struct(leftOther.map(col): _*).as("_lrow")
    )
    // null-key and null-ts right rows can never legitimately match
    // ("right.ts <= left.ts" is unknowable) — without this filter, null-ts
    // rows sort to the partition front (nulls-first asc) and would attach
    // to every left row. Null-key/ts LEFT rows still emit, unmatched, like
    // any left join.
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(keyCol), col(tsCol),
        lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload"),
        col(rightOrderCol).as("_rord"),
        lit(null).cast(lRowType).as("_lrow")
      )
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_rord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        Seq(col(keyCol), col(tsCol)) ++
          leftOther.map(c => col(s"_lrow.$c").as(c)) ++
          payload.map(c => col(s"_match.$c").as(c)): _*
      )
  }
}
