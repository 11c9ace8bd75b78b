package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key salting for skewed shuffle joins — the classic mitigation when one
  * hot key would otherwise pin its entire row group on a single reducer: the
  * big (skewed) side gets a deterministic salt in `[0, salts)`, the other
  * side is replicated once per salt value, and the join key becomes
  * (key, salt) — a hot key's rows now spread over `salts` reducers at the
  * cost of replicating the other side `salts`×.
  *
  * When to reach for this instead of Spark's built-ins: AQE's skew-join
  * split (`spark.sql.adaptive.skewJoin`) already rebalances sort-merge
  * joins at runtime, and tiny dimensions should simply `broadcast`. Salting
  * is the spelling for the cases those don't cover — a skewed key feeding a
  * downstream same-key aggregate (AQE's split must re-merge, salting
  * pre-spreads), large-large joins under streaming (no AQE), or engines
  * pinned to hash joins. Result rows are identical to the plain inner join
  * by construction: every (leftRow, rightRow) key match meets exactly one
  * salt value.
  */
object SkewJoin {

  /** Inner equi-join of `left` (the big, possibly skewed side) with `right`
    * on `leftKey == rightKey`, salted `salts` ways. The salt is a
    * deterministic hash of the whole left row — no RNG, so repeated runs
    * partition identically. Null join keys drop, exactly like the plain
    * inner join.
    */
  def saltedInner(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int = 8
  ): DataFrame = {
    require(salts >= 2, s"salts $salts must be >= 2 (1 is the plain join)")
    val l = left.withColumn("_lsalt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("_rsalt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && col("_lsalt") === col("_rsalt"))
      .drop("_lsalt", "_rsalt")
  }
}
