package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for the shapes AQE can't always fix on its own. */
object RelationalOps {

  /** Salted equi-join for skewed keys: the skewed (big) side gets a random
    * salt in [0, saltFactor); the small side is exploded `saltFactor`× so
    * every salted key finds its match. One hot key is thereby spread over
    * `saltFactor` reducers instead of pinning one.
    *
    * Semantically identical to `big.join(small, keys)` (inner). Prefer AQE
    * skew-join handling first; salting is for persistent planned skew (e.g.
    * a null-heavy or celebrity key) where runtime splitting isn't enough.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8
  ): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("_salt", (rand(42) * saltFactor).cast("int"))
    val exploded = small.withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(exploded, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Per-column null/blank profile — data-quality scan used before big
    * ingests (generalizes reference P11).
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
        count(lit(1)).as(s"${c}_total")
      )
    }
    df.agg(exprs.head, exprs.tail: _*)
  }
}
