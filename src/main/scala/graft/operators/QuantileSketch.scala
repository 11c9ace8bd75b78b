package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable one-pass quantile ESTIMATES from a bottom-k coordinated
  * sample (Cohen & Kaplan 2007's bottom-k sketch applied to rank
  * queries): keep the k rows with the smallest md5-48 draw per group.
  * The sample is
  *   - MERGEABLE: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)),
  *     the same union discipline as the HLL register table — shard
  *     sketches combine without rescanning;
  *   - DETERMINISTIC and engine-replayable: the draw is the shared md5-48
  *     spelling, so unlike KLL/t-digest (whose compactions are RNG- or
  *     arrival-order-fed) the ESTIMATES themselves hash-match a SQL
  *     oracle, not just an error contract;
  *   - uniformly random in value space: md5 is independent of v, so the
  *     sample p-quantile's rank error is the binomial O(√(p(1−p)/k)) —
  *     k = 256 gives ~3 % at the median; the spec pins ≤ 10 % at every
  *     decile on the corpus.
  *
  * Estimate = the exact interpolated percentile over the sample, in the
  * [[Quantiles]] portable spelling (integer position math, one identical
  * IEEE interpolation — no rounding). The `rank_e6`/`err_e6` columns
  * AUDIT each estimate against the full data — evaluation cost, not the
  * serving path (the [[IvfReplay.exactKnn]] convention).
  *
  * Scale shape: ONE hash exchange on the group key for the bottom-k
  * window; everything after runs on ≤ |groups|·k sample rows. The audit
  * join broadcasts the tiny estimate table against the corpus — drop the
  * audit columns in production and the full scan disappears with them.
  */
object QuantileSketch {

  val Deciles: Seq[Int] = (10 to 90 by 10)

  /** One row per (group, percentile): `(group_key, p, est, rank_e6,
    * err_e6)` — the sample-quantile estimate, its achieved rank in the
    * FULL data (micros), and the absolute rank error vs the target
    * `p·10⁴` micros. `valueCol` must be integral (cast upstream);
    * `idCol` seeds the per-row draw and must be unique.
    */
  def sketchWithAudit(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int = 256,
      pcts: Seq[Int] = Deciles
  ): DataFrame = {
    require(k >= 2, "k >= 2")
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100),
      "percentiles must be integers in [0, 100]")
    val base = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"),
        HashSplit.md548(col(idCol)).as("hk"), col(idCol).cast("long").as("rid"))
    val sample = base
      .withColumn("sr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("hk"), col("rid"))))
      .filter(col("sr") <= k)
    val ranked = sample
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))).cast("long") - 1)
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("g"))))
    def loPos(p: Int): Column =
      floor(((col("nn") - 1) * p) / lit(100.0).cast("double")).cast("long")
    val abCols = pcts.flatMap { p =>
      Seq(
        max(when(col("rn") === loPos(p), col("v"))).as(s"a$p"),
        max(when(col("rn") === least(loPos(p) + 1, col("nn") - 1), col("v")))
          .as(s"b$p"))
    }
    val br = ranked.groupBy(col("g")).agg(count(lit(1)).as("ns"), abCols: _*)
    val ests = pcts.map { p =>
      val rem = ((col("ns") - 1) * p) % 100
      br.select(col("g"), lit(p).as("p"),
        (col(s"a$p").cast("double") +
          rem / lit(100.0).cast("double") * (col(s"b$p") - col(s"a$p"))).as("est"))
    }.reduce(_ unionByName _)
    val full = base.groupBy(col("g")).agg(count(lit(1)).as("n_full"))
    val ranks = base.select(col("g"), col("v"))
      .join(broadcast(ests), Seq("g"))
      .groupBy(col("g"), col("p"), col("est"))
      .agg(sum(when(col("v").cast("double") <= col("est"), 1L).otherwise(0L)).as("rank"))
    ranks.join(broadcast(full), Seq("g"))
      .select(col("g").as("group_key"), col("p"), col("est"),
        expr("rank * 1000000 DIV n_full").as("rank_e6"),
        abs(expr("rank * 1000000 DIV n_full") - col("p").cast("long") * 10000L)
          .as("err_e6"))
  }
}
