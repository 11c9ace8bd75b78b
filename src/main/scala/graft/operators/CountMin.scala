package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan 2005) over a categorical
  * column, built with the repo's engine-portable md5-48 hash family so the
  * WHOLE sketch — counters, point estimates, over-count deltas — replays
  * bit-exactly in any SQL engine. The sibling of [[graft.expressions.FreqSketch]]
  * (Misra–Gries): MG answers "which items are frequent" with lower-bound
  * counts; CMS answers "how frequent is THIS item" with upper-biased
  * estimates (est ≥ true always; est ≤ true + 2n/w with prob ≥ 1 − 2^−d
  * per the standard Markov argument).
  *
  * Scale shape: the counter build is one explode(d) projection feeding a
  * map-side-combined groupBy onto at most d·w cells — the shuffle volume is
  * O(d·w) per partition regardless of item cardinality, the same
  * histogram-of-a-high-cardinality-column argument as FreqSketch's
  * scaladoc. Point queries join a (small) probe set against the d·w-row
  * counter table — broadcast by size.
  *
  * Reference anchor: the reference keeps per-type counters in a driver dict
  * (`src/streaming/stream_processor.py:96-114`); this is the bounded-memory
  * distributed spelling of the same "count things without the full
  * histogram" need.
  */
object CountMin {

  /** Row j's bucket for `item`: md5-48 of "item:j" mod w — matches DuckDB's
    * `('0x' || substring(md5(item || ':' || j), 1, 12))::BIGINT % w`
    * exactly (the hash value is a nonnegative 48-bit integer, so plain `%`
    * agrees across engines).
    */
  def bucket(item: Column, j: Int, w: Int): Column =
    conv(substring(md5(concat(item.cast("string"), lit(":" + j))), 1, 12), 16, 10)
      .cast("long") % w

  /** The d×w counter table: `(j, h, c)` — at most d·w rows. */
  def counters(df: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, "depth and width must be >= 1")
    val jh = array((0 until d).map(j =>
      struct(lit(j).as("j"), bucket(col(itemCol), j, w).as("h"))): _*)
    df.select(explode(jh).as("jh"))
      .groupBy(col("jh.j").as("j"), col("jh.h").as("h"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for a probe set (`items` must carry a distinct string
    * column `item`): est(item) = min_j counters[j][h_j(item)]. Probes for
    * items present in the stream always find all d cells, so the inner
    * join is total; absent items would need a 0-coalesce left join —
    * callers probing unseen items should coalesce(est, 0).
    */
  def estimates(df: DataFrame, itemCol: String, items: DataFrame, d: Int, w: Int): DataFrame = {
    val ctr = counters(df, itemCol, d, w)
    val probes = items.select(col("item"),
      explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bucket(col("item"), j, w).as("h"))): _*)).as("jh"))
      .select(col("item"), col("jh.j").as("j"), col("jh.h").as("h"))
    probes.join(broadcast(ctr), Seq("j", "h"))
      .groupBy(col("item"))
      .agg(min(col("c")).as("est_n"))
  }

  /** The audit query: exact top-`k` items (count desc, item asc) with their
    * CMS estimates and the guaranteed-nonnegative over-count. One row per
    * top item: `(item, exact_n, est_n, overcount, ge_ok)` — `ge_ok` is the
    * est ≥ exact structural guarantee (an oracled FALSE would mean the
    * sketch is broken).
    */
  def audit(df: DataFrame, itemCol: String, d: Int, w: Int, k: Int): DataFrame = {
    val exact = df.groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("item"))
      .limit(k)
    estimates(df, itemCol, exact, d, w)
      .join(broadcast(exact), Seq("item"))
      .select(col("item"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"),
        (col("est_n") >= col("exact_n")).as("ge_ok"))
  }
}
