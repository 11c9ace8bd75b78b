package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber, Moffat & Zobel 2010, "A similarity measure
  * for indefinite rankings"): the top-weighted agreement between two
  * rankings — RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_:d ∩ B_:d|/d. Where
  * recall@k treats all k positions equally, RBO weights the head
  * geometrically (p = persistence), which is how retrieval differences
  * actually matter — the ANN-vs-exact eval next to [[IvfReplay]]'s recall.
  *
  * Replay discipline: the depth weights w_d = (1−p)·p^(d−1)/d are driver
  * doubles spliced verbatim into the SQL twin (Double.toString
  * round-trips — the GmmOracle constant precedent); overlap counts are
  * exact integers, each term quantizes to micros BEFORE the integer sum
  * (the Zipf/NMI ln rule), so per-query scores hash-match structurally.
  *
  * Scale shape: one equi-join finds the common items, a broadcast k-row
  * depth spine expands each common item to the depths it counts at, and
  * everything aggregates per (query, depth) — never a per-pair structure
  * beyond the rankings themselves.
  */
object Rbo {

  /** Per-query `(query_id, rbo_e6)` between two `(query_id, neighbor_id,
    * rank)` frames, truncated at depth `k`. Queries with zero overlap
    * score 0 (every query of `a` appears in the output).
    */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int = 10, p: Double = 0.9d): DataFrame = {
    require(k >= 1 && k <= 1000 && p > 0.0d && p < 1.0d)
    val spark = a.sparkSession
    import spark.implicits._
    val commons = a
      .select(col("query_id"), col("neighbor_id"), col("rank").as("ra"))
      .filter(col("ra") <= k)
      .join(
        b.select(col("query_id"), col("neighbor_id"), col("rank").as("rb"))
          .filter(col("rb") <= k),
        Seq("query_id", "neighbor_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("m"))
    val weights = (1 to k).map(d => (d, (1.0d - p) * math.pow(p, (d - 1).toDouble) / d))
      .toDF("d", "wd")
    val perQuery = commons
      .join(broadcast(weights), col("d") >= col("m"))
      .groupBy(col("query_id"), col("d"), col("wd"))
      .agg(count(lit(1)).as("x"))
      .select(col("query_id"),
        floor(col("x") * col("wd") * lit(1000000.0d) + lit(0.5d)).cast("long").as("term"))
      .groupBy(col("query_id"))
      .agg(sum(col("term")).as("rbo_e6"))
    a.select(col("query_id")).distinct()
      .join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("rbo_e6"), lit(0L)).as("rbo_e6"))
  }
}
