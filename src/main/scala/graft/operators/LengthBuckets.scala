package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Optimal length-bucket boundaries by exact dynamic programming — the
  * design problem behind `bucket_by_sequence_length` in every seq2seq /
  * LLM fine-tuning stack: split the token-length distribution into B
  * contiguous buckets so that padding every document to its BUCKET
  * maximum wastes the fewest tokens. [[Batching]] reports the waste of
  * fixed strategies; this operator finds the minimum-waste boundaries.
  *
  * DP over the length HISTOGRAM, not the corpus: lengths l_1 < … < l_L
  * with counts c_k and prefix sums (C_k, S_k); bucket (i, j] costs
  * w(i, j) = l_j·(C_j − C_i) − (S_j − S_i); cost[b][j] = min_i
  * cost[b−1][i] + w(i, j), ties to the SMALLEST i — every quantity an
  * exact BIGINT, so the whole table (and the backtracked boundaries)
  * replays in SQL as B layered argmin joins over the L-row histogram.
  *
  * Scale shape: one groupBy builds the histogram; L is bounded by the
  * token-length range (hundreds), so the O(B·L²) DP is a bounded
  * driver-object computation (the Doremi/KMeansReplay class) — corpus
  * size only affects the histogram aggregate.
  */
object LengthBuckets {

  /** One row per bucket: `(bucket_id, hi_len, n_docs, n_tokens, padding)`
    * — hi_len is the bucket's padding target (its max length). Requires
    * at least `b` distinct lengths.
    */
  def optimalBuckets(
      docs: DataFrame,
      b: Int = 4,
      textCol: String = "text"
  ): DataFrame = {
    require(b >= 1 && b <= 16, "b in 1..16")
    val spark = docs.sparkSession
    val hist = docs
      .select(TextFunctions.tokenCount(col(textCol)).cast("long").as("l"))
      .groupBy(col("l")).agg(count(lit(1)).as("c"))
      .orderBy(col("l"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val big = 1 << 24
    require(hist.length >= b, s"need >= $b distinct lengths, got ${hist.length}")
    require(hist.length < big, s"histogram too wide: ${hist.length}")
    val n = hist.length
    val lens = Array(0L) ++ hist.map(_._1)
    val cc = new Array[Long](n + 1)
    val ss = new Array[Long](n + 1)
    var k = 1
    while (k <= n) {
      cc(k) = cc(k - 1) + hist(k - 1)._2
      ss(k) = ss(k - 1) + hist(k - 1)._2 * hist(k - 1)._1
      k += 1
    }
    def w(i: Int, j: Int): Long = lens(j) * (cc(j) - cc(i)) - (ss(j) - ss(i))
    // cost(b)(j), besti(b)(j) — ties to the smallest i (strict <)
    val cost = Array.fill(b + 1, n + 1)(Long.MaxValue)
    val best = Array.fill(b + 1, n + 1)(0)
    var j = 1
    while (j <= n) { cost(1)(j) = w(0, j); j = j + 1 }
    var lb = 2
    while (lb <= b) {
      var jj = lb
      while (jj <= n) {
        var i = lb - 1
        while (i < jj) {
          if (cost(lb - 1)(i) != Long.MaxValue) {
            val c = cost(lb - 1)(i) + w(i, jj)
            if (c < cost(lb)(jj)) { cost(lb)(jj) = c; best(lb)(jj) = i }
          }
          i += 1
        }
        jj += 1
      }
      lb += 1
    }
    // backtrack boundaries 0 = j_0 < j_1 < … < j_B = n
    val bounds = new Array[Int](b + 1)
    bounds(b) = n
    var bb = b
    while (bb >= 2) { bounds(bb - 1) = best(bb)(bounds(bb)); bb -= 1 }
    val rows = (1 to b).map { bid =>
      val lo = bounds(bid - 1); val hi = bounds(bid)
      (bid, lens(hi), cc(hi) - cc(lo), ss(hi) - ss(lo), w(lo, hi))
    }
    import spark.implicits._
    rows.toDF("bucket_id", "hi_len", "n_docs", "n_tokens", "padding")
  }
}
