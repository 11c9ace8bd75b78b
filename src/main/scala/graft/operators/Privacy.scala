package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling for a dataset about to be released or used as
  * training data — the k-anonymity / l-diversity audit pair (Sweeney 2002;
  * Machanavajjhala et al. 2007) plus an ε-differentially-private histogram
  * release (Dwork et al. 2006) whose Laplace noise is drawn from the
  * repo's portable md5-48 uniforms, so the ENTIRE release replays
  * bit-identically in any engine.
  *
  * Scale shapes:
  *   - the k-anonymity generalization ladder is ONE shuffle: the levels
  *     form a rollup chain, so `ROLLUP(qi...)` computes every level's
  *     equivalence classes in a single pass with map-side combine, and the
  *     per-level profile is a second tiny aggregate over class rows —
  *     never one scan per generalization level;
  *   - l-diversity is one groupBy with countDistinct (partial aggregation
  *     applies — the distinct set is bounded by the sensitive domain);
  *   - the DP histogram's noise is a pure projection over the aggregated
  *     key table (no RNG state, no driver loop).
  */
object Privacy {

  /** Per-level k-anonymity profile over the rollup chain of `qiCols`
    * (level 0 = all columns, each next level drops the last column; the
    * final grouping-id row is the trivial whole-table class). One row per
    * level: `(gid, n_groups, min_k, suppressed_groups, suppressed_rows,
    * total_rows, suppressed_frac_e6)` — `suppressed_*` counts equivalence
    * classes with k < `kThreshold` (the rows a k-anonymous release must
    * drop or generalize further).
    */
  def kAnonymityLadder(df: DataFrame, qiCols: Seq[String], kThreshold: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.rollup(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k"), grouping_id().cast("long").as("gid"))
    classes.groupBy(col("gid"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("k")).as("min_k"),
        sum(when(col("k") < kThreshold, 1L).otherwise(0L)).as("suppressed_groups"),
        sum(when(col("k") < kThreshold, col("k")).otherwise(0L)).as("suppressed_rows"),
        sum(col("k")).as("total_rows"))
      .select(col("gid"), col("n_groups"), col("min_k"), col("suppressed_groups"),
        col("suppressed_rows"), col("total_rows"),
        floor(col("suppressed_rows").cast("double") * lit(1000000.0d)
          / col("total_rows").cast("double")).cast("long").as("suppressed_frac_e6"))
  }

  /** l-diversity histogram: distinct sensitive values per quasi-identifier
    * class, collapsed to one row per diversity level l:
    * `(l, n_groups, n_rows)`. A release is distinct-l-diverse iff the
    * smallest emitted l is ≥ l — the min is readable off the histogram, and
    * the histogram also shows HOW MUCH of the data sits in low-diversity
    * classes (the homogeneity-attack surface).
    */
  def lDiversityHistogram(df: DataFrame, qiCols: Seq[String], sensitive: Column): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("k"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
  }

  /** ε-DP histogram release over `key`: true count + Laplace(1/ε) noise,
    * clamped at 0 (standard nonnegative post-processing), e6-quantized.
    * The noise draw is deterministic given the release salt — u from the
    * portable md5-48 uniform of "salt:key", inverse-CDF'd through
    * noise = −(1/ε)·sign(2u−1)·ln(1 − |2u−1|) — which makes the release
    * auditable/replayable (a fixed-seed release is NOT private against an
    * adversary who knows the salt; production would draw the salt fresh
    * per release and keep it secret — the mechanism and its calibration
    * are what this operator carries).
    */
  /** ε-DP mean release (the v2 the histogram query leaves open): the
    * standard clamp-shift-split mechanism with explicit ε-accounting.
    * Values clamp to [lo, hi] (shifted to [0, R], R = hi−lo, so the
    * add/remove-one sensitivity of the shifted sum is exactly R and of
    * the count exactly 1); Laplace(R/εₛ) noise on the shifted sum and
    * Laplace(1/ε_c) on the count (each inverse-CDF'd from the portable
    * md5-48 uniform of "salt:sum" / "salt:count" — deterministic replay,
    * same caveat as [[dpHistogram]]); the released mean is the noisy
    * quotient clamped back to [0, R] (pure post-processing) plus lo.
    * Total budget ε = εₛ + ε_c by sequential composition — emitted as
    * e6 columns so the release carries its own accounting.
    *
    * One row: `(n, eps_sum_e6, eps_count_e6, eps_total_e6,
    * released_mean_e6)`. Scale shape: one map-side-combined 1-row
    * aggregate; the noise splice is driver-free constant arithmetic.
    */
  def dpMean(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      epsSum: Double, epsCount: Double, salt: String): DataFrame = {
    require(hi > lo, "hi must exceed lo")
    require(epsSum > 0 && epsCount > 0, "epsilons must be positive")
    val r = (hi - lo).toDouble
    def lap(key: String, b: Double): Column = {
      val h = HashSplit.md548(lit(salt + ":" + key))
      val u = (h.cast("double") + lit(0.5d)) / lit(281474976710656.0d) // 2^48
      val c = lit(2.0d) * u - lit(1.0d)
      lit(-b) * signum(c) * log(lit(1.0d) - abs(c))
    }
    val shifted = least(greatest(col(valueCol).cast("long"), lit(lo)), lit(hi)) - lit(lo)
    val agg = df.agg(count(lit(1)).as("n"), sum(shifted).as("s"))
    val noisySum = col("s").cast("double") + lap("sum", r / epsSum)
    val noisyN = greatest(col("n").cast("double") + lap("count", 1.0d / epsCount),
      lit(1.0d))
    val mean = greatest(lit(0.0d), least(lit(r), noisySum / noisyN)) + lit(lo.toDouble)
    agg.select(col("n"),
      lit(math.floor(epsSum * 1e6 + 0.5).toLong).as("eps_sum_e6"),
      lit(math.floor(epsCount * 1e6 + 0.5).toLong).as("eps_count_e6"),
      lit(math.floor((epsSum + epsCount) * 1e6 + 0.5).toLong).as("eps_total_e6"),
      floor(mean * lit(1000000.0d) + lit(0.5d)).cast("long").as("released_mean_e6"))
  }

  def dpHistogram(df: DataFrame, keyCol: String, eps: Double, salt: String): DataFrame = {
    require(eps > 0, "epsilon must be positive")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val h = HashSplit.md548(concat(lit(salt + ":"), col("key")))
    val u = (h.cast("double") + lit(0.5d)) / lit(281474976710656.0d) // 2^48
    val c = lit(2.0d) * u - lit(1.0d)
    val noise = (lit(-1.0d) / lit(eps)) * signum(c) * log(lit(1.0d) - abs(c))
    counts.select(col("key"),
      floor(greatest(lit(0.0d), col("n").cast("double") + noise)
        * lit(1000000.0d) + lit(0.5d)).cast("long").as("released_e6"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third leg
    * of the release triad: per quasi-identifier class, the Earth Mover's
    * Distance between the class's distribution of an ORDERED sensitive
    * attribute and the global distribution,
    *
    *   EMD = 1/(m−1) · Σᵢ |CumP(i) − CumQ(i)|
    *
    * (the ordered-attribute closed form). A class passing k-anonymity and
    * l-diversity can still leak — all its sensitive values clustered at
    * one end of the range — and EMD is what catches that.
    *
    * Exactness: the per-bin term is the INTEGER `|cumP·N − cumQ·n_g|`
    * (common denominator n_g·N; both cumsums are BIGINT window sums), and
    * the single division happens once per class on exact-integer operands
    * (`t_num ≤ m·n_g·N` must stay under 2⁵³ for the double to be exact —
    * holds to ~10⁵ bins × 10⁶-row classes × 10⁹ rows is NOT needed: the
    * audit contract is a bounded bin domain, enforced loudly below).
    *
    * Scale shape: one (qi, bin) aggregate, one bounded dense cross join
    * (classes × bins), two window cumsums partitioned by class — never a
    * global window. The bin-domain guard (≤ 1000) is the
    * Isotonic.calibrate discipline: fail loudly rather than densify an
    * unbounded domain.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitive: Column,
      tThresholdE6: Long = 200000L
  ): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val base = df.select(qiCols.map(col) :+ sensitive.cast("long").as("sv"): _*)
    val bins = base.select(col("sv")).distinct()
    val m = bins.count()
    require(m >= 2, s"t-closeness needs >= 2 sensitive bins, got $m")
    require(m <= 1000L,
      s"sensitive domain has $m bins (> 1000): bin the attribute first so " +
        "the dense class x bin frame stays bounded")

    val global = base.groupBy(col("sv")).agg(count(lit(1)).as("q_cnt"))
    val nTotal = base.groupBy().agg(count(lit(1)).as("n_total"))
    val classes = base.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("_cls_n"))
      .select(qiCols.map(col) :+ col("_cls_n").as("n_g"): _*)
    val cells = base.groupBy(qiCols.map(col) :+ col("sv"): _*)
      .agg(count(lit(1)).as("cnt"))

    val dense = classes.crossJoin(broadcast(bins))
      .join(cells, qiCols :+ "sv", "left")
      .select(qiCols.map(col) ++ Seq(col("n_g"), col("sv"),
        coalesce(col("cnt"), lit(0L)).as("cnt")): _*)
      .join(broadcast(global), Seq("sv"))
      .crossJoin(broadcast(nTotal))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy(col("sv"))
    val cum = dense
      .withColumn("cum_p", sum(col("cnt")).over(w))
      .withColumn("cum_q", sum(col("q_cnt")).over(w))
    cum
      .groupBy(qiCols.map(col) :+ col("n_g") :+ col("n_total"): _*)
      .agg(sum(abs(col("cum_p") * col("n_total") - col("cum_q") * col("n_g")))
        .as("t_num"))
      .select(qiCols.map(col) ++ Seq(col("n_g"),
        floor(col("t_num").cast("double") * lit(1000000.0)
          / (lit(m - 1.0) * col("n_g") * col("n_total")))
          .cast("long").as("t_e6")): _*)
      .withColumn("t_ok", col("t_e6") <= tThresholdE6)
  }
}
