package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection — the monitoring step a continuously-fed
  * training pipeline runs before admitting a new slice of data: for every
  * group (source, day, feed), how far does its value distribution sit from
  * the rest of the corpus? Emits the two standard metrics per group:
  *
  *   - `ks_d`  — two-sample Kolmogorov–Smirnov statistic,
  *     max_x |CDF_group(x) − CDF_rest(x)|, evaluated on bucket edges.
  *   - `psi`   — population stability index,
  *     Σ_b (p_b − q_b) · ln(p_b / q_b), with ε-smoothed bucket masses
  *     (the credit-scoring / model-monitoring industry metric; > 0.25 is
  *     the conventional "investigate" bar).
  *
  * Both are computed on a FIXED equi-width bucketing of the global
  * [min, max] value range (`nBuckets`, default 64). Exact KS needs the
  * order statistics of the pooled sample — a global sort that becomes THE
  * bottleneck at 100 TB — while bucketed ECDFs need one (group, bucket)
  * aggregate and a window over `nBuckets` rows per group; the bucket-edge
  * evaluation grid bounds the KS error by the largest bucket mass, and
  * PSI is defined on buckets anyway. Integer bucket counts make every
  * ratio engine-exact; the two emitted metrics round to 6 decimals.
  *
  * Scale shape: one 2-row-broadcast (global min/max), one shuffle to
  * (group, bucket) counts — rest/total masses derive from per-bucket and
  * per-group aggregates of that SAME small table (|groups| · nBuckets
  * rows), so nothing after the first aggregate touches the raw data.
  *
  * Reference scope: the reference has no drift monitoring; SURVEY §2.12
  * extension (data-quality family with [[QualityBuckets]], [[Anomaly]]).
  */
object Drift {

  /** Per-group drift vs the rest of the corpus: (group, n, ks_d, psi).
    * Groups see the pooled complement as their reference; `eps` smooths
    * empty-bucket masses in PSI (standard practice — ln(0) otherwise).
    */
  def vsRest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBuckets: Int = 64,
      eps: Double = 1e-6
  ): DataFrame = {
    val (enriched, _) = bucketedCdf(df, groupCol, valueCol, nBuckets)
    val nRest = col("_n_all") - col("_n_g")
    val cdfG = col("_cum_g").cast("double") / col("_n_g")
    val cdfR = (col("_cum_all") - col("_cum_g")).cast("double") / nRest
    val pG = col("_c").cast("double") / col("_n_g") + eps
    val pR = (col("_c_all") - col("_c")).cast("double") / nRest + eps
    enriched
      .filter(nRest > 0)
      .groupBy(col(groupCol))
      .agg(
        max(col("_n_g")).as("n"),
        round(max(abs(cdfG - cdfR)), 6).as("ks_d"),
        round(sum((pG - pR) * log(pG / pR)), 6).as("psi"))
  }

  /** Per-group 1-Wasserstein (earth-mover's) distance vs the pooled rest,
    * on the same fixed `nBuckets` equi-width grid as [[vsRest]]:
    *
    *   W1 = Σ_b |CDF_group(b) − CDF_rest(b)| · bucketWidth
    *
    * — the drift measure with VALUE units (how far mass must move, in the
    * measured quantity), complementing the unit-free KS/PSI/JSD battery: a
    * small uniform shift that KS under-reads and PSI noise-reads shows up
    * in W1 as exactly the shift size.
    *
    * Exactness: the per-bucket CDF gap is assembled as the BIGINT
    * |cum_g·n_rest − cum_rest·n_g| (exact integers), SUMMED exactly, and
    * only then hits ONE double expression `S / (n_g·n_rest) · (hi − lo)
    * / nBuckets`, rounded to 6 — the same quantize-late discipline as
    * every drift oracle. Overflow envelope: the SUM is ≤ nBuckets·n_g·
    * n_rest, so Long holds through n ≈ 7·10⁸ balanced rows per
    * group-vs-rest pair — beyond that, pre-aggregate (dedupe, sample, or
    * per-day slices) before the distance. Output: (group, n, w1). Scale
    * shape identical to [[vsRest]].
    */
  def wassersteinVsRest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBuckets: Int = 64
  ): DataFrame = {
    val (enriched, (lo, hi)) = bucketedCdf(df, groupCol, valueCol, nBuckets)
    val nRest = col("_n_all") - col("_n_g")
    val gap = abs(col("_cum_g") * nRest - (col("_cum_all") - col("_cum_g")) * col("_n_g"))
    enriched
      .filter(nRest > 0)
      .groupBy(col(groupCol))
      .agg(
        max(col("_n_g")).as("n"),
        sum(gap).as("_s"),
        max(col("_n_g") * nRest).as("_den"))
      .select(col(groupCol), col("n"),
        round(col("_s").cast("double") / col("_den").cast("double")
          * (lit(hi) - lit(lo)) / nBuckets.toDouble, 6).as("w1"))
  }

  /** Shared bucketing/ECDF plumbing: (group, _b, _c, _n_g, _c_all,
    * _n_all, _cum_g, _cum_all) on the dense group×bucket spine, plus the
    * (lo, hi) global bounds. The bounds are COLLECTED once (2 doubles —
    * bounded driver state) and injected as literals, so consumers that
    * reference them don't re-scan the corpus for a second min/max pass.
    * `private[operators]`: [[Sinkhorn]] consumes the same histogram so
    * the two drift families can't diverge on bucketing.
    */
  private[operators] def bucketedCdf(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBuckets: Int
  ): (DataFrame, (Double, Double)) = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val v = col(valueCol).cast("double")
    // null measurements carry no distribution evidence — excluded from
    // masses AND group sizes, so the ECDFs still reach exactly 1
    val rows = df.filter(v.isNotNull)
    val Array(boundsRow) = rows.agg(min(v).as("_lo"), max(v).as("_hi")).collect()
    // an all-null/empty input has no bounds — lo = hi = 0 buckets the
    // zero surviving rows into 0, and every downstream frame is empty
    val (lo, hi) =
      if (boundsRow.isNullAt(0)) (0.0, 0.0)
      else (boundsRow.getDouble(0), boundsRow.getDouble(1))
    // bucket = floor((v - lo) / span * nB) clamped to [0, nB-1]; span = 0
    // puts everything in bucket 0 (identical arithmetic to the pre-r20
    // crossJoin(bounds) spelling — the values are the same doubles)
    val bucketed = rows.select(col(groupCol), v.as("_v"))
      .select(col(groupCol),
        if (hi == lo) lit(0L).as("_b")
        else least(
          greatest(
            floor((col("_v") - lit(lo)) / (lit(hi) - lit(lo)) * nBuckets),
            lit(0.0)),
          lit(nBuckets - 1.0)).cast("long").as("_b"))
    val counts = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
    // densify: every (group, bucket) cell, zero-filled — the ECDF window
    // must step through empty buckets too
    val groups = counts.groupBy(col(groupCol)).agg(sum(col("_c")).as("_n_g"))
    val spine = groups.crossJoin(
      broadcast(df.sparkSession.range(nBuckets).select(col("id").as("_b"))))
    val full = spine.join(counts, Seq(groupCol, "_b"), "left")
      .select(col(groupCol), col("_b"), col("_n_g"),
        coalesce(col("_c"), lit(0L)).as("_c"))
    val perBucket = full.groupBy(col("_b")).agg(sum(col("_c")).as("_c_all"))
    val total = counts.agg(sum(col("_c")).as("_n_all"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = full
      .join(broadcast(perBucket), Seq("_b"))
      .crossJoin(broadcast(total))
      .withColumn("_cum_g", sum(col("_c")).over(w))
      .withColumn("_cum_all", sum(col("_c_all")).over(w))
    (enriched, (lo, hi))
  }
}
