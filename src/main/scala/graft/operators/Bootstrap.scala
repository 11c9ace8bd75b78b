package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence interval (Chamandy et al. 2012,
  * "Estimating uncertainty for massive data streams") — THE bootstrap
  * that works at 100 TB: classic n-out-of-n resampling needs coordinated
  * global draws, but for large n the per-row multiplicity in a resample
  * is ≈ Poisson(1), so each (row, replicate) can draw its own weight
  * independently and a replicate statistic is just a weighted aggregate.
  *
  * Deterministic replay, no RNG:
  *   - u(row, b) = md5-48(id ‖ ':' ‖ b) / 2⁴⁸ — an exact dyadic rational
  *     both engines compute identically ([[HashSplit.md548]]);
  *   - w = Poisson(1) inverse CDF of u via FIXED double thresholds
  *     P(X ≤ k), k ≤ 7, spliced verbatim into the SQL replay
  *     (`Double.toString` round-trips, the GmmOracle constant precedent);
  *     the tail truncates at w = 8 — P(X > 7) < 1.1·10⁻⁵, far below the
  *     CI's resolution;
  *   - a replicate mean is ONE fixed-spelling double expression over the
  *     exact BIGINT sums (`⌊double(Σwx)·10⁶ / Σw + ½⌋` — each sum cast to
  *     double BEFORE the 10⁶ multiply, so there is no ANSI 2⁶³ ceiling;
  *     identical IEEE result for |Σwx|·10⁶ < 2⁵³, same spelling in the
  *     SQL replay);
  *   - CI bounds are exact order statistics over the B replicate means
  *     (`row_number` by (mean, b) — total order, engine-identical).
  *
  * Scale shape: the replicate explode is CPU-only blow-up — the groupBy
  * on the replicate id map-side-combines to ≤ B partial rows per
  * partition, so the shuffle is B·|partitions| rows regardless of corpus
  * size; the order-statistic window runs over the B-row replicate table.
  */
object Bootstrap {

  /** P(X ≤ k) for Poisson(1), k = 0..7 — computed once, shared verbatim
    * with the SQL replay via Double.toString splicing.
    */
  lazy val PoissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0d)
    var term = e1
    var acc = e1
    val out = Seq.newBuilder[Double]
    out += acc
    (1 to 7).foreach { k =>
      term = term / k
      acc = acc + term
      out += acc
    }
    out.result()
  }

  val TwoPow48: Double = 281474976710656.0d

  /** One-row report `(n_rows, b_reps, mean_e6, lo_e6, hi_e6)`: the exact
    * corpus mean of integer `valueCol` (micros) and the percentile-method
    * bootstrap CI from `b` Poisson replicates. Ranks are fixed literals
    * (⌊b·loPct⌋ / ⌈b·hiPct⌉ clamped to 1..b); an all-zero-weight
    * replicate (probability ~e⁻ⁿ) is excluded on both engines alike.
    */
  def poissonMeanCi(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      b: Int = 200,
      loPct: Double = 0.025d,
      hiPct: Double = 0.975d): DataFrame = {
    require(b >= 10 && b <= 10000, "b in 10..10000")
    val loRank = math.max(1, math.floor(b * loPct).toInt)
    val hiRank = math.min(b, math.ceil(b * hiPct).toInt)
    val base = df.select(col(idCol).as("_id"), col(valueCol).cast("long").as("_x"))
    val point = base.agg(
      count(lit(1)).as("n_rows"),
      floor(sum(col("_x")).cast("double") * lit(1000000.0d)
        / count(lit(1)).cast("double") + lit(0.5d)).cast("long").as("mean_e6"))
    val reps = base
      // all B draws per row in one native kernel pass (bit-identical to the
      // explode + md5 + CDF-ladder column spelling it replaced)
      .select(col("_x"),
        posexplode(graft.expressions.PoissonBoot.weights(col("_id"), b)).as(Seq("b", "w")))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("_x")).as("swx"))
      .filter(col("sw") > 0L)
      .select(col("b"),
        floor(col("swx").cast("double") * lit(1000000.0d)
          / col("sw").cast("double") + lit(0.5d)).cast("long").as("m"))
    // bounded: the window orders the B-row replicate table, never the corpus
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank).select(col("m").as("lo_e6"))
    val hi = ranked.filter(col("rn") === hiRank).select(col("m").as("hi_e6"))
    point
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n_rows"), lit(b).as("b_reps"), col("mean_e6"),
        col("lo_e6"), col("hi_e6"))
  }

  /** Per-group mean CI: [[poissonMeanCi]] with a group column — one row
    * `(group_key, n_rows, mean_e6, lo_e6, hi_e6)` per group. The
    * replicate aggregation map-side-combines to |groups|·b partials and
    * the rank window partitions BY GROUP over b rows each — nothing
    * unpartitioned anywhere, so group count scales freely.
    */
  def poissonMeanCiByGroup(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      idCol: String,
      b: Int = 200,
      loPct: Double = 0.025d,
      hiPct: Double = 0.975d): DataFrame = {
    require(b >= 10 && b <= 10000, "b in 10..10000")
    val loRank = math.max(1, math.floor(b * loPct).toInt)
    val hiRank = math.min(b, math.ceil(b * hiPct).toInt)
    val base = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
      col(valueCol).cast("long").as("_x"))
    val point = base.groupBy(col("_g")).agg(
      count(lit(1)).as("n_rows"),
      floor(sum(col("_x")).cast("double") * lit(1000000.0d)
        / count(lit(1)).cast("double") + lit(0.5d)).cast("long").as("mean_e6"))
    val reps = base
      .select(col("_g"), col("_x"),
        posexplode(graft.expressions.PoissonBoot.weights(col("_id"), b)).as(Seq("b", "w")))
      .groupBy(col("_g"), col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("_x")).as("swx"))
      .filter(col("sw") > 0L)
      .select(col("_g"), col("b"),
        floor(col("swx").cast("double") * lit(1000000.0d)
          / col("sw").cast("double") + lit(0.5d)).cast("long").as("m"))
    val ranked = reps.withColumn("rn",
      row_number().over(Window.partitionBy(col("_g")).orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank).select(col("_g"), col("m").as("lo_e6"))
    val hi = ranked.filter(col("rn") === hiRank).select(col("_g"), col("m").as("hi_e6"))
    point.join(lo, Seq("_g")).join(hi, Seq("_g"))
      .select(col("_g").as("group_key"), col("n_rows"), col("mean_e6"),
        col("lo_e6"), col("hi_e6"))
  }

  /** Two-arm uplift CI (1 row): the bootstrap distribution of
    * `mean(arm 1) − mean(arm 0)` under per-arm Poisson replicates — the
    * experimentation primitive (an md5-split A/A test's interval must
    * bracket 0). `armCol` must be 0/1. Same exactness contract as
    * [[poissonMeanCi]]; a replicate missing either arm entirely is
    * excluded on both engines alike. Output
    * `(n0, n1, diff_e6, lo_e6, hi_e6)` — each replicate diff is the
    * difference of two floor-rounded micro means.
    */
  def poissonDiffCi(
      df: DataFrame,
      valueCol: String,
      armCol: String,
      idCol: String,
      b: Int = 200,
      loPct: Double = 0.025d,
      hiPct: Double = 0.975d): DataFrame = {
    require(b >= 10 && b <= 10000, "b in 10..10000")
    val loRank = math.max(1, math.floor(b * loPct).toInt)
    val hiRank = math.min(b, math.ceil(b * hiPct).toInt)
    val base = df.select(col(idCol).as("_id"), col(valueCol).cast("long").as("_x"),
      col(armCol).cast("long").as("_a"))
    def meanE6(swx: org.apache.spark.sql.Column, sw: org.apache.spark.sql.Column) =
      floor(swx.cast("double") * lit(1000000.0d) / sw.cast("double") + lit(0.5d))
        .cast("long")
    val point = base.agg(
      sum(when(col("_a") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("_a") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("_a") === 0L, col("_x")).otherwise(0L)).as("s0"),
      sum(when(col("_a") === 1L, col("_x")).otherwise(0L)).as("s1"))
      .select(col("n0"), col("n1"),
        (meanE6(col("s1"), col("n1")) - meanE6(col("s0"), col("n0"))).as("diff_e6"))
    val reps = base
      .select(col("_x"), col("_a"),
        posexplode(graft.expressions.PoissonBoot.weights(col("_id"), b)).as(Seq("b", "w")))
      .groupBy(col("b"))
      .agg(
        sum(when(col("_a") === 0L, col("w")).otherwise(0L)).as("sw0"),
        sum(when(col("_a") === 1L, col("w")).otherwise(0L)).as("sw1"),
        sum(when(col("_a") === 0L, col("w") * col("_x")).otherwise(0L)).as("swx0"),
        sum(when(col("_a") === 1L, col("w") * col("_x")).otherwise(0L)).as("swx1"))
      .filter(col("sw0") > 0L && col("sw1") > 0L)
      .select(col("b"),
        (meanE6(col("swx1"), col("sw1")) - meanE6(col("swx0"), col("sw0"))).as("m"))
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank).select(col("m").as("lo_e6"))
    val hi = ranked.filter(col("rn") === hiRank).select(col("m").as("hi_e6"))
    point
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("n0"), col("n1"), col("diff_e6"), col("lo_e6"), col("hi_e6"))
  }
}
