package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.MomentMatrixAgg

/** Distributed PCA, top principal component — the classic two-phase
  * design: the DATA pass is one distributed [[MomentMatrixAgg]] aggregate
  * (O(d²) shuffle bytes total, never a d²-explode of the fact table), and
  * the EIGENSOLVE runs on the driver over the d×d covariance matrix — a
  * bounded object (64×64 here), exactly like the PQ codebook / BPE merge
  * table driver probes. At 100 TB the scan dominates and parallelizes;
  * the O(d²·iters) driver math is microseconds.
  *
  * Determinism contract (what makes this "ML" operator oracle-able where
  * MLlib's PCA is not): the sufficient statistics are rounded to
  * `roundTo` decimals INSIDE the Spark aggregate (round-6 discipline —
  * the only partition-order-dependent floats in the whole computation),
  * and everything downstream — covariance from rounded stats, a fixed
  * `iters` of power iteration from the deterministic uniform start
  * v₀ = (1/√d, …), the Rayleigh-quotient eigenvalue — is identical IEEE
  * arithmetic replayed term-for-term by the generated DuckDB oracle
  * (the zkey3/PageRank generated-SQL technique).
  *
  * Power iteration converges to the dominant eigenvector at rate
  * (λ₂/λ₁)^t — the spec pins recovery on planted-spike data; on
  * near-isotropic data the value of the operator is the variance
  * decomposition, and parity is exact regardless of convergence.
  */
object Pca {

  /** One-pass (n, s, q) moment stats of the first `d` dims of `vecCol`,
    * each value rounded to `roundTo` decimals (pass None for raw sums —
    * the non-oracled path).
    */
  def momentStats(
      df: DataFrame,
      vecCol: String,
      d: Int,
      roundTo: Option[Int] = Some(6)
  ): (Long, Array[Double], Array[Array[Double]]) = {
    val agg = MomentMatrixAgg.moment_matrix(col(vecCol), d)
    val rounded = roundTo.fold(agg)(r => transform(agg, e => round(e, r)))
    val flat = df.agg(rounded.as("m")).head().getSeq[Double](0).toArray
    val n = flat(0).toLong
    val s = flat.slice(1, 1 + d)
    val q = Array.tabulate(d)(i => flat.slice(1 + d + i * d, 1 + d + (i + 1) * d))
    (n, s, q)
  }

  /** Covariance matrix from moment stats: covᵢⱼ = qᵢⱼ/n − (sᵢ/n)(sⱼ/n). */
  def covFromStats(n: Long, s: Array[Double], q: Array[Array[Double]]): Array[Array[Double]] = {
    val nd = n.toDouble
    Array.tabulate(s.length, s.length)((i, j) => q(i)(j) / nd - (s(i) / nd) * (s(j) / nd))
  }

  /** Fixed-iteration power method from the uniform unit start; returns
    * (unit loadings, Rayleigh-quotient eigenvalue). Ascending-index
    * left-fold accumulation throughout — the order the oracle replays.
    */
  def powerIteration(cov: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val d = cov.length
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var t = 0
    while (t < iters) {
      val w = matvec(v)
      var nn = 0.0; var i = 0
      while (i < d) { nn += w(i) * w(i); i += 1 }
      val norm = math.sqrt(nn)
      if (norm > 0.0) v = w.map(_ / norm)
      t += 1
    }
    val w = matvec(v)
    var eig = 0.0; var i = 0
    while (i < d) { eig += v(i) * w(i); i += 1 }
    (v, eig)
  }

  /** Top TWO components via Hotelling deflation: once (v₁, λ₁) is fixed,
    * the dominant direction is subtracted from the covariance —
    * C′ = C − λ₁v₁v₁ᵀ — and the same fixed-round power iteration runs on
    * C′, whose dominant eigenpair is the original second component. Both
    * iterations replay term-for-term in the generated oracle (identical
    * IEEE arithmetic from the shared round-6 moment stats), so the full
    * two-component decomposition stays hash-oracle-able. Output floats
    * use the floor(x·10⁶+0.5)/10⁶ spelling (arithmetic-derived values).
    */
  def topTwoComponents(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      d: Int,
      iters: Int = 5,
      roundTo: Option[Int] = Some(6)
  ): DataFrame = {
    import spark.implicits._
    val (n, s, q) = momentStats(df, vecCol, d, roundTo)
    require(n > 0, "Pca.topTwoComponents: no usable vectors")
    val cov = covFromStats(n, s, q)
    val (v1, e1) = powerIteration(cov, iters)
    val cov2 = Array.tabulate(d, d)((i, j) => cov(i)(j) - e1 * v1(i) * v1(j))
    val (v2, e2) = powerIteration(cov2, iters)
    def floor6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    (0 until d)
      .map(i => (i.toLong, floor6(v1(i)), floor6(e1), floor6(v2(i)), floor6(e2)))
      .toDF("idx", "loading1", "eigval1", "loading2", "eigval2")
  }

  /** DataFrame surface: (idx, loading, eigval) — one row per dimension. */
  def topComponent(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      d: Int,
      iters: Int = 5,
      roundTo: Option[Int] = Some(6)
  ): DataFrame = {
    import spark.implicits._
    val (n, s, q) = momentStats(df, vecCol, d, roundTo)
    require(n > 0, "Pca.topComponent: no usable vectors")
    val (v, eig) = powerIteration(covFromStats(n, s, q), iters)
    v.zipWithIndex
      .map { case (x, i) => (i.toLong, x, eig) }.toSeq
      .toDF("idx", "loading", "eigval")
      .select(col("idx"), round(col("loading"), 6).as("loading"),
        round(col("eigval"), 6).as("eigval"))
  }
}
