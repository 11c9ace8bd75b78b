package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Debiased Sinkhorn optimal-transport divergence between per-group value
  * distributions and the pooled rest — the geometry-aware drift measure
  * (Cuturi 2013 entropic OT; Genevay 2018 debiasing) completing the drift
  * battery: PSI/JSD see only per-bucket mass mismatch, KS one CDF gap,
  * [[Drift.wassersteinVsRest]] the exact linear cost; entropic OT gives
  * the smoothed transport GEOMETRY (how far mass moves under a soft
  * plan), and the debiased form S(a,b) − ½S(a,a) − ½S(b,b) removes the
  * entropic self-cost so identical distributions read EXACTLY zero.
  *
  * Determinism contract (the ALS/HoltWinters replay discipline):
  *   - Histograms are [[Drift.bucketedCdf]]'s integer bucket counts on
  *     the shared 64-bucket grid — the one float stage (bucket ids) is
  *     the drift oracles' pinned IEEE spelling.
  *   - The Gibbs kernel K(d) = exp(−d/ε), ε = 8 bucket units, is a
  *     64-entry TABLE OF LITERAL MICROS ([[Sinkhorn.KernelE6]]) shared
  *     verbatim with the oracle's VALUES clause — engine `exp` never
  *     runs, so it cannot disagree.
  *   - Scaling vectors live as BIGINT nanos (u_q = real·10⁹), updated per
  *     half-round by ONE identically-spelled double chain
  *     `floor(a/Nₐ · 10²⁴ / (Kv)_q + 0.5)` clamped to 10¹⁰ (real 10 — the
  *     ALS ±400 clamp precedent; engages only in pathological corners at
  *     ε = 8), with (Kv)_q an EXACT BIGINT dot of kernel micros against
  *     state nanos (≤ 64·10⁶·10¹⁰ ≪ 2⁶³).
  *   - The transport cost reduces each plan cell u·K·v through two exact
  *     integer divisions (`DIV 10⁹`, `DIV 10⁴` — non-negative, so Spark
  *     DIV ≡ DuckDB //) before the BIGINT num/den sums; one final double
  *     division emits micros of bucket units.
  *   - Output `div2_e6` = 2·S(a,b) − S(a,a) − S(b,b): integer
  *     subtraction only (no halving — a negative-operand division would
  *     hit the trunc-vs-floor trap), ≥ 0 up to quantization and exactly 0
  *     for identical histograms.
  *
  * Scale shape: the corpus-scale work is ONE (group, bucket) histogram
  * shuffle (shared with [[Drift]]); the three Sinkhorn solves run on the
  * collected |groups|·64 cell table — a bounded driver object (the
  * BradleyTerry/RangePlanner k×k class, loud-guarded at 10⁶ cells).
  * Group cardinality is the contract: event types / sources / feeds, not
  * row-scale keys.
  *
  * Reference scope: no counterpart; SURVEY §2.12 drift-family extension.
  */
object Sinkhorn {

  /** Entropic regularization in bucket units. */
  val Eps = 8.0

  /** K(d)·10⁶ for d = 0..63 — literal micros shared with the oracle's
    * VALUES clause (the Bm25Queries single-source discipline).
    */
  val KernelE6: IndexedSeq[Long] =
    (0 until 64).map(d => math.floor(math.exp(-d / Eps) * 1e6 + 0.5).toLong)

  private val ClampHi = 1.0e10 // scaling-vector ceiling, nanos (real 10)
  private val Scale = 1.0e24   // (a/N)·Scale/Kv_q lands in nanos

  /** One Sinkhorn solve: `rounds` alternating u/v updates from the two
    * 64-bucket integer histograms, then the reduced-cell transport cost
    * in micro-bucket-units.
    */
  private[operators] def cost(
      a: Array[Long], na: Long, b: Array[Long], nb: Long, rounds: Int): Long = {
    val n = a.length
    val u = Array.fill(n)(1000000000L)
    val v = Array.fill(n)(1000000000L)
    def k(i: Int, j: Int): Long = KernelE6(math.abs(i - j))
    var r = 0
    while (r < rounds) {
      var i = 0
      while (i < n) {
        var kv = 0L
        var j = 0
        while (j < n) { kv += k(i, j) * v(j); j += 1 }
        // zero mass floors to 0 through the chain itself (floor(0.5) = 0
        // after the 0/N numerator) — no special case, so the oracle can
        // spell the IDENTICAL plain chain; kv > 0 always (kernel > 0 and
        // the max-mass bucket's scaling never floors to 0)
        u(i) = math.min(math.floor(a(i).toDouble / na * Scale / kv + 0.5), ClampHi).toLong
        i += 1
      }
      var j = 0
      while (j < n) {
        var ku = 0L
        var i2 = 0
        while (i2 < n) { ku += k(i2, j) * u(i2); i2 += 1 }
        v(j) = math.min(math.floor(b(j).toDouble / nb * Scale / ku + 0.5), ClampHi).toLong
        j += 1
      }
      r += 1
    }
    var num = 0L
    var den = 0L
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val p = u(i) * k(i, j) / 1000000000L * v(j) / 10000L
        num += p * math.abs(i - j)
        den += p
        j += 1
      }
      i += 1
    }
    if (den == 0L) 0L
    else math.floor(num.toDouble * 1000000.0 / den.toDouble + 0.5).toLong
  }

  /** Per-group debiased OT divergence vs the pooled rest on the shared
    * `nBuckets` grid: (group, n, cost_ab_e6, cost_aa_e6, cost_bb_e6,
    * div2_e6) with div2 = 2·S(a,b) − S(a,a) − S(b,b).
    */
  def vsRest(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBuckets: Int = 64,
      rounds: Int = 5
  ): DataFrame = {
    import spark.implicits._
    require(nBuckets == KernelE6.length,
      s"kernel table is ${KernelE6.length} entries; got nBuckets=$nBuckets")
    val (enriched, _) = Drift.bucketedCdf(df, groupCol, valueCol, nBuckets)
    // take(limit+1), not collect(): the guard must bound DRIVER memory,
    // so it has to fire before an unbounded pull — a row-scale group key
    // now fails with this message instead of an OOM inside collect()
    val maxCells = 1000000
    val cells = enriched
      .filter(col("_n_all") - col("_n_g") > 0)
      .select(col(groupCol).cast("string"), col("_b"), col("_c"),
        col("_c_all"), col("_n_g"), col("_n_all"))
      .take(maxCells + 1)
    require(cells.length <= maxCells,
      s"over $maxCells histogram cells — Sinkhorn groups must be low-cardinality " +
        "(event types / sources), not row-scale keys")
    val out = cells.groupBy(_.getString(0)).toSeq.map { case (grp, rows) =>
      val a = Array.fill(nBuckets)(0L)
      val b = Array.fill(nBuckets)(0L)
      var na = 0L
      var nAll = 0L
      rows.foreach { r =>
        val bk = r.getLong(1).toInt
        a(bk) = r.getLong(2)
        b(bk) = r.getLong(3) - r.getLong(2)
        na = r.getLong(4)
        nAll = r.getLong(5)
      }
      val nb = nAll - na
      val ab = cost(a, na, b, nb, rounds)
      val aa = cost(a, na, a, na, rounds)
      val bb = cost(b, nb, b, nb, rounds)
      (grp, na, ab, aa, bb, 2L * ab - aa - bb)
    }.sortBy(_._1)
    out.toDF(groupCol, "n", "cost_ab_e6", "cost_aa_e6", "cost_bb_e6", "div2_e6")
  }
}
