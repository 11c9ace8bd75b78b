package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group two-sample Welch z-tests with Benjamini–Hochberg FDR control
  * (Benjamini & Hochberg 1995) — the multiple-comparisons discipline for
  * the drift batteries: when PSI/χ²/KS fire once per source, the
  * family-wise false-positive rate is what matters, not any single test.
  *
  * Determinism: all moments are EXACT BIGINT sums (n, Σy, Σy²); the z
  * statistic and its two-sided p-value are double arithmetic over those
  * exact integers, with the normal tail computed by the Zelen–Severo
  * 26.2.17 polynomial (Abramowitz & Stegun) spelled IDENTICALLY on both
  * engines — never a native erf, which would differ between libm and the
  * JDK. p-values e6-quantize before any BH comparison, so the step-up
  * decisions are exact integer arithmetic: reject(i) ⟺ p_e6(i)·m ≤ αe6·i.
  *
  * Scale shape: one map-side-combined groupBy for the per-group moments;
  * totals are a broadcast 1-row frame; the BH sort runs over the
  * group-cardinality table (bounded by #groups, never the row count).
  */
object MultipleTesting {

  /** Survival function 1 − Φ(x) for x ≥ 0 — Zelen & Severo 26.2.17,
    * |ε| < 7.5e-8. Horner form; the 1/√(2π) literal is spelled, not
    * computed.
    */
  def normSf(x: Column): Column = {
    val t = lit(1.0d) / (lit(1.0d) + lit(0.2316419d) * x)
    val poly = ((((lit(1.330274429d) * t - lit(1.821255978d)) * t
      + lit(1.781477937d)) * t - lit(0.356563782d)) * t + lit(0.319381530d)) * t
    exp(lit(-0.5d) * x * x) * lit(0.3989422804014327d) * poly
  }

  /** Per-group Welch z-test of the group mean vs the rest-of-data mean,
    * BH-adjusted at level `alphaE6`/1e6. One row per testable group
    * (n ≥ 2 on both sides, positive standard error):
    * `(group_key, n_rows, z_e6, p_e6, rk, m_tests, rejected)` — `rk` is the
    * p-ascending rank, `rejected` the BH step-up decision.
    */
  def bhBySource(df: DataFrame, groupCol: String, yCol: String, alphaE6: Long): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(yCol).cast("long").as("y"))
    val per = base.groupBy("g").agg(count(lit(1)).as("n1"),
      sum(col("y")).as("s1"), sum(col("y") * col("y")).as("ss1"))
    val tot = base.agg(count(lit(1)).as("nn"), sum(col("y")).as("ss"),
      sum(col("y") * col("y")).as("sss"))
    val j = per.crossJoin(broadcast(tot))
      .withColumn("n2", col("nn") - col("n1"))
      .withColumn("s2", col("ss") - col("s1"))
      .withColumn("ss2", col("sss") - col("ss1"))
      .where(col("n1") >= 2 && col("n2") >= 2)
    val m1 = col("s1").cast("double") / col("n1").cast("double")
    val m2 = col("s2").cast("double") / col("n2").cast("double")
    val v1 = (col("ss1").cast("double") - col("n1").cast("double") * m1 * m1) /
      (col("n1") - 1).cast("double")
    val v2 = (col("ss2").cast("double") - col("n2").cast("double") * m2 * m2) /
      (col("n2") - 1).cast("double")
    val se = sqrt(v1 / col("n1").cast("double") + v2 / col("n2").cast("double"))
    val z = abs(m1 - m2) / se
    val tests = j.withColumn("se", se).where(col("se") > 0.0d)
      .withColumn("z_e6", floor(z * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .withColumn("p_e6",
        floor(lit(2.0d) * normSf(z) * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .select(col("g"), col("n1").as("n_rows"), col("z_e6"), col("p_e6"))
    val ranked = tests
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p_e6"), col("g"))).cast("long"))
    val withM = ranked.crossJoin(broadcast(
      ranked.agg(count(lit(1)).as("m_tests"))))
    val kstar = withM
      .agg(max(when(col("p_e6") * col("m_tests") <= lit(alphaE6) * col("rk"),
        col("rk")).otherwise(0L)).as("kstar"))
    withM.crossJoin(broadcast(kstar))
      .select(col("g").as("group_key"), col("n_rows"), col("z_e6"), col("p_e6"),
        col("rk"), col("m_tests"), (col("rk") <= col("kstar")).as("rejected"))
  }
}
