package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit (Newcomb 1881, Benford 1938; the standard
  * fabricated-amounts forensic): compare the observed leading-digit
  * distribution of a positive amount column against
  * `P(d) = log₁₀(1 + 1/d)` and report the per-digit χ² contribution.
  * Organic multi-scale amounts follow the law; invented or constrained
  * ones don't — a cheap data-quality tripwire for financial columns.
  *
  * Exactness: amounts become integer cents (`floor(x·100 + 0.5)`, the
  * RecordLinkage spelling), the leading digit is string-sliced from the
  * integer (pure integer→text, no float log), the Benford probabilities
  * are SHARED e6 literals (computed once in Scala, embedded in both
  * engines), the expected mass `n·p_e6` is an exact BIGINT product, and
  * the χ² term `(obs−E)²/E` is spelled with an explicit square (no
  * `pow` — transcendental-free) and floor-6-quantized per digit before
  * any sum. One aggregate over the scan; 9-row output.
  */
object Benford {

  /** `floor(log10(1+1/d)·10⁶ + 0.5)` for d = 1..9 — the single source for
    * both engines (the Bm25Queries shared-literal discipline).
    */
  val PE6: Seq[Long] = (1 to 9).map(d =>
    math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong)

  /** Per-digit audit rows: `digit`, `n_obs`, `p_e6`, `expected_e6`
    * (= n·p_e6, exact), `chi2_term_e6`.
    */
  def firstDigitAudit(df: DataFrame, amountCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .select(floor(col(amountCol) * lit(100.0) + lit(0.5)).cast("long").as("_c"))
      .filter(col("_c") >= 1L)
      .select(substring(col("_c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val n = obs.agg(sum(col("n_obs")).as("_n"))
    val pTable = PE6.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p) }.toDF("digit", "p_e6")
    val e = col("_n") * col("p_e6") / lit(1000000.0)
    val dev = coalesce(col("n_obs"), lit(0L)).cast("double") - e
    pTable
      .join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("p_e6"),
        (col("_n") * col("p_e6")).as("expected_e6"),
        floor(dev * dev / e * lit(1000000.0) + lit(0.5)).cast("long")
          .as("chi2_term_e6"))
  }
}
