package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery over candidate column pairs — the
  * data-profiling primitive behind normalization checks, dimension
  * modeling, and constraint inference (Metanome-class A→B testing): for
  * each candidate `A → B`, count the determinant values that map to MORE
  * than one dependent value.
  *
  *   ndv_ab = Σ_a ndv(B | a);  violations = Σ_a (ndv(B | a) − 1)
  *   holds ⇔ violations = 0;   strength = ndv(A) / ndv(A,B)  (g3-style)
  *
  * Exactness: everything is exact distinct counts (BIGINT); strength is
  * one floored e6 division of exact integers. Scale: one grouped
  * count-distinct per candidate (partial aggregation applies — the
  * dependent domain bounds the per-group set), unioned; candidates are a
  * small literal list, not the quadratic column-pair space.
  */
object FdProfile {

  /** One row per candidate: `fd`, `ndv_a`, `ndv_ab`, `violations`,
    * `fd_holds`, `strength_e6` (NULL when the candidate has no testable
    * rows). Rows with a NULL determinant or dependent are EXCLUDED — the
    * standard FD-discovery convention, and the one that keeps the
    * arithmetic sound: `countDistinct` ignores NULLs, so an all-NULL
    * dependent group would otherwise contribute ndv_b = 0, push
    * `violations` NEGATIVE, and let a genuinely violated FD cancel to
    * `fd_holds = true`.
    */
  def profile(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate FD")
    candidates.map { case (a, b) =>
      df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a)).agg(countDistinct(col(b)).as("ndv_b"))
        .agg(count(lit(1)).as("ndv_a"),
          coalesce(sum(col("ndv_b")), lit(0L)).as("ndv_ab"),
          coalesce(sum(col("ndv_b") - lit(1L)), lit(0L)).as("violations"))
        .select(lit(s"$a->$b").as("fd"), col("ndv_a"), col("ndv_ab"),
          col("violations"),
          (col("violations") === 0L).as("fd_holds"),
          when(col("ndv_ab") > 0,
            floor(col("ndv_a").cast("double") * lit(1000000.0) / col("ndv_ab"))
              .cast("long")).as("strength_e6"))
    }.reduce(_ union _)
  }
}
