package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pearson χ² independence test + Cramér's V over a two-column
  * categorical contingency table — the categorical drift/association
  * monitor next to [[Psi]] (numeric-bucket) and [[KsTest]] (continuous):
  * is the label/language mix independent of the source?
  *
  * Exactness: with e = rs·cs/N, each cell's (o−e)²/e rewrites to
  * (o·N − rs·cs)² / (N·rs·cs) — the numerator root is an EXACT BIGINT,
  * the squaring/division happen in identically-spelled doubles, and every
  * cell term e6-quantizes BEFORE the (exact BIGINT) sum — the
  * never-aggregate-doubles rule. The full r×c grid including EMPTY cells
  * enters the sum (an absent cell still contributes e). Cramér's V is one
  * replayed sqrt at the end.
  *
  * Scale shape: one map-side-combined groupBy to the r×c cell table; the
  * grid completion and margins are broadcast joins over r + c rows.
  */
object ChiSquare {

  /** 1 row: `(n, n_rows_dim, n_cols_dim, chi2_e6, cramers_v_e6)`. */
  def contingency(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rs = df.groupBy(col(rowCol).as("r")).agg(count(lit(1)).as("rs"))
    val cs = df.groupBy(col(colCol).as("c")).agg(count(lit(1)).as("cs"))
    val tot = df.agg(count(lit(1)).as("nn"))
    val grid = rs.crossJoin(broadcast(cs))
      .join(cells, Seq("r", "c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("c"), col("rs"), col("cs"), col("nn"),
        coalesce(col("o"), lit(0L)).as("o"))
    val term = grid.withColumn("dv",
      (col("o") * col("nn") - col("rs") * col("cs")).cast("double"))
      .withColumn("term_e6",
        // each factor cast to double INDIVIDUALLY: the BIGINT product
        // nn·rs·cs approaches n³ and would hit the ANSI 2⁶³ ceiling at a
        // few million rows; the double product never overflows and is
        // bit-identical for in-range inputs (same spelling in the oracle)
        floor(col("dv") * col("dv")
          / (col("nn").cast("double") * col("rs").cast("double")
            * col("cs").cast("double"))
          * lit(1000000.0d) + lit(0.5d)).cast("long"))
    term
      .groupBy(col("nn"))
      .agg(countDistinct(col("r")).as("n_rows_dim"),
        countDistinct(col("c")).as("n_cols_dim"),
        sum(col("term_e6")).as("chi2_e6"))
      .select(col("nn").as("n"), col("n_rows_dim"), col("n_cols_dim"),
        col("chi2_e6"),
        when(least(col("n_rows_dim") - 1, col("n_cols_dim") - 1) === 0, lit(0L))
          .otherwise(
            floor(sqrt((col("chi2_e6").cast("double") / lit(1000000.0d))
              / (col("nn") * least(col("n_rows_dim") - 1, col("n_cols_dim") - 1))
                .cast("double"))
              * lit(1000000.0d) + lit(0.5d)).cast("long"))
          .as("cramers_v_e6"))
  }
}
