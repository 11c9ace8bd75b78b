package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population stability index per group vs the whole corpus — the
  * standard distribution-shift monitor (credit-scoring lineage, now the
  * per-domain drift alarm in data pipelines): over a bucketed feature,
  * PSI = Σ_i (p_i − q_i)·ln(p_i/q_i) between the group's bucket
  * distribution p and the corpus distribution q. Rule of thumb: < 0.1
  * stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Replay discipline: add-1 (Laplace) smoothing makes every bucket
  * defined — p'ᵢ = (cᵢ+1)/(n+B) — and each term reduces to
  *   termᵢ = diffNumᵢ · e6(ln ratioᵢ) DIV ((n_g+B)·(N+B))
  * with diffNumᵢ = (c_gᵢ+1)(N+B) − (n_g+B)(c_cᵢ+1) — exact BIGINTs; the
  * single float op per bucket is the ln (e6-quantized before any
  * combination, the Zipf/NMI rule). (p−q) and ln(p/q) always share a
  * sign, so every term is ≥ 0 and the integer division agrees across
  * engines (no negative DIV/floor divergence). The per-group sum is an
  * exact BIGINT over B buckets.
  *
  * Scale shape: one groupBy over (group, bucket) — map-side combined —
  * then everything runs on the |groups|·B summary joined to the B-row
  * corpus histogram (broadcast); the B-grid completion is a broadcast
  * cross join of the group list against `range(B)`.
  */
object Psi {

  private def e6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1000000.0d) + lit(0.5d)).cast("long")

  /** `(group, n_rows, psi_e6)` per group. `bucketCol` must be an integer
    * column in [0, nBuckets).
    */
  def byGroup(
      df: DataFrame,
      bucketCol: String,
      groupCol: String,
      nBuckets: Int = 10
  ): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, "nBuckets in 2..1000")
    val spark = df.sparkSession
    import spark.implicits._
    val B = nBuckets
    val gb = df.groupBy(col(groupCol).as("g"), col(bucketCol).as("b"))
      .agg(count(lit(1)).as("cg"))
    val corpus = df.groupBy(col(bucketCol).as("b")).agg(count(lit(1)).as("cc"))
    val totals = df.agg(count(lit(1)).as("nn"))
    val groups = df.select(col(groupCol).as("g")).distinct()
      .withColumn("ng", lit(0L)) // replaced below; placeholder for shape
      .drop("ng")
    val ngs = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("ng"))
    val grid = groups
      .crossJoin(broadcast((0 until B).toDF("b")))
      .join(gb, Seq("g", "b"), "left")
      .join(broadcast(corpus), Seq("b"), "left")
      .join(ngs, Seq("g"))
      .crossJoin(broadcast(totals))
      .select(col("g"), col("b"), col("ng"), col("nn"),
        coalesce(col("cg"), lit(0L)).as("cg"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    val term = grid
      .withColumn("diff_num",
        (col("cg") + 1L) * (col("nn") + B) - (col("ng") + B) * (col("cc") + 1L))
      .withColumn("ln_e6",
        e6(log(((col("cg") + 1L) * (col("nn") + B)).cast("double") /
          ((col("ng") + B) * (col("cc") + 1L)).cast("double"))))
      .withColumn("term_e6",
        expr(s"diff_num * ln_e6 DIV ((ng + $B) * (nn + $B))"))
    term.groupBy(col("g"))
      .agg(first(col("ng")).as("n_rows"), sum(col("term_e6")).as("psi_e6"))
      .select(col("g").as("group_key"), col("n_rows"), col("psi_e6"))
  }
}
