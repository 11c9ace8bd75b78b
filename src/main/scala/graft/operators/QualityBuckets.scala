package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data"): partition a
  * corpus into head/middle/tail quality tiers by a per-document score —
  * CCNet buckets by LM perplexity per language; here the score column is
  * caller-supplied ([[LmScore]] produces the classic one).
  *
  * Two spellings with different scale economics:
  *   - [[byNtile]] — exact rank-based tiers within each group. The ordering
  *     is fully deterministic (score, then id), so results are
  *     engine-reproducible and SQL-oracled. Costs one per-group sort; right
  *     when groups are bounded (per-language corpora, per-source shards).
  *   - [[byApproxThresholds]] — one GK-sketch pass computes n-1 global
  *     cutoffs (driver state: n-1 doubles), bucketing is then a zero-shuffle
  *     comparison projection. The 100 TB path: no sort anywhere, at the cost
  *     of approximate tier boundaries.
  */
object QualityBuckets {

  /** Exact n-tile bucket (1 = lowest score .. n = highest) within each
    * `groupCol` partition, ordered by (`scoreCol`, `idCol`) — the id
    * tie-break makes equal scores deterministic. Standard SQL NTILE
    * remainder semantics: the first `count % n` buckets get one extra row.
    */
  def byNtile(
      df: DataFrame,
      n: Int = 3,
      scoreCol: String = "avg_logp",
      groupCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(n >= 2, s"n $n must be >= 2")
    df.withColumn("bucket",
      ntile(n).over(Window.partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))))
  }

  /** Approximate global tiers: thresholds from one `approxQuantile` pass
    * (Greenwald-Khanna sketch, relative error `relErr`), then bucket
    * assignment as a chain of comparisons — a pure projection. Buckets are
    * 1..n ascending in score; boundary rows may land one tier off within
    * the sketch's error bound.
    */
  def byApproxThresholds(
      df: DataFrame,
      n: Int = 3,
      scoreCol: String = "avg_logp",
      relErr: Double = 0.001
  ): DataFrame = {
    require(n >= 2, s"n $n must be >= 2")
    val cuts = df.stat.approxQuantile(scoreCol, (1 until n).map(_.toDouble / n).toArray, relErr)
    bucketByCuts(df, cuts, scoreCol)
  }

  /** Bucket assignment from precomputed ascending cutoffs — a pure
    * projection (no action, no state), so it runs unchanged on a STREAMING
    * frame: compute the cuts once from the reference corpus (or a prior
    * [[byApproxThresholds]] run), then tier live documents in append mode —
    * CCNet bucketing as a feed filter. Bucket i (1-based) is
    * `score <= cuts(i-1)`, else `cuts.length + 1`.
    */
  def bucketByCuts(
      df: DataFrame,
      cuts: Array[Double],
      scoreCol: String = "avg_logp"
  ): DataFrame = {
    require(cuts.nonEmpty && cuts.sameElements(cuts.sorted), "cuts must be ascending")
    val bucket = cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length + 1): Column) {
      case (acc, (t, i)) => when(col(scoreCol) <= t, i + 1).otherwise(acc)
    }
    df.withColumn("bucket", bucket)
  }
}
