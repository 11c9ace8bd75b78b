package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985; the coreset policy of
  * Sener & Savarese 2018) — pick k maximally-spread documents by
  * embedding: repeatedly add the point farthest from everything selected
  * so far. The curation uses: a diversity-maximizing seed set for
  * labeling/eval, and the 2-approximation cover radius (max dmin) as a
  * corpus-spread diagnostic.
  *
  * Fully replayable: coordinates quantize to integer micros
  * ([[KMeansReplay.quantize]]), every pairwise distance is an exact
  * BIGINT Σ(Δ²), the first center is the md5-min vec_id, the farthest
  * point breaks ties (dmin DESC, vec_id ASC), and nearest-center
  * assignment ties to the smaller center id — every choice totally
  * ordered, so the greedy trajectory hash-oracles as an unrolled
  * round-per-CTE replay.
  *
  * Scale shape: per round one broadcast of ≤ k (id, 64-long) centers +
  * one codegen'd zip_with distance projection + one 1-row TakeOrdered —
  * the [[ProductQuantization]] bounded-driver-object pattern; k·N·d work
  * total, no pairwise N² anywhere. The quantized points are cached once
  * for the k rounds.
  */
object KCenter {

  /** (vec_id, nearest_center, d2, sel_rank): every point's nearest
    * selected center and exact integer distance²; sel_rank = 1..k on the
    * selected points themselves (selection order), else 0.
    */
  def greedyCoreset(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String = "embedding",
      d: Int = 64,
      k: Int = 8
  ): DataFrame = {
    import spark.implicits._
    require(k >= 1, "k must be >= 1")
    val pts = KMeansReplay.quantize(df, vecCol, d).cache()
    try {
      val first = pts
        .withColumn("h", md5(col("vec_id").cast("string")))
        .orderBy(col("h"), col("vec_id")).limit(1)
        .collect()
      require(first.nonEmpty, "KCenter.greedyCoreset: empty input")
      var selected = Seq(
        (first(0).getLong(0), first(0).getSeq[Long](first(0).fieldIndex("xq"))))
      while (selected.size < k) {
        val selDf = broadcast(selected.map(_._1).toDF("sid"))
        val far = dmin(pts, selected)
          .join(selDf, col("vec_id") === col("sid"), "left_anti")
          .orderBy(desc("dmin"), col("vec_id"))
          .limit(1).collect()
        require(far.nonEmpty, s"KCenter.greedyCoreset: fewer than $k points")
        val r = far(0)
        selected = selected :+
          ((r.getLong(r.fieldIndex("vec_id")), r.getSeq[Long](r.fieldIndex("xq"))))
      }
      val selFrame = selected.zipWithIndex
        .map { case ((id, cx), i) => (id, cx, i + 1) }
        .toDF("c_id", "cx", "sel_rank")
      pts.crossJoin(broadcast(selFrame))
        // native Σ(Δ²) kernel — HOF-parity pinned (LongSqDistParitySpec)
        .withColumn("d2",
          graft.functions.VectorFunctions.sqDistLong(col("xq"), col("cx")))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("c_id"))).as("m"))
        .join(broadcast(selFrame.select(col("c_id").as("vec_id"),
          col("sel_rank"))), Seq("vec_id"), "left")
        .select(col("vec_id"), col("m").getField("c_id").as("nearest_center"),
          col("m").getField("d2").as("d2"),
          coalesce(col("sel_rank"), lit(0)).as("sel_rank"))
      // cache lifecycle: the k greedy rounds have materialized `pts`; the
      // returned frame reads it lazily one final time — session hygiene
      // (Bench/Verify clearCache per query) or the caller releases it
      // (the SubstringDedup.windowHashes convention).
    } catch { case t: Throwable => pts.unpersist(blocking = false); throw t }
  }

  /** Exact integer distance² to the nearest of `selected`, per point. */
  private def dmin(pts: DataFrame, selected: Seq[(Long, Seq[Long])]): DataFrame = {
    import pts.sparkSession.implicits._
    val cdf = broadcast(selected.toDF("c_id", "cx"))
    pts.crossJoin(cdf)
      .withColumn("d2",
        graft.functions.VectorFunctions.sqDistLong(col("xq"), col("cx")))
      .groupBy(col("vec_id"))
      .agg(min(col("d2")).as("dmin"))
      .join(pts, Seq("vec_id"))
      .select(col("vec_id"), col("dmin"), col("xq"))
  }
}
