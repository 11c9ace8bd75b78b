package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal marginal relevance (Carbonell & Goldstein 1998) — greedy
  * diversity-aware selection AGAINST A QUERY: repeatedly pick the
  * candidate maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s). Where
  * [[KCenter]] maximizes pure spread, MMR trades relevance against
  * redundancy — the selection policy for RAG context packing, few-shot
  * exemplar pools, and "top-k but not five copies of the same page"
  * retrieval post-processing.
  *
  * Fully replayable, the [[KCenter]] discipline: coordinates quantize to
  * integer micros ([[KMeansReplay.quantize]]), similarity is the exact
  * BIGINT dot product of micro vectors, and λ enters as an integer pair
  * (lambdaNum/lambdaDen), so the selection score
  * `lambdaNum·rel − (lambdaDen−lambdaNum)·smax` is exact integer
  * arithmetic — order-equivalent to the textbook score, and every argmax
  * totally ordered by (score DESC, vec_id ASC). Round 1 has no selected
  * set: smax ≔ 0, i.e. the first pick is argmax rel (the standard MMR
  * convention). The whole trajectory hash-oracles as an unrolled
  * round-per-CTE replay.
  *
  * Scale shape: relevance is one broadcast-literal projection over the
  * corpus; the pool carries a RUNNING `smax` column (max similarity to the
  * selected-so-far), so each round computes exactly ONE new dot per
  * candidate — `greatest(smax, dot(xq, s_r))` — plus a 1-row TakeOrdered:
  * k·N·d total work, no N² anywhere. Each round's pool (id, xq, rel, smax)
  * is cached and the previous round's cache released once the new one
  * materializes (the Components round discipline), so per-round plans stay
  * constant-size and nothing re-derives earlier rounds' dots.
  */
object Mmr {

  /** Exact BIGINT dot of a micro-vector column against a literal vector
    * (the native [[graft.expressions.LongDot]] kernel).
    */
  private def dotLit(v: Column, q: Seq[Long]): Column =
    graft.functions.VectorFunctions.dotLong(v, array(q.map(lit): _*))

  /** (sel_rank, vec_id, rel_dot, mmr_score): the k selected candidates in
    * selection order. The query row itself is excluded from the pool.
    */
  def select(
      spark: SparkSession,
      df: DataFrame,
      queryId: Long,
      k: Int = 8,
      lambdaNum: Int = 7,
      lambdaDen: Int = 10,
      vecCol: String = "embedding",
      d: Int = 64
  ): DataFrame = {
    import spark.implicits._
    require(k >= 1, "k must be >= 1")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      "need 0 <= lambdaNum <= lambdaDen")
    val quant = KMeansReplay.quantize(df, vecCol, d)
    val qrow = quant.filter(col("vec_id") === queryId).limit(1).collect()
    require(qrow.nonEmpty, s"Mmr.select: query vector $queryId not found")
    val qv = qrow(0).getSeq[Long](qrow(0).fieldIndex("xq"))
    // smax starts at 0: round 1's score is then λnum·rel — the standard
    // first-pick-is-argmax-rel convention — with no special-casing
    var pool = quant.filter(col("vec_id") =!= queryId)
      .withColumn("rel", dotLit(col("xq"), qv))
      .withColumn("smax", lit(0L))
      .cache()
    try {
      // (id, xq, rel, score-at-selection)
      var selected = Seq.empty[(Long, Seq[Long], Long, Long)]
      while (selected.size < k) {
        val scored = pool
          .withColumn("score",
            lit(lambdaNum.toLong) * col("rel") -
              lit((lambdaDen - lambdaNum).toLong) * col("smax"))
        val top = (if (selected.isEmpty) scored
                   else {
                     val selDf = broadcast(selected.map(_._1).toDF("sid"))
                     scored.join(selDf, col("vec_id") === col("sid"), "left_anti")
                   })
          .orderBy(desc("score"), col("vec_id"))
          .limit(1).collect()
        require(top.nonEmpty, s"Mmr.select: fewer than $k candidates")
        val r = top(0)
        val sxq = r.getSeq[Long](r.fieldIndex("xq"))
        selected = selected :+ ((
          r.getLong(r.fieldIndex("vec_id")),
          sxq,
          r.getLong(r.fieldIndex("rel")),
          r.getLong(r.fieldIndex("score"))))
        if (selected.size < k) {
          // fold the new pick into the running smax: ONE dot per candidate
          // per round; cache-swap so later rounds never recompute this one.
          // The FIRST pick overwrites the 0 seed rather than folding into
          // it — micro-dot products can be negative, and max(0, dots) would
          // silently clamp them (the oracle's g1 carries the raw dot)
          val next = pool
            .withColumn("smax",
              if (selected.size == 1) dotLit(col("xq"), sxq)
              else greatest(col("smax"), dotLit(col("xq"), sxq)))
            .cache()
          next.count() // materialize before releasing the superseded cache
          pool.unpersist(blocking = false)
          pool = next
        }
      }
      selected.zipWithIndex
        .map { case ((id, _, rel, score), i) => (i + 1, id, rel, score) }
        .toDF("sel_rank", "vec_id", "rel_dot", "mmr_score")
      // the returned frame is a driver-local relation — the pool cache is
      // no longer needed on ANY path, so release unconditionally
    } finally pool.unpersist(blocking = false)
  }
}
