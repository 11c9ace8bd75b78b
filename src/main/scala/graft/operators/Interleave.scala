package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted-fair training order — the data-loader ordering a
  * multi-source LLM training run materializes: documents from every source
  * interleaved so any PREFIX of the global order carries each source at
  * (approximately) its mixture weight, with no RNG anywhere. This is
  * weighted fair queueing (Demers, Keshav & Shenker 1989) applied to
  * corpus ordering:
  *
  *   - within a source, documents take their md5 content-order rank r
  *     (the [[GroupCap]] sample key — a deterministic shuffle);
  *   - each source s gets temperature weight w_s = (n_s/N)^α in integer
  *     micros (the [[Mixture]] α-sampling law, computed IN-PLAN from the
  *     bounded source-count table — no driver collect);
  *   - a document's virtual finish time is v = (r · 10⁹) DIV w_micros —
  *     WFQ's F_i = r/w_s in exact integer arithmetic (both operands
  *     positive, so Spark DIV ≡ DuckDB //); smaller-weight sources space
  *     their documents proportionally farther apart on the virtual axis;
  *   - the global position is the distributed rank of (v, source, doc_id)
  *     via [[PrefixSum.runningTotal]] — no single-partition window.
  *
  * The r·10⁹ scaling bounds per-source corpus size at ~9.2·10⁹ documents
  * (BIGINT ceiling) while keeping v's quantization (w_micros ≤ 10⁶) far
  * below the rank spacing, so WFQ's per-source monotonicity is exact:
  * within a source, global_pos strictly follows src_rank.
  *
  * Scale shape: one bounded source-count aggregate (broadcast), one
  * per-source rank window (shuffle keyed by source; hot sources bounded
  * by the corpus — for pathological single-source corpora pre-bucket à la
  * [[NegativeSampler.sampleScalable]]), one range-partitioned prefix rank.
  */
object Interleave {

  /** (doc_id, source, src_rank, w_micros, vtime, global_pos), global_pos
    * 1-based and gapless over the whole corpus.
    */
  def trainingOrder(
      docs: DataFrame,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      alpha: Double = 0.5
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("_ns"))
    val total = docs.agg(count(lit(1)).as("_n"))
    val weights = counts.crossJoin(broadcast(total))
      .select(col(sourceCol),
        floor(pow(col("_ns").cast("double") / col("_n").cast("double"), alpha) *
          lit(1000000.0d) + lit(0.5d)).cast("long").as("w_micros"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(GroupCap.sampleKey(col(idCol)), col(idCol))
    val ranked = docs
      .select(col(idCol), col(sourceCol))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .join(broadcast(weights), Seq(sourceCol))
      .withColumn("vtime",
        expr("(src_rank * 1000000000) DIV w_micros"))
      .withColumn("_one", lit(1L))
    PrefixSum
      .runningTotal(ranked, Seq("vtime", sourceCol, idCol), "_one", "global_pos")
      .select(col(idCol), col(sourceCol), col("src_rank"), col("w_micros"),
        col("vtime"), col("global_pos"))
  }
}
