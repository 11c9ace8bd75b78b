package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end curation DECISION LEDGER — one row per document with every
  * pipeline stage's verdict and the final keep bit, the audit artifact a
  * production corpus build publishes next to the filtered output (why did
  * doc X drop? which stage costs the most yield?). Composes the shipped
  * stages in their canonical order, each flag independent so yields are
  * attributable:
  *
  *   - `is_bench`       — held-out benchmark partition (doc_id % 20 = 0,
  *                        the [[Decontaminate]] convention); never trains
  *   - `g_quality`      — [[GopherFilter]] A1.1 gate battery
  *   - `g_repetition`   — [[RepetitionCoverage]] A1.2 char-coverage gates
  *   - `is_exact_dup`   — not the min-id doc of its md5(text) group,
  *                        among TRAINING docs only (bench copies don't
  *                        shadow a training doc)
  *   - `is_contaminated`— shares ≥ 2 distinct 3-shingles with any bench
  *                        doc ([[Decontaminate.overlaps]] contract)
  *   - `keep`           — ¬bench ∧ quality ∧ repetition ∧ ¬dup ∧ ¬contam
  *
  * Scale shape: every stage is the already-audited operator (zero-shuffle
  * gate projections; one md5 hash-aggregate; the broadcast shingle join);
  * the ledger itself is doc_id equi-joins. The oracle nests the stages'
  * own oracle SQLs as derived tables, so the ledger contract cannot
  * drift from the per-stage contracts.
  */
object CurationLedger {

  /** Stage-attributed yield waterfall over the ledger: each stage in
    * canonical order with the docs entering it, dropped BY it (first
    * failing stage wins attribution), and surviving it — the one-page
    * summary a curation run reports. One aggregate over the ledger, then
    * a 5-row explode; scale-free.
    */
  def waterfall(docs: DataFrame): DataFrame = {
    val led = ledger(docs)
    val ag = led.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("is_bench"), 1L).otherwise(0L)).as("d1"),
      sum(when(!col("is_bench") && !col("g_quality"), 1L).otherwise(0L)).as("d2"),
      sum(when(!col("is_bench") && col("g_quality") && !col("g_repetition"), 1L)
        .otherwise(0L)).as("d3"),
      sum(when(!col("is_bench") && col("g_quality") && col("g_repetition") &&
        col("is_exact_dup"), 1L).otherwise(0L)).as("d4"),
      sum(when(!col("is_bench") && col("g_quality") && col("g_repetition") &&
        !col("is_exact_dup") && col("is_contaminated"), 1L).otherwise(0L)).as("d5"))
    val stages = Seq(
      (1, "bench_holdout", lit(0L), col("d1")),
      (2, "quality_gates", col("d1"), col("d2")),
      (3, "repetition_gates", col("d1") + col("d2"), col("d3")),
      (4, "exact_dedup", col("d1") + col("d2") + col("d3"), col("d4")),
      (5, "decontamination", col("d1") + col("d2") + col("d3") + col("d4"), col("d5")))
    ag.select(explode(array(stages.map { case (ord, name, before, dropped) =>
      struct(lit(ord).as("stage_order"), lit(name).as("stage"),
        (col("n_total") - before).as("n_in"), dropped.as("n_dropped"),
        (col("n_total") - before - dropped).as("n_out"))
    }: _*)).as("s"))
      .select(col("s").getField("stage_order").as("stage_order"),
        col("s").getField("stage").as("stage"),
        col("s").getField("n_in").as("n_in"),
        col("s").getField("n_dropped").as("n_dropped"),
        col("s").getField("n_out").as("n_out"))
  }

  def ledger(docs: DataFrame): DataFrame = {
    val isBench = pmod(col("doc_id"), lit(20)) === 0
    val gq = GopherFilter.gates(docs)
      .select(col("doc_id"), col("keep").as("g_quality"))
    val gr = RepetitionCoverage.gates(docs)
      .select(col("doc_id"), col("keep").as("g_repetition"))
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val dup = train.select(col("doc_id"), md5(col("text")).as("_h"))
    val keepers = dup.groupBy(col("_h")).agg(min(col("doc_id")).as("_keeper"))
    val dupFlag = dup.join(keepers, Seq("_h"))
      .select(col("doc_id"), (col("doc_id") =!= col("_keeper")).as("_dup"))
    val cont = Decontaminate
      .overlaps(train, docs.filter(isBench), minShared = 2)
      .select(col("doc_id")).distinct()
      .withColumn("_cont", lit(true))
    docs.select(col("doc_id"), isBench.as("is_bench"))
      .join(gq, Seq("doc_id"))
      .join(gr, Seq("doc_id"))
      .join(dupFlag, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("is_bench"), col("g_quality"), col("g_repetition"),
        coalesce(col("_dup"), lit(false)).as("is_exact_dup"),
        coalesce(col("_cont"), lit(false)).as("is_contaminated"),
        (!col("is_bench") && col("g_quality") && col("g_repetition") &&
          !coalesce(col("_dup"), lit(false)) &&
          !coalesce(col("_cont"), lit(false))).as("keep"))
  }
}
