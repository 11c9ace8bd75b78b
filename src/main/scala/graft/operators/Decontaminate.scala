package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that keeps
  * evaluation sets meaningful: find (and drop) training documents that
  * share at least `minShared` distinct word w-shingles with any benchmark
  * document (n-gram-overlap decontamination, the method used for the
  * GPT-3/C4-era training corpora).
  *
  * Scale shape: both sides explode to (id, shingle) and equi-join on the
  * shingle — never an all-pairs document join. The benchmark side is tiny
  * relative to a training corpus (thousands vs billions of docs), so it is
  * broadcast; per-shingle fan-out is bounded by the benchmark's shingle
  * multiplicity. The training corpus streams through map-side: one scan,
  * one shuffle for the (doc, bench) overlap count.
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared) for every training×benchmark pair with
    * `n_shared >= minShared` distinct shingles in common. Shingles come
    * from [[Dedup.shingles]] (distinct per doc), so a plain count is the
    * distinct-overlap count.
    */
  def overlaps(
      train: DataFrame,
      bench: DataFrame,
      minShared: Int = 5,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val t = train.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
    val b = bench.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), w)).as("sh"))
    t.join(broadcast(b), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The decontaminated corpus: training rows with NO benchmark overlap at
    * the threshold.
    */
  def clean(
      train: DataFrame,
      bench: DataFrame,
      minShared: Int = 5,
      w: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    train.join(
      overlaps(train, bench, minShared, w, idCol, textCol)
        .select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol),
      "left_anti")
}
