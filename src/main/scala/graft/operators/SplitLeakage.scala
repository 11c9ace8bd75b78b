package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test near-duplicate leakage audit — the eval-integrity check the
  * decontamination family doesn't cover: decontamination removes overlap
  * with an EXTERNAL benchmark, but a random split of a deduplicated-only
  * corpus still leaves near-duplicate PAIRS straddling the split, and
  * every such pair silently leaks training text into evaluation (Lee et
  * al. 2021's core argument for dedup-before-split). This operator
  * classifies every verified near-dup pair by which side of the split its
  * ends landed on and sizes the damage:
  *
  *   split_class ∈ {train_train, cross, test_test};
  *   n_pairs, n_docs (distinct docs involved),
  *   n_test_docs (distinct TEST docs touched — for `cross`, the
  *   compromised part of the eval set).
  *
  * The pair stage is [[Dedup.minhashPairsMd5]] (banded md5 MinHash +
  * exact-Jaccard verify — the hash-oracled portable kernel), the split is
  * the content-keyed md5 fold, so the whole audit replays in DuckDB.
  * Scale shape: the pair generation dominates (the near-dup cost the
  * pipeline already pays); the classification is two broadcast-joinable
  * side lookups plus bounded aggregates.
  */
object SplitLeakage {

  /** `isTrain` must be a deterministic predicate over `idCol`. */
  def nearDupLeakage(
      docs: DataFrame,
      isTrain: Column,
      idCol: String = "doc_id",
      threshold: Double = 0.05
  ): DataFrame = {
    val pairs = Dedup.minhashPairsMd5(docs, idCol = idCol, threshold = threshold)
    val side = docs.select(col(idCol).as("id"), isTrain.as("is_train"))
    val cls = pairs
      .join(side.select(col("id").as("id1"), col("is_train").as("t1")), Seq("id1"))
      .join(side.select(col("id").as("id2"), col("is_train").as("t2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        when(col("t1") && col("t2"), "train_train")
          .when(!col("t1") && !col("t2"), "test_test")
          .otherwise("cross").as("split_class"))
    val nPairs = cls.groupBy(col("split_class")).agg(count(lit(1)).as("n_pairs"))
    val docsTouched = cls
      .select(col("split_class"), explode(array(col("id1"), col("id2"))).as("id"))
      .join(side, Seq("id"))
      .groupBy(col("split_class"))
      .agg(countDistinct(col("id")).as("n_docs"),
        countDistinct(when(!col("is_train"), col("id"))).as("n_test_docs"))
    nPairs.join(docsTouched, Seq("split_class"))
  }
}
