package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance near-duplicate verification — the character-level
  * complement of [[Dedup.jaccard]]'s set view: Levenshtein distance
  * catches dense small edits (OCR noise, template variable substitution)
  * that barely move a shingle set, and normalizing by the longer text
  * turns it into a scale-free similarity. Levenshtein is O(|a|·|b|) per
  * pair — NEVER run it all-pairs; this operator verifies CANDIDATE pairs
  * produced by a cheap generator ([[SimilarityJoin]], LSH banding,
  * blocking keys), the standard two-stage shape.
  *
  * Scale shape: two equi-joins attach the texts to the bounded candidate
  * set (the corpus never self-joins), then a zero-shuffle projection
  * computes the codegen'd `levenshtein` kernel per pair.
  *
  * Numeric discipline: the distance and lengths are exact integers
  * (Spark and DuckDB implement the same unit-cost DP); the normalized
  * distance is one exact-integer division, rounded to 6.
  */
object EditDistance {

  /** @param pairs candidate (id1, id2) pairs.
    * @return (id1, id2, dist, norm_dist) — norm_dist = dist / max(len);
    *         two empty texts give norm_dist 0 (identical), not a
    *         division by zero.
    */
  def verify(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val t = docs.select(col(idCol), col(textCol))
    pairs
      .join(t.select(col(idCol).as("id1"), col(textCol).as("_t1")), Seq("id1"))
      .join(t.select(col(idCol).as("id2"), col(textCol).as("_t2")), Seq("id2"))
      .withColumn("dist", levenshtein(col("_t1"), col("_t2")).cast("long"))
      .withColumn("norm_dist",
        when(greatest(length(col("_t1")), length(col("_t2"))) === 0, lit(0.0))
          .otherwise(round(col("dist").cast("double") /
            greatest(length(col("_t1")), length(col("_t2"))), 6)))
      .select(col("id1"), col("id2"), col("dist"), col("norm_dist"))
  }
}
