package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for implicit-feedback training — the
  * standard prep step for recommender / contrastive objectives: for every
  * user, draw `k` items they have NOT interacted with, reproducibly (the
  * same corpus always yields the same negatives, so training runs are
  * comparable and resumable — RNG sampling rebuilds a different epoch
  * every run).
  *
  * Method: hash-slot candidate generation. The item universe is indexed
  * 0..N−1 once; user u's candidate for slot s is
  * `universe[md5_48(u ++ "_" ++ s) mod N]` — O(users · k · oversample)
  * candidate rows total, NEVER the users × items cross join that naive
  * per-user ranking implies. Collisions dedupe to their first slot, seen
  * items drop via one anti-join, and the first k survivors (slot order)
  * are the sample. Every step is md5-deterministic, so DuckDB replicates
  * the exact output (q_negative_samples).
  *
  * Scale shape: the universe index + its count broadcast (item
  * vocabularies are bounded — products, tokens; for an unbounded catalog
  * swap the index join for a hash-bucketed variant); one anti-join
  * shuffle on (user, item); the per-user rank window is bounded by
  * k · oversample rows. Users with fewer than k reachable negatives (tiny
  * universes, heavy collision) return fewer — raise `oversample` to
  * tighten that tail.
  */
object NegativeSampler {

  def sample(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      oversample: Int = 2
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(oversample >= 1, "oversample must be >= 1")
    val inter = interactions.select(col(userCol), col(itemCol)).distinct()
    // item universe indexed 0..N-1 — the only global sort, over the
    // (bounded, broadcastable) item vocabulary
    val univ = inter.select(col(itemCol)).distinct()
      .withColumn("_idx",
        row_number().over(Window.orderBy(col(itemCol))).cast("long") - 1)
    val n = univ.agg(count(lit(1)).as("_n_items"))

    val slots = inter.select(col(userCol)).distinct()
      .crossJoin(broadcast(n))
      .withColumn("_slot", explode(sequence(lit(1), lit(k * oversample))))
    // 48-bit md5 of "user_slot" — the shared engine-portable uniform
    val h = HashSplit.md548(concat(
      col(userCol).cast("string"), lit("_"), col("_slot").cast("string")))
    val cand = slots
      .withColumn("_cidx", pmod(h, col("_n_items")))
      .join(broadcast(univ), col("_cidx") === col("_idx"))
      .select(col(userCol), col(itemCol), col("_slot"))

    val ded = cand.groupBy(col(userCol), col(itemCol))
      .agg(min(col("_slot")).as("_slot"))
    val neg = ded.join(inter, Seq(userCol, itemCol), "left_anti")
    val w = Window.partitionBy(col(userCol)).orderBy(col("_slot"), col(itemCol))
    neg.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .drop("_slot")
  }
}
