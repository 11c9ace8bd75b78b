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
    draw(inter, broadcast(univ), userCol, itemCol, k, oversample)
  }

  /** The unbroadcastable-catalog spelling: same hash-slot semantics, but
    * the universe index is built WITHOUT a global sort and the slot→item
    * resolution is a shuffled equi-join on the index — nothing about the
    * item catalog is ever broadcast or single-partitioned, so the catalog
    * can be billions of rows.
    *
    * Index construction: items hash into `indexBuckets` buckets by
    * md5_48(item); within a bucket rows rank by (md5_48, item) — a
    * PARTITIONED window; bucket offsets come from a cumulative sum over the
    * per-bucket counts, a table bounded by `indexBuckets` (the one
    * Window.orderBy here, same bounded-spine pattern as
    * [[IntervalOverlap]]). Global index = offset + within-bucket rank − 1.
    * The permutation differs from [[sample]]'s item-order index — both are
    * valid deterministic draws; each oracles against its own spelling
    * (q_negative_samples_scalable replays this index as
    * `row_number() OVER (ORDER BY h % B, h, item)`).
    */
  def sampleScalable(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      oversample: Int = 2,
      indexBuckets: Int = 1 << 12
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(oversample >= 1, "oversample must be >= 1")
    require(indexBuckets > 0, "indexBuckets must be positive")
    val inter = interactions.select(col(userCol), col(itemCol)).distinct()
    val items = inter.select(col(itemCol)).distinct()
      .withColumn("_h", HashSplit.md548(col(itemCol)))
      .withColumn("_b", pmod(col("_h"), lit(indexBuckets.toLong)))
    val ranked = items.withColumn("_r",
      row_number().over(
        Window.partitionBy(col("_b")).orderBy(col("_h"), col(itemCol))).cast("long"))
    // bucket offsets: cumsum over ≤ indexBuckets rows — bounded by design
    val offs = items.groupBy(col("_b")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(
          Window.orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_b"), col("_off"))
    val univ = ranked.join(broadcast(offs), Seq("_b"))
      .select(col(itemCol), (col("_off") + col("_r") - 1).as("_idx"))
    draw(inter, univ, userCol, itemCol, k, oversample)
  }

  /** Shared tail: slot candidates → index join → min-slot dedupe →
    * anti-join positives → first k per user. `univ` must carry `_idx`
    * (0..N−1, dense); whether it is broadcast is the caller's choice.
    */
  private def draw(
      inter: DataFrame,
      univ: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      oversample: Int
  ): DataFrame = {
    val n = univ.agg(count(lit(1)).as("_n_items"))

    val slots = inter.select(col(userCol)).distinct()
      .crossJoin(broadcast(n))
      .withColumn("_slot", explode(sequence(lit(1), lit(k * oversample))))
    // 48-bit md5 of "user_slot" — the shared engine-portable uniform
    val h = HashSplit.md548(concat(
      col(userCol).cast("string"), lit("_"), col("_slot").cast("string")))
    val cand = slots
      .withColumn("_cidx", pmod(h, col("_n_items")))
      .join(univ, col("_cidx") === col("_idx"))
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
