package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingHeavyHitters.{HHState, Item}

/** Streaming twin of [[graft.operators.SkewProfile]] — the pre-flight
  * skew check kept LIVE: per candidate key column, the hottest key's mass
  * and the salt modulus it implies, refreshed every micro-batch, so a
  * pipeline can alarm (or re-salt) the moment a key starts running away
  * instead of discovering the straggler task after the join.
  *
  * State is the same Misra–Gries summary as [[StreamingHeavyHitters]]
  * (the transition is SHARED — one MG implementation, two consumers):
  * O(k) per key column, independent of key cardinality. Consequently
  * `max_key_rows_lb` is the MG LOWER BOUND on the hottest key's true
  * row count (exact when the column's distinct-key count stays below k;
  * within n/k of exact otherwise — the MG guarantee), and `salt_factor`
  * derived from it is likewise a lower bound on the batch profiler's
  * figure. `n_rows` is exact. Update semantics: rows for a key column
  * supersede earlier batches' rows — consume latest-per-group, as
  * [[StreamingHeavyHitters]] documents.
  */
object StreamingSkewProfile {

  /** One observation of one candidate key column's value. */
  final case class KeyObs(key_col: String, key_val: String)

  final case class Profile(
      key_col: String,
      n_rows: Long,
      max_key_rows_lb: Long,
      salt_factor: Long)

  /** Per-column transition: fold the batch into the shared MG summary,
    * emit the refreshed one-row profile.
    */
  def processGroup(
      keyCol: String,
      it: Iterator[KeyObs],
      state: GroupState[HHState],
      k: Int,
      targetRowsPerTask: Long
  ): Iterator[Profile] = {
    require(targetRowsPerTask > 0, "target must be positive")
    val summaries = StreamingHeavyHitters
      .processGroup(keyCol, it.map(o => Item(keyCol, o.key_val)), state, k)
      .toSeq
    val n = state.get.n
    val maxLb = if (summaries.isEmpty) 0L else summaries.map(_.mg_lower).max
    Iterator.single(
      Profile(keyCol, n, maxLb, (maxLb + targetRowsPerTask - 1) / targetRowsPerTask))
  }

  /** Explode a (streaming or static) frame's candidate key columns into
    * [[KeyObs]] rows — one pass, one array projection, no shuffle.
    */
  def observations(df: DataFrame, keyCols: Seq[String]): Dataset[KeyObs] = {
    require(keyCols.nonEmpty, "profile at least one key column")
    implicit val enc = Encoders.product[KeyObs]
    df.select(explode(array(keyCols.map(c =>
        struct(lit(c).as("key_col"), col(c).cast("string").as("key_val"))): _*))
        .as("o"))
      .select(col("o.key_col"), col("o.key_val"))
      .as[KeyObs]
  }

  /** Wire over a Dataset[KeyObs]; NoTimeout — the profile only changes on
    * data.
    */
  def profiles(
      obs: Dataset[KeyObs],
      k: Int,
      targetRowsPerTask: Long = 1000000L
  ): Dataset[Profile] = {
    implicit val stateEnc = Encoders.product[HHState]
    implicit val outEnc = Encoders.product[Profile]
    obs
      .groupByKey(_.key_col)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[KeyObs], st: GroupState[HHState]) =>
          processGroup(key, it, st, k, targetRowsPerTask))
  }
}
