package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the coordinated bottom-k sample family
  * ([[graft.operators.QuantileSketch]] / [[graft.operators.SetOverlap]] /
  * [[graft.operators.JoinSizeEst]]): maintain each group's bottom-k LIVE
  * in `flatMapGroupsWithState` state, so sample-backed answers (quantile
  * estimates, overlap, join-size forecasts) stay current without
  * rescanning history.
  *
  * The bottom-k sample is a MONOTONE mergeable summary — folding a new
  * observation is "insert if its draw beats the current k-th, then trim"
  * — so after any prefix of the stream the state is EXACTLY the batch
  * bottom-k of the rows seen so far, for any arrival order or
  * micro-batch partitioning (the batch-parity spec pins ≡, not ≈). The
  * draw is the same md5-48 spelling as [[graft.operators.HashSplit.md548]]
  * (JVM twin here; parity spec-pinned), so downstream estimate arithmetic
  * matches the batch operators bit-for-bit.
  *
  * Update semantics: each batch re-emits the group's current sample;
  * rows for a group supersede earlier ones (read through an
  * update-semantics sink — the [[StreamingHeavyHitters]] caveat).
  *
  * Scale shape: O(k) state per group, O(batch·log k) fold work; state
  * never grows with stream length — the property that lets a 100 TB/day
  * stream keep per-group sketches forever.
  */
object StreamBottomK {

  final case class Obs(group: String, member: String, v: Long)
  final case class BKState(hks: Seq[Long], members: Seq[String], vs: Seq[Long])
  final case class SampleRow(group: String, member: String, hk: Long, v: Long)

  private val mdTl: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** JVM twin of [[graft.operators.HashSplit.md548]]: first 48 bits of
    * md5(utf8(key)) as a non-negative long (12 hex chars).
    */
  def md548(key: String): Long = {
    val d = mdTl.get().digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  /** Pure per-group transition: fold the batch into the bottom-k (dedup on
    * member — the sample is over the member SET, matching the batch
    * operators' distinct), emit the updated sample.
    */
  def processGroup(
      key: String,
      it: Iterator[Obs],
      state: GroupState[BKState],
      k: Int
  ): Iterator[SampleRow] = {
    val prev = state.getOption.getOrElse(BKState(Nil, Nil, Nil))
    val m = scala.collection.mutable.TreeMap.empty[(Long, String), Long]
    prev.hks.indices.foreach(i => m.update((prev.hks(i), prev.members(i)), prev.vs(i)))
    it.foreach { o =>
      val hk = md548(o.member)
      val kk = (hk, o.member)
      if (!m.contains(kk)) {
        if (m.size < k) m.update(kk, o.v)
        else if (Ordering[(Long, String)].lt(kk, m.lastKey)) {
          m.remove(m.lastKey)
          m.update(kk, o.v)
        }
      }
    }
    val entries = m.toSeq
    state.update(BKState(entries.map(_._1._1), entries.map(_._1._2), entries.map(_._2)))
    entries.iterator.map { case ((hk, member), v) => SampleRow(key, member, hk, v) }
  }

  /** Wire over a (streaming or static) Dataset[Obs]; NoTimeout — the
    * sample only changes on data.
    */
  def samples(obs: Dataset[Obs], k: Int = 256): Dataset[SampleRow] = {
    implicit val stateEnc = Encoders.product[BKState]
    implicit val outEnc = Encoders.product[SampleRow]
    obs
      .groupByKey(_.group)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Obs], st: GroupState[BKState]) =>
          processGroup(key, it, st, k))
  }
}
