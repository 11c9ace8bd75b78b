package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHeavyHitters.HHState
import graft.streaming.StreamingSkewProfile
import graft.streaming.StreamingSkewProfile.{KeyObs, Profile}

/** Batch parity for the live skew profiler: over a two-micro-batch replay
  * whose per-column key cardinality stays below k (MG exact regime), the
  * final per-column profile must equal SkewProfile.profile on the same
  * rows; above k the emitted figures must stay lower bounds.
  */
final class StreamingSkewProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshState(prev: Option[HHState] = None) = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[HHState](
      prev.map(org.apache.spark.api.java.Optional.of[HHState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[HHState]()),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
  }

  private def replay(
      keyCol: String,
      batches: Seq[Seq[String]],
      k: Int,
      target: Long): Profile = {
    var st = freshState()
    var out: Seq[Profile] = Nil
    batches.foreach { b =>
      out = StreamingSkewProfile.processGroup(
        keyCol, b.iterator.map(KeyObs(keyCol, _)), st, k, target).toSeq
      st = freshState(Some(st.get))
    }
    assert(out.size === 1)
    out.head
  }

  // two candidate key columns: user skewed on u1, item near-uniform
  private val rows: Seq[(String, String)] =
    (1 to 60).map(i => ("u1", s"i${i % 7}")) ++
      (1 to 30).map(i => (s"u${1 + i % 5}", s"i${i % 7}"))

  test("two-micro-batch replay matches the batch profiler in the exact regime") {
    import spark.implicits._
    val df = rows.toDF("user_id", "item_id")
    val want = graft.operators.SkewProfile
      .profile(df, Seq("user_id", "item_id"), targetRowsPerTask = 10L)
      .select("key_col", "n_rows", "max_key_rows", "salt_factor")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // per-column cardinalities (6 and 7) sit below k−1=15 → MG is exact
    val (b1, b2) = rows.splitAt(40)
    Seq("user_id", "item_id").foreach { kc =>
      val idx = if (kc == "user_id") 0 else 1
      val got = replay(kc,
        Seq(b1.map(t => if (idx == 0) t._1 else t._2),
          b2.map(t => if (idx == 0) t._1 else t._2)),
        k = 16, target = 10L)
      val (nRows, maxRows, salt) = want(kc)
      assert(got.n_rows === nRows, s"$kc n_rows")
      assert(got.max_key_rows_lb === maxRows, s"$kc max_key_rows")
      assert(got.salt_factor === salt, s"$kc salt_factor")
    }
  }

  test("above-k cardinality: figures are lower bounds and the hot key drives them") {
    // hot key 50 of n=95; 45 distinct tail keys; k=8 → heavy eviction
    val stream = Seq.fill(50)("hot") ++ (1 to 45).map(i => s"t$i")
    val (b1, b2) = stream.splitAt(47)
    val got = replay("user_id", Seq(b1, b2), k = 8, target = 10L)
    assert(got.n_rows === 95L)
    // MG guarantee: lb within n/k of the true max, never above it
    assert(got.max_key_rows_lb <= 50L)
    assert(got.max_key_rows_lb >= 50L - 95L / 8L)
    assert(got.salt_factor <= (50L + 9L) / 10L)
    assert(got.salt_factor >= 1L)
  }

  test("live wiring: per-batch profiles over a file stream, latest row wins") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ssp-in")
    val checkpoint = Files.createTempDirectory("graft-ssp-cp").toString
    val csv = rows.map { case (u, i) => s"$u,$i" }.mkString("\n")
    Files.write(dir.resolve("b0.csv"), csv.getBytes)
    val raw = spark.readStream.schema("user_id STRING, item_id STRING").csv(dir.toString)
    val q = StreamingSkewProfile
      .profiles(StreamingSkewProfile.observations(raw, Seq("user_id", "item_id")),
        k = 16, targetRowsPerTask = 10L)
      .writeStream.outputMode("update").format("memory").queryName("ssp_live")
      .option("checkpointLocation", checkpoint).start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM ssp_live").as[Profile].collect()
      .groupBy(_.key_col).map { case (k2, v) => k2 -> v.last }
    // u1: 60 from the first block + 6 from the second (i%5 == 0) = 66
    assert(got("user_id").n_rows === 90L)
    assert(got("user_id").max_key_rows_lb === 66L)
    assert(got("user_id").salt_factor === 7L)
    assert(got("item_id").n_rows === 90L)
  }
}
