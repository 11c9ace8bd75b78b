package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Psi
import graft.streaming.StreamingPsi

/** Live PSI monitor: exact parity with the batch operator when the
  * reference is the pooled corpus, zero on an identical distribution,
  * the alarm on a shifted batch, and live foreachBatch wiring.
  */
final class StreamingPsiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parity with Psi.byGroup when the reference is the pooled corpus") {
    val corpus = ((0 until 250).map(i => ("s0", i % 5)) ++
      (0 until 250).map(_ => ("s1", 0))).toDF("src", "b")
    val want = Psi.byGroup(corpus, "b", "src", 5)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val ref = StreamingPsi.referenceOf(corpus, "b")
    Seq("s0", "s1").foreach { s =>
      val got = StreamingPsi.psiVsReference(
        corpus.filter($"src" === s), "b", ref, 5).collect().head
      assert(got.getLong(1) === want(s), s"parity for $s")
    }
  }

  test("identical distribution scores zero; a shifted batch alarms") {
    val ref = Map(0 -> 100L, 1 -> 100L, 2 -> 100L, 3 -> 100L)
    val same = (0 until 200).map(i => i % 4).toDF("b")
    assert(StreamingPsi.psiVsReference(same, "b", ref, 4)
      .collect().head.getLong(1) === 0L)
    val shifted = Seq.fill(200)(0).toDF("b")
    assert(StreamingPsi.psiVsReference(shifted, "b", ref, 4)
      .collect().head.getLong(1) > 250000L)
  }

  test("live wiring: one PSI row per micro-batch through foreachBatch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-spsi-in")
    val checkpoint = Files.createTempDirectory("graft-spsi-cp").toString
    Files.write(dir.resolve("b0.csv"),
      (0 until 100).map(i => s"${i % 4}").mkString("\n").getBytes)
    val ref = Map(0 -> 50L, 1 -> 50L, 2 -> 50L, 3 -> 50L)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val raw = spark.readStream.schema("b INT").csv(dir.toString)
    val q = StreamingPsi.monitor(spark, raw, "b", ref, 4) { rows =>
      out ++= rows.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.option("checkpointLocation", checkpoint).start()
    try {
      q.processAllAvailable()
      // second, shifted micro-batch
      Files.write(dir.resolve("b1.csv"),
        Seq.fill(100)("0").mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()
    assert(out.size === 2)
    val byBatch = out.sortBy(_._1)
    assert(byBatch.head._3 === 0L) // uniform batch vs uniform ref
    assert(byBatch.last._3 > 250000L) // collapsed batch alarms
  }
}
