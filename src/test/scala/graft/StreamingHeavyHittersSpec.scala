package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{HHState, Item, Summary}

/** Transition-function units for the live Misra–Gries summary: bounded
  * state, the frequency-undercount guarantee across batches under
  * adversarial arrival orders, and the every-frequent-item-present
  * property vs exact counts.
  */
final class StreamingHeavyHittersSpec extends AnyFunSuite {

  private def freshState(prev: Option[HHState] = None) = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[HHState](
      prev.map(org.apache.spark.api.java.Optional.of[HHState])
        .getOrElse(org.apache.spark.api.java.Optional.empty[HHState]()),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
  }

  private def feed(st: org.apache.spark.sql.streaming.TestGroupState[HHState],
      k: Int, items: Seq[String]): Seq[Summary] =
    StreamingHeavyHitters.processGroup(
      "g", items.iterator.map(Item("g", _)), st, k).toSeq

  test("state stays bounded and the hot item survives every order") {
    val stream = Seq.fill(60)("hot") ++ (1 to 50).map(i => s"u$i")
    for (order <- Seq(stream, stream.reverse, stream.sortBy(_.hashCode))) {
      val (b1, b2) = order.splitAt(order.length / 2)
      val st = freshState()
      feed(st, 10, b1)
      val st2 = freshState(Some(st.get))
      val out = feed(st2, 10, b2)
      assert(st2.get.items.size <= 9) // k-1 counters max
      assert(st2.get.n === 110L)
      // f(hot)=60 > n/k=11 → guaranteed present with count >= f - n/k
      val hot = out.find(_.item == "hot").get
      assert(hot.mg_lower >= 60L - 110L / 10L)
      assert(hot.mg_lower <= 60L)
      assert(hot.n_group === 110L)
    }
  }

  test("live wiring: update-mode summaries over a file stream") {
    val spark = TestSpark.spark
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shh-in")
    val checkpoint = Files.createTempDirectory("graft-shh-cp").toString
    val rows = (Seq.fill(20)("hot") ++ (1 to 10).map(i => s"u$i"))
      .map(i => s"g,$i").mkString("\n")
    Files.write(dir.resolve("b0.csv"), rows.getBytes)
    val raw = spark.readStream.schema("group STRING, item STRING").csv(dir.toString)
      .as[Item]
    val q = StreamingHeavyHitters.summaries(raw, k = 5)
      .writeStream.outputMode("update").format("memory").queryName("shh_live")
      .option("checkpointLocation", checkpoint).start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.sql("SELECT * FROM shh_live").as[Summary].collect()
    assert(got.forall(_.n_group == 30L))
    assert(got.map(_.item).distinct.length <= 4)
    assert(got.exists(s => s.item == "hot" && s.mg_lower >= 20L - 30L / 5L))
  }

  test("every item above n/k is in the summary; counts never overcount") {
    val stream = Seq.fill(30)("a") ++ Seq.fill(25)("b") ++
      (1 to 45).map(i => s"t${i % 15}") // tail items, 3 each
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val st = freshState()
    val out = feed(st, 5, stream) // n=100, threshold n/k = 20
    val present = out.map(_.item).toSet
    exact.foreach { case (item, f) =>
      if (f > 100L / 5L) assert(present.contains(item), s"$item f=$f missing")
    }
    out.foreach(s => assert(s.mg_lower <= exact(s.item)))
  }
}
