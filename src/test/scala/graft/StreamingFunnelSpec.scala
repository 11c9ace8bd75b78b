package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Event, Progress, Update}

class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  test("transition function: ordered advance, same-instant progression, no-change silence") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def freshState = TestGroupState.create[Progress](
      org.apache.spark.api.java.Optional.empty[Progress](),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

    // click before any view is ignored; same-ts view+click advances both
    val st1 = freshState
    val out1 = StreamingFunnel.processGroup(1L,
      Iterator(Event(1L, "click", 5L), Event(1L, "view", 10L), Event(1L, "click", 10L)),
      st1, Steps).toSeq
    assert(out1 == Seq(Update(1L, Seq(10L, 10L), 2)))

    // next batch: purchase completes; an out-of-order extra view changes nothing
    val out2 = StreamingFunnel.processGroup(1L,
      Iterator(Event(1L, "view", 3L), Event(1L, "purchase", 20L)), st1, Steps).toSeq
    assert(out2 == Seq(Update(1L, Seq(10L, 10L, 20L), 3)))

    // fully-complete funnel: further events emit nothing
    val out3 = StreamingFunnel.processGroup(1L,
      Iterator(Event(1L, "purchase", 30L)), st1, Steps).toSeq
    assert(out3.isEmpty)
  }

  test("stream/batch parity on in-order events across micro-batches") {
    val rnd = new scala.util.Random(11)
    // per-user ascending timestamps; event types random so funnels break at
    // every stage somewhere in the population
    val all = (1 to 30).flatMap { u =>
      var ts = u * 1000L
      // structural breakage: every 3rd user never purchases (stage ≤ 2),
      // every 7th never views (stage 0)
      val allowed = Steps.filterNot(s =>
        (u % 3 == 0 && s == "purchase") || (u % 7 == 0 && s == "view"))
      (1 to 20).map { _ =>
        ts += 10L + rnd.nextInt(500)
        (u.toLong, allowed(rnd.nextInt(allowed.size)), ts)
      }
    }
    // split into two micro-batches BY TIME so arrival stays in-order per user
    val cutoff = all.map(_._3).sorted.apply(all.size / 2)
    val dir = Files.createTempDirectory("graft-funnel-in")
    def csv(rows: Seq[(Long, String, Long)]): String =
      rows.map(r => s"${r._1},${r._2},${r._3}").mkString("\n")
    Files.write(dir.resolve("b0.csv"), csv(all.filter(_._3 <= cutoff)).getBytes)
    Files.write(dir.resolve("b1.csv"), csv(all.filter(_._3 > cutoff)).getBytes)

    val raw = spark.readStream
      .schema("user_id LONG, event_type STRING, ts_us LONG")
      .option("maxFilesPerTrigger", 1)
      .csv(dir.toString)
      .as[Event]
    val checkpoint = Files.createTempDirectory("graft-funnel-cp").toString
    val q = StreamingFunnel.funnel(raw, Steps).writeStream
      .outputMode("update")
      .format("memory")
      .queryName("funnel_updates")
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // stage is monotone per user: the max-stage row is the final state
    val streamed = spark.sql("SELECT * FROM funnel_updates").as[Update].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.stage)).toMap

    val batch = Funnel
      .ordered(all.toDF("user_id", "event_type", "ts_us"),
        "user_id", "event_type", "ts_us", Steps)
      .select($"user_id", $"t_step1", $"t_step2", $"t_step3", $"stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()

    batch.foreach { case (u, t1, t2, t3, stage) =>
      val expTimes = Seq(t1, t2, t3).flatten.take(stage)
      if (stage == 0) assert(!streamed.contains(u), s"user $u: stage-0 emitted")
      else {
        val got = streamed(u)
        assert(got.stage == stage && got.times == expTimes,
          s"user $u: streamed ${got.times}/${got.stage} vs batch $expTimes/$stage")
      }
    }
    assert(batch.exists(_._5 == 3) && batch.exists(_._5 < 3),
      "fixture too uniform to exercise both complete and broken funnels")
  }
}
