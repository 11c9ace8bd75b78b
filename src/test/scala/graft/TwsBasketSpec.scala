package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwsBasket

class TwsBasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MapState + ListState accumulate across micro-batches on RocksDB") {
    val dir = Files.createTempDirectory("graft-twsb-in")
    val cp = Files.createTempDirectory("graft-twsb-cp").toString
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    // user 1: two views + purchases 500, 100; user 2: one click
    Files.write(f0, "1,view,0\n1,purchase,500\n1,view,0\n2,click,0".getBytes)
    // batch 2: user 1 buys 300 and 900 -> top-3 = 900+500+300
    Files.write(f1, "1,purchase,100\n1,purchase,300\n1,purchase,900".getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val raw = spark.readStream
      .schema("user_id LONG, event_type STRING, value_cents LONG")
      .option("maxFilesPerTrigger", 1).csv(dir.toString)
      .as[TwsBasket.Act]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsBasket.stats(raw, k = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("twsb_out").option("checkpointLocation", cp).start()
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val got = spark.sql("SELECT * FROM twsb_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch 1: u1 (2 types: view+purchase, 4 events? no — 3 events in b0),
    // top-k so far = 500; u2 (1 type, 1 event, no purchases)
    // batch 2: u1 adds 3 purchases -> 2 types, 7 events, top-3 900+500+300
    assert(got == Set(
      (1L, 2L, 3L, 500L), (2L, 1L, 1L, 0L), (1L, 2L, 6L, 1700L)))
  }

  test("static (batch) execution equals the relational aggregate") {
    val acts = Seq(
      TwsBasket.Act(1L, "view", 0L), TwsBasket.Act(1L, "purchase", 500L),
      TwsBasket.Act(1L, "purchase", 100L), TwsBasket.Act(1L, "purchase", 300L),
      TwsBasket.Act(1L, "purchase", 900L), TwsBasket.Act(2L, "click", 0L)
    ).toDS()
    val got = TwsBasket.stats(acts, k = 3).collect()
      .map(s => (s.user_id, s.n_types, s.n_events, s.topk_cents)).toSet
    assert(got == Set((1L, 2L, 5L, 1700L), (2L, 1L, 1L, 0L)))
  }
}
