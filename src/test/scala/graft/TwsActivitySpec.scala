package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwsActivity

class TwsActivitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming transformWithState: RocksDB state, running totals, state readback") {
    val dir = Files.createTempDirectory("graft-tws-in")
    val cp = Files.createTempDirectory("graft-tws-cp").toString
    val f0 = dir.resolve("b0.csv"); val f1 = dir.resolve("b1.csv")
    Files.write(f0, "1,view\n1,click\n1,view\n2,view".getBytes)
    Files.write(f1, "1,view\n1,purchase\n3,view".getBytes)
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val raw = spark.readStream.schema("user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 1).csv(dir.toString)
      .as[TwsActivity.Click]
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = TwsActivity.activity(raw)
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_out").option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.nonEmpty &&
        q.lastProgress.stateOperators(0).operatorName.contains("transformWithState"),
        q.lastProgress.stateOperators.map(_.operatorName).mkString(","))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // update mode: each touched key emits its RUNNING total per batch
    val got = spark.sql("SELECT * FROM tws_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 1L), (1L, 5L), (3L, 1L)))

    // the Spark 4 state data source reads the final ValueState back out
    val state = spark.read.format("statestore")
      .option("stateVarName", "count").load(cp)
    val finalCounts = state.selectExpr("key.value AS user_id", "value.value AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalCounts == Set((1L, 5L), (2L, 1L), (3L, 1L)))
  }

  test("static run equals a plain groupBy count (the oracled parity)") {
    val ev = graft.sources.Tables(spark, TestSpark.Sf0001).events
      .select($"user_id", $"event_type").as[TwsActivity.Click]
    val tws = TwsActivity.activity(ev).collect().map(r => (r.user_id, r.n_events)).toMap
    val batch = ev.groupByKey(_.user_id).count().collect().toMap
    assert(tws == batch)
  }
}
