package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Featurize, SessionConf, Sessionize}

class OperatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def crafted = Seq(
    // session A: purchase mid-stream — events after it must be cut
    ("A", "view", "2024-01-01 10:00:00", 10.0, "p1"),
    ("A", "cart", "2024-01-01 10:01:00", 20.0, "p2"),
    ("A", "purchase", "2024-01-01 10:02:00", 20.0, "p2"),
    ("A", "view", "2024-01-01 10:03:00", 30.0, "p3"), // leaked
    // session B: no purchase — everything kept
    ("B", "view", "2024-01-01 11:00:00", 5.0, "p1"),
    ("B", "view", "2024-01-01 11:30:00", 7.0, "p4")
  ).toDF("user_session", "event_type", "ts_str", "price", "product_id")
    .withColumn("event_time", to_timestamp($"ts_str"))
    .drop("ts_str")

  test("W1 window and J1 join spellings agree row-for-row") {
    val w = Sessionize.withFirstPurchase(crafted)
      .select("user_session", "event_time", "purchase_timestamp")
    val j = Sessionize.withFirstPurchaseViaJoin(crafted)
      .select("user_session", "event_time", "purchase_timestamp")
    assert(w.exceptAll(j).isEmpty && j.exceptAll(w).isEmpty)
  }

  test("leakage filter keeps the purchase event and drops later rows") {
    val cut = Sessionize.dropLeakage(Sessionize.withFirstPurchase(crafted))
    val aRows = cut.filter($"user_session" === "A").collect()
    assert(aRows.length == 3) // view, cart, purchase — post-purchase view dropped
    assert(cut.filter($"user_session" === "B").count() == 2) // no purchase: all kept
  }

  test("session features: conditional counts, duration, distinct items") {
    val f = Featurize.leakageFreeSessionFeatures(crafted)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = f("A")
    assert(a.getAs[Int]("label") == 1)
    assert(a.getAs[Long]("view_count") == 1) // post-purchase view excluded
    assert(a.getAs[Long]("cart_count") == 1)
    assert(a.getAs[Long]("session_duration") == 120)
    assert(a.getAs[Long]("unique_items") == 2)
    val b = f("B")
    assert(b.getAs[Int]("label") == 0)
    assert(b.getAs[Long]("session_duration") == 1800)
    assert(b.getAs[Double]("avg_price") == 6.0)
  }

  test("batchTotals guards division by zero carts") {
    val noCarts = crafted.filter($"event_type" =!= "cart")
    val r = Featurize.batchTotals(noCarts).collect()(0)
    assert(r.getAs[Double]("conversion_rate") == 0.0)
    val withCarts = Featurize.batchTotals(crafted).collect()(0)
    assert(withCarts.getAs[Double]("conversion_rate") == 100.0) // 1 purchase / 1 cart
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("user_session") && df.columns.contains("label"))
  }

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("typed Dataset accessors round-trip the case-class schemas") {
    val t = sources.Tables(spark, TestSpark.Sf0001)
    val ev = t.eventsDs.filter(_.event_type == "purchase").take(3)
    assert(ev.nonEmpty && ev.forall(e => e.ts_ns > 0 && e.event_type == "purchase"))
    val docs = t.documentsDs.map(d => d.text.length).take(2)
    assert(docs.forall(_ > 0))
    assert(t.embeddingsDs.head().embedding.length == 64)
  }

  test("W1 ≡ J1 on real data (sf0.001 clickstream shape)") {
    val ev = sources.Tables(spark, TestSpark.Sf0001).clickstream
      .withColumnRenamed("event_time", "et")
    val w = Sessionize.withFirstPurchase(ev, tsCol = "et")
      .groupBy("user_session").agg(min("purchase_timestamp").as("pt"))
    val j = Sessionize.withFirstPurchaseViaJoin(ev, tsCol = "et")
      .groupBy("user_session").agg(min("purchase_timestamp").as("pt"))
    assert(w.exceptAll(j).isEmpty && j.exceptAll(w).isEmpty)
  }
}
