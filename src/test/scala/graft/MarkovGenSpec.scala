package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarkovGen

class MarkovGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** first 48 bits of md5, as the engine kernel computes them. */
  private def md548(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xFFL))
  }

  // user 1: a b a b -> trans a->b:2, b->a:1; user 2: b c -> b->c:1
  // chain: a: {b:2} total 2; b: {a:1, c:1} total 2 (lex order a<c: a=[0,1), c=[1,2)); c: none
  private def events = Seq(
    (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "a", 30L, 102L), (1L, "b", 40L, 103L),
    (2L, "b", 10L, 200L), (2L, "c", 20L, 201L)
  ).toDF("user_id", "event_type", "ts_us", "event_id")

  test("hand-traced walk: seeds, inverse-CDF buckets, absorbing truncation") {
    val got = MarkovGen.generate(events, steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // seeds = first observed state per user
    assert(got.contains((1L, 0L, "a")) && got.contains((2L, 0L, "b")))
    // replay user 1 by hand: state a always -> b; state b draws between a and c
    var st = "a"
    for (t <- 1 to 3) {
      val next = st match {
        case "a" => "b"
        case "b" => if (md548(s"g 1 $t") % 2 < 1) "a" else "c"
        case "c" => null
      }
      if (next != null) {
        assert(got.contains((1L, t.toLong, next)), s"step $t expected $next: $got")
        st = next
      }
    }
    // user 2 starts at b; if a draw reaches c (absorbing) the walk stops early
    var st2 = "b"
    var alive = true
    for (t <- 1 to 3) {
      if (alive) {
        val next = st2 match {
          case "b" => if (md548(s"g 2 $t") % 2 < 1) "a" else "c"
          case "a" => "b"
          case "c" => null
        }
        if (next == null) alive = false
        else {
          assert(got.contains((2L, t.toLong, next)), s"user2 step $t expected $next: $got")
          st2 = next
          if (st2 == "c" && t < 3) {
            // no outgoing transitions from c: later steps must be absent
            assert(!got.exists(r => r._1 == 2L && r._2 == t + 1L),
              s"walk continued past the absorbing state: $got")
            alive = false
          }
        }
      }
    }
  }

  test("generation is deterministic and replays identically") {
    val a = MarkovGen.generate(events, steps = 4).collect().toSet
    val b = MarkovGen.generate(events, steps = 4).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("q_markov_generate emits step-0 seeds for every user on the fixture corpus") {
    val df = SparkEntry.queries("q_markov_generate")(spark, TestSpark.Sf0001)
    val seeds = df.filter(col("step") === 0L).count()
    val users = graft.sources.Tables(spark, TestSpark.Sf0001).events
      .select(col("user_id")).distinct().count()
    assert(seeds == users)
  }
}
