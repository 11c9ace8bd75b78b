package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key "a": noisy-but-stable series with one planted spike at h=40;
  // key "b": perfectly constant (sigma = 0 -> never flagged)
  private lazy val series = {
    val a = (0 until 48).map { h =>
      val base = 10L + (h % 3) // 10,11,12 repeating: sigma > 0
      ("a", h.toLong, if (h == 40) 100L else base)
    }
    val b = (0 until 48).map(h => ("b", h.toLong, 7L))
    (a ++ b).toDF("k", "h", "v")
  }

  private def run() =
    Anomaly.trailingZScores(series, Seq("k"), "h", "v")
      .select($"k", $"h", $"v", $"trailing_n", $"z", $"is_anomaly")
      .as[(String, Long, Long, Long, Option[Double], Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap

  test("planted spike flags; stable neighbors and constant series don't") {
    val got = run()
    val (_, _, _, _, zSpike, flagged) = got(("a", 40L))
    assert(flagged && zSpike.exists(_ > 3.0), s"spike z=$zSpike")
    // the hour before the spike is ordinary
    assert(!got(("a", 39L))._6)
    // constant series: sigma = 0 -> z null, never flagged
    (12 until 48).foreach { h =>
      val (_, _, _, _, z, f) = got(("b", h.toLong))
      assert(z.isEmpty && !f, s"b@$h")
    }
  }

  test("warm-up: fewer than minPrev trailing observations emit null z, no flag") {
    val got = run()
    (0 until 12).foreach { h =>
      val (_, _, _, n, z, f) = got(("a", h.toLong))
      assert(n == h && z.isEmpty && !f, s"a@$h trailing_n=$n")
    }
    // first fully-warm hour has z defined
    assert(got(("a", 12L))._5.isDefined)
  }

  test("trailing stats cover at most `trailing` previous rows") {
    val got = run()
    (25 until 48).foreach { h =>
      assert(got(("a", h.toLong))._4 == 24L, s"a@$h")
    }
  }

  test("spike poisons the mean of following windows but is not re-flagged") {
    val got = run()
    // hours after the spike keep sigma large (spike in history), so the
    // ordinary values that follow must not flag
    (41 until 48).foreach(h => assert(!got(("a", h.toLong))._6, s"a@$h"))
  }
}
