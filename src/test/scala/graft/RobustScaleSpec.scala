package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustScale

class RobustScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("closed form: symmetric group, outlier immunity, zero-MAD null") {
    val rows =
      (1 to 9).map(i => ("sym", i.toDouble)) ++          // med 5, MAD 2
      (Seq.fill(8)(10.0) :+ 1e9).map(("spiky", _)) ++    // majority constant
      Seq(("outl", 1.0), ("outl", 2.0), ("outl", 3.0), ("outl", 4.0),
        ("outl", 5.0), ("outl", 6.0), ("outl", 1e9))     // one wild value
    val got = RobustScale.zScores(rows.toDF("g", "v"), Seq("g"), "v")
      .select($"g", $"v", $"med", $"mad", $"robust_z")
      .as[(String, Double, Double, Double, Option[Double])].collect()

    val sym = got.filter(_._1 == "sym")
    assert(sym.forall(r => r._3 == 5.0 && r._4 == 2.0))
    val z9 = sym.find(_._2 == 9.0).get._5.get
    assert(math.abs(z9 - 4.0 / (1.4826 * 2.0)) < 1e-6)

    // constant-majority group: MAD 0 → null z everywhere, including the spike
    assert(got.filter(_._1 == "spiky").forall(r => r._4 == 0.0 && r._5.isEmpty))

    // the outlier can't drag the fences: median/MAD stay in the bulk, and
    // the wild value's z is enormous while the bulk stays small
    val outl = got.filter(_._1 == "outl")
    assert(outl.forall(r => r._3 == 4.0 && r._4 == 2.0))
    assert(outl.filter(_._2 <= 6.0).forall(r => math.abs(r._5.get) < 2.0))
    assert(outl.find(_._2 == 1e9).get._5.get > 1e6)
  }

  test("approx twin lands within a band of exact on a skewed fixture") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 3}", math.exp(rnd.nextGaussian() * 2))   // log-normal: skewed
    }
    val df = rows.toDF("g", "v")
    val ex = RobustScale.zScores(df, Seq("g"), "v")
      .select($"g", $"med", $"mad").distinct()
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ap = RobustScale.zScores(df, Seq("g"), "v", exact = false)
      .select($"g", $"med", $"mad").distinct()
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    ex.foreach { case (g, (m, d)) =>
      assert(math.abs(ap(g)._1 - m) <= 0.05 * math.max(m, 1.0), s"$g med")
      assert(math.abs(ap(g)._2 - d) <= 0.10 * math.max(d, 1.0), s"$g mad")
    }
  }

  test("single exchange: both medians stack on one group partitioning") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i.toDouble)).toDF("g", "v")
    val plan = RobustScale.zScores(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
