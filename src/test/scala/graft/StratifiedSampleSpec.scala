package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StratifiedSample

class StratifiedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("budget splits proportional to N_s * sigma_s; zero-variance strata get none") {
    // A: 100 rows alternating 0/10 (sigma ~5.03); B: 100 rows alternating
    // 0/1 (sigma ~0.5); C: constant (sigma 0)
    val rows = (1 to 100).map(i => ("A", i.toLong, if (i % 2 == 0) 10.0 else 0.0)) ++
      (101 to 200).map(i => ("B", i.toLong, if (i % 2 == 0) 1.0 else 0.0)) ++
      (201 to 300).map(i => ("C", i.toLong, 7.0))
    val df = rows.toDF("k", "id", "v")
    val got = StratifiedSample.neyman(df, "k", "id", "v", totalN = 110)
      .as[(Long, String, Long, Long)].collect()
    val byK = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byK.contains("C"), s"zero-variance stratum sampled: $byK")
    // weights ~ 100*5.025 vs 100*0.502 -> A gets ~10x B's quota
    assert(byK("A") >= 9 * byK("B"), s"allocation $byK")
    assert(byK("A") + byK("B") <= 110)
    // ranks are a 1..quota prefix per stratum
    got.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.sameElements(1L to g.length))
      g.foreach(r => assert(r._3 <= r._4))
    }
  }

  test("quota never exceeds the stratum size (small variable stratum fully taken)") {
    val rows = (1 to 4).map(i => ("tiny", i.toLong, i * 1000.0)) ++
      (5 to 104).map(i => ("big", i.toLong, (i % 2).toDouble))
    val got = StratifiedSample.neyman(rows.toDF("k", "id", "v"), "k", "id", "v", totalN = 100)
      .as[(Long, String, Long, Long)].collect()
    val tiny = got.filter(_._2 == "tiny")
    assert(tiny.length == 4, s"tiny stratum should cap at its size, got ${tiny.length}")
  }

  test("deterministic across partitionings") {
    val rows = (1 to 300).map(i => (s"s${i % 3}", i.toLong, (i % 7).toDouble))
    val a = StratifiedSample
      .neyman(rows.toDF("k", "id", "v").repartition(1), "k", "id", "v", totalN = 60)
      .as[(Long, String, Long, Long)].collect().toSet
    val b = StratifiedSample
      .neyman(rows.toDF("k", "id", "v").repartition(11), "k", "id", "v", totalN = 60)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
