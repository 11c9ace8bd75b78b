package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Winsorize

class WinsorizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("closed-form interpolated fences on 1..100; interior rows untouched") {
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("k", "value")
    val got = Winsorize.clipPerGroup(df, Seq("k"), "value")
      .select($"value", $"fence_lo", $"fence_hi", $"clipped")
      .as[(Double, Double, Double, Double)].collect()
    // h = (n-1)p: p01 -> 1 + 0.99, p99 -> 99 + 0.01
    got.foreach { case (_, lo, hi, _) =>
      assert(math.abs(lo - 1.99) < 1e-9 && math.abs(hi - 99.01) < 1e-9)
    }
    got.foreach { case (v, lo, hi, c) =>
      if (v < lo) assert(c == lo)
      else if (v > hi) assert(c == hi)
      else assert(c == v)
    }
    assert(got.count { case (v, _, _, c) => c != v } == 2) // only 1.0 and 100.0 clip
  }

  test("outliers clip to the fences; group isolation") {
    val df = (Seq(("a", 1e9), ("a", -1e9)) ++
      (1 to 998).map(i => ("a", (i % 100).toDouble)) ++
      (1 to 50).map(i => ("b", 1000.0 + i))).toDF("k", "value")
    val byK = Winsorize.clipPerGroup(df, Seq("k"), "value")
      .select($"k", $"value", $"clipped").as[(String, Double, Double)].collect()
      .groupBy(_._1)
    val aMax = byK("a").map(_._3).max
    val aMin = byK("a").map(_._3).min
    assert(aMax < 1e6 && aMin > -1e6, s"outliers survived: [$aMin, $aMax]")
    // group b's fences come from b alone
    assert(byK("b").forall { case (_, v, c) => c >= 1000.0 && c <= 1051.0 })
  }

  test("approx spelling lands within a tight band of the exact fences") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 10000).map(_ => ("a", rnd.nextDouble() * 100)).toDF("k", "value")
    def fences(exact: Boolean) =
      Winsorize.clipPerGroup(df, Seq("k"), "value", exact = exact)
        .select($"fence_lo", $"fence_hi").as[(Double, Double)].head()
    val (exLo, exHi) = fences(exact = true)
    val (apLo, apHi) = fences(exact = false)
    // GK at accuracy 10000 over 10k rows: rank error <= ~1 -> sub-0.1 here
    assert(math.abs(exLo - apLo) < 0.5, s"lo: exact $exLo vs approx $apLo")
    assert(math.abs(exHi - apHi) < 0.5, s"hi: exact $exHi vs approx $apHi")
  }
}
