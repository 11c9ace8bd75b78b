package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions score zero; disjoint ranges score ks_d = 1") {
    val shared = (1 to 200).map(i => (i % 100).toDouble)
    val low = (1 to 200).map(i => (i % 50).toDouble)        // [0, 50)
    val high = (1 to 200).map(i => 500.0 + (i % 50))        // [500, 550)
    val df = (shared.map(("a", _)) ++ shared.map(("b", _)) ++
      low.map(("lo", _)) ++ high.map(("hi", _))).toDF("src", "v")
    val got = Drift.vsRest(df, "src", "v", nBuckets = 64)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // a and b are identical to each other but NOT to the pooled rest
    // (lo/hi pull the complement away) — compare a vs b directly instead
    assert(got("a")._3 == got("b")._3 && got("a")._4 == got("b")._4)
    // hi is fully disjoint from everything else: its ECDF reaches 1 only
    // where the rest is already 1, max gap = 1 at the bucket before
    assert(got("hi")._3 == 1.0, s"disjoint ks_d ${got("hi")._3}")
    assert(got("hi")._4 > 1.0, "disjoint psi should be large")
  }

  test("matches a driver-side replica on a random mixture") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { i =>
      val src = s"s${i % 3}"
      // s2 is shifted: drift should be visible
      val v = rnd.nextDouble() * 100 + (if (src == "s2") 40.0 else 0.0)
      (src, v)
    }
    val nB = 32
    val got = Drift.vsRest(rows.toDF("src", "v"), "src", "v", nBuckets = nB)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap

    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    def bucket(v: Double): Int =
      math.min(math.max(math.floor((v - lo) / (hi - lo) * nB), 0.0), nB - 1.0).toInt
    val bySrc = rows.groupBy(_._1).view.mapValues(_.map(r => bucket(r._2))).toMap
    val nAll = rows.size
    bySrc.foreach { case (src, bs) =>
      val nG = bs.size
      val nR = nAll - nG
      val cG = (0 until nB).map(b => bs.count(_ == b))
      val cAll = (0 until nB).map(b => rows.count(r => bucket(r._2) == b))
      var (cumG, cumA, ks, psi) = (0L, 0L, 0.0, 0.0)
      (0 until nB).foreach { b =>
        cumG += cG(b); cumA += cAll(b)
        ks = math.max(ks, math.abs(cumG.toDouble / nG - (cumA - cumG).toDouble / nR))
        val pG = cG(b).toDouble / nG + 1e-6
        val pR = (cAll(b) - cG(b)).toDouble / nR + 1e-6
        psi += (pG - pR) * math.log(pG / pR)
      }
      val (_, n, ksGot, psiGot) = got(src)
      assert(n == nG)
      assert(math.abs(ksGot - ks) < 2e-6, s"$src ks $ksGot vs $ks")
      assert(math.abs(psiGot - psi) < 2e-6, s"$src psi $psiGot vs $psi")
    }
    // the shifted source must stand out on both metrics (its complement is
    // 2/3 unshifted; the unshifted sources' complements are 1/2 shifted,
    // so they drift too — ordering, not magnitude, is the stable claim)
    assert(got("s2")._3 > got("s0")._3 && got("s2")._4 > got("s0")._4)
  }

  test("wasserstein: identical halves score zero; a pure shift reads as the shift size") {
    // a vs rest where rest ≡ a's distribution → every CDF gap is 0
    val shared = (1 to 400).map(i => (i % 100).toDouble)
    val same = (shared.map(("a", _)) ++ shared.map(("b", _))).toDF("src", "v")
    val gotSame = Drift.wassersteinVsRest(same, "src", "v", nBuckets = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(gotSame("a") == 0.0 && gotSame("b") == 0.0)

    // b = a + 25 exactly, values on bucket centers: the bucketed W1 of a
    // uniform shift is the shift itself (here half the 50-unit spread on
    // a [0,75] range → expect 25 within one bucket width ≈ 1.17)
    val base = (0 until 400).map(i => (i % 50).toDouble)
    val shift = base.map(_ + 25.0)
    val df = (base.map(("a", _)) ++ shift.map(("b", _))).toDF("src", "v")
    val got = Drift.wassersteinVsRest(df, "src", "v", nBuckets = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(got("a") - 25.0) < 1.2, s"shift read ${got("a")}")
    assert(got("a") == got("b"), "symmetric two-group case")
  }

  test("wasserstein: driver replica + partitioning determinism") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 3000).map { i =>
      val src = s"s${i % 3}"
      (src, rnd.nextDouble() * 100 + (if (src == "s2") 15.0 else 0.0))
    }
    val nB = 32
    val got = Drift.wassersteinVsRest(rows.toDF("src", "v").repartition(13),
        "src", "v", nBuckets = nB)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val lo = rows.map(_._2).min
    val hi = rows.map(_._2).max
    def bucket(v: Double): Int =
      math.min(math.max(math.floor((v - lo) / (hi - lo) * nB), 0.0), nB - 1.0).toInt
    val nAll = rows.size
    rows.groupBy(_._1).foreach { case (src, g) =>
      val nG = g.size
      val nR = nAll - nG
      var (cumG, cumA, s) = (0L, 0L, 0L)
      (0 until nB).foreach { b =>
        cumG += g.count(r => bucket(r._2) == b)
        cumA += rows.count(r => bucket(r._2) == b)
        s += math.abs(cumG * nR - (cumA - cumG) * nG)
      }
      val w1 = s.toDouble / (nG.toDouble * nR) * (hi - lo) / nB
      assert(math.abs(got(src)._3 - w1) < 2e-6, s"$src w1 ${got(src)._3} vs $w1")
      assert(got(src)._2 == nG)
    }
    // the shifted source must carry the largest mass displacement
    assert(got("s2")._3 > got("s0")._3 && got("s2")._3 > got("s1")._3)
  }

  test("deterministic across partitionings") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map(i => (s"s${i % 4}", rnd.nextDouble() * 10))
    val a = Drift.vsRest(rows.toDF("src", "v").repartition(1), "src", "v")
      .as[(String, Long, Double, Double)].collect().toSet
    val b = Drift.vsRest(rows.toDF("src", "v").repartition(17), "src", "v")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(a == b && a.size == 4)
  }
}
