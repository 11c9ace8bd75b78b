package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("moment stats match a driver-side replica (raw, then rounded)") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(200)(Array.fill(4)(rnd.nextGaussian().toFloat))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val (n, s, q) = Pca.momentStats(df, "embedding", 4, roundTo = None)
    assert(n == 200)
    for (i <- 0 until 4) {
      val exp = vecs.map(_(i).toDouble).sum
      assert(math.abs(s(i) - exp) < 1e-9, s"s($i)")
      for (j <- 0 until 4) {
        val expQ = vecs.map(v => v(i).toDouble * v(j).toDouble).sum
        assert(math.abs(q(i)(j) - expQ) < 1e-9, s"q($i)($j)")
      }
    }
    val (_, sr, _) = Pca.momentStats(df, "embedding", 4, roundTo = Some(6))
    for (i <- 0 until 4)
      assert(math.abs(sr(i) - s(i)) < 5e-7)
  }

  test("rows that are null or shorter than d are skipped") {
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f, 3.0f)),
      Tuple1(Array(1.0f)),
      Tuple1(null.asInstanceOf[Array[Float]])).toDF("embedding")
    val (n, s, _) = Pca.momentStats(df, "embedding", 3, roundTo = None)
    assert(n == 1)
    assert(s.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("power iteration recovers a planted dominant direction") {
    // x = t * u + small noise, u = (3,4)/5 → top component ≈ ±u.
    val rnd = new scala.util.Random(5)
    val u = Array(0.6, 0.8)
    val vecs = Seq.fill(500) {
      val t = rnd.nextGaussian() * 10
      Array((t * u(0) + rnd.nextGaussian() * 0.1).toFloat,
        (t * u(1) + rnd.nextGaussian() * 0.1).toFloat)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val (n, s, q) = Pca.momentStats(df, "embedding", 2, roundTo = Some(6))
    val (v, eig) = Pca.powerIteration(Pca.covFromStats(n, s, q), iters = 20)
    val dot = math.abs(v(0) * u(0) + v(1) * u(1))
    assert(dot > 0.999, s"|<v,u>| = $dot")
    assert(eig > 50.0) // var(t)·|u|² ≈ 100
  }

  test("eigenvalue is the Rayleigh quotient of a unit vector") {
    val cov = Array(Array(4.0, 1.0), Array(1.0, 2.0))
    val (v, eig) = Pca.powerIteration(cov, iters = 50)
    val nrm = math.sqrt(v(0) * v(0) + v(1) * v(1))
    assert(math.abs(nrm - 1.0) < 1e-12)
    // analytic top eigenvalue of [[4,1],[1,2]] = 3 + sqrt(2)
    assert(math.abs(eig - (3 + math.sqrt(2.0))) < 1e-9)
  }

  test("deflation recovers a planted second direction, orthogonal to the first") {
    // two independent planted axes: e0 with sd 10, e1 with sd 3, e2 noise
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(800)(Array(
      (rnd.nextGaussian() * 10).toFloat,
      (rnd.nextGaussian() * 3).toFloat,
      (rnd.nextGaussian() * 0.1).toFloat))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val r = Pca.topTwoComponents(spark, df, "embedding", d = 3, iters = 20)
      .collect().sortBy(_.getLong(0))
    val v1 = r.map(_.getDouble(1)); val v2 = r.map(_.getDouble(3))
    assert(math.abs(v1(0)) > 0.999, "first component ≈ ±e0")
    assert(math.abs(v2(1)) > 0.999, "second component ≈ ±e1")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"components orthogonal, dot=$dot")
    val e1 = r.head.getDouble(2); val e2 = r.head.getDouble(4)
    assert(e1 > e2 && e2 > 1.0, s"eigval order: $e1 > $e2")
    assert(r.forall(row => row.getDouble(2) == e1 && row.getDouble(4) == e2))
  }

  test("deterministic across partitionings (rounded stats)") {
    val rnd = new scala.util.Random(23)
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val a = Pca.topComponent(spark, df.repartition(1), "embedding", 8, iters = 5)
      .collect().map(_.toSeq).toSet
    val b = Pca.topComponent(spark, df.repartition(13), "embedding", 8, iters = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
