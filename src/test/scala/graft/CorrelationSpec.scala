package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Correlation

class CorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(vecs: Seq[Array[Float]], d: Int): Map[(Long, Long), Option[Double]] =
    Correlation.matrix(spark, vecs.map(Tuple1(_)).toDF("embedding"), "embedding", d)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("diagonal is 1; perfectly correlated and anti-correlated pairs hit ±1") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(100) {
      val t = rnd.nextGaussian().toFloat
      Array(t, 2f * t, -t, rnd.nextGaussian().toFloat)
    }
    val res = run(vecs, 4)
    assert(math.abs(res(0L -> 0L).get - 1.0) < 1e-6)
    assert(math.abs(res(0L -> 1L).get - 1.0) < 1e-4)
    assert(math.abs(res(0L -> 2L).get + 1.0) < 1e-4)
    assert(math.abs(res(0L -> 3L).get) < 0.3) // independent noise
  }

  test("matches a driver-side Pearson replica") {
    val rnd = new scala.util.Random(9)
    val vecs = Seq.fill(300)(Array.fill(3)(rnd.nextGaussian().toFloat))
    val res = run(vecs, 3)
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
      val va = a.map(x => (x - ma) * (x - ma)).sum / n
      val vb = b.map(y => (y - mb) * (y - mb)).sum / n
      cov / (math.sqrt(va) * math.sqrt(vb))
    }
    for (i <- 0 until 3; j <- i until 3) {
      val exp = pearson(vecs.map(_(i).toDouble), vecs.map(_(j).toDouble))
      assert(math.abs(res(i.toLong -> j.toLong).get - exp) < 1e-4, s"($i,$j)")
    }
  }

  test("a constant dimension yields null, never a division by zero") {
    val vecs = Seq.fill(50)(Array(1.0f, scala.util.Random.nextFloat()))
    val res = run(vecs, 2)
    assert(res(0L -> 0L).isEmpty)
    assert(res(0L -> 1L).isEmpty)
    assert(res(1L -> 1L).isDefined)
  }
}
