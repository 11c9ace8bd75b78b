package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FacilitySelect

class FacilitySelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replica(
      vecs: Seq[(Long, Seq[Float])], k: Int, candEvery: Int)
    : Seq[(Long, Long, Long, Long)] = {
    def xq(v: Seq[Float]) = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val q = vecs.map { case (id, v) => id -> xq(v) }
    def nrm(x: Seq[Long]) = x.map(a => a * a).sum
    val pairs = for {
      (v, vx) <- q
      (c, cx) <- q if c % candEvery == 0
      if nrm(vx) > 0 && nrm(cx) > 0
      dp = vx.zip(cx).map { case (a, b) => a * b }.sum
      s = math.floor(dp.toDouble / math.sqrt(nrm(vx).toDouble) /
            math.sqrt(nrm(cx).toDouble) * 1e6 + 0.5).toLong
      if s > 0
    } yield (v, c, s)
    var chosen = Vector.empty[(Long, Long)]
    (1 to k).foreach { _ =>
      val ids = chosen.map(_._1).toSet
      val best = pairs.filter(p => ids.contains(p._2))
        .groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
      val gains = pairs.filterNot(p => ids.contains(p._2))
        .groupBy(_._2).view.mapValues(
          _.map(p => math.max(p._3 - best.getOrElse(p._1, 0L), 0L)).sum).toMap
      if (gains.nonEmpty) {
        val (c, g) = gains.toSeq.minBy { case (c, g) => (-g, c) }
        chosen :+= (c, g)
      }
    }
    chosen.zipWithIndex.map { case ((c, g), i) =>
      (i + 1L, c, g, chosen.take(i + 1).map(_._2).sum)
    }
  }

  test("matches the driver replica; gains diminish; coverage telescopes") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map { id =>
      // three loose clusters in 4-d so the greedy order is non-trivial
      val base = Array.fill(4)(0.1f)
      base((id % 3).toInt) = 1.0f
      id -> base.toSeq.map(x => x + rnd.nextFloat() * 0.3f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = FacilitySelect.greedy(spark, df, k = 5, candEvery = 4, dims = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = replica(vecs, 5, 4)
    assert(got == want, s"\ngot  $got\nwant $want")
    // facility location is submodular: greedy marginal gains never increase
    got.map(_._3).sliding(2).foreach { case Seq(a, b) => assert(a >= b, s"$a < $b") }
    // coverage telescopes the gains and equals Σ_v max_{chosen} s exactly
    assert(got.last._4 == got.map(_._3).sum)
  }

  test("first pick maximizes single-set coverage; ties break to the smaller id") {
    // two identical candidates (0 and 4 same vector): round 1 must take 0;
    // round 2 gains nothing from 4 (fully shadowed) and takes 8 instead
    val a = Seq(1.0f, 0.0f)
    val b = Seq(0.0f, 1.0f)
    val vecs = Seq(0L -> a, 4L -> a, 8L -> b, 1L -> a, 2L -> a, 3L -> b)
    val got = FacilitySelect.greedy(spark, vecs.toDF("vec_id", "embedding"),
        k = 2, candEvery = 4, dims = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 == 0L, s"first pick ${got(0)}")
    assert(got(1)._2 == 8L, s"second pick ${got(1)}")
    // 4 docs at cos 1.0 with candidate 0 → gain 4e6; then the two b docs
    assert(got(0)._3 == 4000000L && got(1)._3 == 2000000L, s"${got.toSeq}")
  }

  test("deterministic across partitionings") {
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 100L).map(id => id -> Seq.fill(4)(rnd.nextFloat()))
    def run(parts: Int) = FacilitySelect.greedy(spark,
        vecs.toDF("vec_id", "embedding").repartition(parts),
        k = 4, candEvery = 8, dims = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }
}
