package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchRollup

class SketchRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(24), rnd.nextInt(800).toLong)
    }.toDF("g", "h", "uid")
  }

  test("union of fine sketches tracks the direct coarse sketch within 2%") {
    // NOT exact: DataSketches sketches start in sparse coupon mode and get
    // promoted during union, shifting low-cardinality estimates sub-percent
    val fine = SketchRollup.sketchBy(df, Seq("g", "h"), "uid")
    val rolled = SketchRollup.rollupEstimate(fine, Seq("g"))
      .as[(String, Long)].collect().toMap
    val direct = df.groupBy($"g")
      .agg(hll_sketch_estimate(hll_sketch_agg($"uid")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(rolled.size == 3)
    direct.foreach { case (g, e) =>
      assert(math.abs(rolled(g) - e) <= math.max(2L, (0.02 * e).toLong),
        s"g=$g direct=$e rolled=${rolled(g)}")
    }
  }

  test("rollup estimates land within 5% of exact distinct counts") {
    val fine = SketchRollup.sketchBy(df, Seq("g", "h"), "uid")
    val rolled = SketchRollup.rollupEstimate(fine, Seq("g"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy($"g").agg(countDistinct($"uid").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(rolled(g) - n) <= math.max(2L, (0.05 * n).toLong),
        s"g=$g exact=$n approx=${rolled(g)}")
    }
    val total = SketchRollup.totalEstimate(fine).as[Long].collect().head
    val exactTotal = df.select(countDistinct($"uid")).as[Long].collect().head
    assert(math.abs(total - exactTotal) <= math.max(2L, (0.05 * exactTotal).toLong))
  }

  test("partitioning moves estimates by at most the sparse-promotion margin (2%)") {
    val fine1 = SketchRollup.sketchBy(df.repartition(1), Seq("g", "h"), "uid")
    val fine8 = SketchRollup.sketchBy(df.repartition(8), Seq("g", "h"), "uid")
    val a = SketchRollup.rollupEstimate(fine1, Seq("g")).as[(String, Long)].collect().toMap
    val b = SketchRollup.rollupEstimate(fine8, Seq("g")).as[(String, Long)].collect().toMap
    a.foreach { case (g, e) =>
      assert(math.abs(b(g) - e) <= math.max(2L, (0.02 * e).toLong), s"g=$g $e vs ${b(g)}")
    }
  }
}
