package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expressions.PqKernels

class PqKernelsParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sqHof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  private def adcHof = (qtab: org.apache.spark.sql.Column, codes: org.apache.spark.sql.Column) =>
    aggregate(zip_with(qtab, codes, (tab, code) => element_at(tab, code + 1)),
      lit(0.0), (acc, x) => acc + x)

  test("double sqdist ≡ HOF bitwise on values, nulls, mismatches, empties") {
    val rnd = new scala.util.Random(31)
    val rows: Seq[(Long, Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])] =
      (1L to 300L).map { i =>
        def vec(n: Int) = Some((1 to n).map(_ =>
          if (rnd.nextInt(50) == 0) None
          else Some(rnd.nextDouble() * 2e6 - 1e6)))
        i.toInt % 10 match {
          case 0 => (i, None, vec(8))
          case 1 => (i, vec(8), None)
          case 2 => (i, vec(8), vec(5))
          case 3 => (i, vec(0), vec(0))
          case _ => (i, vec(8), vec(8))
        }
      }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        PqKernels.sq_dist_double(col("a"), col("b")).as("k"),
        sqHof(col("a"), col("b")).as("h"))
      .as[(Long, Option[Double], Option[Double])].collect()
    // BITWISE equality (same IEEE fold order), not approximate
    out.foreach { case (id, k, h) =>
      assert(k.map(java.lang.Double.doubleToRawLongBits)
        == h.map(java.lang.Double.doubleToRawLongBits), s"row $id: $k vs $h")
    }
    val m = out.map(o => o._1 % 10 -> o._2).toMap
    assert(m(0L).isEmpty && m(2L).isEmpty && m(3L).contains(0.0))
  }

  test("adc sum ≡ HOF bitwise on values, nulls, mismatches, empties") {
    val rnd = new scala.util.Random(37)
    def tab(k: Int) = (1 to k).map(_ => rnd.nextDouble() * 100.0)
    val rows: Seq[(Long, Option[Seq[Seq[Double]]], Option[Seq[Option[Int]]])] =
      (1L to 200L).map { i =>
        val m = 4; val k = 8
        i.toInt % 10 match {
          case 0 => (i, None, Some((1 to m).map(_ => Some(rnd.nextInt(k)))))
          case 1 => (i, Some((1 to m).map(_ => tab(k))), None)
          case 2 => (i, Some((1 to m).map(_ => tab(k))),           // mismatch
            Some((1 to (m - 1)).map(_ => Some(rnd.nextInt(k)))))
          case 3 => (i, Some(Seq.empty), Some(Seq.empty))          // both empty
          case 4 => (i, Some((1 to m).map(_ => tab(k))),           // null code
            Some((1 to m).map(j => if (j == 2) None else Some(rnd.nextInt(k)))))
          case _ => (i, Some((1 to m).map(_ => tab(k))),
            Some((1 to m).map(_ => Some(rnd.nextInt(k)))))
        }
      }
    val df = rows.toDF("id", "qtab", "codes")
    val out = df.select(col("id"),
        PqKernels.adc_sum(col("qtab"), col("codes")).as("k"),
        adcHof(col("qtab"), col("codes")).as("h"))
      .as[(Long, Option[Double], Option[Double])].collect()
    out.foreach { case (id, k, h) =>
      assert(k.map(java.lang.Double.doubleToRawLongBits)
        == h.map(java.lang.Double.doubleToRawLongBits), s"row $id: $k vs $h")
    }
    val m = out.map(o => o._1 % 10 -> o._2).toMap
    assert(m(0L).isEmpty && m(2L).isEmpty && m(4L).isEmpty && m(3L).contains(0.0))
  }

  test("adc sum: an out-of-range code throws (ANSI element_at parity)") {
    val df = Seq((1L, Seq(Seq(1.0, 2.0)), Seq(5))).toDF("id", "qtab", "codes")
    intercept[Exception] {
      df.select(PqKernels.adc_sum(col("qtab"), col("codes"))).collect()
    }
  }

  test("l2Distance still matches its HOF spelling bitwise") {
    val rnd = new scala.util.Random(41)
    val df = (1L to 100L)
      .map(i => (i, (1 to 16).map(_ => rnd.nextDouble() * 4 - 2),
        (1 to 16).map(_ => rnd.nextDouble() * 4 - 2)))
      .toDF("id", "a", "b")
    val hof = sqrt(aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
    val out = df.select(
        graft.functions.VectorFunctions.l2Distance(col("a"), col("b")).as("k"),
        hof.as("h"))
      .as[(Double, Double)].collect()
    out.foreach { case (k, h) =>
      assert(java.lang.Double.doubleToRawLongBits(k)
        == java.lang.Double.doubleToRawLongBits(h))
    }
  }
}
