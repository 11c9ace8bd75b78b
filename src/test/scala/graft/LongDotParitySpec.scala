package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class LongDotParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("kernel ≡ HOF on values, nulls, mismatched lengths, empties") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] =
      (1L to 300L).map { i =>
        def vec(n: Int) = Some((1 to n).map(_ =>
          if (rnd.nextInt(50) == 0) None else Some(rnd.nextInt(2000000) - 1000000L)))
        i.toInt % 10 match {
          case 0 => (i, None, vec(8))                       // null array
          case 1 => (i, vec(8), None)
          case 2 => (i, vec(8), vec(5))                     // length mismatch
          case 3 => (i, vec(0), vec(0))                     // both empty
          case _ => (i, vec(8), vec(8))
        }
      }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorFunctions.dotLong(col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .as[(Long, Option[Long], Option[Long])].collect()
    out.foreach { case (id, k, h) => assert(k == h, s"row $id: kernel $k vs hof $h") }
    // the classes actually exercised: nulls, mismatches and empties present
    val m = out.map(o => o._1 % 10 -> o._2).toMap
    assert(m(0L).isEmpty && m(2L).isEmpty && m(3L).contains(0L))
  }

  test("overflow raises (ANSI Multiply parity), does not wrap") {
    val df = Seq((1L, Seq(Long.MaxValue / 2, Long.MaxValue / 2), Seq(4L, 4L)))
      .toDF("id", "a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dotLong(col("a"), col("b"))).collect()
    }
    assert(e.toString.toLowerCase.contains("overflow")
      || Option(e.getCause).exists(_.toString.toLowerCase.contains("overflow")), e.toString)
  }

  test("self-dot ≡ the self-fold norm spelling") {
    val df = (1L to 50L)
      .map(i => (i, (1 to 16).map(j => (i * j % 997) - 500)))
      .toDF("id", "x")
    val out = df.select(
        VectorFunctions.dotLong(col("x"), col("x")).as("k"),
        aggregate(col("x"), lit(0L), (acc, v) => acc + v * v).as("h"))
      .as[(Long, Long)].collect()
    out.foreach { case (k, h) => assert(k == h) }
  }
}
