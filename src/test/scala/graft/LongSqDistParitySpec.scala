package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class LongSqDistParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  test("kernel ≡ HOF on values, nulls, mismatched lengths, empties") {
    val rnd = new scala.util.Random(23)
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
        VectorFunctions.sqDistLong(col("a"), col("b")).as("k"),
        hof(col("a"), col("b")).as("h"))
      .as[(Long, Option[Long], Option[Long])].collect()
    out.foreach { case (id, k, h) => assert(k == h, s"row $id: kernel $k vs hof $h") }
    // the classes actually exercised: nulls, mismatches and empties present
    val m = out.map(o => o._1 % 10 -> o._2).toMap
    assert(m(0L).isEmpty && m(2L).isEmpty && m(3L).contains(0L))
  }

  test("overflow raises (ANSI Subtract/Multiply parity), does not wrap") {
    val df = Seq((1L, Seq(Long.MaxValue / 2), Seq(-(Long.MaxValue / 2))))
      .toDF("id", "a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.sqDistLong(col("a"), col("b"))).collect()
    }
    assert(e.toString.toLowerCase.contains("overflow")
      || Option(e.getCause).exists(_.toString.toLowerCase.contains("overflow")), e.toString)
  }

  test("identical arrays give 0; replay-loop shaped micros match the HOF") {
    val df = (1L to 50L)
      .map(i => (i, (1 to 64).map(j => (i * j % 997) * 1000L - 400000L)))
      .toDF("id", "x")
    val self = df.select(VectorFunctions.sqDistLong(col("x"), col("x")).as("k"))
      .as[Long].collect()
    self.foreach(v => assert(v == 0L))
    val shifted = df.select(
        VectorFunctions.sqDistLong(col("x"), transform(col("x"), e => e + 3L)).as("k"),
        hof(col("x"), transform(col("x"), e => e + 3L)).as("h"))
      .as[(Long, Long)].collect()
    shifted.foreach { case (k, h) => assert(k == h) }
  }
}
