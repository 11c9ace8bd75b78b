package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Money

/** The micros money path must (a) agree with round(sum, 2) away from
  * rounding boundaries, (b) be invariant to partition layout — the property
  * the plain double sum lacks — and (c) round-trip through the DuckDB twin
  * (asserted end-to-end by local_verify on every money query; here we pin
  * the Spark-side semantics).
  */
class MoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sumOf(values: Seq[java.lang.Double], partitions: Int): Option[Double] = {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(Row(_)), partitions),
      T.StructType(Seq(T.StructField("v", T.DoubleType, nullable = true))))
    val r = df.agg(Money.moneySum($"v").as("s")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("matches round(sum, 2) on plain values") {
    val vals: Seq[java.lang.Double] = Seq(1.10, 2.25, 3.333333, 0.000001)
    val expected = BigDecimal(vals.map(BigDecimal(_)).sum.toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sumOf(vals, 1).contains(expected))
  }

  test("identical across partition layouts, including at half-cent boundaries") {
    val vals: Seq[java.lang.Double] = Seq(0.0025, 0.0025, 1.005, 2.995, -0.0049, 7.77)
    val results = Seq(1, 2, 3, 7).map(p => sumOf(vals, p))
    assert(results.distinct.size == 1, s"partition-dependent: $results")
  }

  test("null handling: nulls skipped; all-null group is null") {
    val vals: Seq[java.lang.Double] = Seq(1.0, null, 2.0)
    assert(sumOf(vals, 2).contains(3.0))
    assert(sumOf(Seq[java.lang.Double](null, null), 2).isEmpty)
  }

  test("negative totals round half away from zero like round(x, 2)") {
    val vals: Seq[java.lang.Double] = Seq(-1.005)
    assert(sumOf(vals, 1).contains(-1.0)) // -1.005 micros = -1005000 → +5000 → /10000 floor = -100 cents
  }
}
