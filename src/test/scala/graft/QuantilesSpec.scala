package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def row(g: String, vals: Seq[Long], pcts: Seq[Int]): Map[String, Double] = {
    val df = vals.map(v => (g, v)).toDF("grp", "x")
    val r = Quantiles.byGroup(df, "grp", "x", pcts).collect().head
    pcts.map(p => s"p$p" -> r.getAs[Double](s"p$p")).toMap
  }

  test("hand-computed interpolation on 10,20,30,40") {
    val q = row("g", Seq(10L, 20L, 30L, 40L), Seq(0, 25, 50, 75, 90, 100))
    assert(q("p0") == 10.0)
    assert(q("p25") == 17.5)   // pos 0.75: 10 + 0.75·10
    assert(q("p50") == 25.0)   // pos 1.5:  20 + 0.5·10
    assert(q("p75") == 32.5)
    assert(q("p90") == 37.0)   // pos 2.7:  30 + 0.7·10
    assert(q("p100") == 40.0)  // lo = n−1: bracket degenerates to the max
  }

  test("single value: every percentile is that value") {
    val q = row("g", Seq(7L), Seq(25, 50, 90))
    assert(q.values.forall(_ == 7.0))
  }

  test("all-tied values are percentile-invariant to rank order") {
    val q = row("g", Seq(5L, 5L, 5L), Seq(25, 50, 75))
    assert(q.values.forall(_ == 5.0))
  }

  test("nulls are excluded; n counts survivors") {
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(3L)))
      .toDF("grp", "x")
    val r = Quantiles.byGroup(df, "grp", "x", Seq(50)).collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("p50") == 2.0)
  }

  test("groups are independent and match the built-in percentile") {
    val df = (1L to 101L).map(i => (s"g${i % 3}", i * 13 % 97))
      .toDF("grp", "x")
    val ours = Quantiles.byGroup(df, "grp", "x", Seq(25, 50, 90))
      .collect().map(r => r.getString(0) -> r).toMap
    val ref = df.groupBy(col("grp"))
      .agg(expr("percentile(x, 0.25)").as("p25"),
        expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, r) <- ref; p <- Seq("p25", "p50", "p90"))
      assert(math.abs(ours(g).getAs[Double](p) - r.getAs[Double](p)) < 1e-9,
        s"$g/$p")
  }

  test("one exchange: rank and count windows share the group partitioning") {
    val df = (1L to 500L).map(i => (s"g${i % 4}", i)).toDF("grp", "x")
    val plan = Quantiles.byGroup(df, "grp", "x", Seq(50))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 2, s"expected stacked windows + final agg, got $n exchanges:\n$plan")
  }
}
