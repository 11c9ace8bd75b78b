package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MultipleTesting

/** BH step-up invariants on constructed groups plus normal-tail accuracy
  * of the Zelen–Severo polynomial against known Φ values.
  */
final class MultipleTestingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normSf matches known normal tail probabilities to 7.5e-8") {
    val known = Seq(0.0 -> 0.5, 1.0 -> 0.15865525393145707,
      1.959963984540054 -> 0.024999999999999998, 3.0 -> 0.0013498980316300933)
    val df = known.map(_._1).toDF("x")
      .select(col("x"), MultipleTesting.normSf(col("x")).as("sf"))
      .as[(Double, Double)].collect().toMap
    known.foreach { case (x, want) =>
      assert(math.abs(df(x) - want) < 7.5e-8, s"sf($x)")
    }
  }

  test("an extreme group is rejected, matched groups are not") {
    // g_hot: mean 1000; eight matched groups around mean 100
    val rows =
      (0 until 40).map(i => ("g_hot", 1000L + (i % 5))) ++
        (for (g <- 0 until 8; i <- 0 until 40)
          yield (s"g$g", 95L + ((i + g) % 11)))
    val out = MultipleTesting.bhBySource(rows.toDF("src", "y"), "src", "y", 50000L)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    val byG = out.map(r => r._1 -> r).toMap
    assert(byG("g_hot")._7, "extreme group must be rejected")
    // the shift is so large the two-sided p underflows the e6 quantum
    assert(byG("g_hot")._4 === 0L)
    // ranks are a permutation of 1..m and m_tests is consistent
    val m = out.head._6
    assert(out.map(_._5).sorted.toSeq === (1L to m).toSeq)
    assert(out.length.toLong === m)
  }

  test("BH step-up: rejections are exactly ranks <= kstar") {
    val rows = (0 until 40).map(i => ("a", 500L + i % 3)) ++
      (0 until 40).map(i => ("b", 100L + i % 3)) ++
      (0 until 40).map(i => ("c", 101L + i % 3))
    val out = MultipleTesting.bhBySource(rows.toDF("src", "y"), "src", "y", 50000L)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    val kstar = out.filter(r => r._4 * r._6 <= 50000L * r._5).map(_._5)
      .reduceOption(_ max _).getOrElse(0L)
    out.foreach(r => assert(r._7 === (r._5 <= kstar)))
  }

  test("groups below n = 2 are excluded from the family") {
    val rows = Seq(("solo", 7L)) ++ (0 until 10).map(i => ("a", 10L + i)) ++
      (0 until 10).map(i => ("b", 20L + i))
    val out = MultipleTesting.bhBySource(rows.toDF("src", "y"), "src", "y", 50000L)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(!out.exists(_._1 == "solo"))
    assert(out.forall(_._6 === out.length.toLong))
  }
}
