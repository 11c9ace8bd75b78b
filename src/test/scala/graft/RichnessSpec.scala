package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Richness

class RichnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-traced spectrum: saturated vs open vocabulary") {
    val docs = Seq(
      // "sat": one word repeated — D=1, f1=0, f2=0 → chao1 = D, unseen 0
      ("sat", "aa aa aa aa aa aa"),
      // "open": all hapax — D=4, f1=4, f2=0 → chao1 = 4 + 4·3/2 = 10,
      // unseen = 4/4 = 1
      ("open", "p q r s"),
      // "mix": aa aa bb bb cc → D=3, f1=1, f2=2, N=5
      ("mix", "aa aa bb bb cc"))
    val got = Richness.bySource(docs.toDF("source", "text"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("sat") == (("sat", 6L, 1L, 0L, 0L, 1000000L, 0L)), got("sat"))
    assert(got("open") == (("open", 4L, 4L, 4L, 0L, 10000000L, 1000000L)), got("open"))
    // chao1 = 3 + 1·0/(2·3) = 3 exactly; unseen = 1/5
    assert(got("mix") == (("mix", 5L, 3L, 1L, 2L, 3000000L, 200000L)), got("mix"))
  }

  test("chao1 ≥ observed types; unseen mass in [0, 1]; deterministic") {
    val rnd = new scala.util.Random(31)
    val docs = (1 to 500).map { i =>
      (s"s${i % 3}", (1 to 20).map(_ => s"w${rnd.nextInt(i)}").mkString(" "))
    }
    def run(parts: Int) = Richness.bySource(
        docs.toDF("source", "text").repartition(parts))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(11) && a.size == 3)
    a.foreach { r =>
      assert(r._6 >= r._3 * 1000000L, s"chao1 below observed: $r")
      assert(r._7 >= 0L && r._7 <= 1000000L, s"unseen mass out of range: $r")
    }
  }
}
