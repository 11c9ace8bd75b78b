package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimilarityJoin}

class SimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Mixed corpus: random word soups + near-duplicate mutations. */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("scan", "sort", "join", "hash", "merge", "key", "row",
      "batch", "query", "table", "group", "agg", "filter", "window", "spark")
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0L until 30L).map(i => (i, soup(25 + rnd.nextInt(10))))
    val mutants = bases.take(8).map { case (i, t) =>
      val toks = t.split(" ").toVector
      val k = rnd.nextInt(toks.size)
      (100L + i, toks.updated(k, "mutated").mkString(" "))
    }
    (bases ++ mutants).toDF("doc_id", "text")
  }

  private def naive(docs: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val sh = docs.select($"doc_id".as("id"), Dedup.shingles($"text").as("sh"))
    sh.as("x").join(sh.as("y"), $"y.id" > $"x.id")
      .select($"x.id", $"y.id", Dedup.jaccard($"x.sh", $"y.sh").as("j"))
      .filter($"j" >= t)
      .as[(Long, Long, Double)].collect().toSet
  }

  private def prefix(docs: DataFrame, t: Double): Set[(Long, Long, Double)] =
    SimilarityJoin.jaccardSelfJoin(docs, t)
      .as[(Long, Long, Double)].collect().toSet

  test("equals the naive all-pairs join at several thresholds") {
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val exp = naive(corpus, t)
      val got = prefix(corpus, t)
      assert(got == exp, s"threshold $t: prefix-filter != naive")
      if (t <= 0.6) assert(exp.nonEmpty, s"fixture produced no pairs at $t")
    }
  }

  test("a pair at exactly the threshold survives (boundary + ε-slack)") {
    // A/B share 2 of 4 distinct shingles: J = 2/4 = 0.5 exactly.
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5"),
      (2L, "t1 t2 t3 t4 u5"),
      (3L, "z1 z2 z3 z4 z5")).toDF("doc_id", "text")
    val got = prefix(docs, 0.5)
    assert(got == Set((1L, 2L, 0.5)))
  }

  test("no cartesian/nested-loop shape in the plan") {
    val plan = SimilarityJoin.jaccardSelfJoin(corpus, 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("rejects a non-positive or >1 threshold") {
    intercept[IllegalArgumentException] {
      SimilarityJoin.jaccardSelfJoin(corpus, 0.0)
    }
    intercept[IllegalArgumentException] {
      SimilarityJoin.jaccardSelfJoin(corpus, 1.5)
    }
  }
}
