package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unimax
import graft.sources.Tables

class UnimaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def allocMap(rows: Array[org.apache.spark.sql.Row]): Map[String, Long] =
    rows.map(r => r.getString(0) -> r.getLong(3)).toMap

  test("hand-computed waterfill: caps bind on the small sources, residual to the big one") {
    // sizes 10/20/100, maxEpochs 2 -> caps 20/40/200; budget 100:
    // A capped (20*3=60<=100), B capped at the boundary (40*2=80<=80),
    // C takes the residual 40
    val df = Seq.tabulate(10)(i => ("A", 1L)) ++
      Seq.tabulate(10)(i => ("B", 2L)) ++ Seq.tabulate(10)(i => ("C", 10L))
    val a = allocMap(Unimax.allocate(df.toDF("source", "n_chars"), budget = 100L, maxEpochs = 2).collect())
    assert(a == Map("A" -> 20L, "B" -> 40L, "C" -> 40L))
  }

  test("no caps bind: uniform share with the remainder to the first source") {
    // sizes 10/10/10, maxEpochs 1, budget 25: 25/3 = 8 rem 1 -> 9/8/8
    val df = (Seq.fill(10)("A") ++ Seq.fill(10)("B") ++ Seq.fill(10)("C")).map((_, 1L))
    val a = allocMap(Unimax.allocate(df.toDF("source", "n_chars"), budget = 25L, maxEpochs = 1).collect())
    assert(a == Map("A" -> 9L, "B" -> 8L, "C" -> 8L))
  }

  test("budget above total cap: every source capped, budget unmet") {
    val df = (Seq.fill(5)("A") ++ Seq.fill(10)("B")).map((_, 1L))
    val a = allocMap(Unimax.allocate(df.toDF("source", "n_chars"), budget = 1000L, maxEpochs = 2).collect())
    assert(a == Map("A" -> 10L, "B" -> 20L))
  }

  test("zero budget allocates zero everywhere") {
    val df = (Seq.fill(5)("A") ++ Seq.fill(5)("B")).map((_, 1L)).toDF("source", "n_chars")
    val a = allocMap(Unimax.allocate(df, budget = 0L, maxEpochs = 2).collect())
    assert(a == Map("A" -> 0L, "B" -> 0L))
  }

  test("invariants on the real corpus: sum = min(B, sum cap), alloc <= cap, fairness") {
    val docs = Tables(spark, TestSpark.Sf0001).documents
    val total = docs.agg(sum($"n_chars".cast("long"))).collect()(0).getLong(0)
    val out = Unimax.allocate(docs, budget = total, maxEpochs = 2).collect()
    val capSum = out.map(_.getLong(2)).sum
    assert(out.map(_.getLong(3)).sum == math.min(total, capSum))
    out.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
    // uncapped sources (alloc < cap) differ by at most 1
    val uncapped = out.filter(r => r.getLong(3) < r.getLong(2)).map(_.getLong(3))
    if (uncapped.nonEmpty) assert(uncapped.max - uncapped.min <= 1)
  }
}
