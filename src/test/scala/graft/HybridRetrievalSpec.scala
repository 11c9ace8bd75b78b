package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridRetrieval

/** RRF fusion contract: a duplicate of the probe tops both lists and wins
  * the fusion; reported scores are self-consistent with reported ranks;
  * the fixture run produces full contiguous top-k lists.
  */
final class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a near-duplicate of the probe ranks first with both ranks = 1") {
    import spark.implicits._
    val texts = Seq(
      0L -> "spark join filter window batch merge",
      1L -> "table scan hash group agg sort",
      2L -> "stream key value row column part",
      3L -> "fast slow big small data query",
      4L -> "vector order customer line dup the",
      5L -> "unrelated words entirely different tokens here",
      6L -> "spark join filter window batch merge", // = doc 0
      7L -> "spark join something else entirely now",
      8L -> "filter window plus other following words",
      9L -> "batch merge and trailing nonsense words")
    val docs = texts.toDF("doc_id", "text")
    // embeddings: basis-ish vectors; vec 6 = vec 0 exactly
    val emb = (0L to 9L).map { i =>
      val v = Array.fill(8)(0.01f)
      v((if (i == 6L) 0L else i).toInt % 8) = 1.0f
      (i, v)
    }.toDF("vec_id", "embedding")
    val out = HybridRetrieval
      .fuseByExample(docs, emb, queryMax = 1L, candK = 5, topK = 3)
      .collect()
    val top = out.filter(r => r.getInt(1) == 1).head
    assert(top.getLong(2) === 6L)       // doc_id
    assert(top.getInt(4) === 1)         // lex_rank
    assert(top.getInt(5) === 1)         // dense_rank
  }

  test("fixture run: 5 probes, contiguous ranks, scores match reported ranks") {
    val t = sources.Tables(spark, "/root/testdata/sf0.001")
    val out = HybridRetrieval.fuseByExample(t.documents, t.embeddings).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L to 4L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to 10))
    }
    def c(r: Int): Double = if (r == 0) 0.0 else 1.0 / (60.0 + r)
    out.foreach { r =>
      val expect = math.floor((c(r.getInt(4)) + c(r.getInt(5))) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) === expect,
        s"rrf_score mismatch for ${r.getLong(0)}/${r.getLong(2)}")
    }
  }
}
