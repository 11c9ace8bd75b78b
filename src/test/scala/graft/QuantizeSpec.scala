package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Similarity}
import graft.sources.Tables

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables(spark, TestSpark.Sf0001).embeddings

  test("codes clamp to [-127,127], extreme element hits ±127, error ≤ scale/2") {
    val q = Quantize.withInt8(emb, "embedding")
      .select($"vec_id", $"embedding", $"q_scale", $"q_codes",
        Quantize.dequantize($"q_codes", $"q_scale").as("deq"))
      .as[(Long, Seq[Float], Double, Seq[Int], Seq[Double])].collect()
    assert(q.nonEmpty)
    q.foreach { case (id, v, s, codes, deq) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id")
      assert(codes.exists(c => math.abs(c) == 127), s"vec $id has no extreme code")
      v.zip(deq).foreach { case (x, xh) =>
        assert(math.abs(x.toDouble - xh) <= s / 2 + 1e-9, s"vec $id elem $x -> $xh")
      }
    }
  }

  test("zero vector quantizes to scale 0 and all-zero codes") {
    val z = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Quantize.withInt8(z, "embedding")
      .select($"q_scale", $"q_codes").as[(Double, Seq[Int])].collect().head
    assert(got._1 == 0.0 && got._2.forall(_ == 0))
  }

  test("quantized kNN keeps high recall against the exact top-10") {
    val exact = Similarity.windowedKnn(emb.filter($"vec_id" < 20), emb, k = 10, window = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val qemb = Quantize.withInt8(emb, "embedding").select($"vec_id", $"q_codes")
    val quant = Similarity.windowedKnn(qemb.filter($"vec_id" < 20), qemb,
      k = 10, window = 100, vecCol = "q_codes")
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = exact.keys.toSeq.map { qid =>
      val e = exact(qid).map(_._2).toSet
      val g = quant.getOrElse(qid, Array.empty[(Long, Long)]).map(_._2).toSet
      e.intersect(g).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean top-10 recall under int8: $mean")
  }
}
