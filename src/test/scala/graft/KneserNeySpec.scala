package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KneserNey

class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // driver replica of the exact-BIGINT KN formulas (KneserNey scaladoc)
  private def replica(train: Seq[String], test: Seq[(Long, String)])
    : Map[Long, (Long, Long, Long)] = {
    def bigrams(s: String): Seq[(String, String)] = {
      val t = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      t.zip(t.drop(1))
    }
    val cb = train.flatMap(bigrams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nh = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nt = cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tT = cb.size.toLong
    test.flatMap { case (id, s) =>
      val bs = bigrams(s)
      if (bs.isEmpty) None
      else {
        val ls = bs.map { case (w1, w2) =>
          val (num, den) =
            if (cw.contains(w1))
              (math.max(4L * cb.getOrElse((w1, w2), 0L) - 3L, 0L) * tT
                 + 3L * nh(w1) * math.max(nt.getOrElse(w2, 0L), 1L),
               4L * cw(w1) * tT)
            else (math.max(nt.getOrElse(w2, 0L), 1L), tT)
          math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong
        }
        val sum = ls.sum
        Some(id -> (bs.size.toLong, sum,
          math.floor(sum.toDouble / bs.size).toLong))
      }
    }.toMap
  }

  test("matches the driver replica across all four backoff classes") {
    val train = Seq(
      "the cat sat on the mat",
      "the cat ran on the hill",
      "a dog sat on a mat",
      "the dog sat near the mat")
    // planted classes: seen bigram ("the cat"), unseen bigram with seen
    // context+tail ("cat mat"), unseen context ("zqx" head), unseen word
    // ("the zqx" tail), and a one-token doc (dropped: zero bigrams)
    val test = Seq(
      1L -> "the cat sat on the mat",
      2L -> "cat mat the zqx",
      3L -> "zqx the cat",
      4L -> "mat")
    val got = KneserNey.score(
        test.toDF("doc_id", "text"),
        train.zipWithIndex.map { case (s, i) => (100L + i, s) }.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = replica(train, test)
    assert(got.keySet == Set(1L, 2L, 3L), s"docs scored: ${got.keySet}")
    want.foreach { case (id, w) => assert(got(id) == w, s"doc $id: ${got(id)} vs $w") }
  }

  test("KN probabilities sum to exactly 1 over seen tails (rational identity)") {
    // with den = 4·c(w1)·T common, Σ_{seen tails} num = den must hold
    // EXACTLY — the discount mass D·N1+(w1·) flows entirely into the
    // continuation distribution, which sums to 1 over the tail types
    val train = Seq(
      "b a c a d a b c",
      "a b a c d b",
      "c c a b d")
    def bigrams(s: String) = {
      val t = s.split("\\s+").toSeq; t.zip(t.drop(1))
    }
    val cb = train.flatMap(bigrams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nh = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nt = cb.groupBy(_._1._2).view.mapValues(_.values.size.toLong).toMap
    val tT = cb.size.toLong
    cw.keys.foreach { w1 =>
      // .iterator: mapping over the keySet would COLLAPSE equal summands
      val sumNum = nt.keys.iterator.map { w2 =>
        math.max(4L * cb.getOrElse((w1, w2), 0L) - 3L, 0L) * tT +
          3L * nh(w1) * nt(w2)
      }.sum
      assert(sumNum == 4L * cw(w1) * tT, s"context $w1 mass $sumNum != ${4L * cw(w1) * tT}")
    }
  }

  test("deterministic across partitionings; seen text outscores gibberish") {
    val train = (1 to 50).map(i => (i.toLong, s"alpha beta gamma delta epsilon t$i"))
    val test = Seq(900L -> "alpha beta gamma delta", 901L -> "zz qq vv ww")
    def run(parts: Int) = KneserNey.score(
        test.toDF("doc_id", "text").repartition(parts),
        train.toDF("doc_id", "text").repartition(parts))
      .as[(Long, Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(7))
    val byId = a.map(r => r._1 -> r._4).toMap
    assert(byId(900L) > byId(901L), s"familiar text must outscore gibberish: $byId")
  }
}
