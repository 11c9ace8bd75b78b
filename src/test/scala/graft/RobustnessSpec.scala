package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input totality: the text/media operators must not throw and
  * must keep their structural invariants on degenerate documents — empty,
  * whitespace-only, punctuation-only, unicode, single-char, and very long
  * inputs. The oracles only ever see the fixture corpus; this is the
  * guard for the inputs a real crawl WILL contain.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nasty = Seq(
    1L -> "",
    2L -> "   \t\n  ",
    3L -> "!!!???...,,,;;;",
    4L -> "a",
    5L -> "café naïve 日本語 emoji é́ mixed",
    6L -> ("lorem ipsum " * 2000).trim, // ~24k chars
    7L -> "UPPER lower MiXeD 123 456",
    8L -> "<p>unclosed <tag attr=\"v\" <nested>&amp;&unknown;</p>"
  )
  private def docs = nasty.toDF("doc_id", "text")

  test("winnowing: degenerate docs fingerprint without throwing; short docs drop") {
    val fps = graft.operators.Winnow.fingerprints(docs).collect()
    assert(fps.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 1))
    val ids = fps.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(4L),
      "docs below k normalized chars must contribute nothing")
    assert(ids.contains(6L))
  }

  test("html strip: malformed markup degrades to text, never throws") {
    val out = docs.select($"doc_id",
      graft.functions.HtmlFunctions.stripTags($"text").as("c")).collect()
    assert(out.length == nasty.length)
    val m = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "" && m(2L) == "")
    assert(m(8L).contains("unclosed") && !m(8L).contains("<p>"))
  }

  test("perceptual hash + media features: all-degenerate corpus hashes totally") {
    val media = graft.operators.Multimodal.toMediaTable(docs)
    val ph = graft.operators.Multimodal.phash(media).collect()
    assert(ph.length == nasty.length)
    ph.foreach(r => assert(r.getSeq[Int](2).forall(b => b >= 0 && b <= 0xFFFF)))
    val f = graft.operators.Multimodal.extractFeatures(media, dim = 8).collect()
    assert(f.length == nasty.length)
  }

  test("readability + distinct-n queries run on the degenerate corpus") {
    docs.createOrReplaceTempView("nasty_docs")
    val toks = graft.functions.TextFunctions.tokens($"text")
    val counts = docs.select($"doc_id", size(toks).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) == 0 && counts(2L) == 0)
    assert(counts(6L) == 4000)
    // gopher gates + quality scores are total on the same frame
    val g = graft.operators.GopherFilter.gates(docs).collect()
    assert(g.length == nasty.length)
  }

  test("wordpiece: degenerate corpus trains and encodes totally; population filter holds") {
    val wc = graft.operators.Vocab.wordCounts(docs)
    val vs = graft.operators.WordPiece.vocabSet(wc)
    val enc = graft.operators.WordPiece.encodeWords(wc, vs)
      .select($"word", $"pieces").as[(String, Seq[String])].collect()
    // the ASCII-no-# <=12-char population excludes unicode words and the
    // 24k-char doc's tokens are all "lorem"/"ipsum" (covered); every
    // surviving word segments without [UNK]
    enc.foreach { case (w, ps) =>
      assert(ps.nonEmpty && !ps.contains(graft.expressions.WordPieceSegment.Unk), w)
      val rt = ps.map(p => if (p.startsWith("##")) p.drop(2) else p).mkString
      assert(rt == w)
    }
    // kernel totality on inputs OUTSIDE the population (never reaches it
    // in the pipeline, but a direct caller may): unicode + empty
    val direct = Seq("日本語", "", "é́").toDF("w")
      .select(graft.expressions.WordPieceSegment.segment($"w", vs, 4).as("p"))
      .as[Seq[String]].collect()
    assert(direct(0) == Seq(graft.expressions.WordPieceSegment.Unk))
    assert(direct(1) == Seq.empty[String])
  }

  test("mp4 walker: text bytes, empty, and random binary all parse to None") {
    for (t <- nasty.map(_._2)) {
      assert(graft.operators.Multimodal.parseMp4Meta(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)) === None)
    }
    // bytes that START like an ftyp but truncate immediately
    val fakeFtyp = Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p', 'm', 'p')
    assert(graft.operators.Multimodal.parseMp4Meta(fakeFtyp) === None)
  }

  test("quantile sketch: groups smaller than k and single-value groups are exact") {
    val tiny = Seq(("a", 5L, 1L), ("a", 7L, 2L), ("b", 3L, 3L)).toDF("g", "v", "id")
    val out = graft.operators.QuantileSketch
      .sketchWithAudit(tiny, "g", "v", "id", k = 256, pcts = Seq(50))
      .as[(String, Int, Double, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._3 == 6.0d) // median of {5,7} interpolates exactly
    assert(out(1)._3 == 3.0d) // singleton group returns its value
  }

  test("unimax / length-buckets reject impossible shapes loudly, not wrongly") {
    // one distinct length < b buckets: fail fast with a clear message
    val one = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.operators.LengthBuckets.optimalBuckets(one, b = 4)
    }
    assert(e.getMessage.contains("distinct lengths"))
  }

  test("generation-eval metrics run totally on the degenerate corpus") {
    // pair the nasty docs with each other (0-based ids so pairs form),
    // including empty-vs-text, whitespace-only, punct-only, 24k-char,
    // and supplementary-plane pairs (code-point paths in the char kernel)
    val evalDocs = (nasty.zipWithIndex.map { case ((_, t), i) =>
      (i.toLong, s"src${i % 2}", t)
    } :+ ((nasty.size.toLong, "src0", "𝄞 clef 𝄞 music")))
      .toDF("doc_id", "source", "text")
    val bleu = graft.operators.Bleu.corpusBleu(evalDocs).collect()
    assert(bleu.forall { r =>
      val b = r.getAs[Double]("bleu"); b >= 0.0 && b <= 1.0
    })
    val chrf = graft.operators.Bleu.chrF(evalDocs).collect()
    assert(chrf.forall { r =>
      val f = r.getAs[Double]("avg_chrf2"); f >= 0.0 && f <= 1.0
    })
    val rouge = graft.operators.Bleu.rougeCorpus(evalDocs).collect()
    assert(rouge.forall { r =>
      val f = r.getAs[Double]("avg_f1"); f >= 0.0 && f <= 1.0
    })
  }

  test("char kernel counts supplementary-plane code points, not UTF-16 units") {
    import graft.expressions.OverlapKernels
    // "𝄞𝄞" is 2 code points / 4 UTF-16 units: nc must be 2
    val r = Seq(("𝄞𝄞", "𝄞x"))
      .toDF("c", "r")
      .select(OverlapKernels.charOverlap(org.apache.spark.sql.functions.col("c"),
        org.apache.spark.sql.functions.col("r")).as("ov"))
      .select("ov.nc", "ov.nr", "ov.m1").collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 1L) // one shared clef code point
  }

  test("agreement raters and kappa/alpha are total on degenerate docs") {
    val d = nasty.zipWithIndex.map { case ((_, t), i) =>
      (i.toLong, "xx", t, t.length.toLong)
    }.toDF("doc_id", "lang", "text", "n_chars")
    val kap = graft.operators.Agreement.fleissKappa(d).collect()
    assert(kap.nonEmpty && kap.forall(r => !r.isNullAt(r.fieldIndex("kappa"))))
    val alp = graft.operators.Agreement.krippendorffAlpha(d).collect()
    assert(alp.nonEmpty && alp.forall(r => !r.isNullAt(r.fieldIndex("alpha"))))
  }
}
