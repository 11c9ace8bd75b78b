package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.WordPieceSegment
import graft.operators.Multimodal

/** Seeded randomized fuzz over the round's JVM kernels — hundreds of
  * generated cases where the hand-picked specs have a dozen: the greedy
  * WordPiece kernel against an independent naive replica on random
  * words × random vocabularies, and the mp4 box walker's totality on
  * random bytes, random truncations, and random single-byte corruptions
  * of valid files. Fixed seed: failures reproduce.
  */
final class KernelFuzzSpec extends AnyFunSuite {

  private def naive(word: String, vocab: Set[String], maxPiece: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val L = (math.min(maxPiece, word.length - pos) to 1 by -1).find { l =>
        val cand =
          if (pos == 0) word.substring(0, l) else "##" + word.substring(pos, pos + l)
        vocab.contains(cand)
      }.getOrElse(return Seq(WordPieceSegment.Unk))
      out += (if (pos == 0) word.substring(0, L) else "##" + word.substring(pos, pos + L))
      pos += L
    }
    out.result()
  }

  private def kernel(word: String, vocab: Set[String], maxPiece: Int): Seq[String] = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    val arr = WordPieceSegment.segmentKernel(UTF8String.fromString(word), set, maxPiece)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("wordpiece kernel ≡ naive on 500 random (word, vocab) cases incl. [UNK] paths") {
    val rng = new scala.util.Random(4217)
    val alphabet = "abcd"
    for (_ <- 1 to 500) {
      val word = Seq.fill(rng.nextInt(13))(alphabet(rng.nextInt(alphabet.length))).mkString
      // random vocab over the alphabet's substrings, both forms, ~half kept
      // (deliberately NOT guaranteeing coverage, so [UNK] paths fuzz too)
      val pieces = for {
        l <- 1 to 4
        s <- alphabet.combinations(l).flatMap(_.permutations).map(_.mkString).toSeq
        form <- Seq(s, "##" + s)
        if rng.nextBoolean()
      } yield form
      val vocab = pieces.toSet
      assert(kernel(word, vocab, 4) === naive(word, vocab, 4),
        s"word '$word' vocab ${vocab.toSeq.sorted.take(20)}...")
    }
  }

  test("mp4 walker is total on 300 random byte blobs") {
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 300) {
      val bytes = new Array[Byte](rng.nextInt(200))
      rng.nextBytes(bytes)
      Multimodal.parseMp4Meta(bytes) // must not throw
    }
  }

  test("mp4 walker is total on every truncation and 200 single-byte corruptions") {
    val full = Multimodal.synthMp4("mp42", 600L, 1200L, 320, 240)
    for (n <- 0 to full.length)
      Multimodal.parseMp4Meta(full.take(n)) // must not throw
    val rng = new scala.util.Random(7)
    var parsedSome = false
    for (_ <- 1 to 200) {
      val b = full.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      val r = Multimodal.parseMp4Meta(b) // must not throw
      parsedSome ||= r.isDefined
    }
    // corruptions in zero-padding still parse — the walker isn't rejecting
    // everything outright
    assert(parsedSome)
  }

  /** Naive clipped multiset intersection over generated gram lists. */
  private def naiveClipped(a: Seq[String], b: Seq[String]): Long = {
    val ca = a.groupBy(identity).view.mapValues(_.size)
    val cb = b.groupBy(identity).view.mapValues(_.size).toMap
    ca.map { case (g, n) => math.min(n, cb.getOrElse(g, 0)).toLong }.sum
  }

  private def naiveWords(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def grams(toks: Seq[String], n: Int): Seq[String] =
    if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq

  private def cpGrams(s: String, n: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) Seq.empty
    else (0 to cps.length - n).map(i => new String(cps, i, n))
  }

  test("overlap kernels ≡ naive clipped counts on 400 random unicode pairs") {
    val rng = new scala.util.Random(20260816)
    // alphabet mixes ASCII, a combining accent, CJK, and a supplementary
    // code point so the char kernel's code-point walk fuzzes for real
    val alphabet = Seq("a", "b", "ab", "é", "́", "日", new String(Character.toChars(0x1D11E)), " ", "\t")
    def randText(): String =
      Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 400) {
      val (c, r) = (randText(), randText())
      val wk = graft.expressions.OverlapKernels.wordKernel(
        UTF8String.fromString(c), UTF8String.fromString(r))
      val (ct, rt) = (naiveWords(c), naiveWords(r))
      assert(wk.getLong(0) === ct.length.toLong, s"nc for '$c'")
      assert(wk.getLong(1) === rt.length.toLong, s"nr for '$r'")
      for (n <- 1 to 4)
        assert(wk.getLong(1 + n) === naiveClipped(grams(ct, n), grams(rt, n)),
          s"word m$n for '$c' vs '$r'")
      val ck = graft.expressions.OverlapKernels.charKernel(
        UTF8String.fromString(c), UTF8String.fromString(r))
      val (cs, rs) = (ct.mkString, rt.mkString)
      for (n <- 1 to 6)
        assert(ck.getLong(1 + n) === naiveClipped(cpGrams(cs, n), cpGrams(rs, n)),
          s"char m$n for '$c' vs '$r'")
    }
  }
}
