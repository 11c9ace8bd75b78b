package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("tokenCount handles empty, multi-space, and mixed case") {
    assert(one("", TextFunctions.tokenCount($"text")) == 0)
    assert(one("  hello   world  ", TextFunctions.tokenCount($"text")) == 2)
    assert(one("The THE the", TextFunctions.stopwordCount($"text")) == 3)
  }

  test("quality score bounded in [0,1], low for junk, high for prose") {
    val junk = one("!!! ??? ..", TextFunctions.qualityScore($"text")).asInstanceOf[Double]
    val prose = one(
      ("the quick brown fox jumps over the lazy dog and it runs to the barn in the morning " * 4),
      TextFunctions.qualityScore($"text")).asInstanceOf[Double]
    assert(junk >= 0.0 && junk <= 1.0 && prose >= 0.0 && prose <= 1.0)
    assert(prose > junk)
  }

  test("charEntropy: closed forms, garbage ordering, empty text") {
    def ent(s: String): Double =
      one(s, TextFunctions.charEntropyFromChars(TextFunctions.chars($"text")))
        .asInstanceOf[Double]
    assert(ent("") == 0.0)
    assert(ent("aaaa") == 0.0)                      // single symbol → -0.0 normalized
    assert(math.abs(ent("abab") - 1.0) < 1e-12)     // two equiprobable symbols
    assert(math.abs(ent("abcdabcd") - 2.0) < 1e-12) // four equiprobable symbols
    // driver replica on arbitrary text
    val s = "the quick brown fox jumps over the lazy dog"
    val counts = s.groupBy(identity).view.mapValues(_.length).values
    val exp = -counts.map { c =>
      val p = c.toDouble / s.length; p * (math.log(p) / math.log(2))
    }.sum
    assert(math.abs(ent(s) - exp) < 1e-9)
    // repetitive garbage scores below prose; base64-ish noise above it
    assert(ent("spam spam spam spam spam spam") < ent(s))
    assert(ent("q8Zf3kT9mWx2Lp0vYb7cRj5nHd4gA1eU6sIo") > ent(s))
  }

  test("langId detects obvious languages and CJK") {
    assert(one("the cat is in the house and it is warm", TextFunctions.langId($"text")) == "en")
    assert(one("el perro es grande y la casa es bonita en un lugar", TextFunctions.langId($"text")) == "es")
    assert(one("der hund ist groß und die katze ist nicht klein", TextFunctions.langId($"text")) == "de")
    assert(one("le chat est dans la maison et les chiens sont dans une cour", TextFunctions.langId($"text")) == "fr")
    assert(one("你好世界", TextFunctions.langId($"text")) == "zh")
    assert(one("zzz qqq xxx", TextFunctions.langId($"text")) == "und")
  }

  test("fingerprint: whitespace-insensitive, order-sensitive, deterministic") {
    def fp(s: String) = one(s, TextFunctions.fingerprint($"text"))
    assert(fp("hello world foo") == fp("  hello   world  foo "))
    assert(fp("hello world foo") != fp("foo world hello"))
    assert(fp("hello world foo") == fp("hello world foo"))
  }

  test("fingerprint native kernel matches the aggregate-HOF spelling") {
    val texts = Seq("", "one", "hello world foo", "The QUICK brown   fox",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val df = texts.toDF("text").select(
      TextFunctions.fingerprint($"text").as("native"),
      TextFunctions.fingerprintHof($"text").as("hof"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("portable fingerprint matches closed-form md5 arithmetic and stays order-sensitive") {
    def ref(s: String): Long = {
      val toks = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val P = 2147483629L
      toks.foldLeft(0L) { (acc, t) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        (acc * 31 + java.lang.Long.parseLong(hex.substring(0, 12), 16) % P) % P
      }
    }
    val texts = Seq("", "one", "hello world foo", "foo world hello",
      "The QUICK brown   fox")
    texts.foreach { t =>
      assert(one(t, TextFunctions.fingerprintPortable($"text")) == ref(t), s"text=<$t>")
    }
    assert(ref("hello world foo") != ref("foo world hello"))
  }

  test("langId tie goes to the alphabetically earlier language") {
    assert(one("que une", TextFunctions.langId($"text")) == "fr") // que∈es,fr; une∈fr → fr=2 > es=1
    assert(one("el le", TextFunctions.langId($"text")) == "es")   // el∈es, le∈fr: 1–1 tie → es
  }
}
