package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PiiScrub

class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(text: String): (Int, Int, Int, Int) =
    PiiScrub.profile(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"n_emails", $"n_urls", $"n_ips", $"redacted_len")
      .as[(Int, Int, Int, Int)].head()

  test("counts each PII class") {
    val (e, u, ip, _) = profile(
      "mail a.user+tag@sub.example.org or b@x.io, see https://a.b/c?d=1 and http://plain.com, host 192.168.0.1 and 10.0.0.255.")
    assert(e == 2)
    assert(u == 2)
    assert(ip == 2)
  }

  test("redaction masks all classes; clean text untouched") {
    val redacted = PiiScrub.redact(org.apache.spark.sql.functions.lit(
      "write x@y.de via http://z.org/a from 1.2.3.4 done"))
    val got = Seq(1).toDF("i").select(redacted.as("r")).as[String].head()
    assert(got == "write <EMAIL> via <URL> from <IP> done")
    val (e, u, ip, len) = profile("no pii here at all")
    assert((e, u, ip) == ((0, 0, 0)))
    assert(len == "no pii here at all".length)
  }

  test("email inside a URL is masked once as the URL") {
    val got = Seq(1).toDF("i").select(
      PiiScrub.redact(org.apache.spark.sql.functions.lit(
        "ftp at http://user@host.com/path end")).as("r")).as[String].head()
    assert(got == "ftp at <URL> end")
  }

  test("profile is a zero-shuffle projection") {
    val plan = PiiScrub.profile(Seq((1L, "x")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- extended battery: phones + Luhn-gated cards ----

  private def profile2(text: String): (Int, Int, Int, Int) =
    PiiScrub.profile2(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"n_phones", $"n_card_candidates", $"n_cards_valid", $"redacted_len")
      .as[(Int, Int, Int, Int)].head()

  test("Luhn separates valid from invalid card numbers") {
    // 4532015112830366 is a classic valid test PAN; flipping the check
    // digit must fail; a 13-digit run is still a candidate
    val (ph, cand, valid, _) = profile2(
      "pay 4532015112830366 or 4532015112830367 maybe 4222222222222")
    assert(ph == 0)
    assert(cand == 3)
    assert(valid == 2) // 4532015112830366 and 4222222222222 both pass Luhn
  }

  test("phone detection and redaction") {
    val (ph, cand, valid, _) = profile2("call (555) 555-0123 or (01) 99 nope")
    assert((ph, cand, valid) == ((1, 0, 0)))
    val got = Seq(1).toDF("i").select(
      PiiScrub.redact2(org.apache.spark.sql.functions.lit(
        "call (555) 555-0123 card 4532015112830366 end")).as("r")).as[String].head()
    assert(got == "call <PHONE> card <CARD> end")
  }

  test("digit runs outside 13-19 digits are not card candidates") {
    val (_, cand, valid, _) = profile2(
      "short 123456789012 long 12345678901234567890")
    assert(cand == 0)
    assert(valid == 0)
  }

  test("profile2 is a zero-shuffle projection") {
    val plan = PiiScrub.profile2(Seq((1L, "x")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
