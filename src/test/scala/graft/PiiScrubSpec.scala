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
}
