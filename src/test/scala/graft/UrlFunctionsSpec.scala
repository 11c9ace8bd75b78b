package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions

class UrlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(UrlFunctions.canonicalize($"url").as("c")).as[String].collect()(0)

  test("hand-pinned canonicalizations") {
    assert(canon("HTTPS://WWW.Example.COM/Path/To?utm_source=x&b=2&a=1#frag") ==
      "https://www.example.com/Path/To?a=1&b=2")
    assert(canon("http://host.com/") == "http://host.com")
    assert(canon("http://host.com/a/b/") == "http://host.com/a/b")
    assert(canon("http://host.com/a?fbclid=1&gclid=2&ref=3&utm_campaign=z") ==
      "http://host.com/a")
    assert(canon("http://Host.com/CaseKept?z=1&y=2") == "http://host.com/CaseKept?y=2&z=1")
    assert(canon("http://h.com") == "http://h.com") // no path, no query
  }

  test("canonical equality collapses tracking-only variants") {
    val variants = Seq(
      "http://a.com/x?id=7&utm_source=mail",
      "HTTP://A.COM/x?id=7",
      "http://a.com/x/?utm_campaign=c&id=7&fbclid=zz"
    ).toDF("url")
    val distinct = variants
      .select(UrlFunctions.canonicalize($"url").as("c")).distinct().count()
    assert(distinct == 1L)
  }

  test("host extraction") {
    val h = Seq("https://Sub.Host.org/a/b?q=1#f").toDF("url")
      .select(UrlFunctions.host($"url")).as[String].collect()(0)
    assert(h == "sub.host.org")
  }
}
