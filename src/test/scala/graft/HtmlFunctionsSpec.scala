package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlFunctions

class HtmlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(HtmlFunctions.stripTags($"h")).collect()(0).getString(0)

  test("strip: tags to spaces, script/style subtrees dropped, entities decoded") {
    val html = "<html><head><style>h1 { color: &red }</style></head>" +
      "<body><h1>Title</h1><p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
      "<script>if (1 < 2) { alert(\"</p>\"); }</script>tail</body></html>"
    assert(strip(html) == "Title a & b <tag> \"q\" 's' end tail")
  }

  test("strip: &amp; decodes last so double-escapes round-trip literally") {
    assert(strip("<p>&amp;lt;</p>") == "&lt;")
  }

  test("strip: multi-line whitespace collapses to single spaces") {
    assert(strip("<p>a\n\n  b\tc\r\n</p>") == "a b c")
  }

  test("anchorHrefs: document order, quoted values only") {
    val html = "<a href=\"http://a/1\">x</a><img src=\"i.png\"/><a class=\"z\" " +
      "href=\"http://b/2?q=1\">y</a>"
    val got = Seq(html).toDF("h").select(HtmlFunctions.anchorHrefs($"h"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("http://a/1", "http://b/2?q=1"))
  }
}
