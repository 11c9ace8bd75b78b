package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML text extraction for web corpora — the tag-strip + link-harvest
  * pass every C4/RefinedWeb-style pipeline runs before quality filtering
  * (the full readability/trafilatura tree walk needs an HTML parser; the
  * regex core below is the 90% that matters for TEXT corpora and is
  * exactly replayable in DuckDB's RE2).
  *
  * Regex discipline (cross-engine parity): only constructs Java regex and
  * RE2 share — `(?s)` dotall, lazy `.*?`, plain character classes. NEVER
  * `\s` (Java includes U+000B, RE2 doesn't — the TokensSql gotcha);
  * whitespace is the explicit `[ \t\n\r]` class. Entity decode is chained
  * literal `replace` — no regex at all. Everything is a zero-shuffle
  * projection.
  */
object HtmlFunctions {

  /** Visible text: drop script/style subtrees (lazy dotall blocks), strip
    * every remaining tag to a space, decode the five core entities +
    * `&nbsp;`, collapse runs of whitespace, trim. `&amp;` decodes LAST so
    * `&amp;lt;` round-trips to the literal `&lt;` (the standard order).
    */
  def stripTags(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** All double-quoted `href` values, document order. */
  def anchorHrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))
}
