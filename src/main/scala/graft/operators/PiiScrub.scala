package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: count and mask
  * email addresses, URLs, and IPv4 literals. Pure per-row regex
  * projection — codegen'd, zero shuffle, scan-speed at corpus scale.
  *
  * Patterns deliberately use only the regex subset with identical
  * semantics in Java (Spark) and RE2 (DuckDB/Go tooling): ASCII classes,
  * bounded quantifiers, `\b`, no backreferences/lookaround — so results
  * are reproducible across the engines a pipeline typically spans.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def urlCount(text: Column): Column = regexp_count(text, lit(UrlRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** Mask all three PII classes. URLs first (an email-shaped userinfo part
    * inside a URL is masked as part of the URL, not counted twice), then
    * emails, then bare IPs.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Per-document PII profile: counts + redacted length. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      df.columns.filterNot(_ == textCol).map(col) :+
        emailCount(col(textCol)).as("n_emails") :+
        urlCount(col(textCol)).as("n_urls") :+
        ipCount(col(textCol)).as("n_ips") :+
        length(redact(col(textCol))).as("redacted_len"): _*
    )
}
