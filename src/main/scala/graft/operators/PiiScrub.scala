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

  // ---- extended detectors: phone numbers + Luhn-checked payment cards ----

  /** North-American display-format phone: `(NNN) NNN-NNNN`. Kept to the
    * unambiguous parenthesised form — bare 10-digit runs collide with the
    * card-candidate detector below and with ids/timestamps in real corpora.
    */
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"

  /** Payment-card candidate: a bare 13–19-digit run (ISO/IEC 7812 PAN
    * lengths). Candidates are then gated by the Luhn checksum — a digit
    * run alone is far too noisy to redact at corpus scale.
    */
  val CardCandidateRe = "\\b\\d{13,19}\\b"

  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Luhn (mod-10) checksum over a digit string: rightmost digit has
    * weight 1, every second digit leftwards is doubled with digit-sum
    * (2d > 9 → 2d − 9). Pure integer HOF fold — codegen'd, zero shuffle,
    * and spelled identically in the DuckDB oracle.
    */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc: Column, i: Column) => {
        val d = substring(c, i, lit(1)).cast("int")
        val weighted = when(pmod(n - i, lit(2)) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + weighted
      })
    pmod(total, lit(10)) === 0
  }

  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit(CardCandidateRe), lit(0))

  def validCardCount(text: Column): Column =
    size(filter(cardCandidates(text), luhnValid _))

  /** Mask phones and ALL card candidates (valid or not — a 16-digit run
    * that fails Luhn is still not trainable text). Cards first: a card
    * number never contains a parenthesised phone, so order only matters
    * for determinism.
    */
  def redact2(text: Column): Column =
    regexp_replace(
      regexp_replace(text, CardCandidateRe, "<CARD>"),
      PhoneRe, "<PHONE>")

  /** Extended per-document PII profile: phone + card detection with the
    * Luhn gate separating candidates from confirmed card numbers.
    */
  def profile2(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      df.columns.filterNot(_ == textCol).map(col) :+
        phoneCount(col(textCol)).as("n_phones") :+
        size(cardCandidates(col(textCol))).as("n_card_candidates") :+
        validCardCount(col(textCol)).as("n_cards_valid") :+
        length(redact2(col(textCol))).as("redacted_len"): _*
    )
}
