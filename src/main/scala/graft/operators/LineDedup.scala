package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document LINE dedup — the RefinedWeb/CCNet "line-wise correction"
  * pass (Penedo et al. 2023 §3.3; CCNet's paragraph dedup): a line that
  * appears in many distinct documents is boilerplate (cookie banners,
  * "subscribe" footers, nav menus) and is stripped from every document,
  * while document order and unique content are preserved. This is the
  * between-documents sibling of [[Repetition]]'s within-document filters
  * and [[Dedup]]'s whole-document hashing.
  *
  * Scale shape: one explode (linear in corpus bytes), ONE hash shuffle on
  * the line hash for the distinct-document counts, and for the strip a
  * hash join on the line hash plus one per-document regroup. Boilerplate
  * hashes are heavy keys by construction — AQE skew-join splits them (the
  * salted-join alternative is wired session-wide). No driver state: the
  * frequent-line table stays distributed.
  */
object LineDedup {

  /** One row per line: `(id, idx, line, h)` — original position, raw
    * line, and the md5 of the TRIMMED line (the dedup key; leading and
    * trailing whitespace doesn't make boilerplate unique).
    */
  def lines(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .withColumn("h", md5(trim(col("line"))))

  /** Lines appearing in ≥ `minDocs` DISTINCT documents (empty lines never
    * count): `(h, n_docs)`. Distinctness matters — a line repeated inside
    * one document is within-doc repetition ([[Repetition]]'s job), not
    * corpus boilerplate.
    */
  def frequentLines(lineRows: DataFrame, minDocs: Long): DataFrame =
    lineRows
      .filter(trim(col("line")) =!= "")
      .groupBy(col("h"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Strip boilerplate lines from every document:
    * `(id, n_lines, n_dropped, clean_text)` — kept lines rejoin with \n in
    * original order; a fully-boilerplate document keeps an empty string.
    */
  def stripBoilerplate(
      docs: DataFrame,
      minDocs: Long,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val ls = lines(docs, idCol, textCol)
    val freq = frequentLines(ls, minDocs).select(col("h"), lit(true).as("_boiler"))
    val kept: Column = when(col("_boiler").isNull, struct(col("idx"), col("line")))
    ls
      .join(freq, Seq("h"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("_boiler")).as("n_dropped"),
        // collect_list skips the null (dropped) entries; array_sort on the
        // (idx, line) struct restores original order — idx is unique per
        // doc, so the sort is total and partition-order-free
        array_join(
          transform(array_sort(collect_list(kept)), s => s.getField("line")),
          "\n").as("clean_text"))
      .select(col("id").as(idCol), col("n_lines"), col("n_dropped"), col("clean_text"))
  }
}
