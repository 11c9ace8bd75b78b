package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the URL-level first pass of
  * a pretraining pipeline (RefinedWeb §3.1 / C4 dedup by URL): tracking
  * parameters make byte-distinct URLs that name the same resource, so
  * exact-URL dedup under-merges unless URLs canonicalize first.
  *
  * Canonical form: lowercase scheme and host, fragment dropped, tracking
  * parameters removed (`utm_*` prefix + the fbclid/gclid/ref click ids),
  * remaining query parameters SORTED (binary order), trailing slashes
  * stripped from the path (path case is preserved — paths are
  * case-sensitive by spec, hosts are not).
  *
  * Spelled entirely with literal-delimiter splits and HOFs — no regex, so
  * the DuckDB oracle twin (split_part / list_filter / list_sort) is exact
  * by construction; everything is a zero-shuffle codegen-friendly
  * projection.
  */
object UrlFunctions {

  /** Query-parameter prefixes stripped by [[canonicalize]]. */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "fbclid=", "gclid=", "ref=")

  /** The canonical URL (see object doc). Assumes a well-formed absolute
    * URL with a single `?`; malformed inputs degrade gracefully (missing
    * parts canonicalize as empty).
    */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"), substring_index(noFrag, "?", -1)).otherwise(lit(""))
    val scheme = substring_index(base, "://", 1)
    val rest = substring_index(base, "://", -1)
    val host = substring_index(rest, "/", 1)
    val path = rest.substr(length(host) + 1, lit(1048576))
    val kept = filter(split(query, "&"), p =>
      p =!= "" && TrackingPrefixes.map(t => !p.startsWith(t)).reduce(_ && _))
    val sortedQ = array_join(array_sort(kept), "&")
    concat(
      lower(scheme), lit("://"), lower(host), rtrim(path, "/"),
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** The lowercase host of a URL (canonical or raw). */
  def host(url: Column): Column =
    lower(substring_index(substring_index(substring_index(url, "#", 1), "://", -1), "/", 1))
}
