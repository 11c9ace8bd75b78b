package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the Deequ idea (Schelter et al.,
  * VLDB 2018, "Automating Large-Scale Data Quality Verification"): declare
  * a battery of constraints against a table, evaluate them all in ONE
  * aggregation pass, and emit a per-constraint report row instead of
  * failing fast.
  *
  * The one-pass shape is the scale story: at 100 TB you cannot afford a
  * scan per constraint, so every violation predicate becomes a conditional
  * sum and every uniqueness check a (count − countDistinct) inside a
  * SINGLE `agg` — Catalyst fuses them into one whole-stage-codegen'd scan.
  * Only referential-integrity checks need a join (anti-join against the
  * parent key set), and those are emitted as separate report rows.
  *
  * Report schema: (check_name, n_bad, n_total, bad_micros, passed) with
  * bad_micros = ⌊10⁶·n_bad/n_total⌋ — exact integer arithmetic, no float
  * fraction to drift cross-engine.
  */
object DataQuality {

  /** Violation-predicate checks (`(name, isViolation)`) and non-null
    * uniqueness checks over one frame, all in a single aggregate →
    * (check_name, n_bad, n_total) — one row per constraint.
    */
  def report(
      df: DataFrame,
      checks: Seq[(String, Column)],
      uniqueCols: Seq[String] = Nil
  ): DataFrame = {
    require(checks.nonEmpty || uniqueCols.nonEmpty, "declare at least one constraint")
    // check names become intermediate column names; restrict to identifier
    // characters so a dotted name fails HERE with a clear message instead
    // of as a struct-field resolution error downstream
    (checks.map(_._1) ++ uniqueCols).foreach { n =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"constraint name '$n' must match [A-Za-z0-9_]+")
    }
    // duplicate names would alias two v_<name> aggregate columns and only
    // fail later as an ambiguous-column AnalysisException — fail fast here
    val allNames = checks.map(_._1) ++ uniqueCols
    require(allNames.distinct.size == allNames.size,
      s"constraint names must be unique, got: ${allNames.mkString(", ")}")
    val aggs: Seq[Column] =
      checks.map { case (n, pred) =>
        // coalesce: sum over an EMPTY frame is null, and an empty
        // partition must report 0 violations, not crash the consumer
        coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"v_$n")
      } ++
        uniqueCols.map { c =>
          (count(col(c)) - countDistinct(col(c))).as(s"u_$c")
        } :+ count(lit(1)).as("n_total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs =
      checks.map { case (n, _) =>
        struct(lit(n).as("check_name"), col(s"v_$n").cast("long").as("n_bad"))
      } ++
        uniqueCols.map { c =>
          struct(lit(s"unique_$c").as("check_name"), col(s"u_$c").cast("long").as("n_bad"))
        }
    one
      .select(explode(array(pairs: _*)).as("kv"), col("n_total"))
      .select(col("kv.check_name").as("check_name"), col("kv.n_bad").as("n_bad"),
        col("n_total"))
  }

  /** Referential integrity: non-null child keys with no matching parent
    * key. Anti-join against the DISTINCT parent key set — the one
    * constraint class that cannot be a conditional sum.
    */
  def fkViolations(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      name: String
  ): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_total"))
    val bad = child.select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    bad.crossJoin(broadcast(total))
      .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))
  }

  /** Attach the integer-exact violation fraction and the pass verdict.
    * An empty checked frame (n_total = 0) reports 0 bad_micros instead of
    * tripping ANSI division-by-zero — verifying a possibly-empty
    * partition must report, not crash.
    */
  def finish(rows: DataFrame): DataFrame =
    rows.select(
      col("check_name"), col("n_bad"), col("n_total"),
      when(col("n_total") === 0L, 0L)
        .otherwise(expr("n_bad * 1000000 DIV n_total")).as("bad_micros"),
      (col("n_bad") === 0L).as("passed"))
}
