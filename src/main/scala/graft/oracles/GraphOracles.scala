package graft.oracles

import graft.functions.Money
import graft.oracles.SharedCtes._

/** Generated DuckDB oracle replays: graph family (k-core, label
  * propagation).
  *
  * Moved verbatim out of SparkEntry.scala (r18 split); the
  * `SparkEntry.oracleSql` map keeps every `"q..." ->` key and
  * references these by name.
  */
private[graft] object GraphOracles {

  /** Generated replay of KCore.peel(k=2, rounds=8) over the shingle graph:
    * the peel unrolled round-per-CTE from the shared [[EdgesCte]] — the
    * oracle always runs the full round budget; the Spark side's fixpoint
    * early-exit is result-identical because peeling is monotone.
    */
  private[graft] lazy val KCoreOracleSql: String = {
    val K = 2; val R = 8
    // MATERIALIZED: DuckDB inlines plain CTEs, and each round references
    // the previous one twice — unmaterialized, the plan (and the scan of
    // documents.parquet) doubles per round until the fd limit blows
    val peels = (1 to R).flatMap { r =>
      Seq(
        s"kd$r AS (SELECT a, count(*) AS n FROM kb${r - 1} GROUP BY a)",
        s"kk$r AS MATERIALIZED (SELECT a FROM kd$r WHERE n >= $K)",
        s"kb$r AS MATERIALIZED (SELECT e.a, e.b FROM kb${r - 1} e " +
          s"JOIN kk$r x ON e.a = x.a JOIN kk$r y ON e.b = y.a)")
    }
    s"""$EdgesCte,
       |kb0 AS MATERIALIZED (SELECT a, b FROM bi),
       |${peels.mkString(",\n")}
       |SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
       |FROM kb$R GROUP BY a""".stripMargin
  }

  /** Generated replay of LabelPropagation.communities(rounds = 3) over the
    * shingle graph — one MATERIALIZED CTE per synchronous round; the
    * arg-max (most frequent neighbor label, smallest label on ties) is a
    * (c DESC, label ASC) row_number, mirroring max(struct(c, −label)).
    */
  private[graft] lazy val LpaOracleSql: String = {
    val R = 3
    val rounds = (1 to R).map { r =>
      s"""l$r AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |           row_number() OVER (PARTITION BY node
         |                              ORDER BY c DESC, label ASC) AS rn
         |    FROM (SELECT e.a AS node, l.label, count(*) AS c
         |          FROM bi e JOIN l${r - 1} l ON l.node = e.b
         |          GROUP BY e.a, l.label))
         |  WHERE rn = 1)"""
    }.mkString(",\n")
    s"""$EdgesCte,
       |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM bi),
       |$rounds
       |SELECT node, label AS community FROM l$R""".stripMargin
  }
}
