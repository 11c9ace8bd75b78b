package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracles.{OracleEntriesA, OracleEntriesB, OracleEntriesC, OracleEntriesD, OracleEntriesE, OracleEntriesF, OracleEntriesG}
import graft.queries.{QueriesCore, QueriesDedup, QueriesMultimodal, QueriesRelational, QueriesSeries, QueriesText, QueriesVector}
import graft.queries.QueryHelpers.sessionFeatures

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator (or operator pipeline) from the
  * SURVEY §2 inventory or the training-data-pipeline extension set; entries
  * with a deterministic relational meaning also appear in `oracleSql` as
  * ANSI SQL that DuckDB runs over the same parquet tables. Column names are
  * aligned on both sides (the driver's compare sorts columns by name).
  *
  * The map BODIES live in `graft.queries.Queries*` (builders, split by
  * domain) and `graft.oracles.OracleEntries*` (oracle SQL, ordered
  * sections) with the generated-oracle constants in the
  * `graft.oracles.*Oracles` domain objects — the r18 split of the former
  * 10.5k-line single file. Keys stay with their values; this object is the
  * stable driver entry point, and `scripts/gen_query_inventory.py` scans
  * the section files in concatenation order.
  */
object SparkEntry {

  def entry(spark: SparkSession): DataFrame =
    sessionFeatures(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.entries ++
    QueriesRelational.entries ++
    QueriesText.entries ++
    QueriesDedup.entries ++
    QueriesVector.entries ++
    QueriesMultimodal.entries ++
    QueriesSeries.entries

  def oracleSql: Map[String, String] =
    OracleEntriesA.entries ++ OracleEntriesB.entries ++
    OracleEntriesC.entries ++ OracleEntriesD.entries ++
    OracleEntriesE.entries ++ OracleEntriesF.entries ++
    OracleEntriesG.entries
}
