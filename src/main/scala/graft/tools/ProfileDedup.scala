package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of the shingle-edge dedup family
  * (optimization-round forensics; no production caller).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, shufflePartitions = 32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val docs = Tables(spark, dir).documents
      time("shingle explode only") {
        noop(docs.select(col("doc_id"),
          explode(graft.operators.Dedup.shingles(col("text"))).as("sh")))
      }
      hygiene()
      time("posting lists (groupBy sh)") {
        noop(Tables(spark, dir).documents
          .select(col("doc_id"), explode(graft.operators.Dedup.shingles(col("text"))).as("sh"))
          .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("docs"))
          .filter(size(col("docs")) <= 20))
      }
      hygiene()
      time("edges weighted (full)") {
        noop(graft.queries.QueryHelpers.shingleEdgesWeighted(Tables(spark, dir).documents))
      }
      hygiene()
      time("components over edges") {
        noop(graft.operators.Components.connectedComponents(
          graft.queries.QueryHelpers.shingleEdges(Tables(spark, dir).documents)))
      }
      hygiene()
      time("q_dedup_components (full query)") {
        noop(graft.SparkEntry.queries("q_dedup_components")(spark, dir))
      }
      hygiene()
      time("q_dedup_keep_best (full query)") {
        noop(graft.SparkEntry.queries("q_dedup_keep_best")(spark, dir))
      }
      hygiene()
    }
    spark.stop()
  }
}
