package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftSession, SparkEntry}

/** §7.5(e): the benchmark-harness parity of the reference's
  * `benchmarks/compare_frameworks.py:136-189` — run the same query two ways,
  * check the results agree, print a winner table. Here the two "frameworks"
  * are the two spellings of the first-purchase computation: W1 (partition
  * window, one shuffle) vs J1 (aggregate + left join, two shuffles).
  *
  *   runMain graft.cli.CompareSpellings [sfDir]
  */
object CompareSpellings {

  final case class Result(name: String, seconds: Double, rows: Long)

  def time(name: String, df: => DataFrame): Result = {
    val t0 = System.nanoTime()
    val frame = df
    frame.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    Result(name, secs, frame.count())
  }

  def run(spark: SparkSession, sfDir: String): Seq[Result] = {
    GraftSession.tune(spark)
    val window = time("W1 window spelling", SparkEntry.queries("q_session_features")(spark, sfDir))
    val join = time("J1 join spelling", SparkEntry.queries("q_session_features_join")(spark, sfDir))
    require(window.rows == join.rows, s"spellings disagree: ${window.rows} vs ${join.rows}")
    Seq(window, join)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-compare").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark, sfDir)
    val winner = results.minBy(_.seconds)
    println(f"| spelling | seconds | rows |")
    println(f"|---|---|---|")
    results.foreach(r => println(f"| ${r.name} | ${r.seconds}%.3f | ${r.rows} |"))
    println(f"winner: ${winner.name} (${results.maxBy(_.seconds).seconds / winner.seconds}%.2fx)")
    spark.stop()
  }
}
