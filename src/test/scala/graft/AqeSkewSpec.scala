package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the session's AQE skew-join handling (GraftSession.tune turns it
  * on for every query) actually ENGAGES: a join with one pathological hot
  * key gets its skewed partition split at runtime — the mechanism that
  * keeps a hot user/session key from pinning one executor at 100 TB. The
  * thresholds are lowered to make a local fixture skewed by AQE's
  * definition; the assertion is on the executed plan's skew markers, not
  * on timing.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one hot key triggers OptimizeSkewedJoin: the merge join runs skew=true") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // left: 200k rows on ONE key + a sprinkle of others; right: the dim
      val left = spark.range(0, 200000)
        .select(when(col("id") % 1000L === 0L, col("id") % 7L + 1L)
          .otherwise(lit(0L)).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = spark.range(0, 8).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      // NOTE: aggregate on something OTHER than the join key — a
      // downstream groupBy(k) would re-require hashpartitioning(k) and
      // AQE then refuses to split the skewed partition (it would have to
      // re-shuffle); a global aggregate leaves the split legal
      val joined = left.join(right.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // AQE re-plans at runtime — must execute
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot-key merge join skewed:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
