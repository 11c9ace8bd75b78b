package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S1: the reference's CSV clickstream source with an explicit schema
  * (reference infers — `inferSchema=True` at src/spark/preprocessing.py:32 —
  * which costs a full extra pass and mis-types event_time; SURVEY §1.2/§1.3
  * mandates explicit schemas in this engine).
  */
object Clickstream {

  /** Column layout per reference src/streaming/config.py:144-157. */
  val Schema: StructType = StructType(
    Seq(
      StructField("event_time", StringType),
      StructField("event_type", StringType),
      StructField("product_id", LongType),
      StructField("category_id", LongType),
      StructField("category_code", StringType),
      StructField("brand", StringType),
      StructField("price", DoubleType),
      StructField("user_id", LongType),
      StructField("user_session", StringType)
    )
  )

  /** Load + clean (P1): header CSV, explicit schema, categorical nulls →
    * 'unknown', and the `"yyyy-MM-dd HH:mm:ss UTC"` strings parsed to real
    * timestamps (the intended semantics the reference's batch plane silently
    * loses — SURVEY §1.2).
    */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .option("header", "true")
      .schema(Schema)
      .csv(path)
      .na.fill(Map("category_code" -> "unknown", "brand" -> "unknown"))
      .withColumn(
        "event_time",
        try_to_timestamp(col("event_time"), lit("yyyy-MM-dd HH:mm:ss 'UTC'"))
      )
  }
}
