package graft

import org.apache.spark.sql.SparkSession

/** Session helpers shared by Verify / Bench / tests.
  *
  * The reference tunes its sessions at script level (8g driver,
  * shuffle.partitions=200 batch / 10 streaming, AQE + Kryo on the cluster —
  * reference: src/spark/preprocessing.py:17-25, src/streaming/config.py:77-85,
  * scripts/create_cluster.sh:42). We centralize the same knobs here, sized for
  * local[N] testing but with the cluster-scale settings (AQE, skew-join
  * handling) always on so the plans we test are the plans a 1000-executor
  * cluster would run.
  */
object GraftSession {

  /** Runtime SQL confs safe to apply to an existing session (everything here
    * is a dynamic SQLConf, not a static spark conf). Idempotent and cheap —
    * call before touching any table.
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    // AQE: runtime partition coalescing + skew-join splitting. At 100 TB the
    // skew handling is what keeps a hot user_session / join key from pinning
    // one executor; locally it is a no-op cost.
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // The driver-generated events table carries parquet TIMESTAMP(NANOS),
    // which Spark's vectorized reader rejects by default. Read the physical
    // int64 as a long (nanos since epoch); sources.Tables converts to a
    // proper TimestampType column.
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    registerFunctions(spark)
    spark
  }

  /** Expose the native sketch expressions to SQL (`SELECT graft_simhash64(text) …`). */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => graft.expressions.SimHash64(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig",
      exprs => graft.expressions.MinHashSig(exprs.head, 32, 3, 42L),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fingerprint64",
      exprs => graft.expressions.Fingerprint64(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_shingle_set",
      exprs => graft.expressions.ShingleSet(exprs.head, 3),
      "built-in")
  }

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4, shufflePartitions: Int = 8): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
  }
}
