package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkEnv
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef

/** Batch `transformWithState` executes against a real state store, whose
  * driver-side StateStoreCoordinator endpoint is normally created lazily
  * by the FIRST streaming query (`StreamingQueryManager`'s lazy val). A
  * purely-batch session never creates it, and the executor-side lookup
  * dies with `RpcEndpointNotFoundException: StateStoreCoordinator`. This
  * shim creates it idempotently (`forDriver` catches the already-exists
  * case) — it lives under `org.apache.spark.sql` because the coordinator
  * API is `private[sql]`, the [[ColumnBridge]] technique.
  */
object StateBridge {

  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.asInstanceOf[SparkSession].sessionState.conf
    StateStoreCoordinatorRef.forDriver(SparkEnv.get, conf)
    ()
  }
}
