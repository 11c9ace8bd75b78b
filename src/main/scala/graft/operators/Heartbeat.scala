package graft.operators

/** JVM-wide daemon that keeps this session's on-disk layout artifacts
  * (bucketed warehouse tables, partitioned tmp dirs) visibly LIVE by
  * refreshing their mtimes every 30 minutes until the JVM exits.
  *
  * The stale-artifact sweeps ([[BucketedJoin]], [[PartitionedLayout]])
  * delete FOREIGN per-session directories cold for > 6h. Directory mtime
  * alone is not a liveness signal: a long-lived session holding a lazy
  * DataFrame over tables it wrote > 6h ago would have its files deleted
  * mid-plan by a concurrent session's sweep (r19 ADVICE). With a daemon
  * refresher, "mtime > 6h" really does mean the owning JVM is dead —
  * daemon threads die with the JVM, so a crashed session's artifacts go
  * cold and get swept, while an idle-but-alive session's never do.
  */
object Heartbeat {
  private val keys = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val sched =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-layout-heartbeat"); t.setDaemon(true); t
      })

  /** Run `touch` now and then every 30 min until JVM exit; idempotent per
    * `key` (re-registration only re-touches). `touch` failures are
    * swallowed — a heartbeat must never take down the owning query.
    */
  def register(key: String)(touch: () => Unit): Unit = {
    try touch()
    catch { case _: Throwable => () }
    if (keys.add(key)) {
      sched.scheduleAtFixedRate(
        () => try touch() catch { case _: Throwable => () },
        30, 30, java.util.concurrent.TimeUnit.MINUTES)
      ()
    }
  }
}
