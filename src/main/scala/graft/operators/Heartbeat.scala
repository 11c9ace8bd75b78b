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

  /** On FIRST registration of `key`: run `touch` once now, then every
    * 30 min until JVM exit. Re-registration is a no-op — callers sit on
    * the query path, and a freshly (re)written artifact has a fresh mtime
    * anyway, so only the scheduled refresher is needed after the first
    * call. `touch` failures are swallowed — a heartbeat must never take
    * down the owning query.
    */
  def register(key: String)(touch: () => Unit): Unit =
    if (keys.add(key)) {
      try touch()
      catch { case _: Throwable => () }
      sched.scheduleAtFixedRate(
        () => try touch() catch { case _: Throwable => () },
        30, 30, java.util.concurrent.TimeUnit.MINUTES)
      ()
    }
}
