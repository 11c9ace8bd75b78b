package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unbiased pass@k estimation (Chen et al. 2021, HumanEval eq. 1) — the
  * standard eval statistic for "given n attempts of which c succeeded,
  * what's P(≥1 success in k random draws)": 1 − C(n−c, k)/C(n, k). Eval
  * pipelines aggregate this over thousands of tasks; here a "task" is a
  * user's event history and a success is a purchase event, so the whole
  * statistic is a pure function of the events table.
  *
  * The estimator is spelled as the telescoped product
  * Π_{i=0..k−1} (n−c−i)/(n−i) — unrolled per fixed k as a left-associated
  * double chain (both engines multiply in the same order), never a
  * factorial (no overflow at any n). Per-task estimates quantize to e6
  * micros before the mean so the cross-partition sum is an exact BIGINT.
  *
  * Scale shape: one grouped count per task + a zero-shuffle projection
  * per k + one tiny final aggregation — no joins, no state.
  */
object PassAtK {

  val DefaultKs: Seq[Int] = Seq(1, 5, 10)

  /** The event type that counts as a success — shared with the generated
    * oracle (EvalOracles) so the two sides cannot disagree by construction.
    */
  val DefaultSuccessType: String = "purchase"

  /** Per-task (n, c) attempt/success counts. */
  def taskCounts(events: DataFrame, successType: String = DefaultSuccessType): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === successType, 1L).otherwise(0L)).as("c"))

  /** 1 − Π_{i=0..k−1} (n−c−i)/(n−i) for one literal k; exactly 1 when
    * n − c < k (C(n−c,k) = 0 — too few failures to fill a k-draw).
    */
  def estimateCol(n: Column, c: Column, k: Int): Column = {
    val prod = (0 until k)
      .map(i => (n - c - lit(i)).cast("double") / (n - lit(i)).cast("double"))
      .reduce(_ * _)
    when(n - c < k, lit(1.0)).otherwise(lit(1.0) - prod)
  }

  /** Mean pass@k over all tasks with n ≥ k, one row per k. ONE scan and
    * ONE aggregate for every k (per-k union branches would re-scan the
    * events table |ks| times); the k rows unfold from the single
    * aggregate row with a literal-array explode.
    */
  def passAtK(events: DataFrame, ks: Seq[Int] = DefaultKs): DataFrame = {
    val tasks = taskCounts(events)
    val aggs = ks.flatMap { k =>
      val eligible = col("n") >= k
      Seq(
        sum(when(eligible, 1L)).as(s"nt_$k"),
        sum(when(eligible,
          floor(estimateCol(col("n"), col("c"), k) * lit(1000000.0) + lit(0.5))
            .cast("long"))).as(s"sp_$k"))
    }
    tasks.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ks.map { k =>
        struct(lit(k).as("k"),
          coalesce(col(s"nt_$k"), lit(0L)).as("n_tasks"),
          coalesce(col(s"sp_$k"), lit(0L)).as("sp"))
      }: _*)).as("s"))
      .select(col("s.k").as("k"), col("s.n_tasks").as("n_tasks"),
        when(col("s.n_tasks") === 0, lit(0.0))
          .otherwise(round(col("s.sp").cast("double") / col("s.n_tasks").cast("double") / lit(1000000.0), 6))
          .as("avg_pass"))
  }
}
