package graft.politeness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-host politeness state evolution — the deterministic re-expression of
  * the reference RateLimiter (/root/reference/crawl4ai/async_dispatcher.py:
  * 26-83): on 429/503 the delay doubles (reference multiplies by
  * 2·U(0.75,1.25); we pin the jitter to its mean 1.0 — documented
  * divergence, SURVEY.md §7.4.4) capped at `maxDelay`, and fail_count
  * increments; on success the delay decays ×0.75 floored at `baseDelay`
  * (reference floors at U(1,3); we pin 2.0, the mean). A host whose
  * fail_count exceeds `maxRetries` is marked aborted
  * (async_dispatcher.py:246-258).
  *
  * One `groupBy(host)` per epoch over the fetch results + a join-back —
  * the whole politeness layer is two narrow-column shuffles.
  */
object DomainState {

  val BaseDelay = 2.0 // midpoint of the reference's U(1,3)
  val MaxDelay = 60.0
  val MaxRetries = 3

  /** Evolve domain state from one epoch's fetch results.
    *
    * @param states  (host, current_delay, fail_count) — may be empty
    * @param results (host, status_code) one row per fetch
    * @return        (host, current_delay, fail_count, aborted)
    */
  def evolve(states: DataFrame, results: DataFrame): DataFrame = {
    val perHost = results
      .groupBy("host")
      .agg(
        sum(when(col("status_code").isin(429, 503), 1).otherwise(0)).as("throttles"),
        sum(when(col("status_code") === 200, 1).otherwise(0)).as("successes"))
    // FULL outer join: a host absent from this epoch's results (idle — e.g.
    // an aborted host whose budget is 0 and therefore never fetches) keeps
    // its state unchanged, exactly like the reference RateLimiter, which
    // only mutates per-domain state when that domain produces a response
    // (async_dispatcher.py:63-83). A left join would resurrect aborted hosts
    // at the full static budget after one idle epoch.
    val joined = perHost.join(states, Seq("host"), "full")
      .withColumn("prev_delay", coalesce(col("current_delay"), lit(BaseDelay)))
      .withColumn("prev_fails", coalesce(col("fail_count"), lit(0)))
    joined
      .withColumn("current_delay",
        when(col("throttles").isNull, col("prev_delay")) // idle: carry forward
          .when(col("throttles") > 0,
            least(col("prev_delay") * 2.0, lit(MaxDelay)))
          .otherwise(greatest(lit(BaseDelay), col("prev_delay") * 0.75)))
      .withColumn("fail_count",
        when(col("throttles").isNull, col("prev_fails")) // idle: carry forward
          .when(col("throttles") > 0, col("prev_fails") + 1)
          .when(col("successes") > 0, lit(0))
          .otherwise(col("prev_fails")))
      .withColumn("aborted", col("fail_count") > MaxRetries)
      .select("host", "current_delay", "fail_count", "aborted")
  }

  /** Per-epoch host budget from the evolved delay: fetches per epoch =
    * epochSeconds / current_delay (min 1 unless aborted) — how the
    * wall-clock rate limit becomes admission control in batch semantics
    * (SURVEY.md §2.5).
    */
  def hostBudget(states: DataFrame, epochSeconds: Double = 60.0): DataFrame =
    states.select(col("host"),
      when(col("aborted"), 0)
        .otherwise(greatest(lit(1),
          floor(lit(epochSeconds) / col("current_delay")).cast("int")))
        .as("budget"))
}
