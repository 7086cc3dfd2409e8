package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-sessionization — the Structured Streaming analog of
  * ops/Sessionize, via the built-in `session_window` aggregation:
  * stateful merging session windows, closed and emitted once the
  * watermark passes a session's end.
  *
  * Boundary semantics vs the batch operator: the batch formulation
  * starts a new session when a gap is STRICTLY greater than `gap`
  * (lag-based, microsecond-exact); `session_window` extends a session
  * by `[ts, ts + gap)` per event, so two events exactly `gap` apart
  * fall in SEPARATE sessions. Interior (non-boundary) inputs produce
  * identical sessions — StreamingSpec asserts the correspondence on
  * such data — and `session_end` here is `last_event + gap` (the
  * window's close), not the last event time.
  *
  * Scale: state per open session key, merged incrementally by the state
  * store; the watermark bounds state lifetime exactly as it bounds
  * lateness in the hourly pipeline (§2.10).
  */
object SessionStream {

  /** @param events streaming DataFrame with (user_id, ts, value)
    * @param gap       session gap, e.g. "30 minutes"
    * @param watermark allowed lateness, e.g. "10 minutes" */
  def sessionStats(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_close"),
        col("n_events"), col("total_value"))
}
