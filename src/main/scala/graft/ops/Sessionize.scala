package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch formulation of the classic
  * streaming session window (the reference's scheduling is tumbling
  * micro-batch only, /root/reference/dags/etl/fact_gold_price.py:35,
  * §2.10; session semantics are part of the beyond-reference analytics
  * surface, SURVEY.md §7.5).
  *
  * A session is a maximal run of a key's events where consecutive
  * events are ≤ `gap` apart; an event more than `gap` after its
  * predecessor starts a new session. Computed with one keyed window:
  * lag() marks session starts, a running sum numbers them — the
  * standard two-window formulation, one shuffle on the key.
  *
  * Scale: everything is partitioned by the session key; the window sort
  * is per-key and spills via Spark's external sorter. A follow-up
  * `groupBy(key, session_no)` needs NO second shuffle: hash
  * partitioning on `key` already clusters every (key, session_no)
  * group, and Catalyst's EnsureRequirements recognizes the subset
  * partitioning (asserted in SessionizeSpec).
  */
object Sessionize {

  /** Adds `session_no` (1-based per key, in time order) to `events`.
    *
    * @param events  input rows
    * @param keyCol  session key (e.g. user_id)
    * @param tsCol   event-time timestamp column
    * @param tieCol  unique tie-break for deterministic ordering of
    *                equal timestamps (e.g. event_id)
    * @param gapSec  max intra-session gap, seconds. The comparison is
    *                strict (`> gap` starts a session) on microsecond
    *                epochs, so sub-second precision is honored.
    */
  def sessions(
      events: DataFrame, keyCol: Column, tsCol: Column, tieCol: Column,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    events
      .withColumn("_prev_us", lag(unix_micros(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          unix_micros(tsCol) - col("_prev_us") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("_new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_us", "_new_session")
  }

  /** Per-session rollup: bounds, size, exact value total, duration.
    * One aggregate over [[sessions]] output — shuffle-free after the
    * sessionizing window (see class doc). */
  def sessionStats(
      events: DataFrame, keyCol: Column, tsCol: Column, tieCol: Column,
      gapSec: Long, valueCol: Column): DataFrame =
    sessions(events, keyCol, tsCol, tieCol, gapSec)
      .groupBy(keyCol, col("session_no"))
      .agg(
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Exact.dsum(valueCol).as("total_value"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000"))
}
