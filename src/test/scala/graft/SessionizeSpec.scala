package graft

import graft.ops.Sessionize
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Session boundary semantics (strict-gap, microsecond precision,
  * per-key isolation) and the one-shuffle plan claim. */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: 3 events within gap, then a jump → sessions 1,1,1,2
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, 2L, ts("2024-01-01 10:10:00"), 2.0),
    (1L, 3L, ts("2024-01-01 10:40:00"), 3.0),
    (1L, 4L, ts("2024-01-01 12:00:00"), 4.0),
    // user 2: exactly gap-sized spacing stays ONE session (strict >)
    (2L, 5L, ts("2024-01-01 00:00:00"), 1.0),
    (2L, 6L, ts("2024-01-01 00:30:00"), 1.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("gap splits, exact-gap does not; numbering is per key") {
    val got = Sessionize
      .sessions(events, col("user_id"), col("ts"), col("event_id"), 1800)
      .select("event_id", "session_no").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("one microsecond over the gap splits") {
    val e = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:00:00"), 0.0),
      (1L, 2L, Timestamp.valueOf("2024-01-01 00:30:00.000001"), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Sessionize
      .sessions(e, col("user_id"), col("ts"), col("event_id"), 1800)
      .select("event_id", "session_no").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("sessionStats aggregates correctly and adds no second shuffle") {
    val stats = Sessionize.sessionStats(
      events, col("user_id"), col("ts"), col("event_id"), 1800, col("value"))
    val row = stats.filter(col("user_id") === 1 && col("session_no") === 1)
      .select("n_events", "total_value", "duration_sec")
      .as[(Long, Double, Long)].head()
    assert(row == ((3L, 6.0, 2400L)))

    // hash partitioning on user_id already clusters (user_id,
    // session_no): exactly one exchange in the whole plan
    val exchanges = "Exchange".r.findAllIn(stats.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, stats.queryExecution.executedPlan.toString)
  }
}
