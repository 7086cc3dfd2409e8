package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time-bounded stream-stream join — the streaming analog of the
  * engine's range/as-of lookup family (SURVEY.md §2.3 J9, ops/RangeJoin,
  * plans/AsOfJoin): enrich each left-stream row with the right-stream
  * rows that precede it on the same key within a bounded horizon.
  *
  * Both sides carry watermarks and the join condition carries an
  * explicit event-time range; together they let Spark derive a state
  * eviction bound — each side buffers only `watermark + horizon` of
  * data per key, regardless of stream length. Without the range
  * condition a stream-stream join must hold EVERY past row forever
  * (unbounded state), which is exactly the failure mode this operator
  * exists to avoid on a 100 TB/day feed.
  *
  * Inner semantics: a pair emits as soon as both rows have arrived (no
  * watermark wait); a right row older than the horizon never pairs.
  */
object StreamJoin {

  /** Join `left` to the `right` rows on the same `key` whose `rightTs`
    * falls in `[leftTs - horizonSec, leftTs]`. Works identically on
    * batch frames (same API, no watermark requirement) — the spec
    * asserts batch ≡ stream on interior data.
    *
    * `joinType` "inner" (default) or "left_outer": the outer form
    * null-pads a left row once the watermark proves no matching right
    * row can still arrive (right event times ≤ leftTs could match, so
    * the row finalizes when the watermark passes leftTs) — the
    * streaming spelling of an enrich-with-default lookup. */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftWm: String,
      right: DataFrame, rightTs: String, rightWm: String,
      key: String, horizonSec: Long, joinType: String = "inner"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, leftWm)
             else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, rightWm)
             else right).alias("r")
    l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") &&
          col(s"r.$rightTs") >= col(s"l.$leftTs") -
            expr(s"INTERVAL $horizonSec SECONDS"),
        joinType)
      .drop(col(s"r.$key"))
  }
}
