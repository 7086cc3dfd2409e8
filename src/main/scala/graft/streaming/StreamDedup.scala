package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingest form of the
  * batch `x_dedup_exact` operator (queries/Text): a firehose of
  * documents where re-crawls and mirror copies arrive minutes-to-hours
  * apart and only the first copy may pass downstream.
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per content
  * hash and expires it once the event-time watermark passes the row's
  * time plus the horizon — so state is bounded by the horizon's ingest
  * volume, not the stream's lifetime (the unbounded-state trap of plain
  * `dropDuplicates` on an infinite stream). A duplicate arriving inside
  * the horizon is suppressed; the first row of each hash emits exactly
  * once, immediately (append mode, no window close to wait for).
  *
  * The dedup key is the same engine-portable construction as the batch
  * operator (md5 of lowercased text), so a corpus deduplicated by the
  * stream and one deduplicated by the batch query agree on which
  * content survives.
  */
object StreamDedup {

  /** @param docs     streaming DataFrame with `text` and an event-time
    *                  column
    * @param tsCol    event-time column name
    * @param horizon  watermark delay AND dedup-state lifetime, e.g.
    *                  "10 minutes"
    * @return first-arrival rows only, with their `content_hash`
    */
  def firstArrivals(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("content_hash", md5(lower(col("text"))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
