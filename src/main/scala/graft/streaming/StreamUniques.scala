package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed DISTINCT counting — the §2.10 analog of
  * `q:w7_sliding_uniques`'s bucket stage: unique users per tumbling
  * window, as dedup-then-count. COUNT(DISTINCT) doesn't exist as a
  * streaming aggregate; the standard construction chains two stateful
  * operators — `dropDuplicates` on (key, window) collapses each user
  * to one row per window (state = one row per live (user, window),
  * expired by the watermark), and an ordinary windowed count above it
  * counts the survivors. Append mode: a window's count emits exactly
  * once, when the watermark passes its end — the same closed-window
  * contract as HourlyMicroBatch.
  */
object StreamUniques {

  /** @param events columns (user_id, ts); watermark/window sized like
    *               the batch operator's 15-min buckets */
  def uniquesPerWindow(events: DataFrame,
      windowLen: String = "15 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), window(col("ts"), windowLen).as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("uniq_users"))
      .select(col("w.start").as("window_start"), col("uniq_users"))
}
