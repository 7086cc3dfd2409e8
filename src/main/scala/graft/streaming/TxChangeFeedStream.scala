package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming-NATIVE face of the change feed: [[TxChangeFeed]]
  * is a driver loop (justified there — an applyCdc-style consumer wants
  * the per-commit diff plan and its own cursor), which means watermarks,
  * windowed aggregates, and stateful operators cannot compose with it.
  * This module closes that gap with the FILE-SOURCE bridge the public
  * streaming systems use for exactly this shape (a CDC spool feeding a
  * streaming job): each commit's row-level diff is materialized once
  * into a spool directory — an append-only parquet log, one write per
  * commit, each row stamped with its `_commit_version` — and a genuine
  * `readStream` file source tails that spool. Everything downstream is
  * ordinary Structured Streaming: `withWatermark`, `window`/
  * `session_window` aggregates, stream-stream joins, `foreachBatch` —
  * none of which the driver-loop feed could host.
  *
  * Why a spool and not a custom V2 MicroBatchStream: the spool IS the
  * V2 source's offset log made visible — file names are the offsets,
  * the file source's own tracking provides exactly-once per file — with
  * none of the scaffolding, and it doubles as a replayable archive of
  * the feed (a late consumer replays from file 0 without touching the
  * table). Scale shape: spooling a commit costs the partitions that
  * commit touched (TxTable.diff's manifest pruning); the spool grows
  * with CHANGE volume, not table size, and is plain parquet — vacuum it
  * by age like any log directory.
  */
object TxChangeFeedStream {

  /** Drain every commit after `fromVersion` into the spool (one append
    * per commit, rows stamped with `_commit_version`) and return the
    * new cursor — the Trigger.AvailableNow half: call it on a cadence,
    * persist the cursor, and the spool stays an exact, ordered copy of
    * the feed. Idempotence contract is the cursor (same as
    * [[TxChangeFeed.drain]]): never re-spool a version already landed. */
  /** The stamp column is injected into every spooled row; a payload
    * already carrying the name would be silently overwritten — the same
    * reserved-name discipline as mirror/replicate's _op/_seq. */
  private def requireNoStampCollision(d: DataFrame): Unit =
    require(!d.columns.contains("_commit_version"),
      "change-feed payload carries reserved column _commit_version — rename it upstream")

  def spool(
      spark: SparkSession, dir: String, key: String,
      spoolDir: String, fromVersion: Long = 0L): Long = {
    var cursor = fromVersion
    TxChangeFeed.drain(spark, dir, key, fromVersion).foreach { case (v, d) =>
      requireNoStampCollision(d)
      d.withColumn("_commit_version", lit(v))
        .write.mode("append").parquet(spoolDir)
      cursor = v
    }
    cursor
  }

  /** Continuous tail into the spool — the processing-trigger half:
    * polls the commit log every `pollMs` (an O(1) tip probe) and
    * appends each new commit until `stop()`. Returns the final
    * cursor. */
  def followInto(
      spark: SparkSession, dir: String, key: String, spoolDir: String,
      fromVersion: Long, pollMs: Long, stop: () => Boolean): Long =
    TxChangeFeed.follow(spark, dir, key, fromVersion, pollMs, stop) {
      (v, d) =>
        requireNoStampCollision(d)
        d.withColumn("_commit_version", lit(v))
          .write.mode("append").parquet(spoolDir)
    }

  /** The streaming SOURCE over a spool: a real `readStream` the full
    * stateful-operator surface composes with. Schema is pinned from
    * the spooled files (file sources require an explicit schema) —
    * with mergeSchema, because a schema-widening commit's diff spools
    * the widened columns and a single-footer schema pick would
    * silently drop them from every streamed row. */
  def source(spark: SparkSession, spoolDir: String): DataFrame =
    spark.readStream
      .schema(spark.read.option("mergeSchema", "true").parquet(spoolDir).schema)
      .parquet(spoolDir)
}
