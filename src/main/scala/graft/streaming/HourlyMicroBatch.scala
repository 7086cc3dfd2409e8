package graft.streaming

import java.nio.file.{Files, Paths}

import graft.ops.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming formulation of the reference's scheduled
  * micro-batch semantics (SURVEY.md §2.10).
  *
  * The reference approximates streaming with an hourly cron: process the
  * last CLOSED hour 35 minutes past the hour
  * (/root/reference/dags/etl/fact_gold_price.py:35, :64-66), with keyed
  * upsert making replays idempotent (:171-179). The exact Spark
  * equivalents:
  *
  *  - cron "35 * * * *" over the closed hour  →  1-hour tumbling
  *    `window($"created_at", "1 hour")` — a window closes when the
  *    watermark passes its end;
  *  - the 35-minute processing cushion        →  `withWatermark("35
  *    minutes")` — late ticks inside the cushion still land in their
  *    hour; later ones are dropped, which the reference equally never
  *    re-processes (catchup=False, fact_gold_price.py:36);
  *  - ON CONFLICT(id) DO UPDATE               →  `foreachBatch` keyed
  *    merge (Merge.upsertLatestWins) into the fact target — replay of a
  *    micro-batch overwrites instead of duplicating.
  *
  * Scale: state is one row per (source, side, hour) per watermark
  * horizon — bounded regardless of tick volume; the merge shuffles on
  * the tick id exactly like the batch path.
  */
object HourlyMicroBatch {

  /** Tick-shaped streaming input → per (source, side, closed hour)
    * aggregates: tick count, exact decimal mean price, min/max.
    * Append mode: a row emits exactly once, when its hour closes. */
  def hourlyAggregates(ticks: DataFrame): DataFrame =
    ticks
      .withWatermark("created_at", "35 minutes")
      .groupBy(
        window(col("created_at"), "1 hour").as("hour"),
        col("source"), col("side"))
      .agg(
        count(lit(1)).as("n_ticks"),
        (sum(col("price").cast("decimal(18,2)")).cast("double") /
          count(col("price"))).as("avg_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
      .select(
        col("hour.start").as("hour_start"),
        col("source"), col("side"),
        col("n_ticks"), col("avg_price"), col("min_price"), col("max_price"))

  /** The upsert sink: each micro-batch merges into a parquet fact
    * directory keyed by `id`, latest `etl_seq` wins — the streaming
    * analog of the reference's per-row ON CONFLICT loop, executed as
    * one set-based merge per batch. Idempotent under micro-batch replay
    * because the merge key, not append order, determines the survivor.
    */
  def upsertSink(
      ticks: DataFrame, targetDir: String): DataStreamWriter[Row] =
    ticks.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val incoming = batch.withColumn("etl_seq", lit(batchId))
        val merged =
          if (Files.exists(Paths.get(targetDir))) {
            val existing = spark.read.parquet(targetDir)
            Merge.upsertLatestWins(existing, incoming, "id", "etl_seq")
          } else incoming
        // Write-ahead to a staging dir, then swap: the read above and an
        // in-place overwrite of the same path would race. On a table
        // format this whole lambda is MERGE INTO.
        val staging = targetDir + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(targetDir)
      }
}
