package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.HourlyMicroBatch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Oracle-gated end-to-end run of the Structured Streaming surface
  * (SURVEY.md §2.10): the batch events table is replayed through the
  * streaming file source, aggregated by the SAME `hourlyAggregates`
  * the production stream uses (1-hour tumbling window, 35-minute
  * watermark, append mode), and the emitted result is hash-compared
  * against a DuckDB oracle that restates the watermark contract in
  * SQL. This closes the gap where §2.10 was spec-only: the oracle now
  * proves stream-mode window emission equals the batch semantics,
  * including WHICH windows emit.
  *
  * Append-mode emission contract encoded in the oracle: a window emits
  * iff the final watermark passed its end. The file source drains the
  * (single-file) input in one micro-batch, the no-data flush batch then
  * finalizes against watermark = max(event time in ms) - 35 min, so
  * emitted hours are exactly { h : end(h) <= max_ts_ms - 35 min }; the
  * trailing partial hour(s) stay in (discarded) state — same as the
  * reference's cron, which never processes a not-yet-closed hour
  * (/root/reference/dags/etl/fact_gold_price.py:35,64-66).
  */
object Streams {

  /** Memory-sink table names must be unique per invocation (Bench runs
    * each query 4×; a fixed name would collide with the live previous
    * query). */
  private val runSeq = new AtomicInteger(0)

  val all: Map[String, Q] = Map(

    "t11_stream_hourly" -> Q(
      (s, dir) => {
        val path = s"$dir/events.parquet"
        // the streaming file source needs an explicit schema; take the
        // RAW parquet schema and apply the same ts normalization as
        // Tables.events (schema-dispatching, fixture-encoding-proof)
        val raw = s.read.parquet(path)
        // FileStreamSource OVERRIDES a user 'basePath' with the source
        // path itself whenever the path is not a glob — and events
        // .parquet is a single file, which then fails the must-be-a-
        // directory check. A glob pattern (matching exactly that file)
        // suppresses the override so the explicit directory basePath
        // survives.
        val ticks = s.readStream.schema(raw.schema)
          .option("basePath", dir).parquet(s"$dir/events*.parquet")
          .select(
            col("event_id").as("id"),
            col("event_type").as("source"),
            when(col("user_id") % 2 === 0, "buy").otherwise("sell").as("side"),
            col("value").as("price"),
            col("ts").cast("timestamp").as("created_at"))
        val name = s"t11_stream_hourly_${runSeq.incrementAndGet()}"
        val q = HourlyMicroBatch.hourlyAggregates(ticks)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // timestamps compare as microsecond strings (engine-dtype-proof,
        // the suite-wide convention)
        s.table(name)
          .withColumn("hour_start",
            date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
          .orderBy("hour_start", "source", "side")
      },
      """WITH t AS (
        |  SELECT date_trunc('hour', ts) AS hour_start,
        |         event_type AS source,
        |         CASE WHEN user_id % 2 = 0 THEN 'buy' ELSE 'sell' END AS side,
        |         value AS price
        |  FROM events),
        |wm AS (SELECT epoch_ms(MAX(ts)) - 35 * 60 * 1000 AS w FROM events)
        |SELECT strftime(hour_start, '%Y-%m-%d %H:%M:%S.%f') AS hour_start, source, side,
        |  COUNT(*) AS n_ticks,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(price) AS avg_price,
        |  MIN(price) AS min_price, MAX(price) AS max_price
        |FROM t
        |GROUP BY hour_start, source, side
        |HAVING epoch_ms(hour_start) + 3600 * 1000 <= (SELECT w FROM wm)
        |ORDER BY hour_start, source, side""".stripMargin),

    // The incremental-aggregate sink run END-TO-END as a stream
    // (streaming/IncrementalStream): events replayed through the file
    // source, each micro-batch appending its mergeable partial
    // (count / decimal sum / min / max per key) to a batch_id-
    // partitioned state log, then merge-on-read + finalize. The oracle
    // is the FULL RECOMPUTE in DuckDB — the strongest statement of the
    // incremental algebra: merge(partials by arbitrary micro-batch
    // split) ≡ one global aggregate, bit-for-bit, because every
    // component is a commutative monoid and sums ride DECIMAL. t11
    // proved windowed append emission; this proves the foreachBatch
    // state-log surface (replay-idempotent by partition overwrite)
    // against an oracle, so the stateful streaming family stops being
    // spec-only beyond hourly windows.
    "t12_stream_incremental" -> Q(
      (s, dir) => {
        val path = s"$dir/events.parquet"
        val raw = s.read.parquet(path)
        val keys = Seq("day", "event_type")
        // same glob trick as t11: keep the explicit basePath alive
        val ticks = s.readStream.schema(raw.schema)
          .option("basePath", dir).parquet(s"$dir/events*.parquet")
          .withColumn("day", date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
        val run = runSeq.incrementAndGet()
        val base = java.nio.file.Files
          .createTempDirectory(s"t12_stream_$run").toString
        val q = graft.streaming.IncrementalStream
          .stateSink(ticks, keys, "value", s"$base/state")
          .option("checkpointLocation", s"$base/ckpt")
          .start()
        q.awaitTermination()
        graft.ops.Incremental.finalize(
            graft.streaming.IncrementalStream.readState(s, s"$base/state", keys))
          .orderBy(col("day"), col("event_type"))
      },
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  COUNT(value) AS cnt,
        |  MIN(value) AS min_v, MAX(value) AS max_v,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_v
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin))
}
