package graft.streaming

import graft.ops.Incremental
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Streaming maintenance of the [[graft.ops.Incremental]] state table —
  * the continuous form of `q:x_incr_agg`'s algebra.
  *
  * Each micro-batch writes its PARTIAL aggregate (count / decimal sum /
  * min / max per key) into a `batch_id=`-partitioned log of the state
  * directory, in dynamic partition-overwrite mode. That choice is what
  * makes the sink replay-idempotent: a recovered/re-run micro-batch
  * rewrites exactly its own partition instead of double-counting — the
  * failure mode that makes naive "read state, add delta, write state"
  * aggregation sinks wrong under at-least-once delivery. Readers merge
  * the partials on read (`merge ∘ state ≡ state ∘ ∪`, the law
  * IncrementalSpec pins), and a maintenance pass can compact old
  * partials into one at any time without changing any answer — the same
  * partial-log + merge-on-read + compaction design a table format's
  * incremental materialized view uses.
  *
  * Scale: per micro-batch the cluster touches delta-sized input and
  * writes key-cardinality-sized partials; no history is ever rescanned
  * and no per-key streaming state store is held (the log IS the state,
  * and it lives on the lake, not in executor memory).
  */
object IncrementalStream {

  /** One micro-batch of the sink: append `batch`'s partial aggregate as
    * partition `batch_id=<id>`, overwriting any previous attempt of the
    * SAME batch. Factored out so replay semantics are directly
    * testable. */
  def applyBatch(
      batch: DataFrame, batchId: Long,
      keys: Seq[String], valueCol: String, stateDir: String): Unit =
    Incremental.state(batch, keys, valueCol)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(stateDir)

  /** The streaming sink: maintain the partial-aggregate log from a
    * stream of fact rows. */
  def stateSink(
      events: DataFrame, keys: Seq[String], valueCol: String,
      stateDir: String): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, keys, valueCol, stateDir)
      }

  /** Merge-on-read: collapse the partial log into current per-key state
    * (finalize for user-facing measures). */
  def readState(
      spark: SparkSession, stateDir: String, keys: Seq[String]): DataFrame =
    Incremental.merge(keys)(spark.read.parquet(stateDir).drop("batch_id"))

  /** Compaction: fold COMMITTED partials into one `batch_id = -1`
    * partition (below any real micro-batch id). Changes no merged
    * answer, bounds the file count; run it like any other maintenance
    * pass.
    *
    * The newest batch in the log is deliberately left OUT of the fold:
    * under at-least-once delivery it is the one batch that may still
    * replay (its sink write can land before the checkpoint commit),
    * and replay-idempotence relies on the replay overwriting a
    * partition that still holds — only — that batch's partial. Every
    * batch below the maximum is provably committed, because batch N
    * only starts after N−1's commit. */
  def compact(
      spark: SparkSession, stateDir: String, keys: Seq[String]): Unit = {
    // partition-value inference reads batch_id back as INT — normalize
    val log = spark.read.parquet(stateDir)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val maxBatch = log.agg(max(col("batch_id"))).head().getLong(0)
    val foldable = log.filter(col("batch_id") < maxBatch)
    if (foldable.isEmpty) return // one live batch (or only -1): no-op
    val staging = stateDir + "_compacted"
    Incremental.merge(keys)(foldable.drop("batch_id"))
      .withColumn("batch_id", lit(-1L))
      .unionByName(log.filter(col("batch_id") === maxBatch))
      .write.partitionBy("batch_id").mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.partitionBy("batch_id").mode("overwrite").parquet(stateDir)
  }
}
