package org.apache.spark.sql

/** The one `private[sql]` reach this library makes, and why it exists:
  * a DataSource-V1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * must return micro-batches whose logical plan carries
  * `isStreaming = true` — MicroBatchExecution asserts it ("DataFrame
  * returned by getBatch … did not have isStreaming=true"). The only
  * constructor for such a frame is `SparkSession.internalCreateDataFrame
  * (rdd, schema, isStreaming = true)`, which is `private[sql]`; every
  * public V1 streaming connector (Spark's own FileStreamSource included)
  * builds its batches through exactly this call. This object lives in
  * `org.apache.spark.sql` purely to reach it, keeps zero state, and is
  * used by [[graft.io.TxStreamSource]] alone.
  */
object GraftStreamingFrame {

  /** Re-wrap a fully-planned BATCH frame as a streaming-tagged frame
    * with the same rows and schema. The RDD hand-off is lazy — the
    * batch plan compiles and runs only when the micro-batch executes. */
  def ofBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The opposite direction, for a V1 streaming SINK: the frame handed
    * to `Sink.addBatch` is streaming-tagged, so ordinary batch verbs on
    * it (localCheckpoint, write) refuse with "streaming sources must be
    * executed with writeStream.start()". Re-wrap it as a plain batch
    * frame over the micro-batch's rows — the ForeachBatchSink move. */
  def ofMicroBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
