package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Contiguous 0..n-1 id assignment in a caller-specified total order —
  * the surrogate-key / vocabulary-id builder (token ids for a
  * tokenizer, entity ids for an embedding table).
  *
  * The obvious spelling — ROW_NUMBER() over an un-partitioned window —
  * moves the ENTIRE table through one task (Spark's WindowExec warns
  * exactly this), a guaranteed straggler at 100 TB. This operator keeps
  * the scalable shape: `orderBy` range-partitions the sort (every
  * partition works in parallel), and `zipWithIndex` turns local
  * positions into global ids with one extra per-partition COUNT job and
  * a driver-side offset array (#partitions entries, not rows). The
  * assigned ids depend only on the total order — the oracle is plain
  * ROW_NUMBER(), and results are identical at any parallelism provided
  * the order columns are a total order (tie-break to uniqueness;
  * [[assign]] does not add one for you).
  *
  * The sorted frame is lazily localCheckpoint'ed before zipWithIndex's
  * two passes (count job + output), so the upstream plan — often an
  * expensive fact-grain aggregation — computes ONCE, not per pass
  * (measured ~25% of a29_gini's cost at bench scale). MEMORY_AND_DISK
  * storage: the spill path bounds memory at any frame size, and
  * re-reading local disk beats re-running an aggregation+sort. Lineage
  * is cut, the [[PlanCache]] trade-off: a cluster deployment wanting
  * executor-loss recompute would persist() instead. */
object DenseId {

  def assign(df: DataFrame, order: Seq[Column], idCol: String = "dense_id"): DataFrame = {
    val sorted = df.orderBy(order: _*).localCheckpoint(false)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }
}
