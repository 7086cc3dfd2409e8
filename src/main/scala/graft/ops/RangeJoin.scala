package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose `value` falls in a
  * right row's `[lo, hi)` interval. Not present in the reference (its
  * only non-equi lookup is the as-of neighbor probe, SURVEY.md §2.3
  * J9); part of the beyond-reference surface (§7.5) because banded
  * joins — value-to-bucket, time-to-SLA-window, score-to-tier — are
  * everywhere in curation pipelines.
  *
  * Two physical strategies:
  *
  *  - [[broadcastLoop]]: broadcast nested-loop with the raw range
  *    predicate. Right side must be driver-small (a dim of bands);
  *    per-row cost O(|R|). The plan Spark picks for any non-equi join
  *    anyway — made explicit here.
  *
  *  - [[bucketed]]: the scale path for LARGE right sides. Both sides
  *    map to fixed-width buckets — left rows to `floor(value/w)`, right
  *    intervals to every bucket they overlap (an `explode(sequence)`
  *    expansion of `ceil((hi-lo)/w)+1` rows) — then an ordinary
  *    shuffled HASH join on the bucket id, re-filtered by the exact
  *    range predicate. Turns the O(|L|·|R|) loop into
  *    O(|L| + |R|·spread) with full shuffle parallelism; pick `w` near
  *    the median interval width so the expansion stays small.
  *
  * Bucket coverage is float-safe: floor(x/w) is monotone, so
  * lo ≤ v < hi implies floor(lo/w) ≤ floor(v/w) ≤ floor(hi/w) — the
  * left row's bucket is always inside the interval's expanded bucket
  * range regardless of rounding wobble in the division; the exact
  * predicate then decides membership. RangeJoinSpec asserts the two
  * strategies produce identical results on random data.
  */
object RangeJoin {

  /** Broadcast nested-loop range join (right side small). */
  def broadcastLoop(
      left: DataFrame, valueCol: Column,
      right: DataFrame, loCol: Column, hiCol: Column): DataFrame =
    left.join(broadcast(right), valueCol >= loCol && valueCol < hiCol)

  /** Bucketed equi-join range join (right side large — see class doc).
    * Output columns = left ++ right, like [[broadcastLoop]]. */
  def bucketed(
      left: DataFrame, valueCol: Column,
      right: DataFrame, loCol: Column, hiCol: Column,
      width: Double): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val lb = left.withColumn("_graft_lbucket", floor(valueCol / width))
    val rb = right.withColumn("_graft_rbucket",
      explode(sequence(floor(loCol / width), floor(hiCol / width))))
    lb.join(rb,
        col("_graft_lbucket") === col("_graft_rbucket") &&
          valueCol >= loCol && valueCol < hiCol)
      .drop("_graft_lbucket", "_graft_rbucket")
  }
}
