package graft.queries

import graft.Tables
import graft.ops.Incremental
import org.apache.spark.sql.functions._

/** Warehouse-maintenance patterns that only matter at scale: work that
  * a small warehouse does by recomputing and a 100 TB lake must do
  * incrementally.
  */
object Maintenance {

  /** Fixed split point inside the events corpus (2024-01-01 →
    * 2024-01-30 at every sf): "history" is days 1–20, the "new
    * arrivals" delta is days 21–30. In production the history side is
    * a persisted state table, not a scan — the query exercises the
    * merge algebra end-to-end. */
  private val Cutoff = "2024-01-21 00:00:00"

  val all: Map[String, Q] = Map(

    // Incremental rollup maintenance — per (day, event_type) stats kept
    // as mergeable components: state(history) ⊎ state(delta) is proven
    // equal to the full recompute (the oracle IS the full recompute —
    // one direct GROUP BY over all events). Each state pass is one
    // partial+final hash aggregate over its slice; the merge
    // re-aggregates two key-cardinality-sized state tables — at lake
    // scale that's delta-sized input + a tiny state read instead of a
    // history rescan, and the decimal sums make the merged result
    // bit-identical to the rebuild regardless of how many increments
    // composed it.
    "x_incr_agg" -> Q(
      (s, dir) => {
        val keys = Seq("day", "event_type")
        val ev = Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        val cut = lit(Cutoff).cast("timestamp")
        val history = Incremental.state(ev.filter(col("ts") < cut), keys, "value")
        val delta = Incremental.state(ev.filter(col("ts") >= cut), keys, "value")
        Incremental.finalize(Incremental.merge(keys)(history, delta))
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
