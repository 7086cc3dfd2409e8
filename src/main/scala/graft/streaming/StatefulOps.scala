package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a tick stream via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the §2.10 surface
  * the windowed-aggregate path can't express: state that must survive
  * ACROSS micro-batches and windows.
  *
  * Operator: per (source, side) key, carry the last observed (time,
  * price) and emit every tick annotated with its price delta and
  * minutes-since-previous — the streaming analog of the reference's
  * neighbor lookup (as-of join J9 / fact_gold_price_temp.py:280-327),
  * with the "previous row" coming from managed state instead of a
  * window over a bounded batch.
  *
  * Scale: state is ONE small row per live (source, side) key —
  * independent of throughput; Spark checkpoints it in the state store
  * and recovers it on failure. Within a batch the group's ticks are
  * processed in event-time order (the iterator is buffered and sorted;
  * per-key per-batch volume is bounded by the key's tick rate, the same
  * bound the batch interpolation kernel relies on).
  */
object StatefulOps {

  case class Tick(source: String, side: String, ts_minute: Long, price: Double)
  case class LastSeen(ts_minute: Long, price: Double)
  case class TickDelta(
      source: String, side: String, ts_minute: Long, price: Double,
      price_delta: Option[Double], minutes_gap: Option[Long])

  /** @param ticks columns (source, side, ts_minute epoch-minute, price) */
  def withDeltas(ticks: DataFrame): Dataset[TickDelta] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .select(col("source"), col("side"), col("ts_minute"), col("price"))
      .as[Tick]
      .groupByKey(t => (t.source, t.side))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: (String, String), it: Iterator[Tick], state: GroupState[LastSeen]) => {
          val ordered = it.toArray.sortBy(t => (t.ts_minute, t.price))
          var last = state.getOption
          val out = ordered.iterator.map { t =>
            val d = TickDelta(t.source, t.side, t.ts_minute, t.price,
              last.map(l => t.price - l.price),
              last.map(l => t.ts_minute - l.ts_minute))
            last = Some(LastSeen(t.ts_minute, t.price))
            d
          }.toVector
          last.foreach(state.update)
          out.iterator
        })
  }
}
