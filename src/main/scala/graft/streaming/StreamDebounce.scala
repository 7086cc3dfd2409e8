package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming chained debounce — the §2.10 analog of the batch
  * `ops/Debounce` operator (q:t14_debounce): per key, emit an event iff
  * its event time exceeds the last EMITTED event's by more than the
  * cool-down gap. The recurrence reads the operator's own output, so
  * the streaming form is managed keyed state, not a windowed aggregate.
  *
  * State per key is two numbers (last-kept epoch + emit counter) —
  * independent of throughput, bounded by the live key population (the
  * FunnelStream discipline; add a timeout eviction like StreamNearDedup
  * when keys churn rather than persist). Within a micro-batch each
  * key's events are buffered and replayed in (epoch, id) order.
  *
  * Ordering contract: the chain is ORDER-SENSITIVE. For feeds that are
  * in event-time order ACROSS batches (a compacted log, a replayed
  * partition), the streamed kept set is exactly the batch operator's —
  * `StreamingSpec` asserts this over randomized logs and batch splits.
  * An out-of-order late event earlier than the last kept epoch cannot
  * retroactively un-emit rows (append mode); it is judged against the
  * state as-is — the same latest-truth caveat FunnelStream documents
  * for non-monotone semantics under late data.
  */
object StreamDebounce {

  case class Ev(k: Long, ep: Long, id: Long)
  case class DebState(lastKept: Long, seq: Int)
  case class Kept(k: Long, ep: Long, id: Long, keep_seq: Int)

  /** @param events columns (k, ep, id); gap in the same units as ep */
  def kept(events: DataFrame, gap: Long): Dataset[Kept] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("k"), col("ep"), col("id"))
      .as[Ev]
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[Ev], state: GroupState[DebState]) => {
          val ordered = it.toArray.sortBy(e => (e.ep, e.id))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Kept]
          for (e <- ordered) {
            if (st == null || e.ep - st.lastKept > gap) {
              st = DebState(e.ep, (if (st == null) 0 else st.seq) + 1)
              out += Kept(key, e.ep, e.id, st.seq)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }
}
