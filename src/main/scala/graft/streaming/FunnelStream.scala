package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the §2.10 analog of `q:a22_funnel`'s
  * FIRST-TOUCH semantics: a user stands at stage k iff their first
  * signup precedes their first view precedes … (k steps deep). Managed
  * state per user carries the four first-touch keys; each incoming
  * event lowers at most one of them, and a row is emitted whenever the
  * user's funnel stage CHANGES.
  *
  * First-touch funnels are deliberately NOT monotone under late data: a
  * late early 'view' can re-order the first-touch sequence and DEMOTE a
  * user (the batch query, re-run, would report the lower stage). The
  * operator therefore emits a change LOG — the latest row per user is
  * the current truth, exactly the latest-wins convention of the
  * engine's upsert sinks (ops/Merge) — rather than pretending
  * monotonicity the semantics don't have. `StreamingSpec` replays a
  * late-data scenario and asserts the final streamed state equals the
  * batch computation on the same events.
  *
  * Scale: state is 4 short strings per live user — independent of
  * throughput; within a batch each user's events are buffered and
  * processed in event-time order (bounded by the user's per-batch
  * volume, the StatefulOps discipline).
  */
object FunnelStream {

  /** step ∈ 1..4 (signup, view, click, purchase); k is the portable
    * zero-padded "epoch_us.event_id" time key (a22's construction —
    * string order IS event-time order). */
  case class FunnelEvent(user_id: Long, step: Int, k: String)

  /** nChanges versions the user's change log: a late event's at_k is
    * EARLIER than rows already emitted, so event-time cannot order the
    * log — change_seq is the per-key version a latest-wins consumer
    * (ops/Merge-style) resolves on, the CDC convention. */
  case class FunnelState(
      t1: Option[String], t2: Option[String],
      t3: Option[String], t4: Option[String], nChanges: Int)

  case class StageChange(
      user_id: Long, stage: Int, at_k: String, change_seq: Int)

  private val Empty = FunnelState(None, None, None, None, 0)

  /** Stage = deepest prefix whose first-touch keys strictly ascend. */
  def stageOf(st: FunnelState): Int = {
    val ts = Seq(st.t1, st.t2, st.t3, st.t4)
    var s = 0
    var prev: Option[String] = None
    var stop = false
    for (t <- ts if !stop) {
      (prev, t) match {
        case (None, Some(_)) if s == 0 => s = 1; prev = t
        case (Some(p), Some(c)) if p < c => s += 1; prev = t
        case _ => stop = true
      }
    }
    s
  }

  private def touch(st: FunnelState, e: FunnelEvent): FunnelState = {
    def min2(cur: Option[String]) =
      Some(cur.fold(e.k)(c => if (e.k < c) e.k else c))
    e.step match {
      case 1 => st.copy(t1 = min2(st.t1))
      case 2 => st.copy(t2 = min2(st.t2))
      case 3 => st.copy(t3 = min2(st.t3))
      case 4 => st.copy(t4 = min2(st.t4))
      case _ => st
    }
  }

  /** @param events columns (user_id, step, k) */
  def stageChanges(events: DataFrame): Dataset[StageChange] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("step"), col("k"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          val ordered = it.toArray.sortBy(_.k)
          var st = state.getOption.getOrElse(Empty)
          var stage = stageOf(st)
          val out = Vector.newBuilder[StageChange]
          for (e <- ordered) {
            st = touch(st, e)
            val ns = stageOf(st)
            if (ns != stage) {
              st = st.copy(nChanges = st.nChanges + 1)
              out += StageChange(user, ns, e.k, st.nChanges)
              stage = ns
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
