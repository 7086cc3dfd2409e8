package graft.streaming

import graft.ops.HeavyHitters
import graft.ops.HeavyHitters.Mg
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the continuous form of
  * `ops/HeavyHitters`' exact frequent-keys pass (reference context:
  * the §2.10 micro-batch family; q:x_heavy_hitters is the batch form).
  *
  * Per window key, managed state carries ONE Misra-Gries summary
  * (≤ m counters + the exact total), folded forward micro-batch by
  * micro-batch with the same `reduce` the batch aggregator runs — so
  * state is m-BOUNDED regardless of how many distinct keys stream
  * through, the whole point of MG over an open key domain (at 100 TB:
  * per-window state is KBs while the naive windowed GROUP BY keeps the
  * full distinct-key grain alive in the store).
  *
  * Each batch the operator emits the window's refreshed summary as a
  * GENERATION of rows (gen = per-window update counter; the latest
  * generation is the current truth — the FunnelStream change-log
  * convention). The summary itself is order-dependent and therefore
  * NOT the query answer; its guarantee is: every key with true
  * frequency > total/(m+1) survives as a candidate, under ANY
  * arrival/merge order (Agarwal et al., PODS'12). The consumer
  * (q:t30_stream_heavy_hitters) closes the loop with one
  * candidate-filtered exact recount + the `cnt·(m+1) > total` claim
  * filter — making the final answer an exact, order-independent
  * function of the input multiset, which is what lets a plain
  * per-window GROUP BY / HAVING oracle gate a stream-maintained sketch.
  *
  * The total rides a pair-less SENTINEL row in every generation, never
  * only candidate rows: the decrement-all path can empty the candidate
  * map while total keeps counting, and a candidate-carried total would
  * silently zero (the x_heavy_hitters_incremental persistence lesson).
  */
object StreamHeavyHitters {

  case class PairEvent(w: Long, pair: String)

  /** Per-window state: update generation + the MG summary fields. */
  case class MgState(gen: Long, total: Long, counts: Map[String, Long])

  /** One summary row: `pair = None` is the generation's total sentinel. */
  case class SummaryRow(
      w: Long, gen: Long, total: Long, pair: Option[String], cnt: Long)

  /** @param pairs columns (w: long window key, pair: string)
    * @param m counter budget per window — keys with frequency
    *   > total/(m+1) are guaranteed to survive as candidates */
  def summaries(pairs: DataFrame, m: Int): Dataset[SummaryRow] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val agg = new HeavyHitters.MisraGries(m)
    pairs.select(col("w").cast("long"), col("pair").cast("string"))
      .as[PairEvent]
      .groupByKey(_.w)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (w: Long, it: Iterator[PairEvent], state: GroupState[MgState]) => {
          val prev = state.getOption.getOrElse(MgState(0L, 0L, Map.empty))
          val mg = it.foldLeft(Mg(prev.total, prev.counts))(
            (b, e) => agg.reduce(b, e.pair))
          val gen = prev.gen + 1L
          state.update(MgState(gen, mg.total, mg.counts))
          (SummaryRow(w, gen, mg.total, None, 0L) +:
            mg.counts.toSeq.map { case (p, c) =>
              SummaryRow(w, gen, mg.total, Some(p), c)
            }).iterator
        })
  }
}
