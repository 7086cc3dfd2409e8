package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming online anomaly detection — the §2.10 analog of the batch
  * `q:a28_anomaly`: each event is scored against its key's 20 PRIOR
  * events (z-score from exact decimal moments, current row excluded),
  * emitted when |z| > 3. State per key is a bounded ring of ≤20
  * (value) entries plus nothing else — independent of throughput.
  *
  * Float parity with the batch query is exact on in-order feeds: the
  * buffer sums are accumulated as scale-2/scale-4 BigDecimal (the same
  * values Spark's DECIMAL(18,2) window casts produce), and the z is
  * the identical fixed double expression — `StreamingSpec` asserts
  * streamed anomalies ≡ the batch window computation, z values
  * included, over randomized logs and batch splits.
  *
  * Ordering contract: scores depend on arrival order (the trailing
  * window is a sequential structure, like [[StreamDebounce]]'s chain);
  * late data is judged against the state as-is.
  */
object StreamAnomaly {

  case class Ev(k: Long, ep: Long, id: Long, value: Double)
  case class Anomaly(k: Long, ep: Long, id: Long, value: Double,
      n_prior: Int, mean_prior: Double, std_prior: Double, z: Double)

  private val Window = 20
  private val MinPrior = 8

  /** @param events columns (k, ep, id, value), value non-null */
  def anomalies(events: DataFrame): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("k"), col("ep"), col("id"), col("value"))
      .as[Ev]
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[Ev], state: GroupState[Seq[Double]]) => {
          val ordered = it.toArray.sortBy(e => (e.ep, e.id))
          var buf = state.getOption.getOrElse(Seq.empty[Double]).toVector
          val out = Vector.newBuilder[Anomaly]
          for (e <- ordered) {
            val n = buf.size
            if (n >= MinPrior) {
              // the exact moments the batch window computes: decimal
              // scale-2 sums and scale-4 squared sums, cast to double
              val sx = buf.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
                .sum.toDouble
              val sx2 = buf.map { v =>
                val d = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                d * d
              }.sum.toDouble
              val mean = sx / n
              val std = math.sqrt((sx2 - sx * sx / n) / (n - 1))
              if (std > 0) {
                val z = (e.value - mean) / std
                if (math.abs(z) > 3)
                  out += Anomaly(key, e.ep, e.id, e.value, n, mean, std, z)
              }
            }
            buf = (buf :+ e.value).takeRight(Window)
          }
          state.update(buf)
          out.result().iterator
        })
  }
}
