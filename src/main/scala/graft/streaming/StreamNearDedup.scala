package graft.streaming

import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection — the continuous-ingest form of
  * the batch MinHash+LSH operator (queries/Text `x_dedup_minhash_lsh`):
  * a firehose of documents where boilerplate re-publications and light
  * edits arrive over time, and each new document must be checked
  * against what already streamed past without ever joining the full
  * history.
  *
  * Construction mirrors the batch operator exactly — same 3-token
  * shingles, same 8-permutation MinHash ([[TextHash]]), same 4 band
  * keys of 2 hashes each, same Jaccard≥threshold verification — so a
  * pair the batch query reports is reported here when both documents
  * fall inside the state horizon (`StreamNearDedupSpec` asserts the
  * batch≡stream agreement on a shared corpus).
  *
  * Mechanics: each document explodes into its 4 band rows;
  * `flatMapGroupsWithState` keyed by band key holds the bucket's
  * member list — (doc_id, shingle set, event-time) — and verifies each
  * arrival against current members before appending it. State is
  * bounded twice, the same two defenses as the batch plan:
  *  - per-bucket member CAP (the batch `bandCap`): a degenerate bucket
  *    (millions of near-identical boilerplate pages) stops absorbing
  *    members at the cap — arrivals still verify against the capped
  *    prefix, mirroring the batch row_number cut, so the loss is
  *    bounded recall, never unbounded state;
  *  - event-time HORIZON via `EventTimeTimeout`: members whose
  *    event time has fallen `horizon` behind the watermark are evicted
  *    on timeout, so bucket state is the horizon's ingest volume, not
  *    the stream's lifetime.
  *
  * A colliding pair can surface in up to 4 buckets; emission is
  * per-bucket, so downstream consumes through `dropDuplicates` on
  * (a_id, b_id) — the streaming analog of the batch plan's `distinct()`
  * over band candidates (cheap: pair rows are collision-sized, and the
  * batch operator pays the identical distinct).
  */
object StreamNearDedup {

  /** One band-bucket arrival: the band key plus the member payload.
    * `ts` stays a timestamp so the watermark metadata the
    * EventTimeTimeout check requires survives the projection. */
  private[streaming] case class BandRow(
      bkey: String, doc_id: Long, sh: Seq[String], ts: java.sql.Timestamp)

  /** Stored bucket member — event time in epoch millis. */
  private[streaming] case class Member(doc_id: Long, sh: Seq[String], ts_ms: Long)

  /** Bucket state: members in arrival order (capped). */
  private[streaming] case class Bucket(members: Seq[Member])

  /** Verified near-dup pair, a_id < b_id. */
  case class NearDupHit(a_id: Long, b_id: Long, jaccard: Double)

  /** Exact Jaccard on shingle sets — same value the batch verifier's
    * native expression computes (both sides are distinct-element
    * sets). */
  private[streaming] def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val inter = b.count(sa.contains)
    inter.toDouble / (sa.size + b.toSet.size - inter).toDouble
  }

  /** @param docs      streaming DataFrame with `doc_id` (long), `text`
    *                   (string) and event-time column `tsCol`
    * @param tsCol     event-time column (timestamp)
    * @param horizon   watermark delay and state lifetime, e.g.
    *                   "10 minutes"
    * @param threshold verification Jaccard threshold (batch default 0.5)
    * @param bucketCap max members retained per band bucket
    * @return append-mode stream of [[NearDupHit]]s (per-bucket; run
    *         `dropDuplicates("a_id","b_id")` downstream for pair-unique
    *         output)
    */
  def nearDupHits(
      docs: DataFrame, tsCol: String, horizon: String,
      threshold: Double = 0.5, bucketCap: Int = 4096): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0, s"horizon must be day-or-finer, got: $horizon")
    val horizonMillis = iv.days * 86400000L + iv.microseconds / 1000L

    val banded = docs
      .withWatermark(tsCol, horizon)
      .withColumn("t", split(col("text"), " "))
      .withColumn("sh", TextHash.shingleSet(col("t"), 3))
      .withColumn("mh", TextHash.minhash(col("sh"), 8))
      .filter(col("mh").isNotNull)
      .withColumn("bkey", explode(expr(
        "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(element_at(mh, 2*b+1) AS string), ':', cast(element_at(mh, 2*b+2) AS string)))")))
      .select(col("bkey"), col("doc_id"), col("sh"), col(tsCol).as("ts"))
      .as[BandRow]

    banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (_: String, it: Iterator[BandRow], state: GroupState[Bucket]) => {
          if (state.hasTimedOut) {
            // watermark passed the newest member + horizon: every
            // member is expired, drop the bucket entirely
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
              .filter(_.ts_ms >= wm - horizonMillis)
            val hits = Seq.newBuilder[NearDupHit]
            // arrival order within the batch is sorted for determinism:
            // micro-batch grouping order is not stable, pair emission
            // must not depend on it
            it.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
              members.foreach { m =>
                if (m.doc_id != r.doc_id) {
                  val j = jaccard(m.sh, r.sh)
                  if (j >= threshold)
                    hits += NearDupHit(
                      math.min(m.doc_id, r.doc_id),
                      math.max(m.doc_id, r.doc_id), j)
                }
              }
              if (members.size < bucketCap)
                members = members :+ Member(r.doc_id, r.sh, r.ts.getTime)
            }
            if (members.nonEmpty) {
              state.update(Bucket(members))
              state.setTimeoutTimestamp(
                members.map(_.ts_ms).max + horizonMillis)
            } else state.remove()
            hits.result().iterator
          }
        })
  }
}
