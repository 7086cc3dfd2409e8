package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory heavy hitters — exact frequent-key detection without
  * ever shuffling the full key grain.
  *
  * The naive frequent-keys plan (`GROUP BY key HAVING count > θ`)
  * shuffles one partial row per (partition, distinct key): fine when
  * the key domain is small, but over an open domain (n-gram pairs,
  * URLs, user agents) the exchange is distinct-keys-sized — at 100 TB
  * that is the job. The classic fix is the Misra-Gries summary
  * ("Finding repeated elements", Sci. Comp. Prog. 2, 1982): m counters
  * per partition, decrement-all when a new key arrives with the buffer
  * full. Summaries merge associatively (Agarwal et al., "Mergeable
  * summaries", PODS'12: add counts, then subtract the (m+1)-th largest
  * and drop non-positives), so the whole pass partial-aggregates
  * map-side and ships ONE ≤m-entry map per partition to a single
  * reducer — shuffle bytes bounded by m, not by the key domain.
  *
  * MG guarantees every key with true frequency > N/(m+1) survives the
  * summary (each decrement event burns m+1 occurrence tokens, and a
  * key's counter absorbs at most its own frequency in decrements), but
  * surviving counts are UNDERestimates. So a second, candidate-filtered
  * pass re-counts exactly: the scan shuffles only rows whose key is in
  * the ≤m-entry candidate set (map-side partial aggregation makes that
  * exchange ≤m rows per partition too), and the final
  * `cnt·(m+1) > N` filter keeps precisely the keys the guarantee
  * covers. The result is therefore EXACT — a deterministic function of
  * the input multiset, independent of partitioning, which is what
  * makes a plain GROUP BY/HAVING oracle possible (q:x_heavy_hitters).
  */
object HeavyHitters {

  /** A Misra-Gries summary: total keys observed and the ≤m surviving
    * (key → lower-bound count) entries. */
  final case class Mg(total: Long, counts: Map[String, Long])

  /** @param m counter budget; every key with frequency > total/(m+1)
    *   is guaranteed to survive as a candidate. */
  final class MisraGries(m: Int) extends Aggregator[String, Mg, Mg] {
    require(m >= 1, s"Misra-Gries needs m >= 1, got $m")

    def zero: Mg = Mg(0L, Map.empty)

    def reduce(b: Mg, w: String): Mg = {
      val c = b.counts
      val kept = c.get(w) match {
        case Some(v) => c.updated(w, v + 1L)
        case None if c.size < m => c.updated(w, 1L)
        case None =>
          // decrement-all: the arriving key and every stored counter
          // each give up one occurrence (m+1 tokens burned per event)
          c.iterator.collect { case (k, v) if v > 1L => k -> (v - 1L) }.toMap
      }
      Mg(b.total + 1L, kept)
    }

    def merge(a: Mg, b: Mg): Mg = {
      val sum = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      val kept =
        if (sum.size <= m) sum
        else {
          // subtract the (m+1)-th largest count from everything — the
          // mergeable-summaries trim that preserves the MG error bound
          val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
          sum.iterator.collect { case (k, v) if v > cut => k -> (v - cut) }.toMap
        }
      Mg(a.total + b.total, kept)
    }

    def finish(r: Mg): Mg = r
    def bufferEncoder: Encoder[Mg] = ExpressionEncoder[Mg]()
    def outputEncoder: Encoder[Mg] = ExpressionEncoder[Mg]()
  }

  /** One-column MG sweep: the global summary of `keys(keyCol)`. */
  def summarize(keys: DataFrame, keyCol: String, m: Int): Mg = {
    import keys.sparkSession.implicits._
    keys.select(col(keyCol).cast("string")).as[String]
      .select(new MisraGries(m).toColumn.name("mg"))
      .head()
  }

  /** Exact heavy hitters: keys of `keys(keyCol)` with frequency
    * > N/(m+1), with their EXACT counts — MG candidate sweep, then a
    * candidate-filtered exact count (both exchanges ≤m rows per
    * partition). Unordered; callers add their presentation sort. */
  def exact(keys: DataFrame, keyCol: String, m: Int): DataFrame =
    exactGiven(keys, keyCol, m, summarize(keys, keyCol, m))

  /** The recount stage alone, against a caller-supplied summary — the
    * incremental path: summaries persist per ingestion batch, merge
    * associatively (mergeable-summaries theory preserves the N/(m+1)
    * guarantee across merges), and ONE recount over the union serves
    * the merged summary (q:x_heavy_hitters_incremental's shape). */
  def exactGiven(keys: DataFrame, keyCol: String, m: Int, mg: Mg): DataFrame = {
    val cand = mg.counts.keySet.toSeq
    if (cand.isEmpty)
      keys.select(col(keyCol)).limit(0).withColumn("cnt", lit(0L))
    else
      keys.filter(col(keyCol).isInCollection(cand))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"))
        // the guarantee boundary: only counts the theory proves were
        // un-missable are claimed (exact long arithmetic, no division)
        .filter(col("cnt") * (m + 1L) > mg.total)
  }

  /** Associative summary merge, exposed for the incremental path. */
  def mergeSummaries(m: Int, a: Mg, b: Mg): Mg = new MisraGries(m).merge(a, b)
}
