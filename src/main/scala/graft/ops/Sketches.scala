package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory cardinality sketches — the mergeable form of
  * COUNT(DISTINCT) for lake-scale profiling.
  *
  * Spark's exact distinct pays a dedup round — a full-data exchange at
  * (group, value) grain before the real aggregation (and an Expand
  * multiplying rows once several distinct aggregates mix);
  * `approx_count_distinct` (HLL++, see [[Approx]])
  * fixes the plan but its sketch bytes are implementation-private, so
  * nothing outside Spark can reproduce the estimate. The KMV (k minimum
  * values) sketch here is the ENGINE-PORTABLE alternative: keep the k
  * smallest distinct values of a uniform hash; with h_k the k-th
  * smallest over hash space M, distinct ≈ (k−1)·M/h_k
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM'02 — the classic bottom-k estimator). Every quantity is a
  * deterministic function of the input SET, so any engine that agrees
  * on the hash agrees on the estimate bit-for-bit — which is what makes
  * the q:x_kmv_distinct oracle possible, and what a multi-engine
  * pipeline needs to reconcile profiles computed in different systems.
  *
  * Scale shape: a typed [[Aggregator]] whose buffer is a sorted
  * ≤k-element array — constant memory per group, associative merge, so
  * it partial-aggregates map-side (ObjectHashAggregate) and ships one
  * tiny array per (partition, group) through the single exchange. Error
  * is ~1/√k relative (k=64 → ~12%); raise k for tighter profiles.
  */
object Sketches {

  /** KMV summary: how many distinct hashes were kept (min(k, distinct)),
    * the k-th smallest hash, and the estimate. When the buffer never
    * filled, `n_kept` IS the exact distinct count and `est_distinct`
    * equals it. */
  final case class Kmv(n_kept: Int, kth_hash: Long, est_distinct: Double)

  /** @param k sketch size (minimum 2 — the estimator needs k−1 ≥ 1)
    * @param hashSpace size M of the hash space the caller feeds in;
    *   defaults to 2^60, the space of the engine-portable md5-prefix
    *   hash (queries.md5Hash60Spark) */
  final class KmvDistinct(k: Int, hashSpace: Long = 1L << 60)
      extends Aggregator[Long, Array[Long], Kmv] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: Array[Long] = Array.empty[Long]

    // buffer invariant: sorted ascending, distinct, length ≤ k
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          // displaces the current maximum; array length stays k
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf // h ≥ current max of a full buffer
      }
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge with dedup, truncated at k — one pass, no resort
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v }
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(buf: Array[Long]): Kmv =
      if (buf.length < k)
        Kmv(buf.length, if (buf.isEmpty) -1L else buf.last, buf.length.toDouble)
      else
        Kmv(k, buf.last, (k - 1).toDouble * hashSpace.toDouble / buf.last.toDouble)

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Kmv] = ExpressionEncoder[Kmv]()
  }

  /** Column-function form: `df.groupBy(...).agg(Sketches.kmv(64)(hashCol))`. */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new KmvDistinct(k))
    (c: Column) => fn(c)
  }
}
