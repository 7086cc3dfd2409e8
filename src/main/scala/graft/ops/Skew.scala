package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY.md §7.5 scale notes).
  *
  * AQE's skew-join splitting handles joins; a heavily skewed
  * AGGREGATION still funnels each hot key through one reducer. The
  * classic fix is salting: stage one spreads every key over `buckets`
  * deterministic salts and partially aggregates, stage two merges the
  * ≤ `buckets` partials per key. Cost: one extra (tiny) shuffle stage;
  * benefit: the hottest key's reducer work drops by ~`buckets`×.
  *
  * Only algebraic aggregates decompose this way — sum/count/min/max
  * merge losslessly (sum of sums, sum of counts, min of mins, …), which
  * is exactly what the engine's pipelines need. AVG is derived as exact
  * decimal sum / count at the merge, keeping the engine's
  * order-independent arithmetic (graft.functions.Exact).
  */
object Skew {

  /** Deterministic salt from a discriminator expression (any column
    * that varies within a key group — a tick id, a timestamp). */
  private def salt(discriminator: Column, buckets: Int): Column =
    pmod(hash(discriminator), lit(buckets))

  /** Internal column name guaranteed absent from `taken`: a bare
    * `"_salt"` would silently shadow (and then drop) a user column of
    * the same name, making the salted result no longer row-identical
    * to the direct plan. */
  private def fresh(base: String, taken: Seq[String]): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !taken.contains(n)).get

  /** Salted sum/count/min/max of `valueCol` grouped by `keys`.
    * Output: keys ++ (sum_<v>, cnt_<v>, min_<v>, max_<v>) — identical
    * rows to the direct single-stage aggregation, by construction. */
  def saltedStats(
      df: DataFrame, keys: Seq[String], valueCol: String,
      discriminator: Column, buckets: Int): DataFrame = {
    val v = col(valueCol)
    val saltCol = fresh("_salt", df.columns.toIndexedSeq)
    val Seq(psum, pcnt, pmin, pmax) =
      Seq("_psum", "_pcnt", "_pmin", "_pmax").map(fresh(_, keys))
    val partial = df
      .withColumn(saltCol, salt(discriminator, buckets))
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(
        sum(v.cast("decimal(28,10)")).as(psum),
        count(v).as(pcnt),
        min(v).as(pmin),
        max(v).as(pmax))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(psum)).cast("double").as(s"sum_$valueCol"),
        sum(col(pcnt)).as(s"cnt_$valueCol"),
        min(col(pmin)).as(s"min_$valueCol"),
        max(col(pmax)).as(s"max_$valueCol"))
  }

  /** Salted equi-join for ONE pathologically hot key value.
    *
    * AQE's skew handling splits an oversized shuffle partition into
    * several tasks — but every split of a single hot KEY still probes
    * the same build rows, and in an aggregation-above-join pipeline the
    * hot key's probe output re-converges on one reducer. Salting splits
    * the KEY itself: each big-side row takes a deterministic salt from
    * a within-key discriminator, the small side is replicated once per
    * salt bucket, and the join key becomes (key, salt) — the hot key's
    * work spreads over `buckets` genuinely independent partitions.
    *
    * Correct for any salt assignment (each big row matches exactly the
    * replica carrying its salt — the join result is row-identical to
    * the direct join); deterministic here so reruns shuffle
    * identically. Cost: the small side is materialized `buckets`× —
    * this is for star joins whose build side is dimension-sized, the
    * only place the hot-key pattern arises.
    *
    * @param bigKey/smallKey join columns (may differ in name; output
    *   keeps both, like the direct `big.join(small, bigKey === smallKey)`)
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      discriminator: Column, buckets: Int): DataFrame = {
    val saltCol = fresh("_salt", (big.columns ++ small.columns).toIndexedSeq)
    val saltedBig = big.withColumn(saltCol, salt(discriminator, buckets))
    val replicated = small.withColumn(saltCol,
      explode(lit((0 until buckets).toArray)))
    saltedBig
      .join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig(saltCol) === replicated(saltCol))
      .drop(saltCol)
  }
}
