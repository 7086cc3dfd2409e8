package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based alternatives to the exact aggregates — the 100 TB
  * escape hatch the oracle-gated queries deliberately do NOT use.
  *
  * The reference's COUNT(DISTINCT x) is exact (SURVEY.md §2.4 A4) and
  * the engine's gated queries keep it exact for value parity. But at
  * lake scale an exact distinct plans an Expand (one duplicated row per
  * distinct-aggregate) plus a full shuffle of the expanded keys, and an
  * exact percentile buffers every value per group. The sketch forms
  * trade a bounded error for one-pass, constant-memory-per-group,
  * partial-aggregable plans — the right default for monitoring/validation
  * aggregates (A4's role) on a 1000-executor run, while the exact forms
  * remain for gate-grade checks. ApproxSpec pins both the error bounds
  * on real data and the no-Expand plan property.
  */
object Approx {

  /** HyperLogLog++ distinct counts per group: one hash-agg pass, a
    * fixed ~1.5 kB sketch per (group, agg) merged associatively across
    * partitions — no Expand, no second shuffle round.
    * @param rsd target relative standard deviation (default 5%) */
  def distinctCounts(
      df: DataFrame, groupCols: Seq[Column],
      countCols: Seq[(Column, String)], rsd: Double = 0.05): DataFrame = {
    require(countCols.nonEmpty, "distinctCounts needs at least one count column")
    df.groupBy(groupCols: _*)
      .agg(
        countCols.head match { case (c, n) => approx_count_distinct(c, rsd).as(n) },
        countCols.tail.map { case (c, n) => approx_count_distinct(c, rsd).as(n) }: _*)
  }

  /** Quantiles per group via percentile_approx (Greenwald-Khanna):
    * bounded-size summary per group, mergeable across partitions —
    * versus the exact percentile's full per-group value buffer.
    * @param accuracy GK accuracy knob; error ≤ 1/accuracy of rank */
  def quantiles(
      df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(valueCol,
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
