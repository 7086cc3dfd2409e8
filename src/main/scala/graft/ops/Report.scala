package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship analytical query: which source was
  * cheapest / most expensive, for how long, yesterday
  * (/root/reference/dags/report/cheap_expensive_chart.py:40-84).
  *
  * Shape: interpolated fact ⋈ dims, filter to the report date, average
  * price per (source, minute), dual ROW_NUMBER ranking per minute
  * (ascending = cheap, descending = expensive — W1), then per-source
  * minute counts with a grand-total share window (W2) formatted as a
  * "HH:MM of the day" duration string (F9–F11).
  *
  * Differences by design (SURVEY.md §4.1): the reference executes the
  * whole CTE twice, once per rank direction; we compute both ranks in
  * one pass and parameterize the final predicate (P8's dynamic column),
  * halving the scan. Rank ordering gets a deterministic tie-break on
  * source name (the reference inherits Postgres's arbitrary order).
  *
  * Scale: the sources dimension is broadcast; the only shuffles are the
  * per-minute aggregation and the tiny post-aggregate window. The W2
  * grand-total window (single partition) runs on the already-aggregated
  * per-source rows — a few hundred rows no matter how big the fact is.
  */
object Report {

  /** @param densified output of Interpolate.densify (or the raw fact)
    * @param sources   sources dim (id, name, color)
    * @param dateId    report date (dd.yesterday = 1 in the reference)
    * @param rankCol   "cheap" | "expensive" — P8 dynamic predicate
    */
  def cheapExpensive(
      densified: DataFrame, sources: DataFrame,
      dateId: Int, rankCol: String): DataFrame = {
    require(rankCol == "cheap" || rankCol == "expensive")

    val perMinute = densified
      .filter(col("date_id") === dateId)
      .join(broadcast(sources), col("source_id") === sources("id"))
      .groupBy(col("id"), col("name").as("source"), col("color"),
        col("rounded_time_id").as("time_id"))
      .agg((sum(col("price").cast("decimal(28,10)")).cast("double") /
        count(col("price"))).as("price"))

    val byMinute = Window.partitionBy(col("time_id"))
    val ranked = perMinute
      .withColumn("cheap",
        row_number().over(byMinute.orderBy(col("price").asc, col("source").asc)))
      .withColumn("expensive",
        row_number().over(byMinute.orderBy(col("price").desc, col("source").desc)))

    val counted = ranked
      .filter(col(rankCol) === 1)
      .groupBy(col("source"), col("color"))
      .agg(count(col("time_id")).as("minute_count"))

    // share-of-day duration: ROUND(cnt/total, 2)·24 split into HH:MM
    // (cheap_expensive_chart.py:74-78), with explicit int casts so the
    // string form is 'HH:MM' in every engine.
    val total = sum(col("minute_count")).over(Window.partitionBy())
    val hoursFrac = round(col("minute_count") / total, 2) * 24
    counted
      .withColumn("_hf", hoursFrac)
      .select(
        col("source"), col("color"), col("minute_count"),
        concat(
          lpad(floor(col("_hf")).cast("int").cast("string"), 2, "0"),
          lit(":"),
          lpad(round((col("_hf") - floor(col("_hf"))) * 60, 0).cast("int")
            .cast("string"), 2, "0")).as("duration"))
      .orderBy(col("minute_count").desc, col("source").asc)
  }
}
