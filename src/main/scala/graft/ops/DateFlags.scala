package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dim_date derived-column maintenance (SURVEY.md §2.1 S12).
  *
  * The reference recomputes 17 relative-date columns daily with one
  * UPDATE statement (/root/reference/dags/etl/dim_date_etl_dag.py:46-73).
  * Spark has no in-place UPDATE on files, so the operator is a pure
  * column recomputation + overwrite of the (tiny) dimension — and the
  * "run date" is an explicit parameter rather than CURRENT_DATE, which
  * makes every run reproducible (SURVEY.md §7.4).
  *
  * Column-for-column parity with the reference's UPDATE, including its
  * naming quirks (the persian_* columns are plain Gregorian EXTRACT
  * arithmetic in the original, dim_date_etl_dag.py:61-64, and
  * EXTRACT(WEEK) is ISO week = Spark weekofyear).
  */
object DateFlags {

  private def prevDays(d: Column, run: Column, n: Int): Column =
    when(d >= date_sub(run, n) && d < run, 1).otherwise(0)

  /** Adds the 17 derived columns to a frame holding `date_string`
    * ('yyyy-MM-dd'). `runDate` plays CURRENT_DATE. */
  def withDerivedColumns(dim: DataFrame, runDate: Column): DataFrame = {
    val d = to_date(col("date_string"))
    val run = to_date(runDate)
    val monthLag = (year(run) - year(d)) * 12 + (month(run) - month(d))
    val weekLag = (year(run) - year(d)) * 52 + (weekofyear(run) - weekofyear(d))
    val lastMonth = add_months(run, -1)
    dim
      .withColumn("day_lag", datediff(run, d))
      .withColumn("today", when(d === run, 1).otherwise(0))
      .withColumn("yesterday", when(d === date_sub(run, 1), 1).otherwise(0))
      .withColumn("prev_7_days", prevDays(d, run, 7))
      .withColumn("prev_14_days", prevDays(d, run, 14))
      .withColumn("prev_30_days", prevDays(d, run, 30))
      .withColumn("prev_45_days", prevDays(d, run, 45))
      .withColumn("prev_60_days", prevDays(d, run, 60))
      .withColumn("prev_90_days", prevDays(d, run, 90))
      .withColumn("prev_180_days", prevDays(d, run, 180))
      .withColumn("prev_270_days", prevDays(d, run, 270))
      .withColumn("prev_360_days", prevDays(d, run, 360))
      .withColumn("persian_month_lag", monthLag)
      .withColumn("persian_week_lag", weekLag)
      .withColumn("persian_year_lag", year(run) - year(d))
      .withColumn("persian_shifted_week_lag", weekLag + 1)
      .withColumn("is_last_month_mtd",
        month(d) === month(lastMonth) && year(d) === year(lastMonth))
  }

  /** dim_date built from a set of timestamps/dates (distinct scan →
    * keyed dimension). date_id = yyyyMMdd int. */
  def dimDateFrom(dates: DataFrame, dateCol: String): DataFrame =
    dates
      .select(to_date(col(dateCol)).as("d"))
      .distinct()
      .select(
        date_format(col("d"), "yyyyMMdd").cast("int").as("date_id"),
        date_format(col("d"), "yyyy-MM-dd").as("date_string"))
}
