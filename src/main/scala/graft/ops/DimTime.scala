package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-grain time dimension (SURVEY.md §1: `dim_time` keyed by
  * HHmmss int with `second`, `hour24`, `minutefullstring24` —
  * /root/reference/dags/etl/fact_gold_price.py:283-288, :273). The
  * reference assumes the table exists; here it is generated — 86 400
  * rows from one explode, deterministic, always broadcast-joined.
  */
object DimTime {

  /** All 86 400 seconds of a day; minute rows are `second = 0`
    * (fact_gold_price.py:286). */
  def build(spark: SparkSession): DataFrame =
    spark.range(1)
      .select(explode(sequence(lit(0), lit(86399))).as("sec_of_day"))
      .select(
        ((col("sec_of_day") / 3600).cast("int") * 10000 +
          (col("sec_of_day") % 3600 / 60).cast("int") * 100 +
          (col("sec_of_day") % 60).cast("int")).as("time_id"),
        (col("sec_of_day") / 3600).cast("int").as("hour24"),
        (col("sec_of_day") % 3600 / 60).cast("int").as("minute"),
        (col("sec_of_day") % 60).cast("int").as("second"))
      .withColumn("minutefullstring24",
        concat(
          lpad(col("hour24").cast("string"), 2, "0"), lit(":"),
          lpad(col("minute").cast("string"), 2, "0")))
}
