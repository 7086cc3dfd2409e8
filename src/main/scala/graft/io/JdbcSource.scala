package graft.io

import java.time.{LocalDateTime, ZoneId}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GoldModel

/** JDBC extract source — the warehouse-facing twin of the parquet
  * harness path. The reference's S1 ingest is a PUSHED-DOWN Postgres
  * read (/root/reference/dags/etl/fact_gold_price.py:52-71: projection
  * + closed-hour predicate evaluated inside the source database, only
  * the matching hour crossing the wire). A user pointing this engine at
  * the reference's actual warehouse starts here.
  *
  * Scale design:
  *  - The WHERE clause must reach the database. Spark's JDBC relation
  *    pushes column-vs-literal comparisons but NOT expressions over
  *    columns — so the Tehran wall-clock window is converted to UTC
  *    bounds ON THE DRIVER (constants move across the timezone, the
  *    column stays bare) and the filter lands in `PushedFilters`
  *    (JdbcSourceSpec pins this against the physical plan). Filtering
  *    `from_utc_timestamp(ts) BETWEEN …` instead would drag the whole
  *    table through Spark.
  *  - A single JDBC cursor is one task no matter how many executors
  *    exist. [[readPartitioned]] splits the read into `numPartitions`
  *    range-predicated cursors (Spark appends the bound predicates per
  *    partition), which is the only way a JDBC extract parallelizes.
  *  - `fetchsize` defaults to 10k: driver-shaped JDBC defaults (e.g.
  *    Postgres's fetch-all-rows) otherwise buffer the entire result in
  *    each task.
  */
object JdbcSource {

  val DefaultFetchSize = "10000"

  /** Thin single-cursor read: `table` may be a table name or a
    * `(SELECT …) alias` pushdown subquery. Prefer
    * [[readPartitioned]] for anything larger than a dimension. */
  def read(
      spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", DefaultFetchSize)
      .options(options)
      .load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * cursors, each with a `partitionColumn` range predicate appended by
    * Spark. Bounds only steer the split points — rows outside
    * [lower, upper] still land in the edge partitions, so the read is
    * always complete. */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    read(spark, url, table, options ++ Map(
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString))

  /** The S1 hourly extract over a JDBC `events`-shaped table
    * (event_id, user_id, event_type, value, ts with ts stored UTC):
    * same projection and closed-hour semantics as the parquet-path
    * `s1_hourly_extract`, with the window predicate pushed to the
    * database.
    *
    * @param windowStartLocal inclusive Tehran wall-clock lower bound
    * @param windowEndLocal   inclusive upper bound (the reference uses
    *                         closed BETWEEN, fact_gold_price.py:63-66)
    */
  def hourlyExtract(
      spark: SparkSession, url: String, table: String,
      windowStartLocal: LocalDateTime, windowEndLocal: LocalDateTime,
      options: Map[String, String] = Map.empty): DataFrame = {
    val df = read(spark, url, table, options)
    val local = GoldModel.tehran(col("ts"))
    df.filter(col("ts").between(
        lit(toUtc(windowStartLocal)), lit(toUtc(windowEndLocal))))
      .select(
        col("event_id").as("id"),
        col("user_id").cast("int").as("source_id"),
        GoldModel.sideId(col("event_type")).as("side_id"),
        col("value").as("price"),
        GoldModel.dateId(local).as("date_id"),
        GoldModel.timeId(local).as("time_id"))
      .orderBy(col("id"))
  }

  /** Tehran wall-clock → UTC instant, resolved on the driver so the
    * pushed predicate compares the raw column against a constant. */
  private[graft] def toUtc(local: LocalDateTime): java.sql.Timestamp =
    java.sql.Timestamp.from(
      local.atZone(ZoneId.of("Asia/Tehran")).toInstant)
}
