package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema derivation: maps the `events` stream table onto the
  * reference's gold-price warehouse model so every reference pipeline
  * has a faithful, deterministic equivalent on the shared corpus.
  *
  * Reference model (SURVEY.md §1; DDL at
  * /root/reference/dags/etl/fact_gold_price.py:125-135):
  *   tick(id, source, side, currency, price, created_at)
  *     → fact(id, source_id, side_id, price, date_id, time_id)
  * Mapping onto `events` (FIXTURES.md §B):
  *   event_id→id, user_id→source_id, event_type→side (with 'error'
  *   deliberately unmapped so side_id is NULL — preserving the
  *   reference's nullable-key semantics, dw_helpers.py:172-173),
  *   value→price, ts→created_at.
  *
  * All key derivation is Asia/Tehran wall-clock exactly like the
  * reference (fact_gold_price.py:61-66): date_id = yyyyMMdd int,
  * time_id = HHmmss int, rounded_time_id = minute-truncated time_id
  * (fact_gold_price.py:262-266).
  */
object GoldModel {

  /** side name → id, as a CASE with no otherwise: unknown side ('error')
    * yields NULL, replicating the reference's missed-lookup semantics
    * (P1-style no-ELSE CASE, fact_gold_price.py:57-60). */
  def sideId(eventType: Column): Column =
    when(eventType === "click", 1)
      .when(eventType === "purchase", 2)
      .when(eventType === "signup", 3)
      .when(eventType === "view", 4)

  /** Tehran-local timestamp of a UTC-stored tick (F4,
    * fact_gold_price.py:61-66). */
  def tehran(ts: Column): Column = from_utc_timestamp(ts, "Asia/Tehran")

  def dateId(tsLocal: Column): Column =
    date_format(tsLocal, "yyyyMMdd").cast("int")

  def timeId(tsLocal: Column): Column =
    date_format(tsLocal, "HHmmss").cast("int")

  /** P5 minute truncation (fact_gold_price.py:262-266). The reference's
    * CASE WHEN time_id%100=0 branch is redundant — t − t%100 is
    * identical for both branches — so we emit the simplified form and
    * let Catalyst fold it. */
  def roundedTimeId(timeId: Column): Column = timeId - (timeId % 100)

  /** events → fact_gold_price-shaped DataFrame.
    * Narrow projection only (column pruning reaches the parquet scan);
    * no shuffle — this is a pure map stage. */
  def fact(events: DataFrame): DataFrame = {
    val local = tehran(col("ts"))
    events.select(
      col("event_id").as("id"),
      col("user_id").cast("int").as("source_id"),
      sideId(col("event_type")).as("side_id"),
      col("value").as("price"),
      dateId(local).as("date_id"),
      timeId(local).as("time_id")
    )
  }

  /** fact + rounded_time_id + is_interpolated=false — the T1 "copy"
    * projection feeding densification (fact_gold_price.py:252-279). */
  def factDensifyInput(events: DataFrame): DataFrame =
    fact(events)
      .withColumn("rounded_time_id", roundedTimeId(col("time_id")))
      .withColumn("is_interpolated", lit(false))

  /** Deterministic color for a source name — the reference hashes
    * md5(name) to '#rrggbb' (F14, populate_sources_dag.py:62-72).
    * Pure built-ins: exact parity with any md5-capable engine. */
  def colorOf(name: Column): Column =
    concat(lit("#"), substring(md5(name), 1, 6))

  /** `sources` dimension derived from the fact's distinct source ids
    * (S4 discovery scan, populate_sources_dag.py:41-45), with name,
    * color and a deterministic soft-delete marker (id % 7 == 3) so the
    * S3/P4 `deleted_at IS NULL` path is exercised. Tiny by construction
    * → always broadcast-joined. */
  def sourcesDim(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id").cast("int").as("id"))
      .agg(min("event_id").as("first_id"))
      .select(
        col("id"),
        concat(lit("src_"), col("id").cast("string")).as("name"),
        col("first_id"))
      .withColumn("color", colorOf(col("name")))
      .withColumn(
        "deleted_at",
        when(col("id") % 7 === 3, to_timestamp(lit("2024-02-01 00:00:00"))))

  /** `sides` dimension (dw_helpers.py:58-65). */
  def sidesDim(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type").as("name")).distinct()
    e.select(sideId(col("name")).as("id"), col("name"))
      .filter(col("id").isNotNull)
  }
}
