package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the mergeable-partials pattern.
  *
  * The reference recomputes its hourly summaries by re-reading the
  * window it just wrote (`/root/reference/dags/etl/fact_gold_price.py:394-413`
  * re-aggregates the hour after the upsert). At lake scale the same
  * dashboard must NOT rescan history every hour: the engine instead
  * maintains a keyed STATE table of algebraic aggregate components —
  * (count, decimal sum, min, max) — and each increment is
  * `merge(state(old), state(delta))`, touching only delta-sized input
  * plus the state table (key-cardinality-sized, orders of magnitude
  * smaller than the fact).
  *
  * Why these components: count/sum/min/max are the canonical
  * commutative monoids — `state(A ∪ B) = merge(state(A), state(B))`
  * exactly, for ANY partitioning of the input (the law
  * `IncrementalSpec` pins). Derived measures (avg here; variance would
  * add a decimal sum-of-squares, see [[graft.functions.Exact]]) are
  * computed only at finalize, never stored — storing `avg` would make
  * the state non-mergeable. Sums accumulate in `DecimalType`, so the
  * merged result is bit-identical to a from-scratch rebuild at any
  * merge order — the property that lets an incremental pipeline prove
  * itself against a full recompute (the DuckDB oracle of
  * `q:x_incr_agg` is exactly that full recompute).
  *
  * This is the same decomposition Spark's own partial/final hash
  * aggregation uses inside ONE query; here it is reified into a
  * DataFrame so the partial can live in a table BETWEEN jobs.
  */
object Incremental {
  private val Dec = DecimalType(18, 2)

  /** Aggregate a fact slice into mergeable per-key state. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("cnt"),
        sum(col(valueCol).cast(Dec)).as("sum_dec"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of state tables (re-aggregation of components).
    * Decimal sums widen precision on merge; [[finalize]] normalizes. */
  def merge(keys: Seq[String])(states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Finalize state into user-facing measures (exact-decimal sum and
    * the derived average, cast once to double). */
  def finalize(state: DataFrame): DataFrame =
    state
      .withColumn("sum_v", col("sum_dec").cast("double"))
      .withColumn("avg_v", col("sum_dec").cast("double") / col("cnt"))
      .drop("sum_dec")
}
