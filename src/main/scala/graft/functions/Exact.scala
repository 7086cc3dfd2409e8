package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (engine-portable) aggregate arithmetic.
  *
  * Floating-point SUM/AVG depend on accumulation order, which differs
  * between Spark's partial+final hash aggregation and any single-node
  * oracle. For columns that carry fixed-point values stored as doubles
  * (prices with 2 decimals), aggregating in `DecimalType` is exact and
  * order-independent; the final cast back to double is a single, fully
  * deterministic conversion. This keeps distributed results bit-identical
  * at any parallelism / partition count — the property that makes a
  * 100 TB run reproducible, not just a local one.
  */
object Exact {
  private val Dec = DecimalType(18, 2)
  /** Decimal(38,4) product sum — for second moments of 2-dp values. */
  private def sq(c: Column): Column = c.cast(Dec) * c.cast(Dec)

  /** Exact SUM of a 2-dp double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact AVG (decimal sum / count) of a 2-dp double column. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(c)

  /** Exact sum of squares (for moment-based variance/stddev). */
  def dsumsq(c: Column): Column = sum(sq(c)).cast("double")

  /** Sample stddev from exact moments: sqrt((Σx² − (Σx)²/n) / (n−1)).
    * Matches Postgres/DuckDB STDDEV (= sample stddev) deterministically:
    * both sums are decimal-exact, the final expression is one fixed
    * IEEE-double evaluation identical in any engine.
    */
  def stddevSampExact(sumx: Column, sumx2: Column, n: Column): Column =
    when(n > 1, sqrt((sumx2 - sumx * sumx / n) / (n - lit(1)))).otherwise(lit(null))
}
