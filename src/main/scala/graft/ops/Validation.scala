package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime data-quality gates (SURVEY.md §2.12): the reference's only
  * correctness assurance is in-pipeline validation —
  * `validate_interpolated_data`
  * (/root/reference/dags/etl/fact_gold_price.py:382-469) and
  * `verify_dim_date_data` (dags/etl/dim_date_etl_dag.py:103-137). Each
  * gate is one aggregate computed distributed and asserted on the
  * driver; a violation throws, which is the Spark-native equivalent of
  * the reference failing the task and routing to its ONE_FAILED alert.
  */
object Validation {

  final case class GateViolation(msg: String) extends RuntimeException(msg)

  /** Completeness gate: the densified window must hold
    * sources × sides × minutes coverage (fact_gold_price.py:433-440).
    * Enforced as per-group coverage — EVERY (source_id, side_id) group
    * must cover all `expectedMinutes` grid minutes — which is the
    * reference's `total == sources × sides × 60` identity made robust to
    * minutes holding more than one actual tick: a group the interpolator
    * skipped (<2 actuals) or a group missing grid minutes fails even
    * when every minute is covered by some other group. Returns the
    * profile row it checked. */
  def completenessGate(densified: DataFrame, expectedMinutes: Long): DataFrame = {
    val profile = densified.agg(
      countDistinct(col("source_id")).as("n_sources"),
      // count NULL side as its own side like the reference's pandas
      // dropna=False grouping: countDistinct skips NULLs, so add the
      // null-side indicator explicitly
      (countDistinct(col("side_id")) +
        max(when(col("side_id").isNull, 1).otherwise(0))).as("n_sides"),
      countDistinct(col("rounded_time_id")).as("n_minutes"),
      count(lit(1)).as("n_rows"))
    val r = profile.collect()(0)
    val nMinutes = r.getAs[Long]("n_minutes")
    if (nMinutes < expectedMinutes)
      throw GateViolation(
        s"completeness: $nMinutes of $expectedMinutes grid minutes present")
    // per-group coverage: one distributed agg, one small collect
    val short = densified
      .groupBy(col("source_id"), col("side_id"))
      .agg(countDistinct(col("rounded_time_id")).as("g_minutes"))
      .filter(col("g_minutes") < expectedMinutes)
      .count()
    if (short > 0)
      throw GateViolation(
        s"completeness: $short source×side groups cover fewer than " +
          s"$expectedMinutes grid minutes")
    profile
  }

  /** Null-price gate (fact_gold_price.py:443-460): no NULL or NaN price
    * may survive densification. */
  def nullPriceGate(densified: DataFrame): Unit = {
    val bad = densified
      .filter(col("price").isNull || isnan(col("price"))).count()
    if (bad > 0) throw GateViolation(s"null/NaN prices: $bad rows")
  }

  /** dim_date integrity gates (dim_date_etl_dag.py:113-128): non-empty
    * (fatal like the reference), no NULL date_string, dates inside the
    * sanity range, exactly one `today`. */
  def dimDateGate(dimDate: DataFrame): Unit = {
    val r = dimDate.agg(
      count(lit(1)).as("n"),
      sum(when(col("date_string").isNull, 1).otherwise(0)).as("null_ds"),
      sum(when(to_date(col("date_string")) < lit("1900-01-01").cast("date") ||
        to_date(col("date_string")) > lit("2100-12-31").cast("date"), 1)
        .otherwise(0)).as("out_of_range"),
      sum(col("today")).as("n_today")).collect()(0)
    if (r.getAs[Long]("n") == 0L) throw GateViolation("dim_date is empty")
    if (r.getAs[Long]("null_ds") > 0L) throw GateViolation("NULL date_string")
    if (r.getAs[Long]("out_of_range") > 0L) throw GateViolation("date out of sanity range")
    // != 1, not > 1: a stale dimension where the run date is absent
    // (zero today flags) is exactly the failure this gate exists to catch
    if (r.getAs[Long]("n_today") != 1L)
      throw GateViolation(
        s"expected exactly one 'today' flag, found ${r.getAs[Long]("n_today")}")
  }
}
