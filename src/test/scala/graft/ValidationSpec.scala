package graft

import graft.ops.{DateFlags, GoldModel, Interpolate, Validation}
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkTestBase {

  private lazy val fact =
    GoldModel.factDensifyInput(Tables.events(spark, sfSmoke)).cache()

  test("densified smoke data passes completeness and null-price gates") {
    // one processing window (single date, like the reference's hourly
    // gate), interpolator-eligible groups only (≥2 ticks): the gate's
    // per-group coverage contract holds exactly there
    val oneDate = fact.filter(col("date_id") === 20240115)
    val eligible = oneDate.groupBy("source_id", "side_id")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("source_id", "side_id")
    val densified = Interpolate.densify(
      oneDate.join(eligible, Seq("source_id", "side_id"), "left_semi")).cache()
    val minutes = densified.select("rounded_time_id").distinct().count()
    val profile = Validation.completenessGate(densified, minutes)
    assert(profile.columns.toSeq ===
      Seq("n_sources", "n_sides", "n_minutes", "n_rows"))
    Validation.nullPriceGate(densified)
  }

  test("completeness gate throws when minutes are missing") {
    val densified = Interpolate.densify(fact)
    intercept[Validation.GateViolation] {
      Validation.completenessGate(densified, Long.MaxValue)
    }
  }

  test("completeness gate catches a group missing grid minutes") {
    val s = spark
    import s.implicits._
    // group (1,1) covers minutes 0..2; group (2,1) covers only minute 0 —
    // global minute coverage is complete, per-group coverage is not
    // (the advisor's ineligible-<2-tick-group scenario)
    val densified = Seq(
      (1, 1, 0, 1.0), (1, 1, 100, 1.0), (1, 1, 200, 1.0),
      (2, 1, 0, 2.0))
      .toDF("source_id", "side_id", "rounded_time_id", "price")
    intercept[Validation.GateViolation] {
      Validation.completenessGate(densified, 3)
    }
  }

  test("null-price gate throws on NaN") {
    val s = spark
    import s.implicits._
    val bad = Seq((1, Double.NaN)).toDF("id", "price")
    intercept[Validation.GateViolation] { Validation.nullPriceGate(bad) }
  }

  test("dim_date gates pass on derived dimension and throw on empty") {
    val dim = DateFlags.withDerivedColumns(
      DateFlags.dimDateFrom(
        Tables.events(spark, sfSmoke)
          .select(GoldModel.tehran(col("ts")).as("local")), "local"),
      lit("2024-01-16"))
    Validation.dimDateGate(dim)
    intercept[Validation.GateViolation] {
      Validation.dimDateGate(dim.filter(lit(false)))
    }
  }
}
