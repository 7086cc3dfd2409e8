package graft

import graft.ops.{DateFlags, GoldModel, Interpolate, Validation}
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkTestBase {

  private lazy val fact =
    GoldModel.factDensifyInput(Tables.events(spark, sfSmoke)).cache()

  test("densified smoke data passes completeness and null-price gates") {
    val densified = Interpolate.densify(fact).cache()
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
