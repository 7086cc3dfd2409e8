package graft

import graft.ops.{GoldModel, Interpolate}
import org.apache.spark.sql.functions._

/** Differential + invariant tests for the interpolation operator
  * (SURVEY.md §2.9): the declarative plan and the typed flatMapGroups
  * kernel must produce bit-identical outputs, and both must satisfy the
  * reference's invariants (fact_gold_price.py:307-351).
  */
class InterpolateSpec extends SparkTestBase {

  private lazy val factRows =
    GoldModel.factDensifyInput(Tables.events(spark, sfSmoke))
      .select("source_id", "side_id", "date_id", "time_id",
        "rounded_time_id", "price", "is_interpolated")
      .cache()
  private lazy val declarative = Interpolate.densify(factRows).cache()
  private lazy val typed =
    Interpolate.densifyTyped(factRows, Interpolate.gridByDate(factRows)).cache()

  test("declarative and typed kernels agree exactly") {
    val d = declarative
    val t = typed
    assert(d.count() === t.count())
    assert(d.exceptAll(t).isEmpty && t.exceptAll(d).isEmpty,
      "densify() and densifyTyped() diverge")
  }

  test("actual rows pass through unaltered") {
    val actualsIn = factRows
    val actualsOut = declarative.filter(!col("is_interpolated"))
    assert(actualsOut.count() === actualsIn.count())
    assert(actualsOut.exceptAll(actualsIn).isEmpty)
  }

  test("generated rows never collide with a covered (group, minute)") {
    val covered = factRows
      .select("source_id", "side_id", "date_id", "rounded_time_id").distinct()
    val gen = declarative.filter(col("is_interpolated"))
      .select("source_id", "side_id", "date_id", "rounded_time_id")
    val collisions = gen.as("g").join(covered.as("c"),
      Seq("source_id", "side_id", "date_id", "rounded_time_id")
        .map(c => col(s"g.$c") <=> col(s"c.$c")).reduce(_ && _),
      "left_semi")
    assert(collisions.isEmpty, "interpolated a minute that has actuals")
  }

  test("NULL side_id groups are interpolated (dropna=False parity)") {
    val genNull = declarative
      .filter(col("is_interpolated") && col("side_id").isNull)
    assert(genNull.count() > 0,
      "NULL-side groups produced no interpolation — null-key joins broken")
  }

  test("groups with <2 ticks generate nothing") {
    val small = factRows
      .groupBy("source_id", "side_id", "date_id")
      .agg(count(lit(1)).as("n")).filter(col("n") < 2)
      .select("source_id", "side_id", "date_id")
    val genFromSmall = declarative.filter(col("is_interpolated")).as("g")
      .join(small.as("s"),
        Seq("source_id", "side_id", "date_id")
          .map(c => col(s"g.$c") <=> col(s"s.$c")).reduce(_ && _),
        "left_semi")
    assert(genFromSmall.isEmpty)
  }

  test("interior-gap prices lie within the group's [min,max] actual price") {
    // nearest-2 can extrapolate at the edges, but an interpolated value is
    // always on the line through two actual points — so it is bounded by
    // the group's global min/max extended by one full gap slope; the
    // cheap sanity check here: no NaN/NULL prices ever.
    val gen = declarative.filter(col("is_interpolated"))
    assert(gen.filter(col("price").isNull || isnan(col("price"))).isEmpty)
  }
}
