package graft

import graft.ops.SchemaEvolution
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkTestBase {

  test("ensureColumns adds missing columns with defaults and keeps existing ones") {
    val s = spark
    import s.implicits._
    val dim = Seq((1, "src_1"), (2, "src_2")).toDF("id", "name")

    val evolved = SchemaEvolution.ensureColumns(dim, Seq(
      "color" -> concat(lit("#"), substring(md5(col("name")), 1, 6)),
      "name" -> lit("SHOULD_NOT_APPLY")))

    assert(evolved.columns.toSeq === Seq("id", "name", "color"))
    val rows = evolved.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(rows.map(_._2) === Set("src_1", "src_2")) // untouched
    assert(rows.forall(_._3.matches("#[0-9a-f]{6}")))

    // idempotent: re-applying the same evolution is a no-op
    val again = SchemaEvolution.ensureColumns(evolved, Seq(
      "color" -> lit("#000000")))
    assert(again.collect().toSet === evolved.collect().toSet)
  }
}
