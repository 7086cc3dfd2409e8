package graft

import graft.ops.Merge
import org.apache.spark.sql.functions._

/** Laws of the CDC apply (ops/Merge.applyCdc) on adversarial literal
  * frames — edge semantics the oracle query's derived change log never
  * hits.
  */
class MergeCdcSpec extends SparkTestBase {

  private def target = {
    val s = spark; import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
  }

  private def changes = {
    val s = spark; import s.implicits._
    Seq(
      (2L, "U", 1L, "b2", 21.0),   // update existing
      (3L, "D", 1L, "", 0.0),      // delete existing
      (4L, "I", 1L, "d", 40.0),    // insert new
      (5L, "D", 1L, "", 0.0),      // delete of a key that never existed
      (6L, "U", 1L, "f1", 60.0),   // update of a missing key…
      (6L, "U", 2L, "f2", 61.0))   // …overridden by a later seq
      .toDF("id", "op", "seq", "name", "v")
  }

  private def applied = Merge.applyCdc(target, changes, "id", "op", "seq")

  test("all three actions land; phantom deletes vanish; latest seq wins") {
    val out = applied.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0),   // untouched passes through
      (2L, "b2", 21.0),  // U applied
      (4L, "d", 40.0),   // I applied
      (6L, "f2", 61.0))) // missing-key U upserts, seq 2 beats seq 1
    // 3 deleted, phantom 5 produced nothing
  }

  test("re-applying the same change log is a no-op (idempotent replay)") {
    val once = applied
    val twice = Merge.applyCdc(once, changes, "id", "op", "seq")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "CDC apply is not idempotent under replay")
  }

  test("equal-seq conflict resolves deterministically at any partitioning") {
    val s = spark; import s.implicits._
    val conflict = Seq(
      (2L, "U", 5L, "x", 1.0),
      (2L, "U", 5L, "y", 2.0)).toDF("id", "op", "seq", "name", "v")
    val a = Merge.applyCdc(target, conflict.repartition(1), "id", "op", "seq")
      .filter(col("id") === 2).collect()
    val b = Merge.applyCdc(target, conflict.repartition(7), "id", "op", "seq")
      .filter(col("id") === 2).collect()
    assert(a.sameElements(b), "equal-seq survivor depends on partitioning")
  }

  test("equal-seq D-vs-U with identical payload resolves deterministically") {
    // the adversarial corner of the tie-break: seq AND payload equal,
    // only the op differs — the op must participate in the hash or the
    // key is deleted on one partitioning and upserted on another
    val s = spark; import s.implicits._
    val conflict = Seq(
      (2L, "D", 5L, "b", 20.0),
      (2L, "U", 5L, "b", 20.0)).toDF("id", "op", "seq", "name", "v")
    val results = Seq(1, 3, 7, 16).map { p =>
      Merge.applyCdc(target, conflict.repartition(p), "id", "op", "seq")
        .filter(col("id") === 2).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    }
    assert(results.distinct.size == 1,
      s"D-vs-U survivor depends on partitioning: ${results.distinct}")
  }
}
