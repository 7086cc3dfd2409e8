package graft

import java.nio.file.{Files, Path, Paths}

import graft.io.MergeWriter
import scala.jdk.CollectionConverters._

/** Partition-scoped upsert: latest-wins semantics AND the physical
  * guarantee that untouched partitions' files are not rewritten —
  * the property that bounds hourly-merge cost at 100 TB.
  */
class MergeWriterSpec extends SparkTestBase {

  private def filesOf(dir: Path): Set[String] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSet

  test("upsertPartitioned merges latest-wins and rewrites only touched partitions") {
    val s = spark
    import s.implicits._
    val target = Files.createTempDirectory("graft_merge").toString + "/fact"

    // bootstrap: two date partitions
    MergeWriter.upsertPartitioned(spark, target,
      Seq(
        (1L, 100.0, 1L, 20240101),
        (2L, 101.0, 1L, 20240101),
        (3L, 200.0, 1L, 20240102)
      ).toDF("id", "price", "etl_seq", "date_id"),
      "id", "etl_seq", "date_id")

    val untouchedBefore = filesOf(Paths.get(target, "date_id=20240102"))
    assert(untouchedBefore.nonEmpty)

    // hourly batch: replay id=2 with new price, insert id=4 — only
    // 20240101 is touched
    MergeWriter.upsertPartitioned(spark, target,
      Seq(
        (2L, 151.0, 2L, 20240101),
        (4L, 102.0, 2L, 20240101)
      ).toDF("id", "price", "etl_seq", "date_id"),
      "id", "etl_seq", "date_id")

    val out = spark.read.parquet(target)
      .select("id", "price", "date_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(out === Set(
      (1L, 100.0, 20240101),
      (2L, 151.0, 20240101), // replay overwrote, no duplicate
      (3L, 200.0, 20240102),
      (4L, 102.0, 20240101)))

    // the untouched date's physical files are bit-identical (same paths,
    // never rewritten)
    assert(filesOf(Paths.get(target, "date_id=20240102")) === untouchedBefore)
  }

  test("upsert is idempotent: replaying the same batch changes nothing") {
    val s = spark
    import s.implicits._
    val target = Files.createTempDirectory("graft_merge_idem").toString + "/fact"
    val batch = Seq((1L, 10.0, 1L, 20240101), (2L, 20.0, 1L, 20240101))
      .toDF("id", "price", "etl_seq", "date_id")
    MergeWriter.upsertPartitioned(spark, target, batch, "id", "etl_seq", "date_id")
    MergeWriter.upsertPartitioned(spark, target, batch, "id", "etl_seq", "date_id")
    assert(spark.read.parquet(target).count() === 2)
  }
}
