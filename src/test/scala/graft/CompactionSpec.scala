package graft

import java.nio.file.{Files, Path, Paths}

import graft.io.Compaction
import scala.jdk.CollectionConverters._

/** Small-file compaction: content-preserving, partition-scoped (only
  * offending leaves rewritten), steady-state no-op. */
class CompactionSpec extends SparkTestBase {

  private def parquetFiles(dir: Path): Set[String] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .filterNot(_.toString.contains(".compact-staging"))
      .map(_.toString).toSet

  test("flat directory: many small files collapse to the ideal count, content preserved") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 1000L).map(i => (i, s"row_$i")).toDF("id", "v")
      .repartition(20).write.parquet(dir)
    assert(parquetFiles(Paths.get(dir)).size == 20)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    val reports = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(reports.size == 1 && reports.head.rewritten)
    assert(reports.head.filesBefore == 20 && reports.head.filesAfter == 1)
    assert(parquetFiles(Paths.get(dir)).size == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before)
  }

  test("partitioned directory: only the offending partition is rewritten") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // p=1: fragmented (15 files); p=2: already compact (1 file)
    (1L to 500L).map(i => (i, 1)).toDF("id", "p")
      .repartition(15).write.partitionBy("p").parquet(dir)
    (501L to 600L).map(i => (i, 2)).toDF("id", "p")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)
    val compactLeafBefore = parquetFiles(Paths.get(dir, "p=2"))
    assert(compactLeafBefore.size == 1)

    val reports = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
      .sortBy(_.leaf)
    assert(reports.size == 2)
    val Seq(p1, p2) = reports
    assert(p1.rewritten && p1.filesBefore == 15 && p1.filesAfter == 1)
    assert(!p2.rewritten)
    // untouched partition's files are physically identical paths
    assert(parquetFiles(Paths.get(dir, "p=2")) === compactLeafBefore)
    // content intact across the whole table
    assert(spark.read.parquet(dir).count() == 600L)
    assert(spark.read.parquet(dir).filter("p = 1").count() == 500L)
  }

  test("steady state is a no-op: recompaction rewrites nothing") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 100L).toDF("id").repartition(10).write.parquet(dir)
    assert(Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
      .head.rewritten)
    val again = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(again.forall(!_.rewritten), "second compaction must be a no-op")
  }

  test("missing directory yields an empty report") {
    assert(Compaction.compact(spark, "/tmp/graft_compact_nonexistent").isEmpty)
  }

  test("crash before the manifest commit: originals intact, staging discarded") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 200L).map(i => (i, s"row_$i")).toDF("id", "v")
      .repartition(10).write.parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    // simulate a crash after staging but BEFORE the manifest rename:
    // a staged (even validated) copy with no _manifest must be treated
    // as uncommitted garbage
    val staging = Paths.get(dir, ".compact-staging").toString
    spark.read.parquet(dir).coalesce(1).write.parquet(staging)

    val reports = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(reports.head.rewritten) // leaf was fragmented, so it compacts
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before)
    assert(!Files.exists(Paths.get(staging)))
  }

  test("crash after the manifest commit: next run finishes the swap losslessly") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 200L).map(i => (i, s"row_$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val originals = parquetFiles(Paths.get(dir))
      .map(p => Paths.get(p).getFileName.toString)

    // simulate the worst crash window: manifest committed, one original
    // already deleted, staged files not yet moved in — the leaf alone
    // is now INCOMPLETE and only staging holds a full copy
    val staging = Paths.get(dir, ".compact-staging")
    spark.read.parquet(dir).coalesce(1).write.parquet(staging.toString)
    Files.write(staging.resolve("_manifest"),
      originals.mkString("\n").getBytes("UTF-8"))
    Files.delete(Paths.get(dir, originals.head))

    // a new file lands AFTER the crash (not in the manifest): recovery
    // must leave it alone
    Seq((9999L, "late")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)

    Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after == before + ((9999L, "late")),
      s"recovery lost or duplicated rows: ${after.size} vs ${before.size + 1}")
    assert(!Files.exists(staging))
  }
}
