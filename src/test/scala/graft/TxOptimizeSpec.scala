package graft

import java.nio.file.Files

import graft.io.{Layout, TxTable}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The transactional OPTIMIZE ZORDER (io/TxTable.optimizeZOrder):
  * rows-preserving at the manifest level (diff emits nothing), and the
  * physical claim measured on footers — post-optimize row groups carry
  * tight (x, y) bounding boxes where the pre-optimize write's spanned
  * the full plane.
  */
class TxOptimizeSpec extends SparkTestBase {

  /** Mean row-group bounding-box area over BOTH probe dimensions,
    * across every live leaf of the table. */
  private def meanBboxArea(dir: String): Double = {
    val conf = spark.sessionState.newHadoopConf()
    val leaves = TxTable.latest(spark, dir)._2.values.toSeq
    val areas = leaves.flatMap { leaf =>
      val d = new java.io.File(dir, leaf)
      d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          def width(c: String): Double = {
            val st = b.getColumns.asScala
              .find(_.getPath.toDotString == c).get.getStatistics
              .asInstanceOf[org.apache.parquet.column.statistics.DoubleStatistics]
            st.getMax - st.getMin
          }
          width("x") * width("y")
        } finally r.close()
      }
    }
    areas.sum / areas.size
  }

  test("optimizeZOrder preserves rows, commits one version, and tightens both dimensions' zone maps") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_tx_zo").toString + "/fact"
    // (x, y) deliberately interleaved in row order: any contiguous run
    // of rows spans nearly the full plane, so the pre-optimize row
    // groups are useless for either dimension's skipping
    val rows = (1L to 20000L)
      .map(i => (i, (i % 97).toDouble, ((i * 53) % 101).toDouble, (i % 2).toInt))
      .toDF("id", "x", "y", "part")
    val lay = Layout(rowGroupBytes = Some(16L * 1024))
    TxTable.upsert(s, dir, rows, "id", "id", "part", layout = lay)
    val before = meanBboxArea(dir)
    val snapBefore = TxTable.snapshot(s, dir).get
      .collect().map(_.toString).sorted.toSeq

    TxTable.optimizeZOrder(s, dir, "part", "x", "y", layout = lay)

    assert(TxTable.latestVersion(s, dir) == 2L)
    val snapAfter = TxTable.snapshot(s, dir).get
      .collect().map(_.toString).sorted.toSeq
    assert(snapAfter == snapBefore, "optimize changed rows")
    assert(TxTable.diff(s, dir, 1L, 2L, "id").count() == 0,
      "rows-preserving rewrite must diff to nothing")
    val after = meanBboxArea(dir)
    assert(after < before / 2.0,
      s"z-order did not tighten row-group bounding boxes: $before -> $after")
  }

  test("optimizeZOrder on an empty or never-committed table is a no-op") {
    val s = spark
    val dir = Files.createTempDirectory("graft_tx_zo_empty").toString + "/fact"
    TxTable.optimizeZOrder(s, dir, "part", "x", "y")
    assert(TxTable.latestVersion(s, dir) == 0L)
  }
}
