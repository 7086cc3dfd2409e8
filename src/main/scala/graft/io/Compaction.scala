package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the lake
  * maintenance an hourly upsert pipeline accumulates a need for: every
  * micro-batch write (MergeWriter, streaming foreachBatch) lands a few
  * files per partition, and after a month a 100 TB fact's hot
  * partitions hold thousands of KB-sized files. Small files hurt twice:
  * scan planning lists and footers every file (driver-side, serial),
  * and each file under the split size becomes its own task — scheduling
  * overhead dwarfing IO.
  *
  * Partition-scoped, like MergeWriter's writes: each leaf directory is
  * judged independently against the target file size and only
  * OFFENDING leaves (file count materially above what their bytes
  * justify) are rewritten — steady-state cost is O(recently-written
  * partitions), not O(table). The rewrite itself is a `coalesce` (no
  * shuffle: merging splits needs no data movement), staged into a
  * hidden `.compact-staging` subdirectory (readers ignore dot-paths),
  * row-count-validated, then swapped in. Not atomic under concurrent
  * writers — same single-writer model as the reference's hourly DAG
  * and MergeWriter (a table format's rewrite-file commit is the
  * transactional equivalent).
  *
  * Reference behavior replaced: the reference never compacts — Postgres
  * heap storage doesn't fragment this way; per-row psycopg2 inserts
  * (fact_gold_price.py:169-196) push the problem to VACUUM. On a
  * parquet lake the equivalent hygiene is explicit, so the engine
  * ships it.
  */
object Compaction {

  /** One leaf directory's verdict. */
  case class Report(
      leaf: String, bytes: Long, filesBefore: Int, filesAfter: Int,
      rewritten: Boolean)

  /** Compact `dir` (flat, or one level of `col=value` partition
    * subdirectories) toward `targetFileBytes` per file.
    *
    * A leaf is rewritten when its file count exceeds
    * `slack × ideal` where ideal = ceil(bytes / targetFileBytes) —
    * the slack keeps steady-state leaves (already compacted, plus one
    * fresh micro-batch) from being rewritten every run.
    */
  def compact(
      spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      slack: Double = 1.5): Seq[Report] = {
    require(targetFileBytes > 0 && slack >= 1.0)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    leaves(fs, root).map(compactLeaf(spark, fs, _, targetFileBytes, slack))
  }

  /** Leaf data directories: the root itself when flat, else its
    * `col=value` children (one partition level, the layout MergeWriter
    * writes). Hidden (dot/underscore) entries are never leaves. */
  private def leaves(fs: FileSystem, root: Path): Seq[Path] = {
    val children = fs.listStatus(root).toSeq
      .filterNot(st => isHidden(st.getPath))
    val partDirs = children.filter(st =>
      st.isDirectory && st.getPath.getName.contains("="))
    if (partDirs.nonEmpty) partDirs.map(_.getPath) else Seq(root)
  }

  private def isHidden(p: Path): Boolean =
    p.getName.startsWith(".") || p.getName.startsWith("_")

  private def dataFiles(fs: FileSystem, leaf: Path) =
    fs.listStatus(leaf).toSeq
      .filter(st => st.isFile && !isHidden(st.getPath))

  private def compactLeaf(
      spark: SparkSession, fs: FileSystem, leaf: Path,
      targetFileBytes: Long, slack: Double): Report = {
    val files = dataFiles(fs, leaf)
    val bytes = files.map(_.getLen).sum
    val ideal = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    if (files.isEmpty || files.length <= slack * ideal)
      return Report(leaf.toString, bytes, files.length, files.length,
        rewritten = false)

    // coalesce, not repartition: merging scan splits moves no data and
    // preserves the (partition-local) sort order of the existing files
    val df = spark.read.parquet(leaf.toString)
    val expected = df.count()
    val staging = new Path(leaf, ".compact-staging")
    fs.delete(staging, true)
    df.coalesce(ideal.toInt).write.parquet(staging.toString)

    // validate the staged rewrite before touching the live files
    val staged = spark.read.parquet(staging.toString).count()
    require(staged == expected,
      s"compaction of $leaf staged $staged rows, expected $expected — aborting swap")

    files.foreach(st => fs.delete(st.getPath, false))
    dataFiles(fs, staging).foreach { st =>
      fs.rename(st.getPath, new Path(leaf, st.getPath.getName))
    }
    fs.delete(staging, true)
    Report(leaf.toString, bytes, files.length,
      dataFiles(fs, leaf).length, rewritten = true)
  }
}
