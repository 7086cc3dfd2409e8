package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

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
  * hidden `.compact-staging` subdirectory (readers ignore dot-paths)
  * and row-count-validated there before any live file is touched.
  *
  * The swap is CRASH-SAFE via a manifest commit point:
  *
  *  1. stage the rewrite; validate its row count (observed on the
  *     write job itself — no extra read pass of the originals);
  *  2. atomically rename `_manifest.tmp` → `_manifest` inside staging,
  *     listing exactly the original files the rewrite supersedes —
  *     this rename IS the commit;
  *  3. delete the superseded originals, move the staged files in,
  *     drop staging.
  *
  * A crash before (2) leaves the originals untouched and the next run
  * discards the uncommitted staging. A crash after (2) is finished by
  * the next run's recovery: it deletes whatever manifest-listed
  * originals remain, moves the staged files in (skipping any already
  * moved), and drops staging — files that landed in the leaf after the
  * crash are not listed in the manifest and are never touched. At no
  * point is the only copy of the data in a directory that a later run
  * deletes blindly. Readers racing the swap window can see a partial
  * leaf — same single-writer/maintenance-window model as MergeWriter
  * and the reference's hourly DAG (a table format's rewrite-file
  * commit is the transactional equivalent) — but a crash never loses
  * data.
  *
  * Reference behavior replaced: the reference never compacts — Postgres
  * heap storage doesn't fragment this way; per-row psycopg2 inserts
  * (fact_gold_price.py:169-196) push the problem to VACUUM. On a
  * parquet lake the equivalent hygiene is explicit, so the engine
  * ships it.
  */
object Compaction {

  private val StagingName = ".compact-staging"
  private val ManifestName = "_manifest"

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

  /** Finish or discard an interrupted swap (idempotent; no-op when no
    * staging directory exists). See the commit protocol above. */
  private def recover(fs: FileSystem, leaf: Path): Unit = {
    val staging = new Path(leaf, StagingName)
    if (!fs.exists(staging)) return
    val manifest = new Path(staging, ManifestName)
    if (!fs.exists(manifest)) {
      // crash before the commit point: originals are intact, the
      // staging content is an unvalidated copy — discard it
      fs.delete(staging, true)
      return
    }
    // committed: the staged copy is the leaf's data. Delete whatever
    // superseded originals remain, move staged files in (skipping any
    // a previous recovery attempt already moved), drop staging. Every
    // FileSystem call is CHECKED — Hadoop signals failure by returning
    // false, and in this path an unchecked false either loses the only
    // copy (failed rename swallowed by the final staging delete) or
    // duplicates rows (failed original delete); on any failure we stop
    // with staging intact, so a later run can still finish the swap.
    readManifest(fs, manifest).foreach { name =>
      val orig = new Path(leaf, name)
      if (fs.exists(orig))
        require(fs.delete(orig, false),
          s"compaction recovery: could not delete superseded $orig")
    }
    dataFiles(fs, staging).foreach { st =>
      val dest = new Path(leaf, st.getPath.getName)
      if (fs.exists(dest))
        require(fs.delete(st.getPath, false),
          s"compaction recovery: could not drop already-moved ${st.getPath}")
      else
        require(fs.rename(st.getPath, dest),
          s"compaction recovery: could not move ${st.getPath} into $leaf")
    }
    require(fs.delete(staging, true),
      s"compaction recovery: could not remove staging $staging")
  }

  private def readManifest(fs: FileSystem, manifest: Path): Seq[String] = {
    val in = fs.open(manifest)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Write the manifest under a temp name, then atomically rename it
    * into place — the rename is the swap's commit point, so a torn
    * manifest can never be observed. */
  private def commitManifest(
      fs: FileSystem, staging: Path, superseded: Seq[String]): Unit = {
    val tmp = new Path(staging, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(superseded.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, new Path(staging, ManifestName)),
      s"could not commit compaction manifest in $staging")
  }

  private def compactLeaf(
      spark: SparkSession, fs: FileSystem, leaf: Path,
      targetFileBytes: Long, slack: Double): Report = {
    recover(fs, leaf)
    val files = dataFiles(fs, leaf)
    val bytes = files.map(_.getLen).sum
    val ideal = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    if (files.isEmpty || files.length <= slack * ideal)
      return Report(leaf.toString, bytes, files.length, files.length,
        rewritten = false)

    // coalesce, not repartition: merging scan splits moves no data and
    // preserves the (partition-local) sort order of the existing files.
    // The input row count is observed on this same job — the originals
    // are read exactly once. The read takes the EXPLICIT file list (the
    // exact set the manifest will supersede), not the directory: a
    // micro-batch file landing between our listing and the rewrite
    // job's own listing would otherwise be folded into the rewrite but
    // not superseded — duplicated after the swap.
    val staging = new Path(leaf, StagingName)
    fs.delete(staging, true)
    val obs = Observation()
    spark.read.parquet(files.map(_.getPath.toString): _*)
      .observe(obs, count(lit(1)).as("rows"))
      .coalesce(ideal.toInt).write.parquet(staging.toString)
    val expected = obs.get("rows").asInstanceOf[Long]

    // validate the staged rewrite before committing
    val staged = spark.read.parquet(staging.toString).count()
    require(staged == expected,
      s"compaction of $leaf staged $staged rows, expected $expected — aborting swap")

    commitManifest(fs, staging, files.map(_.getPath.getName))
    recover(fs, leaf) // the committed swap and its recovery are one path
    Report(leaf.toString, bytes, files.length,
      dataFiles(fs, leaf).length, rewritten = true)
  }
}
