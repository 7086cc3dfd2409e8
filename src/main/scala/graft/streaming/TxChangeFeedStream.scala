package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming-NATIVE face of the change feed: [[TxChangeFeed]]
  * is a driver loop (justified there — an applyCdc-style consumer wants
  * the per-commit diff plan and its own cursor), which means watermarks,
  * windowed aggregates, and stateful operators cannot compose with it.
  * This module closes that gap with the FILE-SOURCE bridge the public
  * streaming systems use for exactly this shape (a CDC spool feeding a
  * streaming job): each commit's row-level diff is materialized once
  * into a spool directory — an append-only parquet log, one write per
  * commit (or per `commitsPerAppend` commits on a catch-up drain), each
  * row stamped with its `_commit_version` — and a genuine `readStream`
  * file source tails that spool. Everything downstream is ordinary
  * Structured Streaming: `withWatermark`, `window`/`session_window`
  * aggregates, stream-stream joins, `foreachBatch` — none of which the
  * driver-loop feed could host.
  *
  * Why a spool and not a custom V2 MicroBatchStream: the spool IS the
  * V2 source's offset log made visible — file names are the offsets,
  * the file source's own tracking provides exactly-once per file — with
  * none of the scaffolding, and it doubles as a replayable archive of
  * the feed (a late consumer replays from file 0 without touching the
  * table). The COMMIT-LOG-NATIVE alternative that needs no spool at all
  * is `spark.readStream.format("graft-tx")` ([[graft.io.TxStreamSource]]);
  * the spool remains the right shape when the feed must also be an
  * archive or feed non-Spark consumers. Scale shape: spooling a commit
  * costs the partitions that commit touched (TxTable.diff's manifest
  * pruning); the spool grows with CHANGE volume, not table size, and is
  * plain parquet — reclaim it by age with [[vacuumSpool]].
  */
object TxChangeFeedStream {

  /** Marker recording the highest `_commit_version` reclaimed by
    * [[vacuumSpool]]. Leading underscore: Spark/Hadoop's default path
    * filter hides it from both batch and streaming reads of the dir. */
  private val HorizonFile = "_spool_horizon"

  /** The stamp column is injected into every spooled row; a payload
    * already carrying the name would be silently overwritten — the same
    * reserved-name discipline as mirror/replicate's _op/_seq. */
  private def requireNoStampCollision(d: DataFrame): Unit =
    require(!d.columns.contains("_commit_version"),
      "change-feed payload carries reserved column _commit_version — rename it upstream")

  /** Drain every commit after `fromVersion` into the spool and return
    * the new cursor — the Trigger.AvailableNow half: call it on a
    * cadence, persist the cursor, and the spool stays an exact, ordered
    * copy of the feed. Idempotence contract is the cursor (same as
    * [[TxChangeFeed.drain]]): never re-spool a version already landed.
    *
    * @param commitsPerAppend batch size of the catch-up path: a
    *   long-gap drain at 1 (the default, and the per-commit tail shape)
    *   is one Spark write job PER COMMIT — O(commits) jobs. A larger
    *   value unions that many commits' (manifest-pruned) diffs into ONE
    *   append, each row still stamped with its own `_commit_version`,
    *   so a 10k-commit catch-up is ceil(10k/N) jobs instead of 10k. The
    *   union is re-hashed on the stamp before writing so a chunk lands
    *   as O(shuffle partitions) files, not (commits × join partitions)
    *   — one extra exchange of change-volume-sized data, the same
    *   trade as Layout.optimizeWrite. */
  def spool(
      spark: SparkSession, dir: String, key: String,
      spoolDir: String, fromVersion: Long = 0L,
      commitsPerAppend: Int = 1): Long = {
    require(commitsPerAppend >= 1, "commitsPerAppend must be >= 1")
    var cursor = fromVersion
    TxChangeFeed.drain(spark, dir, key, fromVersion)
      .grouped(commitsPerAppend).foreach { chunk =>
        val stamped = chunk.map { case (v, d) =>
          requireNoStampCollision(d)
          d.withColumn("_commit_version", lit(v))
        }
        // allowMissingColumns: a schema-widening commit inside a chunk
        // widens the whole chunk, pre-evolution rows null-padded — the
        // same alignment every cross-version TxTable read performs
        val body = stamped.reduce(_.unionByName(_, allowMissingColumns = true))
        val placed =
          if (chunk.size == 1) body // per-commit tail: byte-identical to before
          else body.repartition(col("_commit_version"))
        placed.write.mode("append").parquet(spoolDir)
        cursor = chunk.last._1
      }
    cursor
  }

  /** Continuous tail into the spool — the processing-trigger half:
    * polls the commit log every `pollMs` (an O(1) tip probe) and
    * appends each new commit until `stop()`. Returns the final
    * cursor. */
  def followInto(
      spark: SparkSession, dir: String, key: String, spoolDir: String,
      fromVersion: Long, pollMs: Long, stop: () => Boolean): Long =
    TxChangeFeed.follow(spark, dir, key, fromVersion, pollMs, stop) {
      (v, d) =>
        requireNoStampCollision(d)
        d.withColumn("_commit_version", lit(v))
          .write.mode("append").parquet(spoolDir)
    }

  /** Age-based spool retention — the "vacuum it like any log directory"
    * verb, made safe against the two silent failure modes a bare
    * delete-old-files has:
    *
    *  - A RUNNING (or restartable) stream's exactly-once contract: the
    *    file source re-reads only files named in a PLANNED-BUT-UNCOMMITTED
    *    offset-log batch, so the operator rule is `olderThanMs` must
    *    exceed the oldest in-flight batch's age (any committed
    *    checkpoint never re-reads its files — a restart from a
    *    checkpoint PAST the horizon replays correctly, spec-pinned).
    *    Never reclaim past a live checkpoint's position.
    *  - A FRESH consumer silently starting mid-history: the highest
    *    reclaimed `_commit_version` is recorded in a `_spool_horizon`
    *    marker (written BEFORE the deletes — a crash between the two
    *    leaves the horizon conservatively high, never silently low),
    *    and [[source]] refuses a consumer whose `resumeFromVersion`
    *    sits below it — replay-from-zero after a vacuum must fail
    *    loudly, the re-bootstrap-from-a-snapshot contract every
    *    log-tailing CDC source documents.
    *
    * Returns the number of spool files reclaimed. */
  def vacuumSpool(
      spark: SparkSession, spoolDir: String, olderThanMs: Long): Int = {
    val p = new Path(spoolDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    val aged = fs.listStatus(p).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          s.getModificationTime <= cutoff
      }
    if (aged.isEmpty) return 0
    // the horizon is the max stamp across the aged files — one bounded
    // read of exactly the files being reclaimed. A rows-preserving
    // commit (compaction, optimize) spools an EMPTY diff, so an aged
    // set can be all-empty: nothing replayable is being lost, the
    // horizon stays where it was.
    val maxRow = spark.read.parquet(aged.map(_.getPath.toString): _*)
      .agg(max(col("_commit_version"))).head()
    val prior = readHorizon(spark, spoolDir)
    val horizon =
      if (maxRow.isNullAt(0)) prior else math.max(prior, maxRow.getLong(0))
    if (horizon > prior) writeHorizon(fs, p, horizon)
    aged.foreach { s =>
      fs.delete(s.getPath, false): Unit
      // local FSs shadow each file with a .name.crc checksum sibling —
      // reclaim it too, or the spool dir accumulates orphans forever
      val crc = new Path(s.getPath.getParent, s".${s.getPath.getName}.crc")
      if (fs.exists(crc)) fs.delete(crc, false): Unit
    }
    aged.size
  }

  /** Fold aged per-commit spool files into consolidated ARCHIVE files —
    * [[vacuumSpool]]'s shape with the content preserved instead of
    * reclaimed. A per-commit tail writes one small file per commit; a
    * year of that is a small-files problem for every replay. Compaction
    * cannot simply rewrite the live directory: a RUNNING stream's file
    * source would see each consolidated file as NEW and re-emit every
    * row it already processed. So the fold lands under `_archive/`
    * (leading underscore — invisible to both the running stream and any
    * fresh `readStream`), the `_spool_horizon` marker advances exactly
    * as vacuum's does (a fresh streaming consumer below it must refuse,
    * since the live view no longer holds that history), and the
    * originals are deleted last. [[replaySpool]] is the archive-aware
    * batch read that late consumers bootstrap from.
    *
    * Crash-safe by self-healing, not by atomicity: archive-then-delete
    * means a crash can leave rows present in BOTH views (or a re-run
    * re-archive them) — diff rows are unique per (commit, key), so
    * [[replaySpool]]'s exact-duplicate `distinct` restores the exact
    * feed, and re-running compaction completes the interrupted pass.
    * The age contract is [[vacuumSpool]]'s: `olderThanMs` must exceed
    * the oldest in-flight (planned-but-uncommitted) batch's age of any
    * running stream. Returns the number of live files folded. */
  def compactSpool(
      spark: SparkSession, spoolDir: String, olderThanMs: Long,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new Path(spoolDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    val aged = fs.listStatus(p).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          s.getModificationTime <= cutoff
      }
    if (aged.isEmpty) return 0
    val body = spark.read.option("mergeSchema", "true")
      .parquet(aged.map(_.getPath.toString): _*)
    val files = math.max(1L,
      (aged.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
    // the horizon stat first: a column-pruned scan of just the stamp
    // column (cheap next to the full-row archive pass that follows)
    val maxRow = body.agg(max(col("_commit_version"))).head()
    // archive append BEFORE horizon/deletes: content must exist in the
    // hidden view before the live view loses it
    body.coalesce(files).write.mode("append")
      .parquet(s"$spoolDir/$ArchiveDir")
    val prior = readHorizon(spark, spoolDir)
    val horizon =
      if (maxRow.isNullAt(0)) prior else math.max(prior, maxRow.getLong(0))
    if (horizon > prior) writeHorizon(fs, p, horizon)
    aged.foreach { s =>
      fs.delete(s.getPath, false): Unit
      val crc = new Path(s.getPath.getParent, s".${s.getPath.getName}.crc")
      if (fs.exists(crc)) fs.delete(crc, false): Unit
    }
    aged.size
  }

  /** Re-fold an `_archive/` that has itself accumulated many files —
    * the second-generation compaction a long-lived spool needs: each
    * [[compactSpool]] round APPENDS one consolidated batch, so a year
    * of monthly rounds is 12+ archive files (plus whatever a
    * small-`targetBytes` round produced), and every [[replaySpool]]
    * bootstrap pays the file-open count. This pass rewrites the whole
    * archive into ceil(bytes/targetBytes) files in place.
    *
    * Crash-safety is [[compactSpool]]'s own discipline, one level down:
    * consolidated files land (append) BEFORE the originals are deleted,
    * so a crash leaves rows present twice and [[replaySpool]]'s
    * exact-duplicate `distinct` still restores the exact feed; re-
    * running completes the pass. The horizon does not move — content is
    * preserved, only file identity changes — and no running stream ever
    * reads `_archive/` (underscore-hidden), so there is no age contract
    * here at all. No-op (returns 0) when the archive is already at or
    * under the target file count. Returns the number of files folded. */
  def compactArchive(
      spark: SparkSession, spoolDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val arch = new Path(spoolDir, ArchiveDir)
    val fs = arch.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(arch)) return 0
    val files = fs.listStatus(arch).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val target = math.max(1L,
      (files.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
    if (files.size <= target) return 0
    // explicit file paths, not the directory: the scan's file list must
    // not pick up the consolidated files this very pass appends
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(_.getPath.toString): _*)
      .coalesce(target).write.mode("append").parquet(arch.toString)
    files.foreach { s =>
      fs.delete(s.getPath, false): Unit
      val crc = new Path(s.getPath.getParent, s".${s.getPath.getName}.crc")
      if (fs.exists(crc)) fs.delete(crc, false): Unit
    }
    files.size
  }

  /** The full feed as ONE batch frame: archive ∪ live, exact-duplicate
    * rows collapsed (only a crashed/re-run compaction produces them —
    * diff rows are unique per (commit, key), so `distinct` is identity
    * on a healthy spool). This is the late-consumer bootstrap the
    * horizon refusal in [[source]] points at. */
  def replaySpool(spark: SparkSession, spoolDir: String): DataFrame = {
    val p = new Path(spoolDir)
    val arch = new Path(p, ArchiveDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a fully-compacted spool has NO live parquet files — a bare
    // directory read would fail schema inference, so each side reads
    // only if it holds files
    val liveFiles =
      if (fs.exists(p)) fs.listStatus(p).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      } else Seq.empty
    val sides = Seq(
      if (fs.exists(arch)) Some(spark.read.option("mergeSchema", "true")
        .parquet(arch.toString)) else None,
      if (liveFiles.nonEmpty) Some(spark.read.option("mergeSchema", "true")
        .parquet(liveFiles.map(_.getPath.toString): _*)) else None).flatten
    require(sides.nonEmpty, s"spool $spoolDir holds no feed files")
    sides.reduce(_.unionByName(_, allowMissingColumns = true)).distinct()
  }

  private val ArchiveDir = "_archive"

  private def writeHorizon(
      fs: org.apache.hadoop.fs.FileSystem, p: Path, horizon: Long): Unit = {
    val tmp = new Path(p, s".horizon-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(s"$horizon\n".getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(p, HorizonFile))) {
      fs.delete(new Path(p, HorizonFile), false)
      fs.rename(tmp, new Path(p, HorizonFile)): Unit
    }
  }

  /** Highest `_commit_version` reclaimed from this spool (0 = nothing
    * ever vacuumed): versions at or below it are NOT fully replayable
    * from the spool. */
  def readHorizon(spark: SparkSession, spoolDir: String): Long = {
    val p = new Path(spoolDir, HorizonFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0L
    val in = fs.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    body.toLong
  }

  /** The streaming SOURCE over a spool: a real `readStream` the full
    * stateful-operator surface composes with. Schema is pinned from
    * the spooled files (file sources require an explicit schema) —
    * with mergeSchema, because a schema-widening commit's diff spools
    * the widened columns and a single-footer schema pick would
    * silently drop them from every streamed row.
    *
    * @param resumeFromVersion the consumer's persisted cursor — rows
    *   stamped at or below it are filtered out, and (the loud-failure
    *   half of [[vacuumSpool]]'s contract) it must be at least the
    *   spool's reclaim horizon: a fresh consumer (`0`, the default)
    *   on a vacuumed spool would silently miss the reclaimed history,
    *   so it throws and must re-bootstrap from a table snapshot. */
  def source(
      spark: SparkSession, spoolDir: String,
      resumeFromVersion: Long = 0L): DataFrame = {
    val horizon = readHorizon(spark, spoolDir)
    require(resumeFromVersion >= horizon,
      s"spool $spoolDir reclaimed history up to commit $horizon " +
        s"(vacuumSpool/compactSpool) but this consumer resumes from " +
        s"$resumeFromVersion — a replay from there would silently skip " +
        "the reclaimed commits; re-bootstrap from replaySpool (if " +
        "compacted) or a table snapshot, or pass the checkpointed " +
        "cursor as resumeFromVersion")
    // schema inference must survive a FULLY-compacted spool (zero live
    // files — a bare directory read fails inference): fall back to the
    // archive, whose files carry the same schema. The stream itself
    // reads the (possibly empty) live view and simply waits for files.
    val live = new Path(spoolDir)
    val lfs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val liveFiles =
      if (lfs.exists(live)) lfs.listStatus(live).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      } else Seq.empty
    val schemaSide =
      if (liveFiles.nonEmpty) liveFiles.map(_.getPath.toString)
      else {
        val arch = new Path(live, ArchiveDir)
        require(lfs.exists(arch),
          s"spool $spoolDir holds no feed files to pin a schema from")
        Seq(arch.toString)
      }
    val df = spark.readStream
      .schema(spark.read.option("mergeSchema", "true")
        .parquet(schemaSide: _*).schema)
      .parquet(spoolDir)
    if (resumeFromVersion > 0L) df.filter(col("_commit_version") > resumeFromVersion)
    else df
  }
}
