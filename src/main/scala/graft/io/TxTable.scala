package graft.io

import java.util.UUID

import graft.ops.Merge
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal optimistic-concurrency commit protocol for a partitioned
  * parquet table — the multi-writer upgrade of [[MergeWriter]]'s
  * single-writer upsert (reference semantics: the per-statement
  * atomicity of `INSERT … ON CONFLICT DO UPDATE`,
  * /root/reference/dags/etl/fact_gold_price.py:169-196 — two hourly
  * tasks landing distinct batches never lose each other's rows).
  *
  * ==Why the plain writer can't be fixed in place==
  *
  * `MergeWriter.upsertPartitioned` is read-merge-overwrite against the
  * live partition directories: a second writer committing inside the
  * first's read→write window is clobbered at partition granularity
  * (MergeWriterSpec demonstrates the lost update), and a concurrent
  * reader can observe a half-replaced directory. Both failures come
  * from the same root — the directory tree IS the table state, so
  * there is no commit point. The fix is the one every transactional
  * table format (public Delta/Iceberg design) uses: make state a
  * VERSIONED MANIFEST published by an atomic primitive, and make data
  * files immutable.
  *
  * ==Layout==
  *
  * {{{
  *   targetDir/
  *     _graft_log/v00000000000000000001     # version slot (see CommitStore)
  *     data/<uuid>/__p=<key>/part-*.parquet # immutable; one leaf per (commit, touched partition)
  * }}}
  *
  * A manifest maps each partition KEY to the single data leaf holding
  * its current rows (the leaf written by the commit that last touched
  * it). The key is md5 of the partition value's Spark string cast
  * (NULL → the literal `NULL` — md5 is 32 hex chars, no collision),
  * computed ONLY as a Spark expression on both the incoming batch and
  * the snapshot read — there is no driver-side toString anywhere, so
  * engine and manifest can never disagree on a value's identity, and
  * the key doubles as a filesystem-safe directory name (hive escaping
  * is the identity on hex). Staging is therefore ONE partitionBy job
  * whatever the touched-partition count — a backfill touching 500
  * partitions costs one write, not 500 driver-sequential jobs. Data
  * files keep the partition column as an ordinary column —
  * manifest-level pruning replaces hive directory pruning, exactly the
  * move the real table formats made, and it prunes through the SAME
  * O(touched-partitions) path at 100 TB: a snapshot read of k
  * partitions opens k leaf directories, never lists the table.
  *
  * ==Commit protocol (optimistic CAS, no locks)==
  *
  *  1. read the latest manifest version v (0 = empty table);
  *  2. merge the batch against the SNAPSHOT's touched-partition files
  *     (immutable — a concurrent commit cannot tear this read);
  *  3. stage the merged partitions as new data dirs under unique names
  *     (all the expensive work happens outside any critical region);
  *  4. publish manifest v+1 through [[CommitStore]] — an
  *     ATOMIC-EXCLUSIVE primitive per storage class (local symlink,
  *     HDFS rename-without-overwrite; see CommitStore's scaladoc).
  *     Success = the commit point. Failure = someone else committed
  *     v+1 since step 1: delete the staged dirs and RETRY THE MERGE
  *     from the new snapshot, so the loser's rows land on top of the
  *     winner's instead of over them. First-committer-wins, losers
  *     re-merge — lost updates are impossible by construction.
  *
  * Readers resolve the latest manifest and read immutable files: every
  * read is a consistent snapshot, torn reads are gone too. Files
  * superseded by later commits stay on disk for in-flight readers
  * (and as time travel) until [[vacuum]]. All data-file I/O goes
  * through the Hadoop FileSystem API, so the table works on any
  * Spark-reachable store whose CommitStore primitive holds.
  */
object TxTable {

  private val LogDir = "_graft_log"
  private val DataDir = "data"
  private val PKey = "__p" // internal partition-key column, dropped by partitionBy

  /** Engine-canonical partition key: evaluated only inside Spark, never
    * re-derived on the driver. */
  private def keyExpr(partitionCol: String) =
    when(col(partitionCol).isNull, lit("NULL"))
      .otherwise(md5(col(partitionCol).cast("string")))

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def parse(lines: Seq[String]): Map[String, String] =
    lines.map { line =>
      val Array(k, d) = line.split('\t')
      k -> d
    }.toMap

  private def render(entries: Map[String, String]): Seq[String] =
    entries.toSeq.sorted.map { case (k, d) => s"$k\t$d" }

  /** Latest committed (version, partition → data dir). (0, empty) on a
    * fresh table. */
  def latest(spark: SparkSession, dir: String): (Long, Map[String, String]) = {
    val log = s"$dir/$LogDir"
    val (v, lines) = CommitStore.forPath(fsOf(spark, dir), log).latest(log)
    (v, parse(lines))
  }

  // ---- reads ---------------------------------------------------------

  /** The table's current committed state as one consistent snapshot
    * (empty option on a never-committed table). */
  def snapshot(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (_, entries) = latest(spark, dir)
    if (entries.isEmpty) None
    else Some(read(spark, dir, entries))
  }

  /** Time travel: the table exactly as committed at `version`. Data
    * files are immutable and manifests are never rewritten, so every
    * version remains readable until [[vacuum]] reclaims it (None after
    * that, or for a version never committed). */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): Option[DataFrame] = {
    val log = s"$dir/$LogDir"
    CommitStore.forPath(fsOf(spark, dir), log).at(log, version)
      .map(lines => read(spark, dir, parse(lines)))
  }

  private def read(
      spark: SparkSession, dir: String, entries: Map[String, String]): DataFrame =
    spark.read.parquet(entries.values.toSeq.sorted.map(d => s"$dir/$d"): _*)

  /** Row-level changes between two committed versions — the
    * table-format CDC readout (`table_changes` in the public Delta
    * surface): for each `key`, `insert` (present only at `toVersion`),
    * `delete` (present only at `fromVersion`), or `update` (present in
    * both with any non-key column differing, null-safely; the emitted
    * payload is the NEW row). Unchanged keys emit nothing.
    *
    * PRUNES AT MANIFEST LEVEL BEFORE TOUCHING A FILE: a partition
    * whose manifest entry is IDENTICAL in both versions points at the
    * same immutable leaf — its rows are bit-for-bit the same, so it
    * cannot contribute a change and neither side reads it. Diffing two
    * adjacent versions of a 100 TB table therefore costs the
    * partitions the intervening commits touched, not the table — the
    * pruning is automatic, not a caller discipline. What remains is
    * one full-outer hash join of the changed-partition row sets. */
  def diff(
      spark: SparkSession, dir: String,
      fromVersion: Long, toVersion: Long, key: String): DataFrame = {
    val log = s"$dir/$LogDir"
    val store = CommitStore.forPath(fsOf(spark, dir), log)
    def entriesOf(v: Long): Map[String, String] =
      parse(store.at(log, v).getOrElse(
        throw new IllegalArgumentException(s"version $v not readable")))
    val aE = entriesOf(fromVersion)
    val bE = entriesOf(toVersion)
    val changedKeys = (aE.keySet ++ bE.keySet).filter(k => aE.get(k) != bE.get(k))
    def side(entries: Map[String, String]): DataFrame = {
      val dirs = changedKeys.toSeq.flatMap(entries.get).sorted
      val all = read(spark, dir, entries) // schema anchor
      if (dirs.isEmpty) all.limit(0)
      else spark.read.parquet(dirs.map(d => s"$dir/$d"): _*)
    }
    val a = side(aE)
    val b = side(bE)
    val payload = a.columns.filterNot(_ == key).toSeq
    val an = payload.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"__a_$c"))
      .withColumnRenamed(key, "__a_key")
    val joined = an.join(b, an("__a_key") === b(key), "full_outer")
    val changed = payload
      .map(c => !(col(s"__a_$c") <=> col(c)))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__a_key").isNull, lit("insert"))
          .when(col(key).isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      // deletes carry the OLD row (nothing else exists for them);
      // updates/inserts the NEW one — selected by change type, NOT
      // coalesce, which would resurrect an old value behind a
      // legitimately NULLed field
      .select(col("change_type") +:
        when(col("change_type") === "delete", col("__a_key"))
          .otherwise(col(key)).as(key) +:
        payload.map(c =>
          when(col("change_type") === "delete", col(s"__a_$c"))
            .otherwise(col(c)).as(c)): _*)
  }

  // ---- transactional upsert -------------------------------------------

  /** Keyed latest-wins upsert with first-committer-wins concurrency:
    * safe for any number of concurrent writers landing DISTINCT
    * batches; a replay of the SAME batch stays idempotent through the
    * keyed merge. Single-writer plan shape is identical to
    * `MergeWriter.upsertPartitioned` (snapshot-pruned read of touched
    * partitions, one keyed merge, O(touched) write) plus one manifest
    * round-trip.
    *
    * @param beforeCommit test seam: runs between staging and the CAS on
    *   the FIRST attempt only — lets a spec interleave a competing
    *   commit deterministically inside the race window.
    */
  def upsert(
      spark: SparkSession, targetDir: String, incoming: DataFrame,
      key: String, version: String, partitionCol: String,
      layout: Layout = Layout.none, maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Unit =
    commitLoop(spark, targetDir, incoming, partitionCol, layout,
      maxRetries, beforeCommit, "upsert")(
      (existing, batch) => Merge.upsertLatestWins(existing, batch, key, version))

  /** Replace a predicate-scoped WINDOW of the table — the idempotent
    * write for RECOMPUTE-style loads (MergeWriter.replaceWindow's
    * semantics, CAS-committed): within the batch's touched partitions,
    * existing rows matching `windowPred` are dropped and `incoming`
    * takes their place; rows outside the window and untouched
    * partitions survive untouched. Same contract as the single-writer
    * form: `windowPred` must be FALSE-or-TRUE on every existing row
    * and `incoming` must lie inside the window. */
  def replaceWindow(
      spark: SparkSession, targetDir: String, incoming: DataFrame,
      partitionCol: String, windowPred: org.apache.spark.sql.Column,
      layout: Layout = Layout.none, maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Unit =
    commitLoop(spark, targetDir, incoming, partitionCol, layout,
      maxRetries, beforeCommit, "replaceWindow")(
      (existing, batch) => existing.filter(!windowPred).unionByName(batch))

  /** The shared optimistic-commit loop: snapshot → merge (strategy
    * supplied by the caller) → single-job staging → CAS → loser
    * cleanup + retry. */
  private def commitLoop(
      spark: SparkSession, targetDir: String, incoming: DataFrame,
      partitionCol: String, layout: Layout, maxRetries: Int,
      beforeCommit: () => Unit, op: String)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    // stable across retries: the batch itself never changes
    val batch = incoming.withColumn(PKey, keyExpr(partitionCol))
      .localCheckpoint(true)
    val touchedKeys = batch.select(PKey).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    require(touchedKeys.nonEmpty, "empty incoming batch")
    val fs = fsOf(spark, targetDir)
    val log = s"$targetDir/$LogDir"
    val store = CommitStore.forPath(fs, log)

    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"TxTable.$op lost the commit race $maxRetries times on $targetDir")
      val (v, lines) = store.latest(log)
      val entries = parse(lines)
      val existingDirs = touchedKeys.flatMap(entries.get).distinct
      val merged0 =
        if (existingDirs.isEmpty) batch
        else {
          // immutable snapshot files: this read cannot be torn by a
          // concurrent commit, unlike the live-directory read of the
          // single-writer path. The key is re-derived by the SAME Spark
          // expression (leaves are partition-pure, but defend the
          // invariant anyway).
          val existing = spark.read
            .parquet(existingDirs.sorted.map(d => s"$targetDir/$d"): _*)
            .withColumn(PKey, keyExpr(partitionCol))
            .filter(col(PKey).isInCollection(touchedKeys))
          merge(existing, batch)
        }
      val merged = merged0.localCheckpoint(true)

      // stage ALL touched partitions in ONE job: partitionBy on the key
      // column fans the write out per partition without a driver loop.
      // The leading PKey sort satisfies FileFormatWriter's required
      // ordering, so a secondary layout sort survives into the files
      // (the MergeWriter.laidOut discipline).
      val commitId = UUID.randomUUID().toString
      val stageRel = s"$DataDir/$commitId"
      val sorted =
        if (layout.sortCols.isEmpty) merged
        else merged.sortWithinPartitions((PKey +: layout.sortCols).map(col): _*)
      val w0 = sorted.write.mode("error")
      val w1 = layout.rowGroupBytes.fold(w0)(b => w0.option("parquet.block.size", b))
      layout.bloomCols.foldLeft(w1) { (acc, c) =>
        acc.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", layout.bloomNdv.toString)
      }.partitionBy(PKey).parquet(s"$targetDir/$stageRel")
      // the written leaves ARE the staged manifest entries (key = leaf
      // name minus the column prefix; hive escaping is the identity on
      // the hex/NULL key alphabet)
      val staged = fs.listStatus(new Path(s"$targetDir/$stageRel")).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(PKey + "="))
        .map(leaf => leaf.stripPrefix(PKey + "=") -> s"$stageRel/$leaf")

      if (attempt == 1) beforeCommit()

      if (store.tryCommit(log, v + 1, render(entries ++ staged))) committed = true
      else {
        // lost the race: discard our stale staging and re-merge against
        // the winner's snapshot
        fs.delete(new Path(s"$targetDir/$stageRel"), true): Unit
      }
    }
  }

  /** Fold fragmented leaves — a rows-preserving maintenance commit:
    * every live leaf holding more than `maxFilesPerLeaf` data files is
    * rewritten as a single-file leaf in one new commit; partitions
    * already compact keep their manifest entries untouched. Runs
    * through the SAME CAS as any writer, so it is safe to run
    * concurrently with upserts: a lost race re-reads the winner's
    * manifest and recomputes which leaves still need folding (a
    * partition the winner just rewrote is a fresh leaf — it drops out).
    * The rewrite is one job: all fragmented leaves read together, hash
    * repartitioned on the partition key (every partition's rows land in
    * exactly one task → exactly one file), one partitionBy write.
    * [[diff]] across a compaction commit emits nothing — same rows,
    * new leaves — which doubles as its correctness probe. */
  def compactFiles(
      spark: SparkSession, dir: String, partitionCol: String,
      maxFilesPerLeaf: Int = 4, maxRetries: Int = 10): Unit = {
    val fs = fsOf(spark, dir)
    val log = s"$dir/$LogDir"
    val store = CommitStore.forPath(fs, log)
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val (v, lines) = store.latest(log)
      if (v == 0) return
      val entries = parse(lines)
      val needy = entries.filter { case (_, leaf) =>
        fs.listStatus(new Path(s"$dir/$leaf"))
          .count(_.getPath.getName.endsWith(".parquet")) > maxFilesPerLeaf
      }
      if (needy.isEmpty) return
      val commitId = UUID.randomUUID().toString
      val stageRel = s"$DataDir/$commitId"
      spark.read.parquet(needy.values.toSeq.sorted.map(d => s"$dir/$d"): _*)
        .withColumn(PKey, keyExpr(partitionCol))
        .repartition(needy.size, col(PKey))
        .write.mode("error").partitionBy(PKey)
        .parquet(s"$dir/$stageRel")
      val staged = fs.listStatus(new Path(s"$dir/$stageRel")).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(PKey + "="))
        .map(leaf => leaf.stripPrefix(PKey + "=") -> s"$stageRel/$leaf")
      if (store.tryCommit(log, v + 1, render(entries ++ staged))) return
      fs.delete(new Path(s"$dir/$stageRel"), true): Unit
    }
    throw new IllegalStateException(
      s"TxTable.compactFiles lost the commit race $maxRetries times on $dir")
  }

  /** Drop everything the LATEST manifest no longer references — data
    * dirs superseded by later commits, loser stagings orphaned by a
    * writer crash, old version slots and (on the symlink store) their
    * body files. Destroys time travel and is a MAINTENANCE-WINDOW
    * operation: it must not run while snapshot readers of older
    * versions are in flight (the retention trade every table format
    * documents), NOR while a writer is mid-commit — an in-flight
    * writer's staged-but-uncommitted leaves are indistinguishable from
    * crash orphans and would be reclaimed under it. */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val (v, entries) = latest(spark, dir)
    if (v == 0) return
    val live = entries.values.toSet
    val data = new Path(s"$dir/$DataDir")
    if (fs.exists(data))
      fs.listStatus(data).foreach { commitDir =>
        val cname = commitDir.getPath.getName
        fs.listStatus(commitDir.getPath).foreach { leaf =>
          if (!live.contains(s"$DataDir/$cname/${leaf.getPath.getName}"))
            fs.delete(leaf.getPath, true): Unit
        }
        // a commit whose every leaf was superseded leaves an empty shell
        if (fs.listStatus(commitDir.getPath).isEmpty)
          fs.delete(commitDir.getPath, true): Unit
      }
    // the latest slot (and, on the symlink store, the body it points
    // to) survives; every older slot and unreferenced body goes
    val log = new Path(s"$dir/$LogDir")
    val liveSlot = CommitStore.slotName(v)
    val liveBody = {
      val slot = java.nio.file.Paths.get(s"$dir/$LogDir/$liveSlot")
      if (java.nio.file.Files.isSymbolicLink(slot))
        Some(java.nio.file.Files.readSymbolicLink(slot).toString)
      else None
    }
    // slots BEFORE bodies: deleting a body first would leave its slot a
    // dangling symlink, which the Hadoop local FS can no longer delete
    // (getFileStatus follows the link) — and a dangling slot would read
    // as a corrupt version
    val (slots, bodies) = fs.listStatus(log).toSeq
      .partition(_.getPath.getName.startsWith("v"))
    (slots ++ bodies).foreach { st =>
      val n = st.getPath.getName
      if (n != liveSlot && !liveBody.contains(n))
        fs.delete(st.getPath, false): Unit
    }
  }
}
