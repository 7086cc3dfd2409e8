package graft.io

import graft.ops.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical upsert on partitioned parquet (SURVEY.md §4.3 #1): the
  * reference's `INSERT … ON CONFLICT (id) DO UPDATE` re-expressed as a
  * partition-scoped merge —
  *
  *   1. collect the incoming batch's touched partition values (dates:
  *      tiny by construction, one per day even at 100 TB);
  *   2. read ONLY those partitions of the target (partition pruning —
  *      the filter is on the partition column, so untouched data is
  *      never opened);
  *   3. latest-wins keyed dedup (Merge.upsertLatestWins);
  *   4. write back in dynamic partition-overwrite mode, which replaces
  *      exactly the partitions present in the merged frame and leaves
  *      every other partition's files untouched.
  *
  * The rewrite cost is O(touched partitions), not O(table) — the
  * property that makes hourly upserts feasible on a 100 TB fact. On a
  * transactional table format the same call becomes MERGE INTO; this
  * writer is the parquet-only equivalent.
  *
  * ==Concurrency contract (single writer per table)==
  *
  * Calls are read-merge-write with NO coordination: a call snapshots
  * the touched partitions (localCheckpoint), merges, then dynamic-
  * overwrites those partition directories. Two writers whose touched
  * partitions overlap therefore race as LAST-WRITER-WINS at PARTITION
  * granularity: if B commits between A's read and A's write, A's
  * overwrite replaces the whole partition with A's merge of the
  * pre-B state — B's rows in that partition are silently lost (the
  * classic lost update; MergeWriterSpec demonstrates it). Partitions
  * touched by only one of the writers are unaffected. A reader
  * overlapping a write can also observe a torn partition directory
  * (dynamic overwrite deletes+moves files non-transactionally).
  *
  * This is the same single-writer-per-table model as the reference's
  * hourly DAG (one serialized task per target). Callers needing
  * concurrent writers use [[TxTable.upsert]] — the manifest-versioned
  * variant whose optimistic CAS commit makes concurrent distinct
  * batches first-committer-wins with loser re-merge (both batches
  * survive; MergeWriterSpec proves both contracts side by side).
  * Idempotence (replaying the SAME batch) is guaranteed here;
  * concurrent DISTINCT batches on the same partition are not.
  */
object MergeWriter {

  /** Merge `incoming` into the partitioned parquet table at `targetDir`.
    * @param key          conflict key (reference: fact id)
    * @param version      priority within a key — incoming beats existing,
    *                     then higher version wins (reference:
    *                     etl_timestamp latest-wins)
    * @param partitionCol the table's partition column (reference: date_id)
    */
  /** Predicate selecting the incoming batch's touched partitions.
    * isin() never matches NULL, so a NULL-partition batch would read
    * zero existing rows while dynamic overwrite still replaces the NULL
    * (__HIVE_DEFAULT_PARTITION__) directory — losing its existing rows.
    * Match the NULL partition explicitly. */
  private def touchedPartitions(incoming: DataFrame, partitionCol: String) = {
    val touched = incoming.select(partitionCol).distinct()
      .collect().map(_.get(0))
    val nonNull = touched.filter(_ != null)
    if (nonNull.length == touched.length) col(partitionCol).isin(nonNull.toIndexedSeq: _*)
    else if (nonNull.isEmpty) col(partitionCol).isNull
    else col(partitionCol).isin(nonNull.toIndexedSeq: _*) || col(partitionCol).isNull
  }

  /** Sort within tasks by (partitionCol, layout.sortCols): the leading
    * partition column satisfies FileFormatWriter's required ordering,
    * so the writer inserts no second (order-destroying) sort and the
    * secondary sort survives into the files' row-group stats. */
  private def laidOut(df: DataFrame, partitionCol: String, layout: Layout): DataFrame = {
    // optimizeWrite: one task per touched partition → one file per
    // leaf (see Layout) — the same knob TxTable.writeLaidOut honors
    val placed = if (layout.optimizeWrite) df.repartition(col(partitionCol)) else df
    if (layout.sortCols.isEmpty) placed
    else placed.sortWithinPartitions((partitionCol +: layout.sortCols).map(col): _*)
  }

  private def configured(
      w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      layout: Layout) = {
    val w1 = layout.rowGroupBytes.fold(w)(b => w.option("parquet.block.size", b))
    layout.bloomCols.foldLeft(w1) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", layout.bloomNdv.toString)
    }
  }

  def upsertPartitioned(
      spark: SparkSession, targetDir: String, incoming: DataFrame,
      key: String, version: String, partitionCol: String,
      layout: Layout = Layout.none): Unit = {
    val exists = new java.io.File(targetDir).exists()
    val merged =
      if (!exists) incoming
      else {
        val existing = spark.read.parquet(targetDir)
          .filter(touchedPartitions(incoming, partitionCol))
        Merge.upsertLatestWins(existing, incoming, key, version)
      }
    // localCheckpoint truncates the lineage so the write no longer
    // references the path it reads (Spark rejects self-overwrite plans);
    // it also materializes the merged partitions exactly once.
    configured(
      laidOut(merged.localCheckpoint(true), partitionCol, layout)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic"),
      layout)
      .partitionBy(partitionCol)
      .parquet(targetDir)
  }

  /** Replace a predicate-scoped WINDOW of the partitioned table:
    * existing rows matching `windowPred` (within the incoming batch's
    * touched partitions) are dropped and `incoming` takes their place;
    * rows outside the window and untouched partitions are preserved
    * byte-for-byte (dynamic overwrite).
    *
    * This is the idempotent write for RECOMPUTE-style loads — a
    * densified hour, a rebuilt day: the new computation supersedes
    * everything previously derived for the window, so replays and
    * late-arriving data REPLACE rather than merge. A keyed upsert is
    * wrong for such loads twice over: derived rows need a synthetic
    * key (collapsing legitimate duplicates, e.g. two ticks in one
    * second), and a key that existed in the previous run but not in
    * the recomputation (a minute that gained a real tick and is no
    * longer interpolated) would survive as a stale row.
    *
    * `windowPred` must be FALSE-or-TRUE on every existing row (no
    * NULL-valued predicates) and `incoming` must lie entirely inside
    * the window — the caller derives both from the same (date, hour)
    * parameters, which makes that true by construction. */
  def replaceWindow(
      spark: SparkSession, targetDir: String, incoming: DataFrame,
      partitionCol: String, windowPred: org.apache.spark.sql.Column,
      layout: Layout = Layout.none): Unit = {
    val exists = new java.io.File(targetDir).exists()
    val merged =
      if (!exists) incoming
      else spark.read.parquet(targetDir)
        .filter(touchedPartitions(incoming, partitionCol) && !windowPred)
        .unionByName(incoming)
    configured(
      laidOut(merged.localCheckpoint(true), partitionCol, layout)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic"),
      layout)
      .partitionBy(partitionCol)
      .parquet(targetDir)
  }
}
