package graft

import graft.ops.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws of the mergeable-state pattern (ops.Incremental): merging any
  * partition of the input reproduces the from-scratch state exactly —
  * the property that makes incremental maintenance trustworthy — and
  * the finalized measures are bit-identical either way (decimal sums,
  * no order sensitivity).
  */
class IncrementalSpec extends SparkTestBase {

  private val keys = Seq("day", "event_type")

  private def ev: DataFrame =
    Tables.events(spark, sfSmoke)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy(keys.map(col): _*)
      .collect().map(_.toString).toSeq

  test("merge of an arbitrary split equals the from-scratch state") {
    val full = Incremental.state(ev, keys, "value")
    // split on a non-key predicate: slices cut ACROSS groups
    val a = Incremental.state(ev.filter(col("event_id") % 3 === 0), keys, "value")
    val b = Incremental.state(ev.filter(col("event_id") % 3 === 1), keys, "value")
    val c = Incremental.state(ev.filter(col("event_id") % 3 === 2), keys, "value")
    val merged = Incremental.merge(keys)(a, b, c)
    assert(canon(Incremental.finalize(merged)) === canon(Incremental.finalize(full)))
  }

  test("merge is associative: (a ⊎ b) ⊎ c ≡ a ⊎ (b ⊎ c)") {
    val a = Incremental.state(ev.filter(col("event_id") % 3 === 0), keys, "value")
    val b = Incremental.state(ev.filter(col("event_id") % 3 === 1), keys, "value")
    val c = Incremental.state(ev.filter(col("event_id") % 3 === 2), keys, "value")
    val left = Incremental.merge(keys)(Incremental.merge(keys)(a, b), c)
    val right = Incremental.merge(keys)(a, Incremental.merge(keys)(b, c))
    assert(canon(Incremental.finalize(left)) === canon(Incremental.finalize(right)))
  }

  test("empty delta is the identity") {
    val full = Incremental.state(ev, keys, "value")
    val empty = Incremental.state(ev.filter(lit(false)), keys, "value")
    val merged = Incremental.merge(keys)(full, empty)
    assert(canon(Incremental.finalize(merged)) === canon(Incremental.finalize(full)))
  }

  // ---- streaming maintenance (partial-aggregate log) ---------------

  test("streamed partial log merges to the batch recompute; replay and compaction change nothing") {
    import graft.streaming.IncrementalStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incr_state").toString + "/state"

    val slices = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    slices.zipWithIndex.foreach { case (slice, i) =>
      IncrementalStream.applyBatch(slice, i.toLong, keys, "value", dir)
    }
    val expected = canon(Incremental.finalize(Incremental.state(ev, keys, "value")))
    def current() = canon(Incremental.finalize(
      IncrementalStream.readState(spark, dir, keys)))
    assert(current() === expected, "merged log diverges from batch recompute")

    // at-least-once delivery: replaying batch 1 must overwrite its own
    // partition, not double-count
    IncrementalStream.applyBatch(slices(1), 1L, keys, "value", dir)
    assert(current() === expected, "replayed micro-batch double-counted")

    // compaction is answer-preserving and folds only COMMITTED batches:
    // the newest (the one that may still replay) keeps its partition
    IncrementalStream.compact(spark, dir, keys)
    assert(current() === expected, "compaction changed the merged answer")
    assert(spark.read.parquet(dir)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(-1L, 2L))

    // a crash-replay of the newest batch AFTER compaction must still
    // overwrite its own partition, not double-count into the fold
    IncrementalStream.applyBatch(slices(2), 2L, keys, "value", dir)
    assert(current() === expected, "post-compaction replay double-counted")

    // a second compaction with no new batches is a no-op answer-wise
    IncrementalStream.compact(spark, dir, keys)
    assert(current() === expected)
  }

  test("interrupted compaction swap is recovered (or discarded) without losing state") {
    import graft.streaming.IncrementalStream
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft_incr_crash").toString + "/state"
    val slices = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    slices.zipWithIndex.foreach { case (slice, i) =>
      IncrementalStream.applyBatch(slice, i.toLong, keys, "value", root)
    }
    val expected = canon(Incremental.finalize(Incremental.state(ev, keys, "value")))
    def current() = canon(Incremental.finalize(
      IncrementalStream.readState(spark, root, keys)))
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val staging = new Path(
      new Path(root).getParent, "." + new Path(root).getName + "-compact-staging")

    // crash BEFORE the manifest commit: an unvalidated staging copy is
    // junk — the next compact discards it and the log is untouched
    fs.mkdirs(new Path(staging, "batch_id=-1"))
    IncrementalStream.compact(spark, root, keys)
    assert(!fs.exists(staging), "uncommitted staging was not discarded")
    assert(current() === expected)

    // crash AFTER the manifest commit, before the move: fabricate the
    // exact mid-swap state by taking a completed fold apart — staged
    // copy holds batch_id=-1, the live partition is gone, manifest
    // lists the (already deleted) folded ids
    assert(fs.rename(new Path(root, "batch_id=-1"),
      new Path(staging, "batch_id=-1")))
    val out = fs.create(new Path(staging, "_manifest"), true)
    out.write("0\n1".getBytes("UTF-8")); out.close()
    // a micro-batch that committed DURING the interrupted swap must
    // survive recovery untouched (its id is not in the manifest)
    IncrementalStream.applyBatch(slices(0), 7L, keys, "value", root)
    IncrementalStream.compact(spark, root, keys) // recovery path
    assert(!fs.exists(staging), "recovered staging was not removed")
    assert(current() === canon(Incremental.finalize(Incremental.merge(keys)(
      Incremental.state(ev, keys, "value"),
      Incremental.state(slices(0), keys, "value")))),
      "recovery lost a fold or the concurrent batch")
  }
}
