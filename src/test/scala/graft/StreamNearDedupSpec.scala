package graft

import java.sql.Timestamp

import graft.streaming.StreamNearDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup detection (streaming/StreamNearDedup): the
  * batch≡stream agreement that makes it the continuous form of
  * `x_dedup_minhash_lsh` — same shingles, minhash, bands and Jaccard
  * verification — plus the two state bounds (horizon expiry, bucket
  * cap) that keep it runnable on an infinite firehose.
  */
class StreamNearDedupSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Doc(doc_id: Long, text: String, arrived: Timestamp)

  /** A small corpus of distinct texts (exact-collapse is then identity,
    * so batch rep-level pairs ARE doc-level pairs): two near-dup
    * families plus unrelated noise. */
  private def corpusDocs: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hill"
    val alt = "merge sort splits the array in halves then merges the sorted runs back together"
    Seq(
      1L -> base,
      2L -> (base + " today"),
      3L -> (base + " tonight again"),
      4L -> alt,
      5L -> (alt + " in linear extra space"),
      6L -> "completely unrelated text about parquet row groups and shuffle partitions at scale"
    )
  }

  private def streamPairs(
      docs: Seq[Doc], horizon: String = "10 minutes",
      bucketCap: Int = 4096, batches: Seq[Seq[Doc]] = Nil): Set[(Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Doc]
    val name = s"near_dedup_out_${System.nanoTime()}"
    val q = StreamNearDedup
      .nearDupHits(in.toDF(), "arrived", horizon, bucketCap = bucketCap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val steps = if (batches.nonEmpty) batches else Seq(docs)
      steps.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).dropDuplicates("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("stream pairs equal the batch LSH operator's pairs on a shared corpus") {
    val s = spark
    import s.implicits._
    val corpus = corpusDocs.toDF("doc_id", "text")
    val batch = graft.queries.Text.minhashRepPairsOver(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "batch operator found no pairs — corpus too weak")

    val streamed = streamPairs(
      corpusDocs.zipWithIndex.map { case ((id, t), i) =>
        Doc(id, t, ts(f"2024-01-15 10:0$i%01d:00")) })
    assert(streamed === batch,
      s"stream/batch divergence: stream-only=${streamed -- batch}, batch-only=${batch -- streamed}")
  }

  test("members beyond the horizon no longer pair; in-horizon members do") {
    val d1 = Doc(1, corpusDocs.head._2, ts("2024-01-15 10:00:00"))
    // a watermark-advancing unrelated doc, then a near-dup of doc 1
    // arriving 40 minutes later: doc 1's bucket state has expired
    val far = Doc(9, corpusDocs.last._2, ts("2024-01-15 10:40:00"))
    val d2 = Doc(2, corpusDocs.head._2 + " today", ts("2024-01-15 10:41:00"))
    val expired = streamPairs(Nil,
      batches = Seq(Seq(d1), Seq(far), Seq(d2)))
    assert(!expired.exists(p => p._1 == 1L && p._2 == 2L),
      s"pair (1,2) survived a passed horizon: $expired")

    // same arrivals inside one horizon: the pair IS found
    val inHorizon = streamPairs(Nil,
      batches = Seq(
        Seq(d1),
        Seq(Doc(2, corpusDocs.head._2 + " today", ts("2024-01-15 10:05:00")))))
    assert(inHorizon.exists(p => p._1 == 1L && p._2 == 2L),
      s"in-horizon pair (1,2) missed: $inHorizon")
  }

  test("bucket cap bounds state: capped buckets stop absorbing members") {
    // 1 and 2 fill cap-1 buckets; 3 (near-dup of both) still verifies
    // against the retained member but 2-vs-3 pairs only if 2 was
    // retained — with cap=1 only doc 1 is in each bucket
    val docs = Seq(
      Doc(1, corpusDocs.head._2, ts("2024-01-15 10:00:00")),
      Doc(2, corpusDocs.head._2 + " today", ts("2024-01-15 10:01:00")),
      Doc(3, corpusDocs.head._2 + " tonight", ts("2024-01-15 10:02:00")))
    val capped = streamPairs(docs, bucketCap = 1)
    assert(capped.exists(p => p._1 == 1L),
      s"cap=1 must still pair against the retained first member: $capped")
    assert(!capped.exists(p => p._1 == 2L && p._2 == 3L),
      s"cap=1 retained more than one member (2,3) paired: $capped")
  }

  test("bucket state survives a query restart from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_neardup_ckpt").toString
    // the memory sink refuses checkpoint recovery (not fault-tolerant);
    // the parquet file sink is, and is what a production run would use
    val out = java.nio.file.Files.createTempDirectory("graft_neardup_out").toString + "/hits"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    def runQuery(): org.apache.spark.sql.streaming.StreamingQuery =
      StreamNearDedup.nearDupHits(in.toDF(), "arrived", "6 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: only the base document arrives, then the query STOPS
    val q1 = runQuery()
    try {
      in.addData(Doc(1, corpusDocs.head._2, ts("2024-01-15 10:00:00")))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() === 0)
    } finally q1.stop()

    // run 2, same checkpoint: a near-dup arrives — pairing requires the
    // bucket members written by run 1 to come back from the state store
    val q2 = runQuery()
    try {
      in.addData(Doc(2, corpusDocs.head._2 + " today", ts("2024-01-15 10:05:00")))
      q2.processAllAvailable()
      val hits = spark.read.parquet(out)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits.contains((1L, 2L)),
        s"state lost across restart — expected pair (1,2), got $hits")
    } finally q2.stop()
  }

  test("randomized differential: stream pairs == batch pairs across seeds and batch splits") {
    val s = spark
    import s.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    for (seed <- Seq(11L, 42L, 1337L)) {
      val rnd = new scala.util.Random(seed)
      // shared 12-token prefixes force families of near-dups; a unique
      // trailing uid token keeps every text distinct, so the batch
      // operator's exact-collapse is identity and its rep-level pairs
      // ARE doc-level pairs
      val prefixes = (0 until 4).map(_ =>
        Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val docs = (1L to 24L).map { id =>
        val base = prefixes(rnd.nextInt(prefixes.length))
        val mutated =
          if (rnd.nextInt(3) == 0)
            base.split(" ").updated(rnd.nextInt(12), vocab(rnd.nextInt(vocab.length))).mkString(" ")
          else base
        id -> s"$mutated uid$id"
      }
      val batch = graft.queries.Text.minhashRepPairsOver(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      // random arrival order, random split into 1-3 micro-batches, all
      // inside one horizon
      val shuffled = rnd.shuffle(docs).zipWithIndex.map { case ((id, t), i) =>
        Doc(id, t, ts(f"2024-01-15 10:${i % 60}%02d:00")) }
      val nSplits = 1 + rnd.nextInt(3)
      val batches = shuffled.grouped(
        math.max(1, (shuffled.size + nSplits - 1) / nSplits)).toSeq
      val streamed = streamPairs(Nil, horizon = "6 hours", batches = batches)
      assert(streamed === batch,
        s"seed $seed: stream-only=${streamed -- batch}, batch-only=${batch -- streamed}")
    }
  }
}
