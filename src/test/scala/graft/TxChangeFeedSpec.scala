package graft

import java.nio.file.Files

import graft.io.TxTable
import graft.streaming.TxChangeFeed

/** The change-feed contract t20's oracle can't see: cursor semantics
  * (resume from a persisted version, no replays, no gaps), the replica
  * ≡ snapshot identity at every intermediate version, and the poll
  * loop delivering commits that land WHILE following.
  */
class TxChangeFeedSpec extends SparkTestBase {

  private def freshTable(): String =
    Files.createTempDirectory("graft_cf").toString + "/t"

  private def commit(target: String, rows: Seq[(Long, Double, Long, Int)]): Unit = {
    val s = spark
    import s.implicits._
    TxTable.upsert(spark, target,
      rows.toDF("id", "price", "etl_seq", "date_id"),
      "id", "etl_seq", "date_id")
  }

  private def state(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
    df.select("id", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("drain emits one diff per commit and a resumed cursor replays nothing") {
    val target = freshTable()
    commit(target, Seq((1L, 1.0, 1L, 20240101), (2L, 2.0, 1L, 20240102)))
    commit(target, Seq((1L, 1.5, 2L, 20240101)))                  // update
    commit(target, Seq((3L, 3.0, 3L, 20240103)))                  // insert

    val all = TxChangeFeed.drain(spark, target, "id")
    assert(all.map(_._1) === Seq(1L, 2L, 3L))
    assert(all.head._2.select("change_type").collect()
      .map(_.getString(0)).toSet === Set("insert")) // genesis batch
    assert(state(all(1)._2.drop("change_type")) === Set((1L, 1.5)))

    // consumer checkpointed cursor=2: only the third commit arrives
    val resumed = TxChangeFeed.drain(spark, target, "id", fromVersion = 2L)
    assert(resumed.map(_._1) === Seq(3L))
    assert(state(resumed.head._2.drop("change_type")) === Set((3L, 3.0)))
    // caught-up feed is empty, not an error
    assert(TxChangeFeed.drain(spark, target, "id", fromVersion = 3L).isEmpty)
  }

  test("replicate equals the snapshot at every cursor, including across a resume") {
    val target = freshTable()
    commit(target, Seq((1L, 1.0, 1L, 20240101), (2L, 2.0, 1L, 20240102)))
    commit(target, Seq((2L, 2.5, 2L, 20240102), (3L, 3.0, 2L, 20240101)))

    val (c1, replica1) = TxChangeFeed.replicate(spark, target, "id")
    assert(c1 === 2L)
    assert(state(replica1) === state(TxTable.snapshot(spark, target).get))

    // more commits land; resume replication FROM the old replica
    commit(target, Seq((1L, 9.0, 3L, 20240101)))
    val (c2, replica2) = TxChangeFeed.replicate(spark, target, "id",
      fromVersion = c1, base = Some(replica1))
    assert(c2 === 3L)
    assert(state(replica2) === state(TxTable.snapshot(spark, target).get))
    assert(state(replica2) === Set((1L, 9.0), (2L, 2.5), (3L, 3.0)))
  }

  test("follow delivers commits that land while tailing, in order") {
    val target = freshTable()
    commit(target, Seq((1L, 1.0, 1L, 20240101)))
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var extraDone = false
    val cursor = TxChangeFeed.follow(spark, target, "id",
      fromVersion = 0L, pollMs = 10L,
      stop = () => extraDone && seen.size >= 2) { (v, _) =>
      seen += v
      if (!extraDone) {
        // a writer lands a commit while the feed is live
        commit(target, Seq((2L, 2.0, 2L, 20240102)))
        extraDone = true
      }
    }
    assert(seen.toSeq === Seq(1L, 2L))
    assert(cursor === 2L)
  }
}
