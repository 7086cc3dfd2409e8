package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Integer-arithmetic PageRank (ops.PageRank): hand-computed exact
  * values on a known graph, and partition invariance — the property
  * that justifies calling the integer formulation "deterministic".
  */
class PageRankSpec extends SparkTestBase {

  test("one round matches the hand-computed exact update") {
    val s = spark
    import s.implicits._
    // 2→1, 3→1, 3→2: n=3, r0 = 10^12 div 3 = 333333333333 each,
    // base = 3·10^12 div 60 = 50000000000
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val r1 = PageRank.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1: base + (17 · (333333333333/1 + 333333333333 div 2)) div 20
    assert(r1(1L) === 50000000000L + (17L * (333333333333L + 166666666666L)) / 20L)
    // node 2: base + (17 · (333333333333 div 2)) div 20
    assert(r1(2L) === 50000000000L + (17L * 166666666666L) / 20L)
    // node 3: no in-links → teleport mass only
    assert(r1(3L) === 50000000000L)
  }

  test("rank vector is invariant to edge partitioning and edge duplicates") {
    val s = spark
    import s.implicits._
    val edges = (1L to 400L).map(i => ((i * 7919L) % 50L, (i * 104729L) % 50L))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      PageRank.pageRank(df, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(edges.repartition(1))
    assert(run(edges.repartition(13)) === base, "partitioning changed ranks")
    assert(run(edges.union(edges).repartition(5)) === base,
      "duplicate edges changed ranks (dedup failed)")
  }

  test("syndication mass concentrates on the pointed-at node") {
    val s = spark
    import s.implicits._
    // a star: many copies point at one original
    val edges = (2L to 20L).map(i => (i, 1L)).toDF("src", "dst")
    val pr = PageRank.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) > pr(2L) * 5, s"hub not dominant: $pr")
    assert((2L to 20L).map(pr).toSet.size === 1, "leaves should tie exactly")
  }

  test("driver-local path is bit-identical to the distributed loop and the cutover pins") {
    val s = spark
    import s.implicits._
    val edges = (1L to 300L).map(i => ((i * 7919L) % 40L, (i * 104729L) % 40L))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    // integer arithmetic: the two paths must agree exactly, not approximately
    val (localDf, p1) = PageRank.pageRankImpl(edges, iters = 3, localEdgeThreshold = 100000)
    val (distDf, p2) = PageRank.pageRankImpl(edges, iters = 3, localEdgeThreshold = 0)
    assert(p1 === "local" && p2 === "distributed")
    val l = localDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = distDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l === d, "local and distributed rank vectors diverge")
    // default threshold (heap-derived) routes a tiny graph local
    assert(PageRank.pageRankImpl(edges, iters = 1)._2 === "local")
  }
}
