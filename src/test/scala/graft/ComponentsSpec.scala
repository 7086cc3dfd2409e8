package graft

import graft.ops.Components
import org.apache.spark.sql.functions._
import scala.util.Random

/** Connected components vs. a driver-side union-find oracle on random
  * graphs, plus the degenerate shapes the propagation loop must
  * survive. */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graphs match union-find — both execution paths") {
    val rnd = new Random(42)
    for (trial <- 1 to 5; threshold <- Seq(0, 1 << 21)) {
      // threshold 0 forces the distributed propagation loop; the default
      // takes the driver union-find path — both must agree with the oracle
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      val got = Components
        .connectedComponents(edges.toDF("src", "dst"),
          localEdgeThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial threshold $threshold")
    }
  }

  test("two disjoint chains keep distinct components") {
    // chains have maximal diameter for their size — the slowest shape
    // for one-hop label propagation; force the distributed path
    val chain1 = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    val chain2 = (10L until 15L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Components.connectedComponents(
        (chain1 ++ chain2).toDF("src", "dst"), localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert((0L until 6L).forall(got(_) == 0L))
    assert((10L until 15L).forall(got(_) == 10L))
  }

  test("self-loops and duplicate edges are harmless") {
    val got = Components
      .connectedComponents(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("star contraction matches union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      val got = Components
        .connectedComponentsStar(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("star contraction handles the propagation loop's worst case — a long chain") {
    // diameter 120: one-hop propagation would need ~120 rounds; star
    // contraction must finish within its default O(log² n) budget
    val chain = (0L until 120L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Components.connectedComponentsStar(chain.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 120 && got.values.forall(_ == 0L))
  }

  test("star contraction keeps self-loop-only nodes and empty input") {
    val got = Components
      .connectedComponentsStar(
        Seq((7L, 7L), (1L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponentsStar(empty).count() == 0L)
  }

  test("null endpoints are dropped identically on both paths") {
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long]),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(4L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(5L)))
      .toDF("src", "dst")
    val expected = Map(1L -> 1L, 2L -> 1L, 5L -> 1L)
    for (threshold <- Seq(0, 1 << 21)) {
      val got = Components
        .connectedComponents(edges, localEdgeThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"threshold $threshold")
    }
  }

  test("empty edge list yields empty labeling") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponents(empty).count() == 0L)
  }

  test("path cutover sits exactly at the edge threshold — threshold±1") {
    // 10 edges: at threshold 10 the probe fits and union-find runs; at
    // threshold 9 the probe overflows and the distributed loop runs.
    // Both must produce the oracle labeling.
    val edges = (0L until 10L).map(i => (i, i + 1L))
    val expected = unionFind(edges)
    for ((threshold, wantPath) <- Seq(10 -> "local", 9 -> "distributed")) {
      val (df, path) = Components.connectedComponentsImpl(
        edges.toDF("src", "dst"), localEdgeThreshold = threshold)
      assert(path == wantPath, s"threshold $threshold")
      assert(df.as[(Long, Long)].collect().toMap == expected)
    }
  }

  test("default threshold derives from the byte-budget conf") {
    // 96 B per edge: a 960 B budget admits exactly 10 edges; 864 B
    // admits only 9 — the same ±1 boundary, driven through the conf.
    val edges = (0L until 10L).map(i => (i, i + 1L))
    val expected = unionFind(edges)
    try {
      for ((budget, wantPath) <- Seq(960L -> "local", 864L -> "distributed")) {
        spark.conf.set(Components.LocalEdgeBudgetBytesKey, budget.toString)
        assert(Components.resolvedLocalEdgeThreshold(spark) == (budget / 96L).toInt)
        val (df, path) = Components.connectedComponentsImpl(edges.toDF("src", "dst"))
        assert(path == wantPath, s"budget $budget")
        assert(df.as[(Long, Long)].collect().toMap == expected)
      }
    } finally spark.conf.unset(Components.LocalEdgeBudgetBytesKey)
  }

  test("unset budget falls back to a heap fraction, capped at 2^24") {
    val t = Components.resolvedLocalEdgeThreshold(spark)
    val uncapped = Runtime.getRuntime.maxMemory() / 16 / 96L
    assert(t == math.min(uncapped, (1L << 24)).toInt)
    assert(t > 0)
  }
}
