package graft

import graft.ops.{Debounce, DenseId, Graph}
import org.apache.spark.sql.functions._

/** Semantic laws for the round-7 mining operators, on hand-built
  * inputs where the expected answer is computable by inspection or by
  * an independent naive formulation. The fixture-data value checks live
  * in the DuckDB oracle gate (queries/Mining.scala). */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Graph.triangleStats ----

  test("triangle census: K4 has 4 triangles, cc=1; adding a pendant adds wedges only") {
    // K4 on nodes 1..4: 6 edges, every wedge closed
    val k4 = (for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong)).toDF("a", "b")
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getAs[Long]("n_nodes") == 4 && r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("n_wedges") == 12) // 4 nodes * C(3,2)
    assert(r.getAs[Double]("global_cc") == 1.0)

    // pendant node 5 attached to 1: degree(1)=4 -> +C(4,2)-C(3,2)=3 wedges, 0 new triangles
    val k4p = k4.unionAll(Seq((1L, 5L)).toDF("a", "b"))
    val r2 = Graph.triangleStats(k4p).collect().head
    assert(r2.getAs[Long]("n_triangles") == 4)
    assert(r2.getAs[Long]("n_wedges") == 15)
  }

  test("triangle census canonicalizes: direction, duplicates, self-loops don't change the count") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L), (1L, 3L)).toDF("a", "b")
    val r = Graph.triangleStats(messy).collect().head
    assert(r.getAs[Long]("n_edges") == 3 && r.getAs[Long]("n_triangles") == 1)
  }

  test("triangle census matches naive all-triples count on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for { i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.15 }
      yield (i.toLong, j.toLong))
    val expected = {
      val es = edges.toSet
      def has(a: Long, b: Long) = es.contains((a min b, a max b))
      (for { i <- 0 until n; j <- (i + 1) until n; k <- (j + 1) until n
             if has(i, j) && has(j, k) && has(i, k) } yield 1).size
    }
    val r = Graph.triangleStats(edges.toDF("a", "b")).collect().head
    assert(r.getAs[Long]("n_triangles") == expected.toLong)
  }

  test("broadcast-intersect and wedge-join strategies count identically") {
    val rnd = new scala.util.Random(23)
    val edges = (for { i <- 0 until 60; j <- (i + 1) until 60 if rnd.nextDouble() < 0.1 }
      yield (i.toLong, j.toLong)).toDF("a", "b")
    val viaIntersect = Graph.triangleStats(edges, intersectMaxEdges = Long.MaxValue)
      .select("n_triangles", "n_wedges").as[(Long, Long)].collect().head
    val viaWedgeJoin = Graph.triangleStats(edges, intersectMaxEdges = 0L)
      .select("n_triangles", "n_wedges").as[(Long, Long)].collect().head
    assert(viaIntersect == viaWedgeJoin)
    assert(viaIntersect._1 > 0) // non-degenerate fixture
  }

  // ---- DenseId.assign ----

  test("dense ids are 0..n-1 in exactly the requested total order, at any parallelism") {
    val df = Seq(("c", 3.0), ("a", 1.0), ("d", 3.0), ("b", 2.0)).toDF("k", "w")
    for (parts <- Seq(1, 7)) {
      val out = DenseId.assign(df.repartition(parts), Seq(col("w").desc, col("k")), "id")
        .orderBy("id").select("k", "id").as[(String, Long)].collect().toSeq
      assert(out == Seq(("c", 0L), ("d", 1L), ("b", 2L), ("a", 3L)), s"parts=$parts")
    }
  }

  // ---- Debounce.debounce ----

  test("debounce keeps the chained cool-down, not gap islands") {
    // t=0,3,6 gap 5: island logic keeps {0}; chained debounce keeps {0, 6}
    val df = Seq((1L, 0L, 10L), (1L, 3L, 11L), (1L, 6L, 12L)).toDF("k", "ep", "id")
    val kept = Debounce.debounce(df, "k", "ep", "id", 5L)
      .orderBy("ep").select("id", "keep_seq").as[(Long, Int)].collect().toSeq
    assert(kept == Seq((10L, 1), (12L, 2)))
  }

  test("debounce equals the naive sequential reference on random logs, at any partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val gap = 37L
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var last = Long.MinValue
      var kept = false
      rs.sortBy(t => (t._2, t._3)).flatMap { case (_, ep, id) =>
        if (!kept || ep - last > gap) { kept = true; last = ep; Some((k, ep, id)) }
        else None
      }
    }.toSet
    for (parts <- Seq(1, 8)) {
      val got = Debounce.debounce(rows.toDF("k", "ep", "id").repartition(parts),
          "k", "ep", "id", gap)
        .select("k", "ep", "id").as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("debounce keep_seq numbers the kept chain densely from 1") {
    val df = Seq((9L, 0L, 1L), (9L, 100L, 2L), (9L, 200L, 3L)).toDF("k", "ep", "id")
    val seqs = Debounce.debounce(df, "k", "ep", "id", 50L)
      .orderBy("ep").select("keep_seq").as[Int].collect().toSeq
    assert(seqs == Seq(1, 2, 3))
  }
}
