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

  // ---- ArrayOps.sortedIntersectCount ----

  test("sorted intersect count equals array_intersect size on random sorted arrays") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { _ =>
      val a = (1 to 30).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      val b = (1 to 30).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        graft.functions.ArrayOps.intersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
    // empty sides
    val e = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    assert(e.select(graft.functions.ArrayOps.intersectCount(col("a"), col("b")))
      .as[Long].head() == 0L)
  }

  // ---- Graph.kCore ----

  test("k-core peel strips pendants and keeps the closed triangle") {
    // triangle {1,2,3} + chain 3-4-5: 2-core = the triangle, all deg 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val core = Graph.kCore(edges, k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("k-core with k above the max degree empties; k=1 keeps every edge endpoint") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graph.kCore(edges, k = 3, rounds = 3).count() == 0)
    assert(Graph.kCore(edges, k = 1, rounds = 3).count() == 3)
  }

  test("bounded peel equals an independent driver-side peel on a random graph") {
    val rnd = new scala.util.Random(31)
    val edges = (for { i <- 0 until 50; j <- (i + 1) until 50 if rnd.nextDouble() < 0.12 }
      yield (i.toLong, j.toLong))
    val k, rounds = 3
    // naive reference peel
    var es = edges.toSet
    for (_ <- 1 to rounds) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, l) => n -> l.size }
      val keep = deg.filter(_._2 >= k).keySet
      es = es.filter(e => keep(e._1) && keep(e._2))
    }
    val expected = es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, l) => (n, l.size.toLong) }.toSet
    val got = Graph.kCore(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  // ---- Bpe.train ----

  test("BPE training learns the dominant pair and applies it leftmost-first") {
    // corpus: "abab"×3, "aaa"×2 — round 1 must merge (a,b) (count 6 beats
    // (b,a)'s 3 and (a,a)'s 2·2→ wait: (a,a) appears twice per "aaa" = 4)
    val words = Seq(("abab", 3L), ("aaa", 2L)).toDF("word", "wf")
    val r = graft.ops.Bpe.train(words, rounds = 2)
    assert(r.head.left_tok == "a" && r.head.right_tok == "b" && r.head.pair_count == 6L)
    // after merging (a,b): "abab"→[ab,ab] (2 toks), "aaa"→[a,a,a] (3)
    // weighted avg = (3*2 + 2*3) / 5 = 2.4
    assert(math.abs(r.head.avg_tokens_per_word - 2.4) < 1e-12)
    // round 2: remaining pairs — (ab,ab) ×3, (a,a) ×4 → (a,a) wins
    assert(r(1).left_tok == "a" && r(1).right_tok == "a" && r(1).pair_count == 4L)
  }

  test("BPE merge application chains through the carry (greedy left-to-right)") {
    // "aaa" under merge (a,a): leftmost pair merges, the merged token
    // becomes the carry — ["aa","a"], NOT ["a","aa"]; next round (aa,a)
    val words = Seq(("aaa", 1L)).toDF("word", "wf")
    val r = graft.ops.Bpe.train(words, rounds = 2)
    assert(r.head.left_tok == "a" && r.head.right_tok == "a")
    assert(r.head.avg_tokens_per_word == 2.0) // ["aa","a"]
    assert(r(1).left_tok == "aa" && r(1).right_tok == "a")
    assert(r(1).avg_tokens_per_word == 1.0)
  }

  test("BPE training stops early when no adjacent pairs remain") {
    // single-character words: zero pairs from round 1 — no crash,
    // zero merge rows
    val words = Seq(("a", 3L), ("b", 2L)).toDF("word", "wf")
    assert(graft.ops.Bpe.train(words, rounds = 3).isEmpty)
    // one mergeable pair, then exhaustion: exactly one round emitted
    val w2 = Seq(("ab", 1L)).toDF("word", "wf")
    val r2 = graft.ops.Bpe.train(w2, rounds = 5)
    assert(r2.map(m => (m.round, m.left_tok, m.right_tok)) == Seq((1, "a", "b")))
  }

  // ---- Eigen.power ----

  test("power iteration reports eigenvalue 0 on a zero matrix instead of NaN") {
    val (v, eig) = graft.ops.Eigen.power(Array.fill(3, 3)(0.0), iters = 5)
    assert(eig == 0.0 && v.forall(x => !x.isNaN))
  }

  test("triangle census: wedge-free matching reports NULL clustering coefficient") {
    val m = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val r = Graph.triangleStats(m).collect().head
    assert(r.getAs[Long]("n_wedges") == 0 && r.isNullAt(r.fieldIndex("global_cc")))
  }

  test("power iteration finds the dominant eigenpair of a diagonal matrix") {
    val g = Array(Array(2.0, 0.0), Array(0.0, 1.0))
    val (v, eig) = graft.ops.Eigen.power(g, iters = 20)
    assert(math.abs(eig - 2.0) < 1e-6)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-6 && math.abs(v(1)) < 1e-6)
  }

  test("power iteration is Rayleigh-consistent on a random symmetric matrix") {
    val rnd = new scala.util.Random(5)
    val n = 16
    val a = Array.tabulate(n, n)((_, _) => rnd.nextDouble() - 0.3)
    val g = Array.tabulate(n, n)((i, j) => a(i)(j) + a(j)(i))
    val (v, eig) = graft.ops.Eigen.power(g, iters = 60)
    // Rayleigh quotient of the returned unit vector ≈ returned eigenvalue
    val gv = Array.tabulate(n)(i => (0 until n).map(j => g(i)(j) * v(j)).sum)
    val rayleigh = (0 until n).map(i => v(i) * gv(i)).sum
    assert(math.abs(math.abs(rayleigh) - eig) < 1e-6,
      s"rayleigh=$rayleigh eig=$eig")
  }

  // ---- fixture-level laws for oracle-gated queries ----

  test("PSI drift report: bin counts partition both halves and probabilities sum to 1") {
    val r = SparkEntry.queries("a25_psi_drift")(spark, sfSmoke).collect()
    assert(r.length == 10)
    val pRef = r.map(_.getAs[Double]("p_ref")).sum
    val pCur = r.map(_.getAs[Double]("p_cur")).sum
    assert(math.abs(pRef - 1.0) < 1e-9 && math.abs(pCur - 1.0) < 1e-9)
    // psi_total is a constant column (window over ())
    assert(r.map(_.getAs[Double]("psi_total")).distinct.length == 1)
  }

  test("attribution: last touch is within the window, linear credits split the value") {
    val rows = SparkEntry.queries("a26_attribution")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val lookback = Option(row.getAs[java.lang.Long]("lookback_s"))
      lookback.foreach(l => assert(l >= 0 && l <= 604800, s"lookback $l outside window"))
      // null last_touch fields come and go together
      assert(row.isNullAt(row.fieldIndex("last_touch_id")) ==
        row.isNullAt(row.fieldIndex("last_touch_type")))
      val n = row.getAs[Long]("n_touches")
      if (n > 0 && !row.isNullAt(row.fieldIndex("value"))) {
        val v = row.getAs[Double]("value")
        val cc = row.getAs[Double]("credit_click")
        val cv = row.getAs[Double]("credit_view")
        assert(math.abs(cc + cv - v) < 1e-9, s"credits $cc+$cv != value $v")
      }
    }
  }

  test("ABC classes are monotone along cumulative share and cover A<B<C") {
    val rows = SparkEntry.queries("w9_abc_pareto")(spark, sfSmoke)
      .select("cum_share", "abc_class").collect()
    assert(rows.nonEmpty)
    // cum_share ascending (query orders by it); class never goes backward
    val order = Map("A" -> 0, "B" -> 1, "C" -> 2)
    val classes = rows.map(r => order(r.getString(1)))
    assert(classes.zip(classes.tail).forall { case (a, b) => a <= b })
    assert(rows.last.getDouble(0) > 0.999999 && rows.last.getDouble(0) < 1.000001)
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

  test("debounce rejects non-integral key columns instead of collapsing them to NULL→0") {
    val df = Seq(("a", 0L, 1L), ("b", 1L, 2L)).toDF("k", "ep", "id")
    val e = intercept[IllegalArgumentException] {
      Debounce.debounce(df, "k", "ep", "id", 5L)
    }
    assert(e.getMessage.contains("integral"))
  }

  // ---- SeqFold (t13_ewma / t15_holt kernels) ----

  test("EWMA kernel equals the naive sequential reference bit-for-bit, at any partitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble() * 100))
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var prev = 0.0; var first = true
      rs.sortBy(t => (t._2, t._3)).map { case (_, ep, id, v) =>
        val e = if (first) { first = false; v } else 0.25 * v + 0.75 * prev
        prev = e
        (k, ep, id, v, e)
      }
    }.toSet
    for (parts <- Seq(1, 8)) {
      val got = graft.ops.SeqFold.ewma(
          rows.toDF("k", "ep", "id", "v").repartition(parts), "k", "ep", "id", "v", 0.25)
        .as[(Long, Long, Long, Double, Double)].collect().toSet
      assert(got == expected, s"parts=$parts") // Set equality on raw doubles = bitwise
    }
  }

  test("Holt kernel equals the naive sequential reference; fitted is the prior l+t") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong, rnd.nextDouble() * 10))
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var l = 0.0; var t = 0.0; var first = true
      rs.sortBy(r => (r._2, r._3)).map { case (_, ep, id, v) =>
        val fitted = if (first) None else Some(l + t)
        if (first) { first = false; l = v; t = 0.0 }
        else {
          val l1 = 0.5 * v + 0.5 * (l + t)
          val t1 = 0.25 * (l1 - l) + 0.75 * t
          l = l1; t = t1
        }
        (k, ep, id, v, l, t, fitted)
      }
    }.toSet
    val got = graft.ops.SeqFold.holt(
        rows.toDF("k", "ep", "id", "v").repartition(5), "k", "ep", "id", "v", 0.5, 0.25)
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].collect().toSet
    assert(got == expected)
  }

  test("EWMA/Holt kernels stay linear on a 50k-event hot key") {
    // the r7 aggregate(... concat) spelling was O(n²) per key — 50k
    // events on ONE key took minutes there; the typed kernel must
    // finish the same input comfortably inside the suite budget
    val n = 50000
    val df = spark.range(n).select(lit(1L).as("k"), col("id").as("ep"),
      col("id").as("id2"), (col("id") % 97).cast("double").as("v"))
    val e = graft.ops.SeqFold.ewma(df, "k", "ep", "id2", "v", 0.25)
    val h = graft.ops.SeqFold.holt(df, "k", "ep", "id2", "v", 0.5, 0.25)
    assert(e.count() == n && h.count() == n)
    // spot-check the chain actually folded (not all pass-through)
    val last = e.orderBy(col("ep").desc).select("ewma").as[Double].head()
    assert(last != ((n - 1) % 97).toDouble)
  }

  // ---- Prefix.rankAndRunningSum (w9_abc_pareto kernel) ----

  test("prefix rank+running-sum equals the window spelling exactly, at any parallelism") {
    val rnd = new scala.util.Random(41)
    val df = (1 to 300).map(i => (i.toLong, BigDecimal(rnd.nextInt(100000), 2)))
      .toDF("k", "v").select(col("k"), col("v").cast("decimal(18,2)").as("v"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v").desc, col("k"))
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long") - 1)
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "rk", "cum").as[(Long, Long, java.math.BigDecimal)]
      .collect().toSet
    for (parts <- Seq(1, 8)) {
      val got = graft.ops.Prefix.rankAndRunningSum(
          df.repartition(parts), Seq(col("v").desc, col("k")), "v", "rk", "cum")
        .select("k", "rk", "cum").as[(Long, Long, java.math.BigDecimal)]
        .collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("prefix running sum skips NULL values and is NULL before the first non-null") {
    val df = Seq((1L, null), (2L, "3.50"), (3L, null), (4L, "1.25"))
      .toDF("k", "v").select(col("k"), col("v").cast("decimal(18,2)").as("v"))
    val got = graft.ops.Prefix.rankAndRunningSum(df, Seq(col("k")), "v", "rk", "cum")
      .orderBy("rk").select("k", "cum").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getDecimal(1).compareTo(new java.math.BigDecimal("3.50")) == 0)
    assert(got(2).getDecimal(1).compareTo(new java.math.BigDecimal("3.50")) == 0)
    assert(got(3).getDecimal(1).compareTo(new java.math.BigDecimal("4.75")) == 0)
  }

  test("prefix rejects float value columns (order-sensitive running sums)") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Prefix.rankAndRunningSum(df, Seq(col("k")), "v")
    }
    assert(e.getMessage.contains("exact"))
  }
}
