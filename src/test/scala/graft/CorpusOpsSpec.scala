package graft

import graft.ops.Sketches
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Invariants for the corpus-preparation operators (queries.Corpus) and
  * the KMV sketch (ops.Sketches): accuracy against exact, partition
  * invariance of the mergeable sketch, chunk-coverage laws, and
  * end-to-end behavior on an injected corpus (the query functions take
  * a directory, so edge-case corpora are just temp parquet dirs).
  */
class CorpusOpsSpec extends SparkTestBase {

  private def q(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** Write an ad-hoc documents corpus and return its directory. */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_corpus").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("srcX").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- containment dedup ------------------------------------------

  test("containment dedup finds the quoted-inside pair symmetric Jaccard misses") {
    // A's 6 tokens appear verbatim inside B (12 tokens): containment
    // |A∩B|/|A| = 1.0, while Jaccard is 4/10 = 0.4 — under the 0.5
    // near-dup threshold, the exact blind spot this operator exists
    // for. C shares nothing.
    val dir = corpusDir(Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "intro words here alpha beta gamma delta epsilon zeta trailing tail tokens",
      3L -> "one two three four five six seven"))
    val rows = q("x_dedup_containment", dir)
      .select("a_id", "b_id", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 2L, 1.0)), s"got $rows")
    val jaccard = q("x_dedup_ngram", dir).collect()
    assert(jaccard.isEmpty, "Jaccard at 0.5 should miss the quoted pair")
  }

  // ---- KMV sketch -------------------------------------------------

  test("kmv estimate tracks exact distinct within sketch error") {
    val est = q("x_kmv_distinct", sfSmoke)
      .select("l_returnflag", "est_distinct").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.lineitem(spark, sfSmoke)
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (flag, e) =>
      val x = exact(flag).toDouble
      // k=64 → relative std ≈ 1/√62 ≈ 12.7%; 4σ bound
      assert(math.abs(e - x) / x <= 0.5,
        s"$flag: kmv=$e exact=$x — outside sketch error")
    }
  }

  test("sketch profile tracks the exact profile: estimates within error, rest identical") {
    val exact = q("a21_profile", sfSmoke).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val sketch = q("a21_profile_kmv", sfSmoke).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(exact.keySet === sketch.keySet && exact.nonEmpty)
    exact.foreach { case (c, e) =>
      val s0 = sketch(c)
      // non-distinct metrics are computed identically — must be equal
      for (f <- Seq("n_rows", "n_nulls")) {
        assert(e.getAs[Long](f) === s0.getAs[Long](f), s"$c.$f")
      }
      for (f <- Seq("min_val", "max_val", "avg_val")) {
        assert(e.getAs[Double](f) === s0.getAs[Double](f), s"$c.$f")
      }
      // the estimate: exact when the buffer never filled, else within
      // sketch error (k=64 → rel std ≈ 12.7%; 4σ bound)
      val x = e.getAs[Long]("n_distinct").toDouble
      val est = s0.getAs[Double]("est_distinct")
      if (s0.getAs[Int]("n_kept") < 64) assert(est === x, s"$c below-k must be exact")
      else assert(math.abs(est - x) / x <= 0.5, s"$c: kmv=$est exact=$x")
    }
  }

  test("kmv sketch is partition-invariant (merge path ≡ single partition)") {
    val h = expr(queries.md5Hash60Spark("l_orderkey"))
    def sketch(parts: Int) =
      Tables.lineitem(spark, sfSmoke)
        .repartition(parts)
        .select(col("l_returnflag"), h.as("hh"))
        .groupBy("l_returnflag")
        .agg(Sketches.kmv(64)(col("hh")).as("kmv"))
        .select(col("l_returnflag"), col("kmv.n_kept"), col("kmv.kth_hash"),
          col("kmv.est_distinct"))
        .collect().sortBy(_.getString(0)).toSeq
    assert(sketch(1) === sketch(13),
      "KMV result depends on partitioning — merge is not associative")
  }

  test("kmv is exact below k and matches the estimator contract above") {
    val agg = new Sketches.KmvDistinct(8, hashSpace = 1L << 60)
    // below k: the sketch IS the distinct set
    val small = Seq(5L, 3L, 5L, 9L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(small) === Sketches.Kmv(3, 9L, 3.0))
    // above k: k smallest retained, estimate = (k-1)·M/h_k
    val big = (1L to 100L).map(_ * 1000L).foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(big)
    assert(out.n_kept === 8 && out.kth_hash === 8000L)
    assert(out.est_distinct === 7.0 * (1L << 60).toDouble / 8000.0)
    // merge ≡ reduce-all, any split point
    val all = (1L to 40L).map(i => (i * 7919L) % 1000L)
    for (cut <- Seq(0, 7, 20, 40)) {
      val (l, r) = all.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq === all.foldLeft(agg.zero)(agg.reduce).toSeq,
        s"merge at $cut diverges")
    }
  }

  test("kmv plan pays one exchange; exact distinct pays two") {
    // count only requirement-driven hash exchanges: the widening
    // exchange the loaders add (REPARTITION_BY_NUM) is input-sized and
    // not part of the aggregation strategy under test
    def nExchanges(plan: String) =
      plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && l.contains("ENSURE_REQUIREMENTS"))
    val sketch = q("x_kmv_distinct", sfSmoke).queryExecution.executedPlan.toString
    assert(nExchanges(sketch) === 1, s"sketch plan shuffles more than once:\n$sketch")
    assert(!sketch.contains("Expand"), "sketch plan should not Expand")
    // control: the exact form dedups at (group, value) grain first —
    // a second full-data exchange the sketch never pays. The distinct
    // value must NOT be the loader's widening key (l_orderkey): hash
    // distribution by the key already co-locates that dedup grain and
    // the exchange legitimately disappears — countDistinct(l_partkey)
    // keeps the control un-co-located
    val exact = Tables.lineitem(spark, sfSmoke)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey"))
      .queryExecution.executedPlan.toString
    assert(nExchanges(exact) === 2,
      s"control: exact distinct expected two exchanges:\n$exact")
  }

  // ---- chunking ---------------------------------------------------

  test("chunks cover every token exactly and reconstruct the document") {
    // 1-token, exactly-one-window, one-past-window, and long docs
    val docs = Seq(
      1L -> "solo",
      2L -> (1 to 32).map(i => s"w$i").mkString(" "),
      3L -> (1 to 33).map(i => s"w$i").mkString(" "),
      4L -> (1 to 100).map(i => s"t$i").mkString(" "))
    val dir = corpusDir(docs)
    val rows = q("x_chunking", dir)
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val nTokens = docs.toMap.view.mapValues(_.split(" ").length).toMap
    docs.foreach { case (id, _) =>
      val cs = byDoc(id)
      val n = nTokens(id)
      // first chunk starts at 1; stride 24; last chunk reaches token n
      assert(cs.head._3 === 1)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._3 === 24, s"doc $id stride")
        case _ =>
      }
      assert(cs.last._3 + cs.last._4 - 1 === n, s"doc $id tail coverage")
      // expected chunk count: 1 + ceil(max(n-32,0)/24)
      assert(cs.length === 1 + math.ceil(math.max(n - 32, 0) / 24.0).toInt)
    }
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2)
  }

  // ---- repetition quality -----------------------------------------

  test("repetitive documents are flagged; diverse ones are not") {
    val dir = corpusDir(Seq(
      1L -> Seq.fill(30)("spam ham").mkString(" "),          // one bigram repeated
      2L -> (1 to 60).map(i => s"u$i").mkString(" ")))       // all distinct
    val out = q("x_quality_repetition", dir)
      .select("doc_id", "dup_bigram_frac", "top_bigram_share", "flagged")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    val (rep, div) = (out(0), out(1))
    assert(rep._2 > 0.9 && rep._4, s"repetitive doc not flagged: $rep")
    assert(div._2 === 0.0 && !div._4, s"diverse doc flagged: $div")
    assert(rep._3 > div._3, "top-bigram share should rank repetitive higher")
  }

  // ---- BM25 -------------------------------------------------------

  test("bm25 stats join broadcasts and scores rank term-bearing docs") {
    val df = q("x_bm25", sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "corpus-stats row should broadcast, not shuffle")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tfSum = r.getInt(1) + r.getInt(2) + r.getInt(3)
      assert(tfSum > 0, "scored doc carries no query term")
      assert(r.getDouble(4) > 0.0, "BM25 score must be positive")
    }
  }

  // ---- cross-document span scrub ----------------------------------

  test("span dedup removes shared 5-gram spans and leaves unique text intact") {
    val shared = "alpha beta gamma delta epsilon" // the cross-doc span
    val dir = corpusDir(Seq(
      1L -> s"one two $shared three four",
      2L -> s"$shared five six seven eight nine",
      3L -> "ten eleven twelve thirteen fourteen fifteen"))
    val out = q("x_span_dedup", dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    // doc 3 shares nothing: untouched, hash of its own text
    assert(out(3L)._2 === 0)
    assert(out(3L)._3 === java.security.MessageDigest.getInstance("MD5")
      .digest("ten eleven twelve thirteen fourteen fifteen".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    // docs 1 and 2: exactly the 5 shared tokens removed
    assert(out(1L) === ((9, 5, md5Hex("one two three four"))))
    assert(out(2L) === ((10, 5, md5Hex("five six seven eight nine"))))
  }

  test("span dedup on identical documents removes everything") {
    val text = "a b c d e f g"
    val dir = corpusDir(Seq(1L -> text, 2L -> text))
    q("x_span_dedup", dir).collect().foreach { r =>
      assert(r.getInt(2) === 7, "all tokens should be covered")
      assert(r.getDouble(3) === 0.0)
      assert(r.getString(4) === md5Hex(""))
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("span dedup matches a brute-force reference on a collision-heavy random corpus") {
    // tiny vocabulary forces genuine cross-doc 5-gram collisions
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // brute force: positions covered by any 5-gram string seen in ≥2 docs
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - 5).map(p => (t.slice(p, p + 5).mkString(" "), id, p))
    }
    val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ")
      val cov = (0 to t.length - 5)
        .filter(p => dup(t.slice(p, p + 5).mkString(" ")))
        .flatMap(p => p until p + 5).toSet
      id -> (t.length, cov.size,
        t.zipWithIndex.collect { case (tok, i) if !cov(i) => tok }.mkString(" "))
    }.toMap

    val out = q("x_span_dedup", corpusDir(docs)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, (n, removed, kept)) =>
      assert(out(id) === ((n, removed, md5Hex(kept))), s"doc $id diverges")
    }
    assert(expected.values.exists(_._2 > 0), "corpus produced no collisions — test is vacuous")
  }

  // ---- trigram LM counts ------------------------------------------

  test("ngram lm counts are exact and conditional probabilities sum to 1") {
    val dir = corpusDir(Seq(
      1L -> "x y z x y z x y w",
      2L -> "x y z"))
    val rows = q("x_ngram_lm", dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // "x y z" appears 3× in doc1? positions: (x y z) at 1, 4; (x y w) at 7; doc2 adds 1
    assert(rows(("x", "y", "z"))._1 === 3L)
    assert(rows(("x", "y", "w"))._1 === 1L)
    assert(rows(("x", "y", "z"))._2 === 4L, "context count = Σ over w3")
    assert(rows(("x", "y", "z"))._3 === 0.75)
    // probabilities within each full context group sum to 1 (±rounding)
    rows.keys.groupBy(k => (k._1, k._2)).foreach { case (_, ks) =>
      val s = ks.map(rows(_)._3).sum
      assert(math.abs(s - 1.0) < 1e-5, s"cond probs sum to $s")
    }
  }

  test("ngram lm matches brute-force trigram counts on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("p", "q", "r", "s")
    val docs = (1L to 30L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val brute = docs.flatMap { case (_, text) =>
      text.split(" ").sliding(3).filter(_.length == 3).map(a => (a(0), a(1), a(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = brute.groupBy { case ((w1, w2, _), _) => (w1, w2) }
      .view.mapValues(_.values.sum).toMap

    val out = q("x_ngram_lm", corpusDir(docs)).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    // top-100 covers everything here (≤ 4³ = 64 trigram types)
    assert(out.size === brute.size)
    out.foreach { case (k, (c3, cc)) =>
      assert(c3 === brute(k), s"count for $k")
      assert(cc === ctx((k._1, k._2)), s"context for $k")
    }
  }

  // ---- weighted sampling ------------------------------------------

  test("weighted sample is partition-invariant and weight-biased") {
    val base = q("x_weighted_sample", sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // partition invariance: hash keys are per-row, top-k is global
    val reparted = Tables.documents(spark, sfSmoke).repartition(17)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("es_key", expr(
        s"round(ln((${queries.md5Hash60Spark("doc_id")} + 1) / ${queries.Hash60Space}) / n_chars, 9)"))
      .orderBy(col("es_key").desc, col("doc_id")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(base === reparted, "sample changed under repartitioning")
    // expectation: P[keep] ∝ n_chars ⇒ sample mean exceeds corpus mean
    val sampleMean = base.map(_._2).sum.toDouble / base.length
    val corpusMean = Tables.documents(spark, sfSmoke)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
