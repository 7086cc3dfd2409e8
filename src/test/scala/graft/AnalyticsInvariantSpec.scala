package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the reshape/reconcile/resample queries —
  * properties the DuckDB hash-match can't express (it proves equality
  * with the oracle, not that both are RIGHT). Each test states a law
  * the operator must satisfy on any input and checks it on the real
  * corpus.
  */
class AnalyticsInvariantSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("OHLC bars: low <= open,close <= high and ticks partition exactly") {
    val bars = run("t9_resample_ohlc").cache()
    try {
      val bad = bars.filter(
        col("low") > col("open") || col("low") > col("close") ||
          col("high") < col("open") || col("high") < col("close") ||
          col("low") > col("high"))
      assert(bad.count() == 0, "a bar's open/close escaped its [low, high] range")
      // every tick lands in exactly one bar
      val total = Tables.events(spark, sf).count()
      val barSum = bars.agg(sum("n_ticks")).head().getLong(0)
      assert(barSum == total, s"bars hold $barSum ticks, corpus has $total")
      // single-tick bars must degenerate to open = close = high = low
      val deg = bars.filter(col("n_ticks") === 1)
        .filter(col("open") =!= col("close") || col("high") =!= col("low"))
      assert(deg.count() == 0, "a 1-tick bar has distinct open/close")
    } finally bars.unpersist()
  }

  test("SCD2 history: versions contiguous from 1, runs alternate, events partition exactly") {
    val hist = run("s16_scd2_history").cache()
    try {
      // per user: versions are exactly 1..n (the running change-flag sum
      // can't skip), and consecutive versions never share a state (a
      // shared state means the island split spuriously)
      val perUser = hist.groupBy("uid").agg(
        count(lit(1)).as("n"), min("version").as("vmin"), max("version").as("vmax"))
      assert(perUser.filter(col("vmin") =!= 1 || col("vmax") =!= col("n")).count() == 0,
        "a user's version sequence has gaps")
      val next = hist.select(col("uid"), col("version"), col("state"))
        .withColumn("next_state",
          lead(col("state"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("uid").orderBy("version")))
      assert(next.filter(col("state") === col("next_state")).count() == 0,
        "consecutive versions share a state — island split spuriously")
      val total = Tables.events(spark, sf).count()
      val histSum = hist.agg(sum("n_events")).head().getLong(0)
      assert(histSum == total, s"history covers $histSum events, corpus has $total")
    } finally hist.unpersist()
  }

  test("full-outer reconciliation: tags partition the key union") {
    val rec = run("j14_full_outer").cache()
    try {
      // keys are unique (both inputs are aggregates) and every 'both'
      // row carries values from both sides, every X_only row exactly one
      assert(rec.count() == rec.select("uid").distinct().count())
      assert(rec.filter(col("tag") === "both" &&
        (col("signup_total").isNull || col("purchase_total").isNull)).count() == 0)
      assert(rec.filter(col("tag") === "signup_only" &&
        col("purchase_total").isNotNull).count() == 0)
      assert(rec.filter(col("tag") === "purchase_only" &&
        col("signup_total").isNotNull).count() == 0)
    } finally rec.unpersist()
  }

  test("grouping sets: each breakdown independently sums to the corpus") {
    val gs = run("a19_grouping_sets").cache()
    try {
      val total = Tables.events(spark, sf).count()
      // the () set is one row holding the grand total; each one-key set
      // partitions the corpus, so its counts sum back to the total
      val grand = gs.filter(col("g_t") === 1 && col("g_u") === 1)
      assert(grand.count() == 1 && grand.head().getAs[Long]("n") == total)
      val byType = gs.filter(col("g_t") === 0 && col("g_u") === 1)
      assert(byType.agg(sum("n")).head().getLong(0) == total)
      val byUser = gs.filter(col("g_t") === 1 && col("g_u") === 0)
      assert(byUser.agg(sum("n")).head().getLong(0) == total)
    } finally gs.unpersist()
  }

  test("text cleaning is idempotent and its output alphabet is closed") {
    // law: clean(clean(x)) = clean(x) — a second pass over an already
    // clean string must be a fixpoint, else the chain's stages interact
    // (e.g. punctuation-strip re-introducing double spaces). Uses the
    // PRODUCTION chain (queries.Text.cleanedText), not a copy.
    val cleaned = Tables.documents(spark, sf)
      .withColumn("c1", graft.queries.Text.cleanedText(col("text")))
      .withColumn("c2", graft.queries.Text.cleanedText(col("c1")))
    assert(cleaned.filter(col("c1") =!= col("c2")).count() == 0,
      "cleaning is not a fixpoint on its own output")
    assert(cleaned.filter(col("c1").rlike("[^a-z0-9 ]|  ")).count() == 0,
      "cleaned text contains a non-alphanumeric or a double space")
  }

  test("histogram: bins partition the corpus and shares sum to one") {
    val hist = run("a20_histogram").cache()
    try {
      val total = Tables.events(spark, sf).count()
      assert(hist.agg(sum("n")).head().getLong(0) == total,
        "histogram bins do not partition the corpus")
      val shareSum = hist.agg(sum("share")).head().getDouble(0)
      assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
      assert(hist.filter(col("lo") =!= col("bin") * 50.0).count() == 0,
        "bin lower bound disagrees with bin index")
    } finally hist.unpersist()
  }

  test("domain cap: at most K per source, exactly min(K, domain size) kept") {
    val capped = run("x_domain_cap").cache()
    try {
      val perSource = capped.groupBy("source").agg(count(lit(1)).as("kept"))
      assert(perSource.filter(col("kept") > 15).count() == 0,
        "a domain exceeds the cap")
      val expected = Tables.documents(spark, sf)
        .groupBy("source").agg(least(count(lit(1)), lit(15L)).as("want"))
      val mismatch = perSource.join(expected, Seq("source"), "full_outer")
        .filter(col("kept").isNull || col("want").isNull ||
          col("kept") =!= col("want"))
      assert(mismatch.count() == 0,
        "kept-per-domain differs from min(cap, domain size)")
    } finally capped.unpersist()
  }

  test("contamination: every injected copy of a benchmark doc is fully flagged") {
    // benchmark = %50 originals; the dedup corpus injects an EXACT copy
    // of each at doc_id + (max+1) — identical text ⟹ identical shingle
    // set ⟹ contamination must be exactly 1.0 for every one of them
    val docs = Tables.documents(spark, sf)
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val expectedIds = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + off).as("doc_id"))
    val flagged = run("x_contamination")
    val fullHits = flagged.filter(col("contamination") === 1.0)
      .select("doc_id")
    assert(expectedIds.exceptAll(fullHits).isEmpty,
      "an exact benchmark copy escaped full contamination")
  }

  test("array kitchen: folds agree with typed recomputation") {
    // recompute sum_all and rev_dot in plain Scala on the driver for a
    // sample and compare bitwise — pins the fold ORDER the oracle match
    // relies on (left-to-right, double accumulator)
    import scala.jdk.CollectionConverters._
    val rows = run("f_array_kitchen").limit(50).collect()
    val embs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") <= rows.map(_.getAs[Long]("vec_id")).max)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getList[Float](1).asScala.toArray).toMap
    rows.foreach { r =>
      val e = embs(r.getAs[Long]("vec_id"))
      val sumAll = e.foldLeft(0.0)((acc, x) => acc + x.toDouble)
      val revDot = e.indices.foldLeft(0.0)((acc, i) =>
        acc + e(i).toDouble * e(e.length - 1 - i).toDouble)
      assert(r.getAs[Double]("sum_all") == sumAll, s"sum_all mismatch at ${r}")
      assert(r.getAs[Double]("rev_dot") == revDot, s"rev_dot mismatch at ${r}")
      assert(r.getAs[Int]("n_pos") == e.count(_ > 0f))
    }
  }

  test("LOCF fill: contiguous per-user grid, carries the latest preceding close") {
    val f = run("t12_locf_fill").cache()
    try {
      // the grid is exactly [min..max] per uid, no gaps or duplicates
      val grid = f.groupBy("uid").agg(
        count(lit(1)).as("n"), countDistinct("bucket").as("nd"),
        min("bucket").as("mn"), max("bucket").as("mx"))
      assert(grid.filter(col("n") =!= col("nd") ||
        col("n") =!= col("mx") - col("mn") + 1).count() == 0,
        "a user's bucket grid has gaps or duplicates")
      // every row's close equals the latest ACTUAL close at or before it
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("uid").orderBy("bucket")
        .rowsBetween(Long.MinValue, 0)
      val carried = f.withColumn("expect",
        last(when(!col("is_filled"), col("close")), ignoreNulls = true).over(w))
      assert(carried.filter(col("close") =!= col("expect")).count() == 0,
        "a filled row does not carry the latest preceding actual close")
      // boundary rows are never filled (LOCF cannot extrapolate)
      val edges = f.join(
        f.groupBy("uid").agg(min("bucket").as("b")), Seq("uid"))
        .filter(col("bucket") === col("b") && col("is_filled"))
      assert(edges.count() == 0, "the first bucket of a user is filled")
    } finally f.unpersist()
  }

  test("funnel: stage counts are monotone down the funnel") {
    val r = run("a22_funnel").head()
    val (u, s1, s2, s3, s4) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_signup"),
      r.getAs[Long]("n_signup_view"), r.getAs[Long]("n_signup_view_click"),
      r.getAs[Long]("n_full_funnel"))
    assert(u >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4,
      s"funnel counts not monotone: $u >= $s1 >= $s2 >= $s3 >= $s4")
    assert(s1 > 0, "fixture should produce signups")
  }

  test("transition matrix: rows are distributions, transitions count events minus users") {
    val m = run("a23_transition_matrix").cache()
    try {
      val rowSums = m.groupBy("prev").agg(
        sum(col("p").cast("decimal(28,15)")).cast("double").as("ps"))
      // each row's probabilities sum to 1 within representation error
      assert(rowSums.filter(abs(col("ps") - 1.0) > 1e-9).count() == 0,
        "a transition row does not sum to 1")
      val total = m.agg(sum("n")).head().getLong(0)
      val ev = Tables.events(spark, sf).count()
      val users = Tables.events(spark, sf).select("user_id").distinct().count()
      assert(total == ev - users,
        s"transitions $total != events $ev - users $users")
    } finally m.unpersist()
  }

  test("gram matrix: diagonal nonnegative, Cauchy-Schwarz holds") {
    val g = run("x_gram_matrix").cache()
    try {
      val diag = g.filter(col("i") === col("j"))
        .select(col("i"), col("gram")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(diag.size == 64 && diag.values.forall(_ >= 0.0),
        "diagonal missing entries or negative")
      // |G(i,j)| <= sqrt(G(i,i) G(j,j)): exact on the quantized sums;
      // the 2^-40 double rescale can nudge each side ~1 ulp, hence the
      // relative slack
      val bad = g.filter(col("i") =!= col("j")).collect().filterNot { r =>
        val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        v * v <= diag(i) * diag(j) * (1.0 + 1e-12)
      }
      assert(bad.isEmpty, s"Cauchy-Schwarz violated at ${bad.take(3).mkString(",")}")
    } finally g.unpersist()
  }

  test("tfidf: ranks contiguous, rounded scores descend within a doc") {
    val t = run("x_tfidf").cache()
    try {
      val perDoc = t.groupBy("doc_id").agg(
        count(lit(1)).as("n"), min("rnk").as("rmin"), max("rnk").as("rmax"))
      assert(perDoc.filter(col("rmin") =!= 1 || col("rmax") =!= col("n") ||
        col("n") > 3).count() == 0, "ranks not contiguous 1..n<=3")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("rnk")
      assert(t.withColumn("nxt", lead("score", 1).over(w))
        .filter(col("nxt") > col("score")).count() == 0,
        "scores increase down the ranking")
    } finally t.unpersist()
  }

  test("hard negatives: positives share the anchor label, negatives never do") {
    val h = run("x_hard_negative").cache()
    try {
      val labels = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"))
      val j = h.join(labels, Seq("q_id")).cache()
      assert(j.filter(col("kind") === "positive")
        .filter(col("label") =!= col("q_label")).count() == 0,
        "a positive has a different label than its anchor")
      assert(j.filter(col("kind") === "hard_neg")
        .filter(col("label") === col("q_label")).count() == 0,
        "a hard negative shares the anchor label")
      val perKind = h.groupBy("q_id", "kind").agg(count(lit(1)).as("n"))
      assert(perKind.filter(col("kind") === "positive" && col("n") > 1).count() == 0)
      assert(perKind.filter(col("kind") === "hard_neg" && col("n") > 3).count() == 0)
    } finally h.unpersist()
  }

  test("dataset mix: caps respected, rate-1 languages fully kept, shares sum to 1") {
    val m = run("x_dataset_mix").cache()
    try {
      assert(m.filter(col("kept_n") > col("n_lang")).count() == 0,
        "kept more than available")
      assert(m.filter(col("rate") === 1.0 && col("kept_n") =!= col("n_lang"))
        .count() == 0, "a fully-rated language lost documents")
      // the fixture's en surplus must actually exercise the rate branch
      assert(m.filter(col("rate") < 1.0).count() >= 1,
        "no language was rate-limited - the mix is degenerate")
      val s = m.agg(sum(col("achieved_share").cast("decimal(28,15)"))
        .cast("double")).head().getDouble(0)
      assert(math.abs(s - 1.0) < 1e-9, s"achieved shares sum to $s")
    } finally m.unpersist()
  }

  test("z-test: variant counts partition users, conversions bounded") {
    val r = run("a24_abtest_ztest").head()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") == users)
    assert(r.getAs[Long]("c0") <= r.getAs[Long]("n0"))
    assert(r.getAs[Long]("c1") <= r.getAs[Long]("n1"))
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite,
      "z must be finite - the conversion definition went degenerate")
  }

  test("OOV rate: bounded and consistent with token counts") {
    val o = run("x_oov_rate")
    assert(o.filter(col("n_oov") > col("n_tokens") ||
      col("oov_rate") < 0.0 || col("oov_rate") > 1.0).count() == 0)
  }

  test("RFM: scores are balanced rank quintiles and the label rules hold") {
    val r = run("a31_rfm").cache()
    try {
      val n = r.count()
      assert(n > 0)
      // every score in 1..5, each quintile bucket sized n/5 (+1 at the
      // remainder boundary) — the rank construction's defining property
      for (c <- Seq("r_score", "f_score", "m_score")) {
        val sizes = r.groupBy(c).count().collect()
          .map(row => row.getInt(0) -> row.getLong(1)).toMap
        assert(sizes.keySet.forall(s => s >= 1 && s <= 5), s"$c out of 1..5")
        sizes.foreach { case (s, cnt) =>
          assert(cnt >= n / 5 && cnt <= n / 5 + 1, s"$c=$s bucket $cnt of $n")
        }
      }
      // labels must agree with the published rule on every row
      val bad = r.filter(expr("""NOT (
          |  (segment = 'champion'    AND r_score >= 4 AND f_score >= 4) OR
          |  (segment = 'loyal'       AND NOT (r_score >= 4 AND f_score >= 4) AND f_score >= 4) OR
          |  (segment = 'recent'      AND f_score < 4 AND r_score >= 4) OR
          |  (segment = 'at_risk'     AND f_score < 4 AND r_score < 4 AND r_score <= 2 AND f_score >= 3) OR
          |  (segment = 'hibernating' AND f_score < 4 AND r_score < 4 AND NOT (r_score <= 2 AND f_score >= 3) AND r_score <= 2 AND f_score <= 2) OR
          |  (segment = 'regular'     AND f_score < 4 AND r_score < 4 AND NOT (r_score <= 2 AND f_score >= 3) AND NOT (r_score <= 2 AND f_score <= 2)))""".stripMargin))
      assert(bad.count() == 0, "a segment label disagrees with the score rule")
    } finally r.unpersist()
  }
}
