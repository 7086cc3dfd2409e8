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
}
