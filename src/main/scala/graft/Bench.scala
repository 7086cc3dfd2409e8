package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; this suite's
      // 60+ queries × several codegen stages each evict one another
      // between passes, so every pass recompiles (and re-JITs) its hot
      // loops — measured 3× on the heaviest query. Any long-running
      // cluster serving a query mix wants this raised the same way.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    // ERROR: the one WARN this suite emits by design (Report's
    // single-partition grand-total window over the already-aggregated
    // per-source rows — deliberate and documented there) would repeat
    // 150+ times across three passes; the bench contract is the JSON
    // line, not a log stream.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, parquet footer caches, JIT) on the
    // flagship query so the first timed query isn't charged for startup.
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // One untimed warm pass, then three timed passes, per-query minimum:
    // steady-state timing. Generated code is JIT-compiled lazily —
    // identical consecutive executions measure 5.7s → 2.8s → 1.3s while
    // C2 ramps — so the first execution of each query times the JVM,
    // not the plan; and a single timed pass is additionally at the
    // mercy of transient host contention (observed 25× one-off spikes
    // on an otherwise sub-second query, on BOTH passes of a 2-pass
    // run). Warm-then-min reports what the engine actually costs per
    // query at steady state, the same policy as any JMH-style harness.
    // A query that throws must NOT record a timing: r5's artifact carried
    // 44 ~0.05s analysis-failure floors that read as 20-38× speedups. A
    // failed query times as +Infinity within the pass and is reported in
    // a "failed" list with a null time — it can never improve the total.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-query shuffle volume: seconds at sf0.1 can hide a plan that
    // is fast here but moves the whole input through an exchange — at
    // 100 TB the shuffled BYTES are the cost model. A listener sums
    // task-level shuffle writes; the final timed pass records them per
    // query (reset → run → poll-stable read: task-end events arrive on
    // the async bus, the SQL-metrics discipline). The poll runs AFTER
    // the query's own timing is captured, so timings are unaffected.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillBytes.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def settled(a: java.util.concurrent.atomic.AtomicLong): Long = {
      var prev = -1L
      var cur = a.get
      val t0 = System.nanoTime()
      while (cur != prev && System.nanoTime() - t0 < 2e9.toLong) {
        Thread.sleep(100); prev = cur; cur = a.get
      }
      cur
    }
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    def pass(recordShuffle: Boolean = false, dir: String = sfDir): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
      // drop shared materialized intermediates (dedup signature frames)
      // so each query's timing charges its own full compute —
      // intra-query reuse is the optimization under test, a previous
      // query's warm cache is not
      graft.ops.PlanCache.clear()
      if (recordShuffle) { settled(shuffleBytes); shuffleBytes.set(0) }
      val t0 = System.nanoTime()
      // toRdd executes the FULL plan — every output column is computed.
      // A plain .count() would let Catalyst prune computed columns and
      // under-report any query whose cost is in its projections.
      val ok =
        try { fn(spark, dir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          failed.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (recordShuffle && ok)
        shuffleMb(name) = math.round(settled(shuffleBytes) / 1e5) / 10.0
      name -> (if (ok) elapsed else Double.PositiveInfinity)
    }
    pass() // warm (JIT/codegen), untimed
    val timed1 = pass()
    val timed2 = pass()
    // spill shares shuffle_mb's denominator (the final pass only):
    // settle the async task-end bus, then zero before the recorded pass
    settled(spillBytes); spillBytes.set(0)
    val timed = Seq(timed1, timed2, pass(recordShuffle = true))
    // capture before the skew measurement below adds its own spill
    val spillFinalPassBytes = settled(spillBytes)
    val resultsAll = timed.head.keys.map { k =>
      k -> timed.map(_(k)).min
    }.toMap
    val results = resultsAll.filter { case (_, v) => v.isFinite }
    val failedNames = resultsAll.collect { case (k, v) if !v.isFinite => k }.toSeq.sorted
    // Host-load calibration: a fixed 400M-step single-thread LCG loop.
    // Query timings vary run-to-run with machine contention (a loaded
    // host measured this same suite ~2× slower end-to-end, min-of-3
    // included, because contention spanned the whole run); calib_s
    // moves identically, so readings are comparable ACROSS runs via
    // value/calib_s. min-of-3 after one warm round, like the queries.
    def lcgPass(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L; var i = 0
      while (i < 400000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
      if (x == 42) print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    lcgPass()
    val calib = Seq(lcgPass(), lcgPass(), lcgPass()).min
    // Multi-core calibration: calib_s is single-threaded and therefore
    // BLIND to multi-core contention — r11 measured a uniform 1.2×
    // inflation across 152 untouched queries while calib_s moved 1%,
    // because a competing multi-threaded load steals cores that the
    // 1-thread loop never asks for. calib_mt_s runs the same LCG on
    // every query-execution core at once (cpus threads × 100M steps);
    // when the host is quiet it tracks calib_s × (work ratio), and
    // under multi-core contention it inflates the same way the query
    // suite does — so uniform between-run inflation is machine-
    // detectable from the artifact alone: queries up, calib_s flat,
    // calib_mt_s up ⇒ host contention, not a regression.
    def lcgMtPass(): Double = {
      val n = cpus.toInt
      val t0 = System.nanoTime()
      val threads = (0 until n).map { i =>
        new Thread(() => {
          var x = 0x9E3779B97F4A7C15L + i; var k = 0
          while (k < 100000000) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
          if (x == 42) print("")
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    lcgMtPass()
    val calibMt = Seq(lcgMtPass(), lcgMtPass(), lcgMtPass()).min
    // Adversarial-skew measurement: the same hot-key join timed with
    // and without salting (ops/Skew.saltedJoin), both numbers in the
    // metric JSON. 90% of lineitem rows collapse onto ONE part key —
    // the pathological shape a domain-heavy 100 TB corpus produces.
    // Broadcast is disabled for the measurement: at lake scale the
    // dimension doesn't fit an executor, and a broadcast join would
    // sidestep the skew being measured. AQE stays on (engine default),
    // so "direct" includes AQE's own skew-split — salting is measured
    // against Spark's best built-in answer, not a strawman.
    val skewJson = {
      import org.apache.spark.sql.functions._
      val restoreBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val hot = Tables.part(spark, sfDir).agg(min("p_partkey")).head().getLong(0)
        def skewed = Tables.lineitem(spark, sfDir)
          .withColumn("l_partkey",
            when(pmod(col("l_orderkey"), lit(10)) < 9, lit(hot))
              .otherwise(col("l_partkey")))
        val dim = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type"))
        def run(joined: org.apache.spark.sql.DataFrame): Double = {
          val plan = joined.groupBy(col("p_type"))
            .agg(count(lit(1)).as("n"), sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
          val t0 = System.nanoTime()
          plan.queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val directT = {
          def d() = run(skewed.join(dim, col("l_partkey") === col("p_partkey")))
          d(); Seq(d(), d()).min
        }
        // the same join with AQE's skew-split off: the shape salting
        // insures against — a skew AQE cannot rescue (its split only
        // applies to sort-merge/shuffled-hash joins above the size
        // threshold; both-sides-skewed and windowed shapes miss it)
        val directNoAqeT = {
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
          try {
            def d() = run(skewed.join(dim, col("l_partkey") === col("p_partkey")))
            d(); Seq(d(), d()).min
          } finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        }
        val saltedT = {
          def s0() = run(graft.ops.Skew.saltedJoin(
            skewed, dim, "l_partkey", "p_partkey",
            discriminator = col("l_orderkey"), buckets = 16))
          s0(); Seq(s0(), s0()).min
        }
        s""""skew":{"direct_s":$directT,"direct_noskewjoin_s":$directNoAqeT,"salted_s":$saltedT}"""
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restoreBroadcast)
    }
    // Second-scale sweep: sf0.1 timings alone can't distinguish a flat
    // query from a super-linear one — both can be green and fast at one
    // scale. Re-time the whole surface at the sibling sf0.01 (1 warm +
    // 2 timed, min) and emit the per-query 10×-data scaling ratio
    // t(sf0.1)/t(sf0.01): ≈1 = fixed-overhead-bound, ≈10 = linear,
    // >>10 = super-linear shape that will not survive the next 10×.
    // Ratios are only as sharp as the sf0.01 floor (~0.05s startup per
    // query), so sub-0.2s denominators are reported but read as noisy.
    val secondaryDir = {
      val f = new java.io.File(sfDir)
      val sib = new java.io.File(f.getParentFile, "sf0.01")
      if (f.getName != "sf0.01" && sib.isDirectory) Some(sib.toString) else None
    }
    val (secondaryJson, ratioJson, ratioNoisyJson) = secondaryDir match {
      case None => ("null", "null", "[]")
      case Some(d) =>
        pass(dir = d) // warm at the secondary scale
        val s1 = pass(dir = d); val s2 = pass(dir = d)
        val sec = s1.keys.map(k => k -> math.min(s1(k), s2(k)))
          .collect { case (k, v) if v.isFinite => k -> v }.toMap
        val secJ = sec.map { case (k, v) => s"\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val ratJ = sec.collect { case (k, v) if v > 0 && results.contains(k) =>
          s"\"" + k + "\":" + (math.round(results(k) / v * 100) / 100.0)
        }.mkString("{", ",", "}")
        // denominators under the per-query startup floor make the ratio
        // mostly overhead arithmetic — mark them so a 4× "ratio" on a
        // 0.1s query is read as noise, not a scaling alarm
        val noisyJ = sec.collect { case (k, v) if v < 0.2 && results.contains(k) => k }
          .toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
        (secJ, ratJ, noisyJ)
    }
    val qs = (results.map { case (k, v) => s"\"" + k + "\":" + v } ++
      failedNames.map(k => s"\"" + k + "\":null"))
      .mkString("{", ",", "}")
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // fixture fingerprint: makes a between-rounds testdata regeneration
    // visible in the artifact instead of reading as a perf regression
    val fixturesJson = Fixtures.fingerprintJson(spark, sfDir)
    val shuffleJson = shuffleMb
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // same denominator as shuffle_mb: the final timed pass only (reset
    // above) — the r8 artifact accumulated spill over all four passes
    // while shuffle covered one, inviting cross-metric misreading
    val spillMb = math.round(spillFinalPassBytes / 1e5) / 10.0
    val metricJson =
      s"""{"metric":"total","value":$total,"unit":"sec","calib_s":$calib,"calib_mt_s":$calibMt,"n_ok":${results.size},$skewJson,"failed":$failedJson,"fixtures":$fixturesJson,"spill_mb_final_pass":$spillMb,"shuffle_mb":$shuffleJson,"queries":$qs,"sf":"$sfDir","sf_secondary":${secondaryDir.fold("null")("\"" + _ + "\"")},"queries_secondary":$secondaryJson,"scale_ratio":$ratioJson,"scale_ratio_noisy":$ratioNoisyJson}"""
    if (failedNames.nonEmpty)
      System.err.println(s"[bench] ${failedNames.size} queries FAILED (excluded from total): " +
        failedNames.mkString(", ") + " — first errors: " +
        failed.take(3).map { case (k, v) => s"$k: $v" }.mkString(" | "))
    // The metric JSON is the bench contract. With 90+ queries the line
    // outgrew the harness's log-tail capture (r4's official total was
    // lost to truncation), so it is persisted to its own file — the
    // durable artifact — and printed as the first stdout line.
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outFile, metricJson.getBytes("UTF-8"))
    println(metricJson)
    // The harness's round artifact keeps only the LAST 2000 chars of
    // stdout and tries to parse them — which failed every round (the
    // full line starts ~14KB before the window). Make that window a
    // valid JSON document on its own: pad it out with newlines, then
    // end stdout with a compact summary — the headline metrics plus the
    // slowest queries' (2-decimal) timings, as many as fit the window.
    // The full 150+-query map cannot fit 2000 chars at any useful
    // precision; queries_top covers the whole comparable surface (the
    // omitted tail is sub-~0.5s noise floor) and queries_total records
    // the cut. Leading whitespace is legal around a JSON document, so
    // json.loads(tail) now parses whether the harness takes the whole
    // tail or its last line.
    // HARNESS CONTRACT (pinned here, the single source of truth): the
    // round artifact keeps only the last CaptureWindow chars of stdout
    // and json-parses them. Everything below derives from that one
    // constant — the newline pad that flushes earlier output past the
    // window, and the byte budget the compact summary must fit —
    // and the fit is ASSERTED, so a summary outgrowing the window
    // fails this run loudly instead of silently shipping an
    // unparseable artifact. Nothing may print after the summary.
    val CaptureWindow = 2000
    val sortedQ = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"$k\":${math.round(v * 100) / 100.0}" }
    // the failed list is CAPPED here (count + first few names): a
    // mass-failure round would otherwise blow the head past the
    // capture window and cut the front off the JSON — unparseable in
    // exactly the round where the summary matters most
    val failedCompact = failedNames.take(8).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val head = s"""{"metric":"total","value":${math.round(total * 100) / 100.0},""" +
      s""""unit":"sec","calib_s":${math.round(calib * 1000) / 1000.0},""" +
      s""""calib_mt_s":${math.round(calibMt * 1000) / 1000.0},""" +
      s""""n_ok":${results.size},"failed_n":${failedNames.size},""" +
      s""""failed_top":$failedCompact,""" +
      s""""spill_mb_final_pass":$spillMb,"sf":"$sfDir",""" +
      s""""full":"${outFile.getFileName}","queries_total":${results.size},""" +
      s""""queries_top":{"""
    // 100-char headroom under the window for the closing braces and any
    // line terminator the capture includes
    val budget = (CaptureWindow - 100) - head.length - 2
    // strict prefix of the slowest-first order (stop at the first
    // non-fit): queries_top must BE the slowest N, not "whatever fit"
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    var used = 0
    var full = false
    sortedQ.foreach { s =>
      if (!full && used + s.length + 1 <= budget) { kept += s; used += s.length + 1 }
      else full = true
    }
    val compact = head + kept.mkString(",") + "}}"
    assert(compact.length <= CaptureWindow - 50,
      s"compact summary (${compact.length} chars) outgrew the $CaptureWindow-char capture window")
    // final statement on stdout before stop(): leading whitespace is
    // legal around a JSON document, so the captured tail parses whether
    // the harness takes the whole window or its last line
    println("\n" * (CaptureWindow + 100) + compact)
    spark.stop()
  }
}
