package graft

import java.nio.file.Files

import graft.io.BucketedWriter
import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Scale techniques that only show up under load: salting for skewed
  * aggregation keys (result-identical to the direct plan), bucketed
  * co-located joins (exchange-free by plan inspection), and dynamic
  * partition pruning through a dimension join (partition-count by plan
  * inspection).
  */
class ScaleToolkitSpec extends SparkTestBase {

  test("a dim-filter join dynamically prunes fact partitions") {
    // The lake layout MergeWriter produces (fact partitioned by
    // date_id) must let a selective dim filter prune fact partitions
    // THROUGH the join at runtime — on a 100 TB fact this is the
    // difference between scanning one day and scanning the lake.
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_dpp").toString
    (1 to 3000).map(i => (i.toLong, 20240101 + i % 30, i * 1.5))
      .toDF("id", "date_id", "v")
      .write.partitionBy("date_id").parquet(s"$base/fact")
    (0 until 30).map(d => (20240101 + d, if (d == 4) 1 else 0))
      .toDF("date_id", "yesterday")
      .write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")

    val joined = spark.read.parquet(s"$base/fact")
      .join(dim.filter(col("yesterday") === 1), Seq("date_id"))
    // execute THIS dataframe's plan (df.count() would build a separate
    // aggregate plan and leave joined's AQE plan unfinalized)
    assert(joined.queryExecution.toRdd.count() === 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
    // the fact scan's own metric must report ONE partition read, not
    // 30 — found via the final adaptive plan, and REQUIRED to exist so
    // a pruning regression can't hide behind a missing metric
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE wraps materialized stages in QueryStageExec LEAF nodes, so a
    // plain collect stops at the stage boundary — descend through them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val factScans = allNodes(finalPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("fact")) => f
    }
    assert(factScans.nonEmpty, s"no fact FileSourceScanExec in:\n$finalPlan")
    val partsRead = factScans.head.metrics.getOrElse("numPartitions",
      fail("fact scan reports no numPartitions metric")).value
    assert(partsRead === 1, s"fact scan read $partsRead partitions")
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // DPP (above) prunes PARTITIONS through a join; the runtime bloom
    // filter is its row-level sibling for non-partition join keys: the
    // filtered dim side builds a bloom filter that is pushed into the
    // fact scan, so most fact rows die at the scan instead of crossing
    // the join's exchange. On a 100 TB fact joined on a non-layout key
    // this is the only scan-side reduction available. Thresholds are
    // lowered because the lake-sized defaults (10 GB application side)
    // would never fire on test data.
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_bloom").toString
    (1 to 50000).map(i => (i.toLong % 1000, i * 1.5)).toDF("k", "v")
      .write.parquet(s"$base/fact")
    (0 until 1000).map(d => (d.toLong, if (d < 10) 1 else 0)).toDF("k", "sel")
      .write.parquet(s"$base/dim")

    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    // broadcast disabled: the bloom filter targets shuffle joins (a
    // broadcast join already filters at the probe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val joined = spark.read.parquet(s"$base/fact")
        .join(spark.read.parquet(s"$base/dim").filter(col("sel") === 1), Seq("k"))
      assert(joined.queryExecution.toRdd.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter reached the fact side:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a skewed join partition at runtime") {
    // Salting (below) is the MANUAL skew tool for aggregation; for
    // joins the engine's first line of defense is AQE's skew-join
    // splitting — one oversized partition is divided among several
    // tasks, each re-reading a slice against the full build side.
    // Thresholds are lowered to make a local corpus register as skewed;
    // at lake scale the 256 MB defaults do the same job.
    val s = spark
    import s.implicits._
    // key 0 carries 95% of the left side
    val left = (1 to 40000).map(i =>
      (if (i % 20 == 0) (i % 7 + 1).toLong else 0L, i.toLong)).toDF("k", "l")
    val right = (0 to 7).map(k => (k.toLong, s"r$k")).toDF("k", "r")
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      val joined = left.join(right, Seq("k"))
      assert(joined.queryExecution.toRdd.count() === 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted aggregation equals direct aggregation on a 90%-skewed key") {
    val s = spark
    import s.implicits._
    // hot key 0 carries ~90% of rows
    val df = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) i % 7 + 1 else 0
      (k, i.toLong, (i % 400) / 100.0 * 25)
    }.toDF("k", "id", "v")

    val salted = Skew.saltedStats(df, Seq("k"), "v", col("id"), buckets = 16)
    val direct = df.groupBy("k").agg(
      sum(col("v").cast("decimal(28,10)")).cast("double").as("sum_v"),
      count(col("v")).as("cnt_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty,
      "salted two-stage aggregation diverges from the direct plan")
  }

  test("sorted layout lets row-group statistics skip most of a range scan") {
    // SortedWriter's zone-map claim, measured: the same rows written
    // sorted vs shuffled by the predicate column, same small row groups,
    // same pushed range filter — the sorted scan must surface a small
    // fraction of the rows the shuffled scan does, because tight
    // disjoint min/max stats let the parquet reader skip groups
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_sorted").toString
    val rows = (1 to 300000).map(i => (i.toLong, i.toLong, s"payload_$i"))
      .toDF("k", "id", "pay")
    graft.io.SortedWriter.writeSorted(
      rows.repartition(1), s"$base/sorted", Seq("k"), rowGroupBytes = 1L << 20)
    // same row groups, adversarial order: k scattered by hash so every
    // group's min/max spans the whole range
    rows.repartition(1).sortWithinPartitions(xxhash64(col("k")))
      .write.option("parquet.block.size", 1L << 20)
      .mode("overwrite").parquet(s"$base/shuffled")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k").between(1000, 2000))
      assert(df.queryExecution.toRdd.count() === 1001) // same answer both layouts
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      scans.head.metrics("numOutputRows").value
    }
    val sorted = scannedRows(s"$base/sorted")
    val shuffled = scannedRows(s"$base/shuffled")
    assert(sorted * 10 <= shuffled,
      s"sorted layout surfaced $sorted rows vs $shuffled shuffled — row-group skipping is not engaging")
  }

  test("z-order layout skips row groups on BOTH probe dimensions") {
    // the z-curve claim, measured: one layout, two independent probe
    // columns, both get row-group skipping — where a single-column sort
    // gives skipping on its own column and none on the other
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_zorder").toString
    val rows = (1 to 300000).map { i =>
      val x = (i * 2654435761L) % 100000L        // Knuth-scrambled
      val y = (i * 1103515245L + 12345L) % 100000L
      (x, y, s"payload_$i")
    }.toDF("x", "y", "pay")
    graft.io.SortedWriter.writeZOrdered(
      rows, s"$base/zorder", "x", "y", rowGroupBytes = 1L << 20)
    // control: sorted by x only — perfect on x, blind on y
    graft.io.SortedWriter.writeSorted(
      rows.repartition(1), s"$base/xsorted", Seq("x"), rowGroupBytes = 1L << 20)

    def scanned(path: String, c: String): Long = {
      val df = spark.read.parquet(path).filter(col(c).between(40000, 41000))
      df.queryExecution.toRdd.count()
      val scans = df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      // SQL metrics land via the async listener bus — under full-suite
      // parallel load a read right after count() can see a partial
      // value (observed once as a spurious failure). Poll until stable.
      def read() = scans.head.metrics("numOutputRows").value
      var prev = read()
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = read()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    val blindY = scanned(s"$base/xsorted", "y")  // ~full scan: no stats help
    val zX = scanned(s"$base/zorder", "x")
    val zY = scanned(s"$base/zorder", "y")
    assert(zX * 2 <= blindY,
      s"z-order x-probe surfaced $zX rows vs $blindY unskipped — no x skipping")
    assert(zY * 2 <= blindY,
      s"z-order y-probe surfaced $zY rows vs $blindY unskipped — no y skipping")
    // and the same answers come back
    assert(spark.read.parquet(s"$base/zorder").filter(col("x").between(40000, 41000)).count() ===
      spark.read.parquet(s"$base/xsorted").filter(col("x").between(40000, 41000)).count())
  }

  test("salted join is row-identical to the direct join on a skewed key") {
    val s = spark
    import s.implicits._
    // 90% of big-side rows hit key 1 — the hot-key shape
    val big = (1 to 20000).map { i =>
      (if (i % 10 == 0) (i % 50).toLong else 1L, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L to 49L).map(k => (k, s"name_$k")).toDF("dk", "name")
    val salted = graft.ops.Skew
      .saltedJoin(big, dim, "k", "dk", discriminator = col("payload"), buckets = 16)
    val direct = big.join(dim, col("k") === col("dk"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty,
      "salted join diverges from the direct join")
    // the physical join key must carry the salt (two equi-conditions)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt column missing from the join plan:\n$plan")
  }

  test("writeZOrdered tolerates user columns named like its internals") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_zcollide").toString
    // xmin / __z0 used to be internal names — must survive as user data
    val rows = (1 to 5000).map(i => (i.toLong, (i * 7 % 5000).toLong,
      s"xmin_$i", i % 3)).toDF("x", "y", "xmin", "__z0")
    graft.io.SortedWriter.writeZOrdered(
      rows, s"$base/z", "x", "y", rowGroupBytes = 1L << 20)
    val back = spark.read.parquet(s"$base/z")
    assert(back.columns.sorted.toSeq === Seq("__z0", "x", "xmin", "y"))
    assert(back.count() === 5000)
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty,
      "z-order write corrupted rows under colliding column names")
  }

  test("salted ops never shadow a user column named _salt") {
    val s = spark
    import s.implicits._
    // the user's own `_salt` column must ride through the join intact —
    // a fixed internal name would silently replace then drop it
    val big = (1 to 1000).map(i => (i % 5L, i.toLong, s"u$i"))
      .toDF("k", "payload", "_salt")
    val dim = (0L to 4L).map(k => (k, s"name_$k")).toDF("dk", "name")
    val salted = graft.ops.Skew
      .saltedJoin(big, dim, "k", "dk", discriminator = col("payload"), buckets = 4)
    assert(salted.columns.count(_ == "_salt") === 1,
      "user _salt column was dropped or duplicated")
    val direct = big.join(dim, col("k") === col("dk"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty,
      "salted join with user _salt diverges from the direct join")
    // and saltedStats stays correct when the GROUPING KEY collides with
    // an internal partial-aggregate alias (and _salt is also taken)
    val statsDf = big.withColumnRenamed("k", "_psum")
    val stats = graft.ops.Skew.saltedStats(
      statsDf, Seq("_psum"), "payload",
      discriminator = col("payload"), buckets = 4)
    val want = statsDf.groupBy("_psum").agg(
      sum(col("payload").cast("double")).as("sum_payload"),
      count(col("payload")).as("cnt_payload"),
      min(col("payload")).as("min_payload"),
      max(col("payload")).as("max_payload"))
    assert(stats.exceptAll(want).isEmpty && want.exceptAll(stats).isEmpty,
      "saltedStats diverges when internal names collide")
  }

  test("parquet bloom filters skip row groups for point probes on unsorted columns") {
    // the third layout lever, complementing zone maps (sorted/z-order):
    // a point probe on a HIGH-CARDINALITY column in RANDOM order gets
    // nothing from min/max stats — every group spans the range — but a
    // per-group bloom filter rejects groups that cannot contain the key
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_bloom").toString
    val rows = (1 to 300000).map(i => ((i * 2654435761L) % 1000000L, s"payload_$i"))
      .toDF("k", "pay")
    graft.io.SortedWriter.writeWithBloom(
      rows.repartition(1), s"$base/bloom", Seq("k"),
      expectedNdv = 300000, rowGroupBytes = 1L << 20)
    rows.repartition(1).write
      .option("parquet.block.size", 1L << 20)
      .mode("overwrite").parquet(s"$base/plain")
    def scanned(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k") === 999983L)
      df.queryExecution.toRdd.count()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numOutputRows").value
    }
    val bloom = scanned(s"$base/bloom")
    val plain = scanned(s"$base/plain")
    assert(bloom * 5 <= plain,
      s"bloom-filtered scan surfaced $bloom rows vs $plain plain — bloom row-group skipping is not engaging")
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_buckets").toString
    val facts = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "a")
    val other = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("id", "b")
    BucketedWriter.writeBucketed(facts, s"$base/t_a", "bkt_a", "id", 8)
    BucketedWriter.writeBucketed(other, s"$base/t_b", "bkt_b", "id", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
