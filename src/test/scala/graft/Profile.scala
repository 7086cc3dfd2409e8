package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling main — not part of the engine surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("w1_report_cheap", "t6_rebuild_summary", "j1_star_join_revenue",
        "p10_lenient_cast", "s14_sheets_export", "x_dedup_simhash",
        "x_dedup_minhash_lsh", "x_dedup_ngram", "a2_pricing_summary")

    // warm
    SparkEntry.entry(spark).queryExecution.toRdd.count()

    // SPARK_GRAFT_PROFILE_CLEAR=1 mimics Bench's per-query PlanCache
    // clear, so round-2+ numbers measure warm-JIT cold-cache (what the
    // bench's timed passes actually see) instead of cache reuse.
    val clear = sys.env.get("SPARK_GRAFT_PROFILE_CLEAR").contains("1")
    for (round <- 1 to 3; name <- names) {
      if (clear) graft.ops.PlanCache.clear()
      val t0 = System.nanoTime()
      val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"[$round] $name%-24s build ${(t1 - t0) / 1e9}%6.2f  plan ${(t2 - t1) / 1e9}%6.2f  exec ${(t3 - t2) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
