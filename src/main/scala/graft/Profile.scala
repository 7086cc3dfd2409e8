package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev measurement tool (optimization guide §1: measure first).
  *
  * Runs named queries (or the full registry) with a listener that
  * counts Spark jobs / stages / tasks and sums in-job wall time, then
  * prints one line per query:
  *
  * {{{ name  wall_s  jobs  stages  tasks  job_s  gap_s }}}
  *
  * `job_s` is the sum of per-job wall spans (submitted→completed, as
  * the driver saw them); `gap_s = wall_s - job_s` is everything the
  * executors never saw — driver-side planning, filesystem metadata
  * ops, commit-log round-trips, streaming micro-batch bookkeeping.
  * A query whose gap dominates is bounded by fixed per-operation
  * overhead, not by data — the sf0.1 bench's most common shape, and
  * the signal for WHICH overhead to cut. Each query runs twice and
  * reports the second run (steady-state, the Bench discipline).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val sites = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // per-callsite (job count, total nanos): WHERE the jobs come from
    val bySite =
      new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(e.jobId, System.nanoTime())
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        sites.put(e.jobId, site): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        if (t0 != 0L) {
          val d = System.nanoTime() - t0
          jobNanos.addAndGet(d)
          val site = Option(sites.remove(e.jobId)).getOrElse("?")
          bySite.merge(site, (1, d),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
        }
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(): Unit
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(): Unit
      }
    })
    def settle(): Unit = { // async bus: let counters drain
      var prev = -1; var cur = tasks.get
      val t0 = System.nanoTime()
      while (cur != prev && System.nanoTime() - t0 < 2e9.toLong) {
        Thread.sleep(50); prev = cur; cur = tasks.get
      }
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-34s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"job_s"}%7s ${"gap_s"}%7s")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      graft.ops.PlanCache.clear()
      try {
        fn(spark, sfDir).queryExecution.toRdd.count() // warm
        graft.ops.PlanCache.clear()
        settle()
        jobs.set(0); stages.set(0); tasks.set(0); jobNanos.set(0)
        bySite.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        settle()
        val js = jobNanos.get / 1e9
        println(f"$n%-34s $wall%7.2f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d $js%7.2f ${wall - js}%7.2f")
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (site, (cnt, nanos)) =>
            println(f"    ${nanos / 1e9}%6.2fs x$cnt%-3d $site")
        }
      } catch {
        case e: Throwable =>
          println(f"$n%-34s FAILED ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    spark.stop()
  }
}
