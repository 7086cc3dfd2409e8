package graft

import graft.ops.{GoldModel, Interpolate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test sourceset): stage-by-stage timing of the gold
  * pipeline's shared subtrees, to localize bench cost. Run with
  * `sbt "Test/runMain graft.StageProbe"`. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val D = 20240115
    // warm
    SparkEntry.entry(spark).queryExecution.toRdd.count()

    for (_ <- 1 to 2) {
      val ev = Tables.events(spark, sfDir)
      time("events scan")(ev.queryExecution.toRdd.count())
      time("fact (date_format keys)")(
        GoldModel.fact(ev).queryExecution.toRdd.count())
      // arithmetic variant of the same key derivation
      val local = GoldModel.tehran(col("ts"))
      val arith = ev.select(
        col("event_id").as("id"),
        col("user_id").cast("int").as("source_id"),
        GoldModel.sideId(col("event_type")).as("side_id"),
        col("value").as("price"),
        (year(local) * 10000 + month(local) * 100 + dayofmonth(local))
          .as("date_id"),
        (hour(local) * 10000 + minute(local) * 100 + second(local))
          .as("time_id"))
      time("fact (arithmetic keys)")(arith.queryExecution.toRdd.count())
      val fdi = GoldModel.factDensifyInput(ev)
      time("factDensifyInput")(fdi.queryExecution.toRdd.count())
      val dens = Interpolate.densify(fdi)
      time("densify full corpus")(dens.queryExecution.toRdd.count())
      val densD = Interpolate.densify(fdi.filter(col("date_id") === D))
      time("densify date D")(densD.queryExecution.toRdd.count())
      time("t6 two-level agg")(
        dens.groupBy(col("date_id"), col("is_interpolated"),
            col("rounded_time_id"))
          .agg(count(lit(1)).as("_n"), min(col("price")).as("_min"),
            max(col("price")).as("_max"))
          .groupBy(col("date_id"), col("is_interpolated"))
          .agg(sum(col("_n")).as("n"), count(lit(1)).as("n_minutes"),
            min(col("_min")).as("min_price"), max(col("_max")).as("max_price"))
          .queryExecution.toRdd.count())
      time("sourcesDim")(
        GoldModel.sourcesDim(ev).queryExecution.toRdd.count())
      // dens minus the union'd actuals: only generated rows
      time("generated only")(
        dens.filter(col("is_interpolated")).queryExecution.toRdd.count())
      // how much is the row-count materialization itself? aggregate
      // instead of toRdd: partial count per partition, no row handoff
      time("generated count-agg")(
        dens.filter(col("is_interpolated")).groupBy()
          .agg(count(lit(1))).queryExecution.toRdd.count())
      // hypothesis: HashAggregate above Union loses codegen fusion —
      // aggregate the generated side alone (no union in the subtree)
      time("generated minute-agg (no union)")(
        dens.filter(col("is_interpolated"))
          .groupBy(col("date_id"), col("rounded_time_id"))
          .agg(count(lit(1)).as("_n"), min(col("price")).as("_min"),
            max(col("price")).as("_max"))
          .queryExecution.toRdd.count())
      time("t6 agg over union (current)")(
        dens.groupBy(col("date_id"), col("is_interpolated"),
            col("rounded_time_id"))
          .agg(count(lit(1)).as("_n"), min(col("price")).as("_min"),
            max(col("price")).as("_max"))
          .queryExecution.toRdd.count())
      println("----")
    }
    spark.stop()
  }
}
