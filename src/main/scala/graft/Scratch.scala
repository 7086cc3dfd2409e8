package graft

import graft.ops.{GoldModel, Interpolate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage timing probe — not part of the engine surface. */
object Scratch {
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

    // warm
    SparkEntry.entry(spark).queryExecution.toRdd.count()

    val D = 20240115
    for (_ <- 1 to 2) {
      val ev = graft.Tables.events(spark, sfDir)
      val fdi = GoldModel.factDensifyInput(ev).filter(col("date_id") === D)
      val dens = Interpolate.densify(fdi)
      time("densify(D)")(dens.queryExecution.toRdd.count())
      val perMinuteDec = dens
        .groupBy(col("source_id"), col("rounded_time_id").as("time_id"))
        .agg((sum(col("price").cast("decimal(28,10)")).cast("double") /
          count(col("price"))).as("price"))
      time("perMinute agg decimal")(perMinuteDec.queryExecution.toRdd.count())
      val perMinuteDbl = dens
        .groupBy(col("source_id"), col("rounded_time_id").as("time_id"))
        .agg((sum(col("price")) / count(col("price"))).as("price"))
      time("perMinute agg double")(perMinuteDbl.queryExecution.toRdd.count())
      val perMinute182 = dens
        .groupBy(col("source_id"), col("rounded_time_id").as("time_id"))
        .agg((sum(col("price").cast("decimal(18,2)")).cast("double") /
          count(col("price"))).as("price"))
      time("perMinute agg dec(18,2)")(perMinute182.queryExecution.toRdd.count())
      val perMinute186 = dens
        .groupBy(col("source_id"), col("rounded_time_id").as("time_id"))
        .agg((sum(col("price").cast("decimal(18,6)")).cast("double") /
          count(col("price"))).as("price"))
      time("perMinute agg dec(18,6)")(perMinute186.queryExecution.toRdd.count())
      println("----")
    }
    spark.stop()
  }
}
