package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Scratch profiling main — not part of the engine surface. */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))

    time("warm: tokenize only")(base.select("doc_id", "t"))
    time("tokenize only")(base.select("doc_id", "t"))
    time("+shingleSet")(base.withColumn("sh", TextHash.shingleSet(col("t"), 3)).select("doc_id", "sh"))
    time("+polyHashes")(base.withColumn("hs", TextHash.polyHashes(col("t"), 31)).select("doc_id", "hs"))
    time("md5 whole text")(base.selectExpr("doc_id", "md5(lower(text)) AS fp_md5"))
    time("shingle+md5min")(
      base.withColumn("sh", TextHash.shingleSet(col("t"), 3))
        .selectExpr("doc_id", "array_min(transform(sh, x -> md5(x))) AS fp_shingle_min"))
    time("polyhash+rolling")(
      base.withColumn("hs", TextHash.polyHashes(col("t"), 31))
        .selectExpr("doc_id", "aggregate(hs, 0L, (acc, h) -> (acc * 131 + h) % 1000000007) AS fp_rolling"))
    time("full fingerprint")(SparkEntry.queries("x_fingerprint")(spark, sfDir))
    time("full fingerprint again")(SparkEntry.queries("x_fingerprint")(spark, sfDir))
    spark.stop()
  }
}
