package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed table writes for co-located joins (SURVEY.md §7.5 scale
  * notes): two facts bucketed and sorted on the same join key hash into
  * aligned files, so their join needs NO shuffle exchange — at 100 TB
  * that removes the single largest cost of a fact-to-fact join. The
  * spec asserts the exchange-free plan.
  */
object BucketedWriter {

  /** Write `df` as an external parquet table bucketed+sorted on
    * `bucketCol` into `nBuckets` buckets, registered as `table`. */
  def writeBucketed(
      df: DataFrame, path: String, table: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
