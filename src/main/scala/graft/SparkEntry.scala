package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a named query
  * here; when its semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle statement is registered too (the driver hash-compares
  * the two at sf0.01). Query families live in graft.queries.*.
  */
object SparkEntry {

  private def registry: Map[String, Q] =
    Relational.all ++ Gold.all ++ Text.all ++ Vector.all ++ Multimodal.all ++
      Analytics.all ++ Corpus.all ++ Maintenance.all ++ Streams.all ++ Mining.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("j1_star_join_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
