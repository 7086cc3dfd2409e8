package graft

import org.apache.spark.sql.SparkSession

/** Fixture fingerprinting for the bench/verify artifacts.
  *
  * The round-7 cross-round bench comparison was silently confounded by
  * a fixture regeneration between the two runs — different parquet
  * content, same paths, and the artifact had no way to show it. Every
  * artifact now carries per-table row counts and on-disk byte sizes, so
  * a regeneration reads as "the fixtures changed", not as a 1.3×
  * perf regression. Row counts come from parquet footer metadata (a
  * count() over an unfiltered scan never touches data pages), so the
  * fingerprint is cheap even at bench scale.
  */
object Fixtures {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def sizeOf(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).map(_.map(sizeOf).sum).getOrElse(0L)
    else f.length()

  /** `{"lineitem":{"rows":600572,"bytes":12345678},...}` — tables whose
    * parquet is absent report rows/bytes -1 rather than failing the
    * artifact write. */
  def fingerprintJson(spark: SparkSession, dir: String): String =
    tableNames.map { t =>
      val path = new java.io.File(s"$dir/$t.parquet")
      val (rows, bytes) =
        if (!path.exists()) (-1L, -1L)
        else try (Tables.load(spark, dir, t).count(), sizeOf(path))
        catch { case _: Throwable => (-1L, sizeOf(path)) }
      s""""$t":{"rows":$rows,"bytes":$bytes}"""
    }.mkString("{", ",", "}")
}
