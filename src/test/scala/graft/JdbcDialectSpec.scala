package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.io.{JdbcSource, JdbcWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The JDBC writer parametrized over TWO driver dialects: stock Derby
  * (exact batch counts) and the `graftpg` shim ([[GraftPgDriver]] —
  * Derby storage behind a driver that withholds batch counts as
  * `SUCCESS_NO_INFO`, the PostgreSQL/MySQL/Oracle family behavior).
  * Every case runs identically on both URLs; on the shim the suite
  * additionally proves the withheld-count fallback RAN (the counter)
  * and still produced the exact same state — the carried r10 finding
  * that JdbcWriter's SUCCESS_NO_INFO path had no driver exercising it.
  */
class JdbcDialectSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  GraftPgDriver.ensureRegistered()

  private val dbSeq = new AtomicInteger(0)

  /** (dialect name, bootstrap url, dialect url) — same in-memory Derby
    * database behind both URLs, so divergence is driver behavior only. */
  private def dialects(): Seq[(String, String, String)] = {
    val db1 = s"graftdial${dbSeq.incrementAndGet()}"
    val db2 = s"graftdial${dbSeq.incrementAndGet()}"
    Seq(
      ("derby", s"jdbc:derby:memory:$db1;create=true",
        s"jdbc:derby:memory:$db1;create=true"),
      ("graftpg", s"jdbc:derby:memory:$db2;create=true",
        s"jdbc:graftpg:memory:$db2;create=true"))
  }

  /** decimal / timestamp / null payload — the setObject mappings that
    * differ per driver family. */
  private def df(rows: Seq[(Long, java.math.BigDecimal, java.sql.Timestamp, String)]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DecimalType(12, 2), nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("tag", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 2),
      schema)
  }

  private def dec(s: String): java.math.BigDecimal =
    new java.math.BigDecimal(s).setScale(2)

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def state(url: String, table: String): Set[(Long, Option[String], Option[String], Option[String])] =
    JdbcSource.read(spark, url, table).collect().map { r =>
      (r.getLong(0),
        Option(r.getDecimal(1)).map(_.toPlainString),
        Option(r.getTimestamp(2)).map(_.toString),
        Option(r.getString(3)))
    }.toSet

  test("round-trip + idempotent replay + multi-chunk upsert hold on both dialects; the shim's NO_INFO fallback runs") {
    dialects().foreach { case (name, bootUrl, dialUrl) =>
      val table = "dial_rt"
      // bootstrap through Spark's JDBC writer (owns DDL), via the plain
      // derby url — storage is shared, the dialect url sees the rows
      df(Seq(
        (1L, dec("10.00"), ts("2024-01-15 10:00:00"), "a"),
        (2L, dec("20.50"), ts("2024-01-15 11:00:00"), null)))
        .write.format("jdbc")
        .option("url", bootUrl).option("dbtable", table)
        .mode("overwrite").save()
      // the writer's documented contract: the conflict column needs a
      // UNIQUE INDEX (without it each batched UPDATE full-scans and two
      // concurrent partition connections can deadlock on row locks)
      val c = java.sql.DriverManager.getConnection(bootUrl)
      try c.createStatement().execute(
        s"""CREATE UNIQUE INDEX ${table}_key ON $table ("id")""")
      finally c.close()

      val before = GraftPgDriver.noInfoBatches.get

      // revision: update id=2 (null ts, null->value tag), insert id=3
      // (null price) — nulls cross setObject in both directions
      val batch = df(Seq(
        (2L, dec("25.00"), null, "b2"),
        (3L, null, ts("2024-01-16 09:30:00"), "c")))
      JdbcWriter.upsert(batch, dialUrl, table, "id")
      val expected = Set(
        (1L, Some("10.00"), Some("2024-01-15 10:00:00.0"), Some("a")),
        (2L, Some("25.00"), None, Some("b2")),
        (3L, None, Some("2024-01-16 09:30:00.0"), Some("c")))
      assert(state(dialUrl, table) === expected, s"[$name] upsert state")

      // at-least-once replay lands the same state
      JdbcWriter.upsert(batch, dialUrl, table, "id")
      assert(state(dialUrl, table) === expected, s"[$name] replay state")

      // multi-chunk (batchSize 2 over 5 rows) exercises per-chunk commits
      val wide = df(Seq(
        (1L, dec("11.00"), ts("2024-01-17 00:00:00"), "a1"),
        (3L, dec("33.00"), null, "c1"),
        (4L, dec("40.00"), ts("2024-01-18 00:00:00"), null),
        (5L, null, null, "e"),
        (6L, dec("60.00"), ts("2024-01-19 00:00:00"), "f")))
      JdbcWriter.upsert(wide, dialUrl, table, "id", batchSize = 2)
      assert(state(dialUrl, table) === Set(
        (1L, Some("11.00"), Some("2024-01-17 00:00:00.0"), Some("a1")),
        (2L, Some("25.00"), None, Some("b2")),
        (3L, Some("33.00"), None, Some("c1")),
        (4L, Some("40.00"), Some("2024-01-18 00:00:00.0"), None),
        (5L, None, None, Some("e")),
        (6L, Some("60.00"), Some("2024-01-19 00:00:00.0"), Some("f"))),
        s"[$name] multi-chunk state")

      val noInfoRan = GraftPgDriver.noInfoBatches.get - before
      if (name == "graftpg")
        assert(noInfoRan > 0,
          "the shim never withheld batch counts — the fallback path did not run")
      else
        assert(noInfoRan == 0, "derby url unexpectedly routed through the shim")
    }
  }

  test("spark.read resolves the graftpg driver by URL and reads through it") {
    val Seq(_, (_, bootUrl, dialUrl)) = dialects()
    val s = spark; import s.implicits._
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.format("jdbc")
      .option("url", bootUrl).option("dbtable", "dial_read")
      .mode("overwrite").save()
    val got = JdbcSource.read(spark, dialUrl, "dial_read")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 10.0), (2L, 20.0)))
  }
}
