package graft

import java.time.LocalDateTime

import graft.io.JdbcSource
import org.apache.spark.sql.functions._

/** JDBC extract path against an in-memory Derby database (the JDBC
  * driver ships with Spark's jars): semantics AND plan shape — the
  * window predicate must reach the database, not run in Spark. */
class JdbcSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  /** events-shaped mirror of the sf0.001 parquet table, loaded once
    * through Spark's JDBC writer so timestamp handling round-trips
    * through one stack. */
  private lazy val eventsInDerby: Unit = {
    Tables.events(spark, sfSmoke)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .write.format("jdbc")
      .option("url", url)
      .option("dbtable", "events_jdbc")
      .mode("overwrite")
      .save()
  }

  test("hourly extract pushes the window predicate into the JDBC scan") {
    eventsInDerby
    val df = JdbcSource.hourlyExtract(
      spark, url, "events_jdbc",
      LocalDateTime.parse("2024-01-15T00:00:00"),
      LocalDateTime.parse("2024-01-16T00:00:00"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(ts") && plan.contains("LessThanOrEqual(ts"),
      s"window bounds not pushed:\n${plan.take(2000)}")
  }

  test("JDBC-path S1 extract matches the parquet-path query row for row") {
    eventsInDerby
    val viaJdbc = JdbcSource.hourlyExtract(
      spark, url, "events_jdbc",
      LocalDateTime.parse("2024-01-15T00:00:00"),
      LocalDateTime.parse("2024-01-16T00:00:00"))
    val viaParquet = graft.queries.Relational
      .all("s1_hourly_extract").fn(spark, sfSmoke)
    assert(viaJdbc.schema.map(f => (f.name, f.dataType)) ==
      viaParquet.schema.map(f => (f.name, f.dataType)))
    val j = viaJdbc.collect().map(_.toSeq)
    val p = viaParquet.collect().map(_.toSeq)
    assert(j.length == p.length && j.length > 0)
    assert(j.toSeq == p.toSeq)
  }

  test("closed-hour BETWEEN keeps both boundary instants") {
    // Tehran 2024-01-15 00:00:00 = 2024-01-14 20:30:00 UTC (fixed
    // +03:30, Iran abolished DST in 2022)
    val lo = JdbcSource.toUtc(LocalDateTime.parse("2024-01-15T00:00:00"))
    val hi = JdbcSource.toUtc(LocalDateTime.parse("2024-01-15T01:00:00"))
    assert(lo.toInstant.toString == "2024-01-14T20:30:00Z")
    Seq(
      (1L, 1L, "click", 10.0, new java.sql.Timestamp(lo.getTime - 1000)),
      (2L, 1L, "click", 11.0, lo),
      (3L, 2L, "view", 12.0, hi),
      (4L, 2L, "view", 13.0, new java.sql.Timestamp(hi.getTime + 1000)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "boundary_events")
      .mode("overwrite").save()
    val got = JdbcSource.hourlyExtract(
      spark, url, "boundary_events",
      LocalDateTime.parse("2024-01-15T00:00:00"),
      LocalDateTime.parse("2024-01-15T01:00:00"))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("JdbcWriter.upsert round-trips through Derby and replays idempotently") {
    import graft.io.JdbcWriter
    // bootstrap through Spark's JDBC writer (owns the DDL, like the
    // reference's separately-managed CREATE TABLE)
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"))
      .toDF("id", "price", "tag")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "upsert_rt")
      .mode("overwrite").save()

    def state(): Set[(Long, Double, String)] =
      JdbcSource.read(spark, url, "upsert_rt")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet

    // revision batch: update id=2, insert id=3 — batched update-then-
    // insert, no per-row loop
    val batch = Seq((2L, 25.0, "b2"), (3L, 30.0, "c")).toDF("id", "price", "tag")
    JdbcWriter.upsert(batch, url, "upsert_rt", "id")
    val expected = Set((1L, 10.0, "a"), (2L, 25.0, "b2"), (3L, 30.0, "c"))
    assert(state() === expected)

    // at-least-once replay: the same batch lands the same state
    JdbcWriter.upsert(batch, url, "upsert_rt", "id")
    assert(state() === expected)

    // a multi-chunk batch (batchSize 2 over 5 rows) exercises the
    // per-chunk commit path
    val wide = Seq((1L, 11.0, "a1"), (3L, 33.0, "c1"), (4L, 40.0, "d"),
      (5L, 50.0, "e"), (6L, 60.0, "f")).toDF("id", "price", "tag")
    JdbcWriter.upsert(wide, url, "upsert_rt", "id", batchSize = 2)
    assert(state() === Set((1L, 11.0, "a1"), (2L, 25.0, "b2"), (3L, 33.0, "c1"),
      (4L, 40.0, "d"), (5L, 50.0, "e"), (6L, 60.0, "f")))
  }

  test("partitioned read splits into N cursors and stays complete") {
    eventsInDerby
    val df = JdbcSource.readPartitioned(
      spark, url, "events_jdbc",
      partitionColumn = "event_id",
      lowerBound = 0L, upperBound = 1000L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000L)
    // rows outside [lower, upper) must still arrive via edge partitions
    val narrow = JdbcSource.readPartitioned(
      spark, url, "events_jdbc",
      partitionColumn = "event_id",
      lowerBound = 400L, upperBound = 600L, numPartitions = 3)
    assert(narrow.count() == 1000L)
  }
}
