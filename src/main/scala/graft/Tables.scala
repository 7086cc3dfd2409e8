package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * All engine code takes a `sfDir` (scale-factor directory) so the same
  * program runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) —
  * and, on a real cluster, against a 100 TB lake path. Reads are plain
  * `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown and column pruning all engage; nothing is cached here
  * (callers decide lifetime).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  // orders/lineitem are FACT scans: [[parallelized]] so a
  // single-row-group fixture file (1 scan task, however many cores)
  // doesn't serialize the partial aggregation / join build fed by the
  // scan; a real lake's many-split scan passes through untouched.
  def orders(s: SparkSession, d: String): DataFrame     = parallelized(load(s, d, "orders"), "o_orderkey")
  def lineitem(s: SparkSession, d: String): DataFrame   = parallelized(load(s, d, "lineitem"), "l_orderkey")
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) (loads as raw `LongType`
    * nanos under `nanosAsLong`, which we truncate to micros with
    * integer division — a double division would lose precision:
    * epoch-nanos ≈ 1.7e18 > 2^53) and parquet `timestamp[us]` with no
    * timezone (loads as `TIMESTAMP_NTZ`). The reference's extract reads
    * whatever the source column is (reference
    * dags/etl/fact_gold_price.py:52-71), so this reader dispatches on
    * the LOADED schema instead of assuming one encoding. The session
    * timezone is pinned to UTC everywhere (Verify/Bench/specs), so the
    * NTZ→session-zone cast is value-preserving and downstream Tehran
    * keying (`from_utc_timestamp` in GoldModel) is unchanged. */
  // events is NOT [[parallelized]]: column pruning does not reach
  // below a RepartitionByExpression, so the exchange would carry the
  // wide `props` JSON column for every query — measured as a uniform
  // ~+0.3s on all 15 slim-projection events queries, dwarfing the one
  // JSON-parsing query the exchange helps. Compute-heavy events
  // consumers should repartition AFTER their own pruning projection.
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a session-zone timestamp
    }
  }
  /** Repartition a small scan to the session's parallelism. A parquet
    * file is splittable only at row-group boundaries, so a
    * single-row-group file pins the whole scan STAGE — including every
    * per-row kernel Catalyst fuses into it (shingling, hashing,
    * signatures) — to one task. When the input has fewer splits than
    * half the cores, one cheap input-sized exchange buys full-width
    * execution of those kernels; when the input is a real lake (many
    * files/row groups — the 100 TB case) this is a NO-OP and no
    * exchange is added.
    *
    * The exchange HASHES on `key` (a high-cardinality column of the
    * table) rather than round-robin: Spark's retry-determinism guard
    * (`sortBeforeRepartition`, default on) inserts a full-row LOCAL
    * SORT under every round-robin exchange, which measured +0.6s on
    * wide-row scans (events with its JSON column, 16-column lineitem)
    * — hash partitioning is deterministic by construction and skips
    * the sort. A near-unique key hashes ~evenly, so downstream width
    * matches round-robin's. */
  def parallelized(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // actual scan splits (file × maxPartitionBytes ranges), not file
    // count: one LARGE file already splits into many byte-range tasks
    // and must not be re-shuffled
    val scanParts = df.rdd.getNumPartitions
    if (scanParts >= (target + 1) / 2) df
    else df.repartition(target, col(key))
  }

  /** documents/embeddings feed compute-dominant kernels (per-token
    * hashing, per-dimension float loops), so their readers apply
    * [[parallelized]] — the scan must never serialize the kernels. */
  def documents(s: SparkSession, d: String): DataFrame =
    parallelized(load(s, d, "documents"), "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    parallelized(load(s, d, "embeddings"), "vec_id")
}
