package graft.ops

import org.apache.spark.sql.DataFrame

import scala.util.Try

/** Bounded cache of persisted intermediate DataFrames, keyed by the
  * canonicalized analyzed plan.
  *
  * Motivation: the dedup family builds one expensive, reused
  * intermediate per query — the exact-duplicate class/signature frame
  * (collapse → shingle → minhash, or collapse → bit-signature). Its
  * subtree appears 2–5× inside a single query DAG (band self-join
  * sides, verification join-backs, class-map expansion) and Catalyst
  * cannot merge the copies: each use prunes different columns, so the
  * canonicalized exchanges differ and `ReuseExchange` never fires.
  * Without this cache the collapse aggregation and per-token hashing
  * run once PER REFERENCE — at 100 TB that is 2–5 redundant passes
  * over the corpus; at sf0.1 it measured as a 1.4–4× regression.
  *
  * Semantics: `materialized(df)` returns a lazily `localCheckpoint`ed
  * handle for the plan (MEMORY_AND_DISK storage); identical plans
  * (same session) share one materialization. The checkpoint truncates
  * the handle's lineage to a leaf, so a parent DAG referencing it
  * several times plans a tiny node per reference instead of the full
  * subtree — the planning cost was the measurable half of the
  * redundancy. The cache is a deliberately tiny LRU (8 entries —
  * these are rep-level frames, far smaller than the corpus); evicted
  * or superseded entries unpersist their RDDs best-effort. Lineage is
  * CUT: a lost partition cannot recompute, which a single-JVM session
  * never observes — a cluster deployment wanting executor-loss
  * tolerance trades back to persist().
  *
  * Like Tables' stat caches this is only sound because the corpus
  * directories are immutable (TESTDATA.md contract): the key is the
  * PLAN, so a process that rewrites the same path in place and
  * re-queries it would read stale data and must call [[clear]] first.
  * Bench clears it before every timed query so each timing charges the
  * full compute (intra-query reuse only — the optimization under
  * test), never a previous query's warm cache.
  */
object PlanCache {
  private val MaxEntries = 8

  private val cache =
    new java.util.LinkedHashMap[AnyRef, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) Try(e.getValue.rdd.unpersist(false))
        evict
      }
    }

  def materialized(df: DataFrame): DataFrame = synchronized {
    val key = df.queryExecution.analyzed.canonicalized
    val hit = cache.get(key)
    // a plan from a stopped/previous session can canonically equal this
    // one; its persisted handle is dead — replace it
    if (hit != null && (hit.sparkSession eq df.sparkSession)) hit
    else {
      if (hit != null) Try(hit.rdd.unpersist(false))
      // localCheckpoint (lazy) instead of persist: the returned frame's
      // logical plan is a LogicalRDD LEAF, so a parent DAG referencing
      // it 3-5x canonicalizes/optimizes a tiny node each time instead
      // of the full collapse/shingle/minhash subtree -- measured ~0.4s
      // of driver planning per dedup query. Storage is the same
      // MEMORY_AND_DISK. Trade-off: a lost partition cannot recompute
      // (lineage is cut) -- acceptable for session-lifetime
      // intermediates; a cluster deployment wanting executor-loss
      // tolerance would switch back to persist at the cost of planning.
      val p = df.localCheckpoint(false)
      cache.put(key, p)
      p
    }
  }

  def clear(): Unit = synchronized {
    val it = cache.values().iterator()
    while (it.hasNext) { Try(it.next().rdd.unpersist(false)); () }
    cache.clear()
  }
}
