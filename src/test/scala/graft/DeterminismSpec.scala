package graft

import org.apache.spark.sql.Row

/** Engine-wide determinism sweep: a representative slice of the query
  * surface, executed at two different parallelism settings, must
  * produce IDENTICAL rows — including every double bit.
  *
  * Each float-governed operator family pins its own law in its own
  * suite; this sweep is the backstop for the composition: a query
  * whose result depends on shuffle partitioning (a float sum trusted
  * to reduction order, a tie broken by arrival, a sample keyed on
  * partition id) is exactly the bug class that passes a single-config
  * oracle run and then drifts on a real cluster whose parallelism is
  * never the oracle's. The picked queries cover the risk surfaces:
  * exact-decimal aggregates, fixed-point quantized double sums,
  * sequential typed folds, two-pass rank/prefix operators, iterative
  * graph kernels, sketches, and hash-keyed sampling.
  */
class DeterminismSpec extends SparkTestBase {

  private val Queries = Seq(
    "a4_stats_block",     // exact-decimal moment block
    "x_zipf_fit",         // ln → 9dp round → 2^40 quantized sums + DenseId rank
    "a25_psi_drift",      // quantized PSI total
    "t13_ewma",           // typed sequential fold (SeqFold)
    "t15_holt",           // 2-state typed fold
    "w9_abc_pareto",      // Prefix rank+running-sum two-pass
    "x_dense_ids",        // DenseId zipWithIndex offsets
    "x_pagerank",         // iterative integer-exact damping
    "x_kmv_distinct",     // mergeable sketch (merge-order invariance)
    "x_sample_stratified",// hash-threshold sampling
    "x_shard_shuffle",    // md5 permutation + round-robin shards
    "x_label_confusion",  // argmax winners over bit-portable cosine
    "x_zorder_scan",      // layout rewrite + skipping read-back (r9)
    "x_tx_upsert"         // manifest-committed upsert round-trip (r9)
  )

  /** Canonical row multiset: raw Catalyst values stringified — for
    * doubles Row.toString prints the shortest round-trip form, so two
    * doubles stringify equal iff they are bit-equal (NaN aside). */
  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("query results are identical at shuffle parallelism 2 and 7") {
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    try {
      Queries.foreach { name =>
        def run(parts: String): Seq[String] = {
          conf.set("spark.sql.shuffle.partitions", parts)
          graft.ops.PlanCache.clear() // materializations key on plans, not conf
          canon(SparkEntry.queries(name)(spark, sfSmoke).collect())
        }
        val a = run("2")
        val b = run("7")
        assert(a == b, s"$name drifts with shuffle parallelism")
        assert(a.nonEmpty, s"$name returned no rows at smoke scale")
      }
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }
}
