package graft

/** Every registered query runs at sf0.001, returns rows, and its oracle
  * (when present) is syntactically registered. Detailed value parity is
  * checked by the DuckDB-compare harness (tools/check_oracle.py) and
  * the driver's CORRECTNESS gate; suites here guard plan validity and
  * determinism re-run-to-re-run.
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sfSmoke)
      val n = a.count()
      assert(n > 0, s"$name returned no rows")
      // re-run must give identical results (no current_timestamp leaks,
      // no nondeterministic ordering feeding row_number, …)
      val b = fn(spark, sfSmoke)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$name is nondeterministic across runs")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet -- qs
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
