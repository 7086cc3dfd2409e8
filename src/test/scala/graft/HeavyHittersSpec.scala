package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.functions._

/** ops/HeavyHitters — the Misra-Gries guarantee, merge correctness
  * under arbitrary partitioning, and exactness of the two-pass result
  * against the naive GROUP BY / HAVING it replaces. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** A skewed stream: `hot_i` appears 200·(6−i) times for i in 1..5
    * (3000 occurrences), plus 3000 singleton keys — 6000 total. */
  private def skewed = {
    val hot = (1 to 5).flatMap(i => Seq.fill(200 * (6 - i))(s"hot_$i"))
    val cold = (1 to 3000).map(i => s"cold_$i")
    // interleave deterministically so no partition is all-hot
    (hot ++ cold).sortBy(_.hashCode).toDF("k")
  }

  /** The answer the operator must reproduce, spelled naively. */
  private def naive(m: Int) = {
    val df = skewed
    val n = df.count()
    df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (m + 1L) > n)
      .orderBy(col("cnt").desc, col("k"))
      .as[(String, Long)].collect().toSeq
  }

  test("MG guarantee: every key above N/(m+1) survives as a candidate, even with m far below the key count") {
    val m = 16 // 3005 distinct keys vs 16 counters: decrement/trim paths run constantly
    val mg = HeavyHitters.summarize(skewed.repartition(7), "k", m)
    assert(mg.total == 6000L)
    val heavy = naive(m).map(_._1).toSet
    assert(heavy.nonEmpty && heavy.subsetOf(mg.counts.keySet),
      s"missing: ${heavy -- mg.counts.keySet}")
    assert(mg.counts.size <= m)
  }

  test("exact(): equals the naive GROUP BY / HAVING answer, independent of partitioning") {
    val m = 16
    val expected = naive(m)
    for (parts <- Seq(1, 4, 13)) {
      val got = HeavyHitters.exact(skewed.repartition(parts), "k", m)
        .orderBy(col("cnt").desc, col("k"))
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"at $parts partitions")
    }
  }

  test("counts in the summary are lower bounds; the recount restores exact values") {
    val m = 8
    val mg = HeavyHitters.summarize(skewed, "k", m)
    val exactCnt = skewed.groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    mg.counts.foreach { case (k, v) =>
      assert(v <= exactCnt(k), s"$k: MG $v > exact ${exactCnt(k)}")
    }
  }

  test("incremental ≡ one-shot: summaries merged across batches yield the exact same answer") {
    val m = 16
    val df = skewed
    val expected = HeavyHitters.exact(df, "k", m)
      .orderBy(col("cnt").desc, col("k")).as[(String, Long)].collect().toSeq
    // split into three "days", summarize each independently, merge —
    // the trim path runs on every merge at m=16 vs 3005 keys
    val parts = Seq(
      df.filter(length(col("k")) % 3 === 0),
      df.filter(length(col("k")) % 3 === 1),
      df.filter(length(col("k")) % 3 === 2))
    val merged = parts.map(p => HeavyHitters.summarize(p, "k", m))
      .reduce(HeavyHitters.mergeSummaries(m, _, _))
    assert(merged.total == 6000L)
    val got = HeavyHitters.exactGiven(df, "k", m, merged)
      .orderBy(col("cnt").desc, col("k")).as[(String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("degenerate inputs: empty frame and all-one-key") {
    val empty = HeavyHitters.exact(Seq.empty[String].toDF("k"), "k", 4)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("k", "cnt"))
    val one = HeavyHitters.exact(Seq.fill(100)("x").toDF("k"), "k", 4)
      .as[(String, Long)].collect().toSeq
    assert(one == Seq(("x", 100L)))
  }
}
