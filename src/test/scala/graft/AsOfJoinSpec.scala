package graft

import graft.plans.{AsOf, AsOfJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import scala.util.Random

/** The custom backward as-of join operator: value semantics against a
  * plain-Scala reference implementation (deterministic edges + seeded
  * random differential), and the physical contract — the strategy plans
  * AsOfJoinExec with its two key exchanges and nothing else. */
class AsOfJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def run(
      left: Seq[(java.lang.Integer, Long, Double)],
      right: Seq[(java.lang.Integer, Long, Double)]): Set[(Option[Int], Long, Double, Option[Long], Option[Double])] = {
    val s = spark
    import s.implicits._
    val l = left.toDF("k", "t", "v")
    val r = right.toDF("k", "rt", "q")
      .select($"k".as("rk"), $"rt", $"q")
    AsOf.joinBackward(l, r, Seq("k" -> "rk"), "t", "rt")
      .collect()
      .map(row => (
        if (row.isNullAt(0)) None else Some(row.getInt(0)),
        row.getLong(1), row.getDouble(2),
        if (row.isNullAt(4)) None else Some(row.getLong(4)),
        if (row.isNullAt(5)) None else Some(row.getDouble(5))))
      .toSet
  }

  /** Reference semantics: last right row with equal non-null key and
    * rt <= t; right times are unique per key in all fixtures. */
  private def oracle(
      left: Seq[(java.lang.Integer, Long, Double)],
      right: Seq[(java.lang.Integer, Long, Double)]): Set[(Option[Int], Long, Double, Option[Long], Option[Double])] =
    left.map { case (k, t, v) =>
      val m =
        if (k == null) None
        else right.filter(r => r._1 != null && r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
      (Option(k).map(_.intValue), t, v, m.map(_._2), m.map(_._3))
    }.toSet

  test("edge cases: no match, exact-time match, null keys, interleaved keys") {
    val left: Seq[(java.lang.Integer, Long, Double)] = Seq(
      (1, 10L, 1.0),   // before any quote → no match
      (1, 20L, 2.0),   // exact-time match (rt == t included)
      (1, 25L, 3.0),   // between quotes → holds t=20
      (2, 100L, 4.0),  // other key
      (3, 50L, 5.0),   // key with no right rows at all
      (null, 60L, 6.0) // null key never matches
    )
    val right: Seq[(java.lang.Integer, Long, Double)] = Seq(
      (1, 20L, 10.5), (1, 30L, 11.5), (2, 90L, 20.0), (null, 1L, 99.0))
    assert(run(left, right) === oracle(left, right))
  }

  test("seeded random differential vs reference implementation") {
    val rnd = new Random(42)
    def gen(n: Int, keyNull: Double): Seq[(java.lang.Integer, Long, Double)] =
      (1 to n).map { _ =>
        val k: java.lang.Integer =
          if (rnd.nextDouble() < keyNull) null
          else Int.box(rnd.nextInt(6))
        (k, rnd.nextInt(1000).toLong, math.rint(rnd.nextDouble() * 100) / 1)
      }
    // unique right (key, time): reference "last row ≤ t" is otherwise
    // order-dependent — the operator's documented determinism contract
    val right = gen(300, 0.05)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = gen(500, 0.05)
    assert(run(left, right) === oracle(left, right))
  }

  test("physical plan: AsOfJoinExec with exactly two shuffle exchanges") {
    val s = spark
    import s.implicits._
    val l = (1 to 100).map(i => (i % 5, i.toLong, i * 1.0)).toDF("k", "t", "v")
    val r = (1 to 50).map(i => (i % 5, i.toLong * 2, i * 2.0))
      .toDF("rk", "rt", "q")
    val df = AsOf.joinBackward(l, r, Seq("k" -> "rk"), "t", "rt")
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.nonEmpty)
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size === 2)
  }
}
