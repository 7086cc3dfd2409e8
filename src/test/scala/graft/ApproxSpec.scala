package graft

import graft.ops.Approx
import org.apache.spark.sql.functions._

/** The sketch aggregates must be (a) close to exact on real data and
  * (b) structurally cheaper: no Expand in the distinct plan, no
  * per-group value buffering guarantees claimed beyond Spark's own. */
class ApproxSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("HLL distinct counts within rsd-scale error of exact, and no Expand") {
    val ev = Tables.events(spark, sf)
    val approx = Approx.distinctCounts(ev, Seq(col("event_type")),
        Seq((col("user_id"), "nd_users")), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(3, (0.15 * e).toLong),
        s"$k: approx $a vs exact $e")
    }

    val plan = Approx.distinctCounts(ev, Seq(col("event_type")),
      Seq((col("user_id"), "nd"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "sketch distinct must not plan an Expand")
    val exactPlan = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")), countDistinct(col("value")))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "baseline check: multi-exact-distinct does plan an Expand")
  }

  test("GK quantiles track exact percentiles on integer data") {
    val li = Tables.lineitem(spark, sf)
    val approx = Approx.quantiles(li, Seq(col("l_returnflag")),
        col("l_quantity"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, eq) =>
      approx(k).zip(eq).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 1.0, s"$k: approx $a vs exact $e")
      }
    }
  }
}
