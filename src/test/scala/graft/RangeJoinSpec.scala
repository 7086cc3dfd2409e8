package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._
import scala.util.Random

/** The bucketed range join must be value-identical to the broadcast
  * nested loop — including interval boundaries and bucket-edge values —
  * and must plan as a hash join, not a nested loop. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed == broadcast loop on random data (several widths)") {
    val rnd = new Random(7)
    val left = Seq.fill(300)((rnd.nextInt(1000), rnd.nextDouble() * 10))
      .toDF("lid", "v")
    // random [lo, lo+len) intervals, some overlapping, some empty-range
    val right = Seq.fill(40) {
      val lo = rnd.nextDouble() * 10
      (rnd.nextInt(1000), lo, lo + rnd.nextDouble() * 3)
    }.toDF("rid", "lo", "hi")

    val expected = RangeJoin
      .broadcastLoop(left, col("v"), right, col("lo"), col("hi"))
      .select("lid", "rid").as[(Int, Int)].collect().sorted.toSeq

    for (w <- Seq(0.1, 0.5, 2.0, 50.0)) {
      val got = RangeJoin
        .bucketed(left, col("v"), right, col("lo"), col("hi"), w)
        .select("lid", "rid").as[(Int, Int)].collect().sorted.toSeq
      assert(got == expected, s"width $w")
    }
  }

  test("boundaries: lo inclusive, hi exclusive, point intervals empty") {
    val left = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("lid", "v")
    val right = Seq((10, 1.0, 2.0), (20, 2.0, 2.0)).toDF("rid", "lo", "hi")
    val got = RangeJoin
      .bucketed(left, col("v"), right, col("lo"), col("hi"), 0.5)
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10))) // v=1 in [1,2); v=2 excluded; [2,2) empty
  }

  test("bucketed path plans a hash join, not a nested loop") {
    val left = Seq((1, 1.0)).toDF("lid", "v")
    val right = Seq((10, 0.0, 2.0)).toDF("rid", "lo", "hi")
    val plan = RangeJoin
      .bucketed(left, col("v"), right, col("lo"), col("hi"), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
