package graft

import graft.ops.{GoldModel, Interpolate, Report}
import org.apache.spark.sql.functions._

/** The report's two formulations — the reference-literal dual
  * ROW_NUMBER window ranking (W1) and the argmin/argmax hash
  * aggregation the engine runs by default — must be value-identical:
  * rank=1 under ORDER BY (price, source) is exactly
  * min_by(source, (price, source)), and the (price, source) ordering
  * key is unique per minute (one row per source after the per-minute
  * aggregation), so there is no tie for the rewrite to break
  * differently. */
class ReportSpec extends SparkTestBase {

  private lazy val densified = {
    val e = Tables.events(spark, sfSmoke)
    Interpolate.densify(GoldModel.factDensifyInput(e))
  }

  private lazy val sources = {
    val e = Tables.events(spark, sfSmoke)
    GoldModel.sourcesDim(e)
      .filter(col("deleted_at").isNull)
      .select("id", "name", "color")
  }

  private def dateId: Int = {
    val e = Tables.events(spark, sfSmoke)
    GoldModel.fact(e).agg(min("date_id")).head().getInt(0)
  }

  for (rankCol <- Seq("cheap", "expensive")) {
    test(s"window and argmax formulations agree ($rankCol)") {
      val d = dateId
      val win = Report.cheapExpensive(densified, sources, d, rankCol,
        useWindows = true).collect().toSeq
      val agg = Report.cheapExpensive(densified, sources, d, rankCol,
        useWindows = false).collect().toSeq
      assert(win.nonEmpty, "report produced no rows at smoke scale")
      assert(win == agg)
    }
  }
}
