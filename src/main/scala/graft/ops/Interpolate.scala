package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minute-grain densification + nearest-two-point linear interpolation —
  * the reference's one genuinely procedural computation, re-expressed
  * declaratively (SURVEY.md §2.9).
  *
  * Semantics replicated from /root/reference/dags/etl/fact_gold_price.py:
  *  - grid: every minute `time_id` between the per-date min and max
  *    observed minute (full-rebuild variant,
  *    dags/archived/rebuild_all_time_interpolation.py:73-96);
  *  - per (source_id, side_id, date_id) group — NULL keys form their own
  *    group exactly like pandas dropna=False (fact_gold_price.py:310);
  *  - a minute already covered by the group is not generated (anti-join,
  *    fact_gold_price.py:312-315);
  *  - for each missing minute m, take the two nearest actual points by
  *    |rounded_time_id − m| measured on the RAW HHmmss encoding (the
  *    reference's quirk: the 59→00 minute boundary is 4100 units wide,
  *    fact_gold_price.py:330-333) — nearest-by-distance, NOT bracketing,
  *    so head/tail gaps extrapolate;
  *  - linear: p1 + (m − t1)·(p2 − p1)/(t2 − t1); equal times → p1
  *    (fact_gold_price.py:336-340);
  *  - groups with < 2 actual points generate nothing
  *    (fact_gold_price.py:321).
  *
  * Two deliberate determinism refinements over the reference (which
  * inherits unspecified ordering from Postgres when several ticks share
  * a minute, SURVEY.md §7.4):
  *  - actual points are pre-aggregated to one point per minute using an
  *    exact decimal mean (order-independent);
  *  - distance ties (equidistant minutes either side of m) break toward
  *    the EARLIER minute, matching numpy argsort's stable order on the
  *    time-sorted array.
  *
  * Scale notes: everything shuffles on the group key (source, side,
  * date) or on date_id only; per-group state is bounded by 1440 minutes
  * per day regardless of total data size, so the plan survives a 100 TB
  * fact — there is no per-driver collection and no unbounded skew (a
  * hot source/date still caps at 1440 grid rows × its tick count).
  */
object Interpolate {

  private val keys = Seq("source_id", "side_id", "date_id")

  /** Null-safe conjunction over key columns: the reference's pandas
    * dropna=False grouping means a NULL side_id is a real group, so
    * every self-join on the group key must use <=> — plain = would
    * silently drop NULL-key groups from the interpolation output. */
  private def keyEq(l: String, r: String, cols: Seq[String]) =
    cols.map(c => col(s"$l.$c") <=> col(s"$r.$c")).reduce(_ && _)

  /** HHmmss minute encoding → minute-of-day. */
  private def minuteOfDay(t: org.apache.spark.sql.Column) =
    floor(t / 10000) * 60 + floor((t % 10000) / 100)

  /** minute-of-day → HHmmss minute encoding. */
  private def toTimeId(mod: org.apache.spark.sql.Column) =
    (floor(mod / 60) * 10000 + (mod % 60) * 100).cast("int")

  /** Full densified table from a T1-shaped input
    * (source_id, side_id, date_id, time_id, rounded_time_id, price,
    * is_interpolated=false): actual rows unioned with generated rows.
    */
  def densify(factRows: DataFrame): DataFrame = {
    val spark = factRows.sparkSession
    import spark.implicits._

    // One exact point per (group, minute): decimal mean of that minute's
    // ticks (deterministic — see scaladoc).
    val actuals = factRows
      .groupBy((keys :+ "rounded_time_id").map(col): _*)
      .agg(
        (sum($"price".cast("decimal(18,2)")).cast("double") / count($"price"))
          .as("aprice"))

    // T2: per-date minute grid spanning [min, max] observed minute.
    // Tiny output (≤1440 rows/date) regardless of input size.
    val grid = factRows
      .groupBy($"date_id")
      .agg(min($"rounded_time_id").as("t_min"), max($"rounded_time_id").as("t_max"))
      .select(
        $"date_id",
        explode(sequence(minuteOfDay($"t_min"), minuteOfDay($"t_max"))).as("mod"))
      .select($"date_id", toTimeId($"mod").as("rounded_time_id"))

    // J8 grid fan-out: every group × its date's minutes. Groups is a
    // distinct projection (small); join is on date_id.
    val groups = factRows.select(keys.map(col): _*).distinct()
    val expected = groups.join(grid, Seq("date_id"))

    // J6 anti-join: minutes the group already covers are not generated.
    val covered = factRows
      .select((keys :+ "rounded_time_id").map(col): _*).distinct()
    val missing = expected.as("e")
      .join(covered.as("c"),
        keyEq("e", "c", keys :+ "rounded_time_id"), "left_anti")

    // Groups eligible for interpolation: ≥ 2 actual ticks
    // (fact_gold_price.py:321 counts rows, not distinct minutes).
    val eligible = factRows
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_ticks"))
      .filter($"n_ticks" >= 2)
      .select(keys.map(col): _*)

    // Nearest-2 selection, linear formulation. The naive plan joins every
    // missing minute against every actual point of its group (O(gap ×
    // points) rows per group-day — quadratic, and the dominant cost on a
    // dense fact). But the two nearest points of a missing minute m can
    // only be drawn from {prev2, prev1, next1, next2}: the two closest
    // actual minutes on each side — anything further on the same side is
    // dominated. So: interleave missing slots with the group's actual
    // points on one time-sorted window, carry each side's nearest two via
    // last/first(ignoreNulls) chains, then pick the best 2 of ≤4
    // candidates by (|Δt|, t) — the same stable tie-break as numpy
    // argsort on the time-sorted array (SURVEY §7.4). One shuffle on the
    // group key, O(n log n) per group, no quadratic intermediate.
    val points = actuals
      .withColumnRenamed("rounded_time_id", "pos")
      .withColumn("pt", struct($"pos".as("t"), $"aprice".as("p")))
      .withColumn("prevpt",
        lag($"pt", 1).over(Window.partitionBy(keys.map(col): _*).orderBy($"pos")))
      .withColumn("nextpt",
        lead($"pt", 1).over(Window.partitionBy(keys.map(col): _*).orderBy($"pos")))
      .withColumn("is_slot", lit(false))
      .drop("aprice")

    val slots = missing.as("m")
      .join(eligible.as("g"), keyEq("m", "g", keys), "left_semi")
      .withColumnRenamed("rounded_time_id", "pos")
      .withColumn("pt", lit(null).cast(points.schema("pt").dataType))
      .withColumn("prevpt", lit(null).cast(points.schema("pt").dataType))
      .withColumn("nextpt", lit(null).cast(points.schema("pt").dataType))
      .withColumn("is_slot", lit(true))

    val byTime = Window.partitionBy(keys.map(col): _*).orderBy($"pos")
    val before = byTime.rowsBetween(Window.unboundedPreceding, 0)
    // "nearest actual at-or-after" is expressed as last-non-null over the
    // REVERSED ordering with an unboundedPreceding frame, never as
    // first(ignoreNulls) over a (0, unboundedFollowing) frame: Spark's
    // UnboundedFollowingWindowFunctionFrame re-scans the remaining frame
    // for every row — O(n²) per group (measured 51s → 9s on one sf0.1
    // date), while the unboundedPreceding frame is incremental O(n).
    // `pos` is unique within a group (points are minute-aggregated and
    // slots are the complement minutes), so both orderings are total.
    val beforeDesc = Window.partitionBy(keys.map(col): _*).orderBy($"pos".desc)
      .rowsBetween(Window.unboundedPreceding, 0)

    // slot rows carry NULL pt/prevpt/nextpt, so ignoreNulls skips them:
    // prev1 = nearest actual before the slot, prev2 = its predecessor
    // (propagated through the lag chain), symmetrically next1/next2.
    val enriched = points.unionByName(slots)
      .withColumn("prev1", last($"pt", ignoreNulls = true).over(before))
      .withColumn("prev2", last($"prevpt", ignoreNulls = true).over(before))
      .withColumn("next1", last($"pt", ignoreNulls = true).over(beforeDesc))
      .withColumn("next2", last($"nextpt", ignoreNulls = true).over(beforeDesc))

    // Best-2-of-4 selection in pure scalar arithmetic so the whole stage
    // stays inside whole-stage codegen (an array_sort over candidate
    // structs is an interpreted lambda per row — measured 3× slower on a
    // 30-day rebuild). Each candidate is ranked by the key
    // |Δt|·10⁶ + t: t < 10⁶ (HHmmss), so key order == lexicographic
    // (distance, t) order — nearest first, distance ties toward the
    // earlier minute, exactly the struct-sort this replaces. Candidate
    // t's are distinct within a group (one point per minute), so keys
    // are distinct and decode unambiguously.
    def keyOf(c: org.apache.spark.sql.Column) =
      when(c.isNotNull,
        abs(c.getField("t") - $"pos").cast("long") * 1000000L + c.getField("t"))

    val interpolated = enriched
      .filter($"is_slot")
      .withColumn("k_p2", keyOf($"prev2"))
      .withColumn("k_p1", keyOf($"prev1"))
      .withColumn("k_n1", keyOf($"next1"))
      .withColumn("k_n2", keyOf($"next2"))
      // least() skips NULLs: k1 = best candidate, k2 = best of the rest.
      .withColumn("k1", least($"k_p2", $"k_p1", $"k_n1", $"k_n2"))
      .withColumn("k2", least(
        when($"k_p2" =!= $"k1", $"k_p2"),
        when($"k_p1" =!= $"k1", $"k_p1"),
        when($"k_n1" =!= $"k1", $"k_n1"),
        when($"k_n2" =!= $"k1", $"k_n2")))
      .withColumn("t1", ($"k1" % 1000000L).cast("int"))
      .withColumn("t2", ($"k2" % 1000000L).cast("int"))
      .withColumn("p1",
        when($"k_p2" === $"k1", $"prev2.p").when($"k_p1" === $"k1", $"prev1.p")
          .when($"k_n1" === $"k1", $"next1.p").otherwise($"next2.p"))
      .withColumn("p2",
        when($"k_p2" === $"k2", $"prev2.p").when($"k_p1" === $"k2", $"prev1.p")
          .when($"k_n1" === $"k2", $"next1.p").when($"k_n2" === $"k2", $"next2.p"))
      .select(
        col("source_id"), col("side_id"), col("date_id"),
        $"pos".as("time_id"), $"pos".as("rounded_time_id"),
        when($"k2".isNull || $"t2" === $"t1", $"p1")
          .otherwise($"p1" +
            ($"pos" - $"t1") * ($"p2" - $"p1") / ($"t2" - $"t1"))
          .as("price"),
        lit(true).as("is_interpolated"))

    val actualsOut = factRows.select(
      $"source_id", $"side_id", $"date_id", $"time_id", $"rounded_time_id",
      $"price", $"is_interpolated")

    actualsOut.unionByName(interpolated)
  }

  // --------------------------------------------------------------------
  // Typed kernel: the literal numpy nearest-2 scan, for differential
  // testing against the declarative plan and as the SURVEY §2.11
  // UDTF-shaped formulation (groupByKey → flatMapGroups).
  // --------------------------------------------------------------------

  case class FactPoint(
      source_id: Option[Int], side_id: Option[Int], date_id: Int,
      time_id: Int, rounded_time_id: Int, price: Double,
      is_interpolated: Boolean)

  /** Same contract as [[densify]] but with the per-group interpolation
    * done imperatively inside flatMapGroups, mirroring
    * fact_gold_price.py:307-351 line for line. Per-group memory is
    * bounded by the day's tick count — the same bound the reference
    * relies on ("chunk by date", rebuild_all_time_interpolation.py:67).
    */
  def densifyTyped(factRows: DataFrame, gridByDate: Map[Int, Seq[Int]]): DataFrame = {
    val spark = factRows.sparkSession
    import spark.implicits._
    val bGrid = spark.sparkContext.broadcast(gridByDate)

    // canonical 7-column projection (same contract as densify(), which
    // also drops any pass-through columns like the tick id)
    val pts = factRows.select(
      $"source_id", $"side_id", $"date_id", $"time_id", $"rounded_time_id",
      $"price", $"is_interpolated").as[FactPoint]
    val generated = pts
      .groupByKey(p => (p.source_id, p.side_id, p.date_id))
      .flatMapGroups { (key: (Option[Int], Option[Int], Int), it: Iterator[FactPoint]) =>
        val (src, side, dateId) = key
        val rows = it.toArray
        val existing = rows.map(_.rounded_time_id).toSet
        val grid = bGrid.value.getOrElse(dateId, Seq.empty)
        val missing = grid.filterNot(existing.contains)
        if (missing.isEmpty || rows.length < 2) Iterator.empty
        else {
          // exact per-minute mean, time-sorted — matches densify()
          val actuals = rows
            .groupBy(_.rounded_time_id).toArray
            .map { case (t, rs) =>
              // HALF_UP to match the declarative path's decimal(18,2)
              // cast (and avoid ArithmeticException on >2dp doubles)
              val s = rs.map(r =>
                BigDecimal(r.price).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
              // double division AFTER the exact decimal sum — the same
              // operation order as the declarative plan, so results are
              // bit-identical between the two formulations
              (t, s.toDouble / rs.length)
            }
            .sortBy(_._1)
          if (actuals.length < 1) Iterator.empty
          else missing.iterator.map { m =>
            val byDist = actuals.zipWithIndex
              .sortBy { case ((t, _), i) => (math.abs(t.toLong - m), i) }
            val (t1, p1) = byDist(0)._1
            val price =
              if (byDist.length < 2) p1
              else {
                val (t2, p2) = byDist(1)._1
                if (t2 == t1) p1
                else p1 + (m - t1) * (p2 - p1) / (t2 - t1)
              }
            FactPoint(src, side, dateId, m, m, price, is_interpolated = true)
          }
        }
      }
    pts.toDF.unionByName(generated.toDF)
  }

  /** Per-date [min,max] minute grids, computed distributed then collected
    * (one tiny row per date) for the typed kernel's broadcast. */
  def gridByDate(factRows: DataFrame): Map[Int, Seq[Int]] = {
    val spark = factRows.sparkSession
    import spark.implicits._
    factRows
      .groupBy($"date_id")
      .agg(min($"rounded_time_id").as("lo"), max($"rounded_time_id").as("hi"))
      .as[(Int, Int, Int)]
      .collect()
      .map { case (d, lo, hi) =>
        def mod(t: Int) = t / 10000 * 60 + t % 10000 / 100
        def tid(m: Int) = m / 60 * 10000 + m % 60 * 100
        d -> (mod(lo) to mod(hi)).map(tid)
      }
      .toMap
  }
}
