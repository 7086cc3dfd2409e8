package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed per-key sequential folds with O(n) state — EWMA and Holt
  * double-exponential smoothing.
  *
  * Both recurrences read their own previous OUTPUT, so they are
  * sequential folds, not window frames (same family as [[Debounce]]).
  * The SQL `aggregate(...concat(acc, array(...)))` spelling works but
  * re-copies the accumulator array on every step — O(n²) per key, which
  * visibly degrades on a 50k-event key and would stall outright on a
  * 100 TB hot key. These kernels are the [[Debounce]] discipline: one
  * shuffle on the key, per-key history sorted in the task (bounded by
  * per-key retention — the same contract the interpolation kernel
  * documents), then a constant-state linear pass that emits rows
  * streaming (no output array is materialized either).
  *
  * Arithmetic is the exact IEEE operation sequence of the SQL fold
  * (`α·x + (1−α)·prev`, with dyadic-exact α), so results are
  * bit-identical to the quadratic oracle spelling.
  *
  * Input contract (validated): key/epoch/id integral and non-NULL,
  * value double — a NULL key would decode as 0L and join the key-0
  * fold, the [[Debounce]] failure mode. Types are checked at plan
  * build; NULLs are rejected at RUNTIME by a codegen'd per-row
  * raise_error guard ([[nonNullLong]]) — no extra job, the row that
  * violates the contract aborts the query with the column name
  * instead of silently merging into the key-0 fold.
  */
object SeqFold {

  private def requireCols(df: DataFrame, intCols: Seq[String], dblCol: String): Unit = {
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    intCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(integral.contains(dt),
        s"SeqFold column '$c' must be an integral type, got $dt")
    }
    val vt = df.schema(dblCol).dataType
    require(vt == DoubleType || vt == FloatType,
      s"SeqFold value column '$dblCol' must be double/float, got $vt")
  }

  /** NULL-rejecting cast: errors (with the offending column named) on
    * the first NULL instead of letting the tuple Encoder decode it as
    * 0L/0.0. Inline in the projection — codegen'd, no extra pass. */
  private def guarded(c: String, op: String): org.apache.spark.sql.Column =
    when(col(c).isNull,
      raise_error(lit(s"$op column '$c' must be non-NULL")))
      .otherwise(col(c)).cast("long")

  private def guardedD(c: String, op: String): org.apache.spark.sql.Column =
    when(col(c).isNull,
      raise_error(lit(s"$op column '$c' must be non-NULL")))
      .otherwise(col(c)).cast("double")

  /** Per-key EWMA in (epoch, id) order: first row passes through, then
    * e' = α·x + (1−α)·e. Returns (key, epoch, id, value, ewma). */
  def ewma(df: DataFrame, keyCol: String, epochCol: String, idCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    requireCols(df, Seq(keyCol, epochCol, idCol), valueCol)
    val spark = df.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha // dyadic α ⇒ exact
    df.select(guarded(keyCol, "SeqFold"), guarded(epochCol, "SeqFold"),
        guarded(idCol, "SeqFold"), guardedD(valueCol, "SeqFold"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(t => (t._2, t._3))
        var prev = 0.0
        var first = true
        rows.iterator.map { case (_, ep, id, v) =>
          val e = if (first) { first = false; v } else alpha * v + beta * prev
          prev = e
          (k, ep, id, v, e)
        }
      }
      .toDF(keyCol, epochCol, idCol, valueCol, "ewma")
  }

  /** Per-key Holt smoothing in (epoch, id) order: state (l, t) seeds at
    * (x₀, 0), then l' = α·x + (1−α)(l+t), t' = β(l'−l) + (1−β)t;
    * `fitted` is the one-step-ahead forecast l+t of the PRIOR row (NULL
    * on the key's first row). Returns
    * (key, epoch, id, value, level, trend, fitted). */
  def holt(df: DataFrame, keyCol: String, epochCol: String, idCol: String,
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    requireCols(df, Seq(keyCol, epochCol, idCol), valueCol)
    val spark = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    df.select(guarded(keyCol, "SeqFold"), guarded(epochCol, "SeqFold"),
        guarded(idCol, "SeqFold"), guardedD(valueCol, "SeqFold"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(t => (t._2, t._3))
        var l = 0.0
        var t = 0.0
        var first = true
        rows.iterator.map { case (_, ep, id, v) =>
          val fitted: Option[Double] = if (first) None else Some(l + t)
          if (first) { first = false; l = v; t = 0.0 }
          else {
            val l1 = alpha * v + a1 * (l + t)
            val t1 = beta * (l1 - l) + b1 * t
            l = l1; t = t1
          }
          (k, ep, id, v, l, t, fitted)
        }
      }
      .toDF(keyCol, epochCol, idCol, valueCol, "level", "trend", "fitted")
  }
}
