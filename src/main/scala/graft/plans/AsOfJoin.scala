package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.bridge

/** Backward as-of join as a first-class operator: custom `LogicalPlan`
  * → `SparkStrategy` → physical `SparkPlan`, the (c)-level extension
  * path (SURVEY.md §2 Spark-mapping preference order) for semantics the
  * built-in operators can't express as ONE operator.
  *
  * Semantics (pandas merge_asof / DuckDB ASOF JOIN, generalizing the
  * reference's boundary neighbor lookup J9,
  * /root/reference/dags/archived/fact_gold_price_temp.py:280-327): for
  * each left row, attach the LAST right row with the same keys and
  * right_time ≤ left_time; no candidate → right side NULL (left outer).
  * NULL keys or NULL left time never match. Right times must be unique
  * per key for a deterministic result (pre-aggregate to one row per
  * (key, time) — same discipline the interpolation pipeline applies).
  *
  * Why a custom operator instead of the window/union composition: the
  * compositional form (union both sides, last(ignoreNulls) window,
  * filter back) materializes left+right rows through a WindowExec sort
  * buffer TWICE (union sort + re-filter); this operator declares
  * `requiredChildDistribution`/`requiredChildOrdering`, so Catalyst
  * plans exactly two hash exchanges + two sorts (AQE-sized), and the
  * merge itself is a single streaming pass per partition holding ONE
  * buffered right row — no per-group state, no skew amplification: a
  * hot key streams, never buffers.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time types must match")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of: children are hash-clustered on the keys and
  * sorted by (keys, time); each partition pair is merged in one pass.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeys, lOut)
      val rKeyGen = UnsafeProjection.create(rKeys, rOut)
      val lTimeBound = BindReferences.bindReference(lTime, lOut)
      val rTimeBound = BindReferences.bindReference(rTime, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(lTime.dataType)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // latest usable right row seen so far, with a copy of its key
        private var heldKey: InternalRow = _
        private var heldRow: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyGen(l)
          if (lk.anyNull) return outProj(joiner(l, nullRight))
          val lt = lTimeBound.eval(l)
          if (lt == null) return outProj(joiner(l, nullRight))
          // advance the right side: consume rows whose key is behind,
          // and rows of the current key with time ≤ lt (holding the
          // latest); stop at the first row beyond (key, lt).
          var continue = true
          while (continue && rBuf.hasNext) {
            val rk = rKeyGen(rBuf.head)
            val c = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
            if (c < 0) rBuf.next()
            else if (c > 0) continue = false
            else {
              val rt = rTimeBound.eval(rBuf.head)
              if (rt == null) rBuf.next() // unusable: never matches
              else if (timeOrd.lteq(rt, lt)) {
                heldRow = rBuf.next().copy()
                heldKey = rk.copy()
              } else continue = false
            }
          }
          val matched = heldRow != null && keyOrd.compare(heldKey, lk) == 0
          outProj(joiner(l, if (matched) heldRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. */
object AsOf {

  /** Backward as-of left-outer join.
    * @param keys  (leftCol, rightCol) equality key pairs
    * @param leftTime/rightTime ordering columns (same type both sides;
    *   right times should be unique per key for determinism)
    *
    * Self-join note: the analyzer's relation deduplication does not
    * visit custom nodes, so when both sides derive from the same
    * DataFrame the right side must alias its columns to fresh names
    * (as q:j10_asof_spread does) — shared attribute ids would bind the
    * right-side expressions to the left child. Detected and rejected
    * here rather than silently misbound.
    */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val overlap = left.queryExecution.analyzed.outputSet
      .intersect(right.queryExecution.analyzed.outputSet)
    require(overlap.isEmpty,
      s"as-of join sides share attributes ${overlap.mkString(", ")}; " +
        "alias the right side's columns to fresh names before joining")
    val node = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      keys.map(k => bridge.expression(left.col(k._1))),
      keys.map(k => bridge.expression(right.col(k._2))),
      bridge.expression(left.col(leftTime)),
      bridge.expression(right.col(rightTime)))
    bridge.ofRows(spark, node)
  }

  /** Idempotently register the strategy on a live session (the
    * GraftExtensions injection does the same for extension-built
    * sessions). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = bridge.experimental(spark)
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }
}
