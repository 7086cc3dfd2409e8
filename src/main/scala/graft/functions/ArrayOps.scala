package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native sorted-array set kernels (long-id adjacency lists).
  *
  * The built-in `array_intersect` materializes a hash set AND a result
  * array per call; in the triangle census the call count is the EDGE
  * count and only the intersection SIZE is needed — for a 100 TB-scale
  * graph pass that allocation is the hot loop. This expression runs the
  * two-pointer merge over pre-sorted arrays in compiled code (no
  * allocation, whole-stage codegen through a static call), the same
  * rationale as [[VectorOps]]/[[TextHash]].
  *
  * Contract: both inputs sorted ascending and duplicate-free (the
  * caller sorts once per adjacency row — amortized over every edge
  * probing it). Count semantics are then exactly
  * `size(array_intersect(a, b))`.
  */
object ArrayOps {

  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Column API: |a ∩ b| of two sorted long-array columns. */
  def intersectCount(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCountExpr(bridge.expression(a), bridge.expression(b)))
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // containsNull = false: getLong on a null slot silently reads 0 and
  // miscounts. ExpectsInputTypes alone does NOT enforce this —
  // acceptsType uses sameType, which ignores containsNull — so
  // checkInputDataTypes below rejects nullable-element arrays
  // explicitly at ANALYSIS (the SQL-registered surface is reachable
  // from arbitrary text; internal adjacency builders produce non-null)
  override def inputTypes =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false))
  override def checkInputDataTypes(): TypeCheckResult = {
    val parent = super.checkInputDataTypes()
    if (parent.isFailure) return parent
    Seq(left, right).zipWithIndex.collectFirst {
      case (c, i) if c.dataType.asInstanceOf[ArrayType].containsNull =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName argument ${i + 1} must be ARRAY<BIGINT> with " +
            "non-nullable elements; null slots would be read as 0 and " +
            "break the sorted-merge contract")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayOps.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}
