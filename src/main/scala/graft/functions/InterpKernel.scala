package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** The nearest-two linear-interpolation price kernel as one native
  * Catalyst expression.
  *
  * This projection runs once per GENERATED minute — the output-sized hot
  * loop of the densify operator (tens of millions of rows from a
  * 100k-tick day range; arbitrarily more at lake scale). Expressing the
  * candidate selection as nested `when` trees duplicates the comparison
  * subtrees across t1/p1/t2/p2/price and inflates the generated code
  * past what the JVM executes well cold (a fresh executor pays bytecode
  * interpretation until C2 kicks in — measured 3× wall-clock on a
  * 30-day rebuild). A single static call keeps the whole selection in
  * one small, always-JIT-friendly method — the same preference order the
  * engine follows everywhere: built-in > native Expression > UDF.
  *
  * Semantics (bit-identical to the previous declarative formulation and
  * the typed numpy-faithful kernel, enforced by InterpolateSpec's
  * differential and the t3/t6 oracles): candidates around a gap are
  * time-sorted, distances measured on the RAW HHmmss encoding
  * (/root/reference/dags/etl/fact_gold_price.py:330-333), nearest two
  * win with distance ties toward the earlier minute (numpy argsort's
  * stable order on the time-sorted array), linear interpolation
  * p1 + (pos−t1)·(p2−p1)/(t2−t1), single-candidate cases flat-line.
  * Missing candidates are encoded as t = −1 (call sites `coalesce`).
  */
object InterpKernel {

  /** @param cse 0 = interior gap (between c and nx), 1 = head run
    *            (before the group's first point c), 2 = tail run (after
    *            the group's last point c)
    * @param pos the missing minute, HHmmss encoding
    * @param pvT/pvP previous-of-c point (t = −1 if none)
    * @param cT/cP   the gap's anchor point (always present)
    * @param nxT/nxP next-of-c point (t = −1 if none)
    * @param n2T/n2P next-of-next point (t = −1 if none)
    */
  def price(cse: Int, pos: Int,
      pvT: Int, pvP: Double, cT: Int, cP: Double,
      nxT: Int, nxP: Double, n2T: Int, n2P: Double): Double = {
    var t1 = cT; var p1 = cP
    var t2 = -1; var p2 = 0.0
    if (cse == 0) {
      // interior: pv_t < c_t < pos < nx_t < n2_t; first = closer of
      // (c, nx) with tie toward c (earlier); second = closer of the
      // remaining inner point and the next-outer point on first's side.
      val d1 = pos - cT
      val d2 = nxT - pos
      if (d1 <= d2) {
        if (pvT >= 0 && pos - pvT <= d2) { t2 = pvT; p2 = pvP }
        else { t2 = nxT; p2 = nxP }
      } else {
        t1 = nxT; p1 = nxP
        if (n2T < 0 || d1 <= n2T - pos) { t2 = cT; p2 = cP }
        else { t2 = n2T; p2 = n2P }
      }
    } else if (cse == 1) { t2 = nxT; p2 = nxP }
    else { t2 = pvT; p2 = pvP }
    if (t2 < 0 || t2 == t1) p1
    else p1 + (pos - t1).toDouble * (p2 - p1) / (t2 - t1).toDouble
  }

  /** Column API. All inputs must be non-nullable (coalesce missing
    * candidates to t = −1 / p = 0.0 at the call site). */
  def nearestTwoPrice(cse: Column, pos: Column,
      pvT: Column, pvP: Column, cT: Column, cP: Column,
      nxT: Column, nxP: Column, n2T: Column, n2P: Column): Column =
    bridge.column(NearestTwoPriceExpr(Seq(cse, pos, pvT, pvP, cT, cP,
      nxT, nxP, n2T, n2P).map(bridge.expression)))
}

/** 10-ary static-call expression; children are (int, int, int, double,
  * int, double, int, double, int, double) and must be non-nullable —
  * the generated code evaluates them without null guards. NULL prices
  * are carried as NaN by the call site (see Interpolate) and restored
  * with nanvl above the call. */
case class NearestTwoPriceExpr(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes =
    Seq(IntegerType, IntegerType, IntegerType, DoubleType, IntegerType,
      DoubleType, IntegerType, DoubleType, IntegerType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    InterpKernel.price(
      v(0).asInstanceOf[Int], v(1).asInstanceOf[Int],
      v(2).asInstanceOf[Int], v(3).asInstanceOf[Double],
      v(4).asInstanceOf[Int], v(5).asInstanceOf[Double],
      v(6).asInstanceOf[Int], v(7).asInstanceOf[Double],
      v(8).asInstanceOf[Int], v(9).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val argList = evals.map(_.value).mkString(", ")
    ev.copy(
      code = code"""
        ${evals.map(_.code).reduce(_ + _)}
        double ${ev.value} = graft.functions.InterpKernel.price($argList);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestTwoPriceExpr =
    copy(children = newChildren)
  override def prettyName: String = "nearest_two_price"
}
