package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding similarity
  * (array<float> columns — the `embeddings` table shape).
  *
  * Same rationale as [[TextHash]]: a cosine via
  * `aggregate(zip_with(...))` built-ins runs one interpreted lambda
  * dispatch per vector element; these expressions keep the per-vector
  * loop in compiled JVM code and join whole-stage codegen through a
  * static call. Determinism: float×float products are exact in double
  * (24-bit mantissas), and both accumulation loops run in index order —
  * the DuckDB oracle mirrors the same left-to-right reduction, so
  * cosine values are bit-identical across engines.
  */
object VectorOps {

  /** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), double accumulation in
    * index order. */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH signature: bit h = sign of the projection on
    * a deterministic integer hyperplane w(h,i) = ((h+1)·131 + i·31) mod
    * 97 − 48. Integer weights ≤ |48| keep every product exact in double,
    * so the signature is engine-portable (the DuckDB oracle recomputes
    * it identically). */
  def hyperplaneSig(e: ArrayData, bits: Int): Long = {
    val n = e.numElements()
    var sig = 0L
    var h = 0
    while (h < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += e.getFloat(i).toDouble * (((h + 1) * 131 + i * 31) % 97 - 48)
        i += 1
      }
      if (dot > 0) sig |= 1L << h
      h += 1
    }
    sig
  }

  /** Column API: cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API: `bits`-bit hyperplane LSH signature of a float array. */
  def sig(e: Column, bits: Int = 8): Column =
    bridge.column(HyperplaneSigExpr(bridge.expression(e), bits))
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.cosineSim($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

case class HyperplaneSigExpr(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneSig(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.hyperplaneSig($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}
