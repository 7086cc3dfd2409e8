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

  /** Argmin squared-L2 cell assignment over a codebook — the k-means
    * inner loop as compiled code. The interpreted spelling
    * (`transform(_cents, c -> aggregate(...))` + an argmin fold) runs
    * k×dim lambda dispatches per row with no codegen; this keeps the
    * identical arithmetic (per-centroid sum of (v[j]−c[j])² in
    * ascending j, strict-< argmin so ties keep the smaller cell id —
    * bit-identical distances, same winner) in one static JVM loop.
    * The KMeans failure contract is preserved verbatim: a NaN vector
    * never wins a `<` and raises, a vector whose length differs from
    * the codebook dimension raises before any distance is used. */
  def codebookArgminCell(v: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    val n = v.numElements()
    var best = -1
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cent = cents.getArray(c)
      if (cent.numElements() != n)
        throw new RuntimeException(
          "KMeans: vector length differs from the codebook dimension")
      var d = 0.0
      var j = 0
      while (j < n) {
        val t = v.getDouble(j) - cent.getDouble(j)
        d += t * t
        j += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    if (best < 0)
      throw new RuntimeException(
        "KMeans: vector with NaN has no comparable centroid distance")
    best
  }

  /** Column API: cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API: argmin-L2 codebook cell of a double-array column
    * against an array<array<double>> codebook column. */
  def codebookArgmin(v: Column, cents: Column): Column =
    bridge.column(CodebookArgminExpr(bridge.expression(v), bridge.expression(cents)))

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

case class CodebookArgminExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any, cents: Any): Any =
    VectorOps.codebookArgminCell(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.VectorOps.codebookArgminCell($v, $c)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookArgminExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "codebook_argmin"
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
