package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hash kernels.
  *
  * The same constructions are expressible with higher-order built-ins
  * (`aggregate`/`transform` over the token array — see the DuckDB oracle
  * SQL in graft.queries.Text, which stays in that form), but Spark
  * evaluates higher-order lambdas interpreted, one closure dispatch per
  * token × bit. These expressions keep the per-document loop in compiled
  * JVM code and participate in whole-stage codegen through a static
  * call, which is the preference order the engine follows everywhere:
  * built-in > native Expression > UDF.
  *
  * Semantics (shared with the oracle formulation):
  *   polyhash_m(w)  = fold over code points: (acc·m + cp) mod (10⁹+7)
  *   simhash60(ts)  = bits 0..29: sign-votes over polyhash₃₁ bits,
  *                    bits 30..59: sign-votes over polyhash₁₃₁ bits
  */
object TextHash {
  final val Mod = 1000000007L

  /** Polynomial rolling hash of one token over Unicode code points —
    * matches `aggregate(sequence(1,length(w)), 0L, (acc,i) ->
    * (acc*m + ascii(substr(w,i,1))) % 1000000007)`: Spark substr/length
    * operate on code points and ascii() yields the leading code point. */
  def polyHash(w: UTF8String, mult: Long): Long = {
    if (w == null) return 0L
    val s = w.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def polyHashArray(tokens: ArrayData, mult: Long): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = polyHash(tokens.getUTF8String(i), mult)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit simhash in one pass over the token array. */
  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val h1 = polyHash(w, 31L)
      val h2 = polyHash(w, 131L)
      var j = 0
      while (j < 30) {
        votes(j) += (if (((h1 >> j) & 1L) == 1L) 1 else -1)
        votes(30 + j) += (if (((h2 >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** k MinHash signatures via a universal hash family over the polyhash:
    * h_j(s) = ((2j+3)·polyhash₃₁(s) + (5j+7)) mod (10⁹+7), minimum taken
    * per j across the shingle set. One char-level pass per shingle +
    * k integer mixes — ~100× cheaper than k independent md5 minhashes
    * for the same LSH guarantees. Empty input → null (mirrors DuckDB
    * list_min(empty) = NULL). */
  def minHashes(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = polyHash(shingles.getUTF8String(i), 31L)
      var j = 0
      while (j < k) {
        val hj = ((2 * j + 3) * h + (5 * j + 7)) % Mod
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: per-token polynomial hashes of a tokens array. */
  def polyHashes(tokens: Column, mult: Int): Column =
    bridge.column(PolyHashArrayExpr(bridge.expression(tokens), mult))

  /** Distinct n-token shingles joined with spaces — semantics of
    * array_distinct(transform(sequence(1, size(t)-n+1), i ->
    * concat_ws(' ', slice(t, i, n)))) in one compiled pass (keeps first
    * occurrence order; every consumer is set-semantics anyway). Returns
    * an empty array below n tokens, where the sequence() form would
    * generate a descending range. */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Any](0))
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]((cnt - n + 1) * 2)
    var i = 0
    while (i <= cnt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Exact Jaccard of two distinct-element string arrays — semantics of
    * size(array_intersect(a,b)) / size(array_union(a,b)) but one
    * hash-set pass in compiled code instead of two interpreted
    * higher-order builds per candidate pair. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (set.contains(b.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Column API: k-permutation MinHash signature of a shingles array. */
  def minhash(shingles: Column, k: Int): Column =
    bridge.column(MinHashesExpr(bridge.expression(shingles), k))

  /** Column API: exact Jaccard of two distinct-element string arrays. */
  def jaccardSim(a: Column, b: Column): Column =
    bridge.column(JaccardExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API: distinct n-token shingles of a tokens array. */
  def shingleSet(tokens: Column, n: Int = 3): Column =
    bridge.column(ShinglesExpr(bridge.expression(tokens), n))

  /** Column API: 60-bit simhash of a tokens array. */
  def simhash(tokens: Column): Column =
    bridge.column(SimHash60Expr(bridge.expression(tokens)))
}

case class PolyHashArrayExpr(child: Expression, mult: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.polyHashArray(input.asInstanceOf[ArrayData], mult.toLong)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.polyHashArray($c, ${mult}L)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashArrayExpr =
    copy(child = newChild)
  override def prettyName: String = "poly_hash_array"
}

case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextHash.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sim"
}

case class MinHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set → null
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.TextHash.minHashes($c, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
    code
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "minhashes"
}

case class SimHash60Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}
