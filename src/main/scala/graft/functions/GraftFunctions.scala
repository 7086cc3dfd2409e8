package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's native expressions, so the library
  * works as a first-class Spark extension: with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or an explicit
  * [[GraftFunctions.register]] on an existing session) every kernel —
  * text hashing, vector similarity, the interpolation price selector —
  * is callable from plain SQL text exactly like a built-in, with the
  * same codegen'd evaluation as the Column API.
  *
  * Parameters that shape the expression (shingle width, minhash count,
  * LSH bits, polyhash multiplier) must be integer literals — they are
  * baked into the generated code, mirroring how the Column API takes
  * them as Scala Ints.
  */
object GraftFunctions {

  private def intLit(args: Seq[Expression], i: Int, fn: String): Int =
    args(i) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INT literal, got $other")
    }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  /** (name, builder) for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash_array" -> { args =>
      arity(args, 2, "poly_hash_array")
      PolyHashArrayExpr(args.head, intLit(args, 1, "poly_hash_array"))
    },
    "shingle_set" -> { args =>
      arity(args, 2, "shingle_set")
      ShinglesExpr(args.head, intLit(args, 1, "shingle_set"))
    },
    "jaccard_sim" -> { args =>
      arity(args, 2, "jaccard_sim")
      JaccardExpr(args(0), args(1))
    },
    "minhashes" -> { args =>
      arity(args, 2, "minhashes")
      MinHashesExpr(args.head, intLit(args, 1, "minhashes"))
    },
    "simhash60" -> { args =>
      arity(args, 1, "simhash60")
      SimHash60Expr(args.head)
    },
    "cosine_sim" -> { args =>
      arity(args, 2, "cosine_sim")
      CosineSimExpr(args(0), args(1))
    },
    "hyperplane_sig" -> { args =>
      arity(args, 2, "hyperplane_sig")
      HyperplaneSigExpr(args.head, intLit(args, 1, "hyperplane_sig"))
    },
    "sorted_intersect_count" -> { args =>
      arity(args, 2, "sorted_intersect_count")
      SortedIntersectCountExpr(args(0), args(1))
    },
    "nearest_two_price" -> { args =>
      arity(args, 10, "nearest_two_price")
      NearestTwoPriceExpr(args)
    },
    "linear_interpolate" -> { args =>
      arity(args, 3, "linear_interpolate")
      LinearInterpolateRows(args(0), args(1), args(2))
    }
  )

  def identifiers: Seq[FunctionIdentifier] =
    all.map { case (name, _) => FunctionIdentifier(name) }

  /** Register every function on an already-running session (the
    * programmatic alternative to the spark.sql.extensions conf). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      bridge.registerFunction(spark, FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), builder)
    }
}
