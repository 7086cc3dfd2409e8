package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the codebook
  * trainer for the IVF ANN path (queries/Vector.x_ann_ivf): that query
  * assigns corpus vectors to a fixed centroid set, and this produces a
  * trained centroid set with the same (cell, centroid) contract, so a
  * trained codebook drops into the probe plan unchanged.
  *
  * Shape per iteration (the classic scalable k-means layout, same as
  * any MapReduce/Spark formulation):
  *
  *  1. assignment — centroids ship to every task (constant-size build
  *     side), one pass over the corpus computes argmin squared-L2 per
  *     vector. No shuffle touches the corpus. Two value-identical
  *     spellings, picked by codebook size: small codebooks inline as a
  *     literal array (the whole fold stays in one codegen'd
  *     projection); past `literalMaxCells` total elements the literal
  *     tree would exceed codegen method limits and bloat analysis, so
  *     the assignment becomes a broadcast nested-loop join against the
  *     codebook DataFrame with a min_by argmin — the same plan the IVF
  *     query uses.
  *  2. update — per-dimension sums via posexplode → hash-agg on
  *     (cell, dim). The exploded stream is dim× the corpus but carries
  *     (int, int, double) rows, combines map-side, and collapses to
  *     k×dim rows — the ONLY exchange, input-bounded, never
  *     vector-wide.
  *  3. the k×dim aggregate collects to the driver (tiny by
  *     construction), forms the next broadcast.
  *
  * Malformed vectors fail LOUDLY: a NaN element or a dimension
  * mismatch makes every distance NaN/null, which both paths surface as
  * raise_error instead of a silent wrong (or out-of-range) cell.
  *
  * Empty cells keep their previous centroid (standard practice; no
  * re-seeding randomness). Initialization is the first k vectors by
  * ascending id — deterministic, so runs are reproducible at any
  * parallelism; callers wanting k-means++ can pass their own `init`.
  */
object KMeans {

  private val BadVectorMsg =
    "KMeans: vector with NaN or mismatched dimensions has no comparable centroid distance"

  /** @param data   (id, vector) rows; vector = array<float|double>
    * @param k      codebook size (used when `init` is empty)
    * @param iters  Lloyd iterations (fixed count — deterministic)
    * @param init   optional explicit initial centroids (cell → vector)
    * @param literalMaxCells k×dim threshold above which assignment
    *               switches from the inlined-literal codebook to the
    *               broadcast-join spelling (0 forces the join path)
    * @return (codebook, assignments): codebook (cell, centroid:
    *         array<double>); assignments (id, cell)
    */
  def fit(
      data: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int,
      init: Seq[Array[Double]] = Nil,
      literalMaxCells: Int = 4096): (DataFrame, DataFrame) = {
    val spark = data.sparkSession
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")

    val vecs = data.select(
      col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))

    var centroids: Array[Array[Double]] =
      if (init.nonEmpty) init.toArray
      else vecs.orderBy(col("id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "no initial centroids (empty input?)")
    val dim = centroids.head.length

    def codebookDf(): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        centroids.zipWithIndex.map { case (c, i) =>
          Row(i, c.toSeq)
        }.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("centroid",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false),
            nullable = false))))
    }

    // argmin squared-L2, ties to the smaller cell id: literal-codebook
    // fold for small k×dim, broadcast join past the codegen-size bound.
    def assigned(): DataFrame =
      if (centroids.length.toLong * dim <= literalMaxCells) {
        val centLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
        vecs
          .withColumn("_cents", centLit)
          // squared-L2 to every centroid, each computed once…
          .withColumn("_dists", expr(
            """transform(_cents, c ->
              |  aggregate(sequence(1, size(v)), CAST(0 AS DOUBLE),
              |    (s, j) -> s + (element_at(v, j) - element_at(c, j))
              |                * (element_at(v, j) - element_at(c, j))))""".stripMargin))
          // …then a linear argmin fold (strict <: ties keep the smaller
          // id). A NaN/null distance never wins a `<`, so a fully
          // malformed vector leaves the seed -1 → raise_error.
          .withColumn("_best", expr(
            """aggregate(sequence(0, size(_dists) - 1),
              |  named_struct('best', -1, 'd', CAST('Infinity' AS DOUBLE)),
              |  (acc, i) -> IF(element_at(_dists, i + 1) < acc.d,
              |                 named_struct('best', i, 'd', element_at(_dists, i + 1)),
              |                 acc),
              |  acc -> acc.best)""".stripMargin))
          .withColumn("cell",
            expr(s"IF(_best < 0, raise_error('$BadVectorMsg'), _best)"))
          .drop("_cents", "_dists", "_best")
      } else {
        // broadcast join: k rows per vector, argmin via struct-min —
        // (d2, cell) ordering ties to the smaller cell. A null d2
        // (dimension mismatch) sorts FIRST in a struct min and a NaN
        // sorts last, so both are caught explicitly below.
        vecs.crossJoin(broadcast(codebookDf()))
          .withColumn("_d2", expr(
            """aggregate(sequence(1, size(v)), CAST(0 AS DOUBLE),
              |  (s, j) -> s + (element_at(v, j) - element_at(centroid, j))
              |              * (element_at(v, j) - element_at(centroid, j)))""".stripMargin))
          .groupBy(col("id"))
          .agg(
            first(col("v")).as("v"),
            min(struct(col("_d2"), col("cell"))).as("_best"))
          .withColumn("cell", expr(
            s"IF(_best._d2 IS NULL OR isnan(_best._d2), raise_error('$BadVectorMsg'), _best.cell)"))
          .select(col("id"), col("v"), col("cell"))
      }

    for (_ <- 0 until iters) {
      // update: per-(cell, dim) sums — map-side combined, k×dim output
      val sums = assigned()
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { case Row(cell: Int, d: Int, sx: Double, n: Long) =>
        next(cell)(d) = sx / n
      }
      // empty cells keep their previous centroid
      centroids = next
    }

    (codebookDf(), assigned().select(col("id"), col("cell")))
  }
}
