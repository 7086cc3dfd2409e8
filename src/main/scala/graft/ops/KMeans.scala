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
  *  1. assignment — centroids broadcast (k×dim doubles, constant-size
  *     build side), one map pass over the corpus computes argmin
  *     squared-L2 per vector. No shuffle touches the corpus.
  *  2. update — per-dimension sums via posexplode → hash-agg on
  *     (cell, dim). The exploded stream is dim× the corpus but carries
  *     (int, int, double) rows, combines map-side, and collapses to
  *     k×dim rows — the ONLY exchange, input-bounded, never
  *     vector-wide.
  *  3. the k×dim aggregate collects to the driver (tiny by
  *     construction), forms the next broadcast.
  *
  * Empty cells keep their previous centroid (standard practice; no
  * re-seeding randomness). Initialization is the first k vectors by
  * ascending id — deterministic, so runs are reproducible at any
  * parallelism; callers wanting k-means++ can pass their own `init`.
  */
object KMeans {

  /** @param data   (id, vector) rows; vector = array<float|double>
    * @param k      codebook size (used when `init` is empty)
    * @param iters  Lloyd iterations (fixed count — deterministic)
    * @param init   optional explicit initial centroids (cell → vector)
    * @return (codebook, assignments): codebook (cell, centroid:
    *         array<double>); assignments (id, cell)
    */
  def fit(
      data: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int,
      init: Seq[Array[Double]] = Nil): (DataFrame, DataFrame) = {
    val spark = data.sparkSession
    require(k > 0 && iters >= 0, "k and iters must be positive")

    val vecs = data.select(
      col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))

    var centroids: Array[Array[Double]] =
      if (init.nonEmpty) init.toArray
      else vecs.orderBy(col("id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "no initial centroids (empty input?)")
    val dim = centroids.head.length

    // argmin squared-L2 against the broadcast codebook, ties to the
    // smaller cell id. Expressed as one SQL fold over the centroid
    // array literal so the whole assignment stays in codegen.
    def assigned(): DataFrame = {
      val centLit = array(centroids.map(c =>
        array(c.map(lit): _*)): _*)
      vecs
        .withColumn("_cents", centLit)
        // squared-L2 to every centroid, each computed once…
        .withColumn("_dists", expr(
          """transform(_cents, c ->
            |  aggregate(sequence(1, size(v)), CAST(0 AS DOUBLE),
            |    (s, j) -> s + (element_at(v, j) - element_at(c, j))
            |                * (element_at(v, j) - element_at(c, j))))""".stripMargin))
        // …then a linear argmin fold (strict <: ties keep the smaller id)
        .withColumn("cell", expr(
          """aggregate(sequence(0, size(_dists) - 1),
            |  named_struct('best', -1, 'd', CAST('Infinity' AS DOUBLE)),
            |  (acc, i) -> IF(element_at(_dists, i + 1) < acc.d,
            |                 named_struct('best', i, 'd', element_at(_dists, i + 1)),
            |                 acc),
            |  acc -> acc.best)""".stripMargin))
        .drop("_cents", "_dists")
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

    import scala.jdk.CollectionConverters._
    val codebook = spark.createDataFrame(
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
    (codebook, assigned().select(col("id"), col("cell")))
  }
}
