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
  *  1. assignment — the codebook reaches every row as ONE array column
  *     and a per-row argmin fold computes the cell. No shuffle ever
  *     touches the corpus, on either spelling: small codebooks inline
  *     the array as a literal (the whole fold is one codegen'd
  *     projection, no join at all); past `literalMaxCells` total
  *     elements — where the literal expression tree would exceed
  *     codegen method limits and bloat analysis — the same array
  *     arrives via a broadcast single-row cross join (a 1-row build
  *     side: effectively a map stage). The fold itself is shared, so
  *     the two spellings are identical by construction — including on
  *     duplicate ids, which are independent rows on both.
  *  2. update — per-dimension sums via posexplode → hash-agg on
  *     (cell, dim). The exploded stream is dim× the corpus but carries
  *     (int, int, double) rows, combines map-side, and collapses to
  *     k×dim rows — the ONLY exchange, input-bounded, never
  *     vector-wide.
  *  3. the k×dim aggregate collects to the driver (tiny by
  *     construction), forms the next codebook.
  *
  * Malformed vectors fail LOUDLY: a NaN element leaves the argmin at
  * its -1 seed (NaN never wins a `<`), and a vector whose length
  * differs from the codebook dimension is rejected by an explicit size
  * check — both surface as raise_error instead of a silent wrong (or
  * prefix-distance) cell.
  *
  * Empty cells keep their previous centroid (standard practice; no
  * re-seeding randomness). Initialization is the first k vectors by
  * ascending id — deterministic, so runs are reproducible at any
  * parallelism; callers wanting k-means++ can pass their own `init`.
  */
object KMeans {

  // the NaN / dimension-mismatch failure messages live with the
  // assignment kernel: graft.functions.VectorOps.codebookArgminCell

  /** @param data   (id, vector) rows; vector = array<float|double>
    * @param k      codebook size (used when `init` is empty)
    * @param iters  Lloyd iterations (fixed count — deterministic)
    * @param init   optional explicit initial centroids (cell → vector)
    * @param literalMaxCells k×dim threshold above which the codebook
    *               array is attached via a broadcast 1-row join instead
    *               of an inlined literal (0 forces the broadcast form)
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

    // materialized ONCE, deliberately: the assignment fold below reads
    // `v` via element_at O(k x dim) times per row, and higher-order
    // folds run interpreted (no codegen) — if the caller's vector
    // column is itself a computed projection (e.g. a fixed-point
    // quantization transform), Catalyst's CollapseProject would inline
    // that computation INTO every element access, turning a linear pass
    // into k x dim re-evaluations per row (observed: 500 rows x 16
    // cells stuck for minutes on inlined round()). The checkpoint also
    // pays the upstream plan once instead of iters+1 times.
    val vecs = data.select(
      col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
      .localCheckpoint(true)

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

    /** The codebook as one array<array<double>> row, for the broadcast
      * spelling of the assignment. */
    def codebookRow(): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        Seq(Row(centroids.map(_.toSeq).toSeq)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_cents",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, containsNull = false),
              containsNull = false),
            nullable = false))))
    }

    // Per-row argmin squared-L2 over the `_cents` column, ties to the
    // smaller cell id — shared by both codebook-attachment spellings.
    // The loop is the NATIVE codegen expression
    // [[graft.functions.VectorOps.codebookArgmin]] (identical
    // arithmetic and failure contract — NaN raises BadVectorMsg, a
    // dimension mismatch BadDimMsg): the previous higher-order-function
    // spelling ran k×dim interpreted lambda dispatches per row, the
    // dominant cost of every Lloyd pass (optimization guide §4:
    // keep the hot loop in compiled code).
    def withCell(withCents: DataFrame): DataFrame =
      withCents
        .withColumn("cell",
          graft.functions.VectorOps.codebookArgmin(
            org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.col("_cents")))
        .drop("_cents")

    def assigned(): DataFrame =
      if (centroids.length.toLong * dim <= literalMaxCells)
        withCell(vecs.withColumn("_cents",
          array(centroids.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)))
      else
        withCell(vecs.crossJoin(broadcast(codebookRow())))

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
