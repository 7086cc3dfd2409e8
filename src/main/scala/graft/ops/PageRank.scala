package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact integer arithmetic — link-mass quality scoring for
  * corpus curation (rank "original" pages by how much syndicated mass
  * points at them), in a form any engine reproduces bit-for-bit.
  *
  * All rank mass lives in integer units of `scale` (default 10^12):
  *
  *   r₀(v)    = scale div n
  *   rₖ₊₁(v)  = (3·scale) div (20·n)  +  (17 · Σ_{u→v} rₖ(u) div d(u)) div 20
  *
  * i.e. the standard damping-0.85 update with every product/quotient
  * replaced by its floor — deterministic at any parallelism and
  * identical across engines, where a floating formulation diverges in
  * the ulps the moment two engines sum contributions in different
  * orders. Dangling mass (out-degree-0 nodes) is dropped, the common
  * simplified form: ranks are compared, not summed to 1.
  *
  * Scale design: the same iterative shape as [[Components]] — per
  * iteration one edge-keyed join (edges partition by src; the rank
  * table is node-grain, orders of magnitude smaller) and one dst-keyed
  * aggregation with map-side combine; `localCheckpoint` cuts lineage
  * each round so plan depth stays constant over any iteration count.
  * Edges and degrees are joined once, outside the loop.
  */
object PageRank {

  /** @param edges directed (src, dst) — duplicates and null endpoints
    *              dropped; nodes are the endpoints seen in edges
    * @param iters fixed iteration count (a handful suffices for
    *              curation-grade ranking; convergence testing would
    *              compare rank vectors across rounds like Components)
    * @param localEdgeThreshold edge count at or below which the
    *              driver-local path runs; 0 forces the distributed
    *              loop, negative (default) derives the threshold from
    *              the driver heap like [[Components]]
    * @return (node, pr) — rank in integer `scale` units
    */
  def pageRank(
      edges: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L,
      localEdgeThreshold: Int = -1): DataFrame =
    pageRankImpl(edges, iters, scale, localEdgeThreshold)._1

  /** Same as [[pageRank]] but reports which path ran ("local" |
    * "distributed") so specs can pin the cutover. */
  private[graft] def pageRankImpl(
      edges: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L,
      localEdgeThreshold: Int = -1): (DataFrame, String) = {
    require(iters >= 0, "iters must be non-negative")
    val spark = edges.sparkSession
    import spark.implicits._
    val clean = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop(Seq("src", "dst"))

    // Near-dup pair graphs are corpus-tiny (only colliding documents
    // band together), yet the distributed loop pays 5+ eagerly
    // materialized jobs (checkpoint per round) — at sf0.1 that fixed
    // overhead was 25× the actual arithmetic. Same bytes-aware cutover
    // as Components: collect-at-most-threshold+1, run the identical
    // integer recurrence on the driver (bit-equal by construction —
    // every operation is a floor div/mult on longs, no float order
    // sensitivity), parallelize the result. A web-scale link graph
    // overflows the probe and takes the distributed loop unchanged.
    val threshold =
      if (localEdgeThreshold >= 0) localEdgeThreshold
      else Components.resolvedLocalEdgeThreshold(spark)
    if (threshold > 0) {
      val probe = clean.limit(threshold + 1).as[(Long, Long)].collect()
      if (probe.length <= threshold)
        return (pageRankLocal(spark, probe, iters, scale), "local")
    }
    (pageRankDistributed(clean, iters, scale), "distributed")
  }

  /** Driver-local evaluation of the identical integer recurrence. */
  private def pageRankLocal(
      spark: org.apache.spark.sql.SparkSession,
      rawEdges: Array[(Long, Long)], iters: Int, scale: Long): DataFrame = {
    import spark.implicits._
    val edges = rawEdges.distinct
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2))
      .toArray.distinct.sorted
    require(nodes.nonEmpty, "pageRank on an empty edge set")
    val n = nodes.length
    val idx = nodes.zipWithIndex.toMap
    val deg = new Array[Long](n)
    edges.foreach { case (s, _) => deg(idx(s)) += 1L }
    val base = (3L * scale) / (20L * n)
    var r = Array.fill(n)(scale / n)
    var it = 0
    while (it < iters) {
      val contrib = new Array[Long](n)
      edges.foreach { case (s, d) =>
        val si = idx(s)
        contrib(idx(d)) += r(si) / deg(si)
      }
      r = Array.tabulate(n)(i => base + (17L * contrib(i)) / 20L)
      it += 1
    }
    spark.createDataset(nodes.indices.map(i => (nodes(i), r(i))))
      .toDF("node", "r")
  }

  private def pageRankDistributed(
      clean: DataFrame, iters: Int, scale: Long): DataFrame = {
    val e = clean
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // node count is a metadata-sized driver probe, like Components'
    // convergence checks — never row data
    val n = nodes.count()
    require(n > 0, "pageRank on an empty edge set")
    val base = (3L * scale) / (20L * n)
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .localCheckpoint()

    var r = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(r, withDeg("src") === r("node"))
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      r = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("r"))
        .localCheckpoint()
    }
    r
  }
}
