package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of near-duplicate detection: LSH/minhash emits similar PAIRS
  * (SURVEY.md §7.5), but a curation pipeline needs whole duplicate
  * GROUPS (pick one canonical document per group, drop the rest).
  * Pairs are edges; the duplicate groups are the connected components.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round, a node's label becomes the
  * minimum of its own and its neighbors' labels. Labels are monotone
  * non-increasing and reach the component-minimum id in O(diameter)
  * rounds — and near-duplicate clusters are dense (diameter is tiny:
  * members all resemble one another), so 2–3 rounds is typical.
  *
  * Scale: each round is one shuffled join edges⋈labels plus a
  * hash aggregation — no driver-side data beyond the one-row
  * convergence probe. `localCheckpoint` truncates the lineage every
  * round, bounding plan growth over iterations (the classic iterative-
  * Spark trap). For billion-edge graphs swap in the alternating
  * large/small-star variant (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — same join-round shape, fewer
  * rounds on high-diameter graphs; the API is the contract here.
  */
object Components {

  /** @param edges DataFrame with two long columns `src`, `dst`
    *              (undirected; direction and duplicates don't matter)
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // symmetrize once: propagation below only follows src→dst
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(neighborMin.withColumnRenamed("node", "n2"),
          col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint()
      val changed = next
        .join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") =!= col("prev"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels.withColumnRenamed("label", "component")
  }
}
