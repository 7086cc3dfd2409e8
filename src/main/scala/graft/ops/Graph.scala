package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle census of an undirected simple graph — the third
  * graph operator next to [[Components]] (connectivity) and
  * [[PageRank]] (centrality): triangles measure local closure
  * (community structure, spam/bot subgraphs in a link corpus).
  *
  * Scale design: the naive 3-way edge self-join explodes on hubs (a
  * degree-d node contributes C(d,2) wedges). The standard fix — orient
  * every edge from its lower-(degree, id) endpoint to its higher one
  * (Suri & Vassilvitskii, WWW'11 "Counting triangles and the curse of
  * the last reducer") — bounds every out-degree by O(√E), so the wedge
  * stage is Σ C(outdeg,2) ≤ O(E^1.5) TOTAL, spread evenly: the hub's
  * C(d,2) wedges vanish because a hub (maximal key) has out-degree 0.
  * Both shuffles are edge-sized and keyed (src, then (p,q)); nothing is
  * ever node-quadratic. Orientation compares native (deg, id) STRUCTS —
  * no key packing, so 64-bit node ids need no range assumption.
  *
  * Two physical strategies over the same oriented graph, chosen by
  * measured edge count (the [[Components]] bytes-aware-cutover
  * discipline):
  *  - INTERSECT (edges ≤ [[IntersectMaxEdges]]): per oriented edge
  *    (u,v), |out(u) ∩ out(v)| — each triangle counted exactly once at
  *    its (min,mid) edge. The out-adjacency table is edge-sized and
  *    BROADCAST, so the whole count is one map-side pass over edges:
  *    no wedge rows ever materialize, no third shuffle. At fixture
  *    scale this removed the wedge exchange that dominated the query
  *    (7.8s → see bench).
  *  - WEDGE JOIN (larger): materialize oriented wedges and semi-join
  *    the closing edge — the shuffle formulation that needs no
  *    broadcastable adjacency, i.e. the 100 TB path.
  * Both paths count the same apex wedges; the spec asserts equality on
  * random graphs.
  */
object Graph {

  /** Default cutover: adjacency ≈ 8 B/edge ⇒ ~32 MB broadcast at 4M
    * edges. Session-overridable via `spark.graft.graph.intersectMaxEdges`. */
  val IntersectMaxEdges = 4000000L

  /** One-row census: node/edge/wedge/triangle counts plus the global
    * clustering coefficient 3·T / wedges. Input edge list may be
    * directed, duplicated, or contain self-loops — it is canonicalized
    * (u<v, distinct, loops dropped) first, so callers can feed raw
    * co-occurrence pairs. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val conf = edges.sparkSession.conf
    triangleStats(edges,
      conf.getOption("spark.graft.graph.intersectMaxEdges")
        .map(_.toLong).getOrElse(IntersectMaxEdges))
  }

  def triangleStats(edges: DataFrame, intersectMaxEdges: Long): DataFrame = {
    val e0 = edges.toDF("a", "b")
    // materialized: consumed by the edge count, degree pass, and the
    // orientation join — without the cut the canonicalization +
    // distinct would replan/rerun per consumer
    val und = PlanCache.materialized(e0
      .select(least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    val nEdges = und.count() // cutover decision; reused in the output row

    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))

    // total-order key (deg, id): acyclic orientation lower → higher
    val dk = deg.select(col("n"), struct(col("deg"), col("n")).as("k"))
    val oriented = und
      .join(dk.select(col("n").as("u"), col("k").as("ku")), "u")
      .join(dk.select(col("n").as("v"), col("k").as("kv")), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))

    val nTri =
      if (nEdges <= intersectMaxEdges) {
        // broadcast SORTED out-adjacency; |out(u) ∩ out(v)| per edge via
        // the allocation-free two-pointer kernel (fn:ArrayOps — sorting
        // once per adjacency row amortizes over every edge probing it;
        // array_intersect would build a hash set + result array per
        // EDGE, measured as the probe stage's hot loop)
        val adj = oriented.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        // INNER join on dst: an edge whose head has no out-neighbors
        // intersects to 0 and cannot contribute — dropping it is
        // value-identical and avoids a nullable-element coalesce the
        // kernel (correctly) rejects at analysis
        oriented
          .join(broadcast(adj.select(col("src").as("p_"), col("nbrs").as("np"))),
            col("src") === col("p_"))
          .join(broadcast(adj.select(col("src").as("q_"), col("nbrs").as("nq"))),
            col("dst") === col("q_"))
          .select(graft.functions.ArrayOps.intersectCount(
            col("np"), col("nq")).as("t"))
          .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
      } else {
        // wedges at the triangle's minimum-key apex: both out-neighbors
        // have key > key(src); canonical order p<q by key makes the
        // closing edge exactly p→q in the oriented set (no direction
        // disjunction).
        val wedges = oriented.as("x").join(oriented.as("y"),
            col("x.src") === col("y.src") && col("x.kdst") < col("y.kdst"))
          .select(col("x.dst").as("p"), col("y.dst").as("q"))
        wedges
          .join(oriented.select(col("src").as("p"), col("dst").as("q")), Seq("p", "q"))
          .agg(count(lit(1)).as("n_triangles"))
      }

    val nodesWedges = deg.agg(
      count(lit(1)).as("n_nodes"),
      // open wedges of the UNORIENTED graph: Σ C(deg, 2).
      // `div` keeps the whole sum in long arithmetic — `/` on longs is
      // double division, exact only below 2^53, and a ~1e8-degree hub
      // would silently round in a census documented as exact
      sum(expr("deg * (deg - 1L) div 2")).as("n_wedges"))

    nodesWedges.crossJoin(nTri)
      .select(col("n_nodes"), lit(nEdges).as("n_edges"),
        col("n_wedges").cast("long").as("n_wedges"), col("n_triangles"),
        // a wedge-free graph (perfect matching) has an undefined
        // clustering coefficient: NULL, not double 0/0 = NaN
        when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges")).as("global_cc"))
  }

  /** Bounded-round k-core peel: `rounds` iterations of {degree pass →
    * drop nodes with degree < k → restrict edges to survivors},
    * returning each surviving node with its degree in the final
    * subgraph. With enough rounds this converges to the exact k-core;
    * a FIXED round count keeps the operator a finite relational
    * expression (the x_pagerank discipline — the oracle unrolls the
    * identical rounds), and the returned frame is exact for the
    * bounded peel either way.
    *
    * Scale shape per round: one edge-sized combine-enabled degree
    * aggregate + two semi-joins on the node-sized survivor set; the
    * edge frame is re-materialized each round ([[PlanCache]]) so
    * lineage stays flat — the [[Components]] iteration pattern. Total
    * work is rounds × O(E); no stage is ever node-quadratic. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges.toDF("a", "b")
    var e = PlanCache.materialized(e0
      .select(least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      // the degree frame is materialized so ONE job computes it and the
      // convergence probe rides that job as a global min — r7 ran the
      // probe as its own `limit(1).count()` over the lazy aggregate,
      // which re-ran the degree pass (a whole extra edge-sized job per
      // round, the bench's slowest query's top cost)
      val deg = PlanCache.materialized(e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg")))
      // convergence probe: once no node falls below k, every further
      // round is the identity — skipping them is value-identical to
      // running the full bound (the oracle unrolls all of them; an
      // identity round maps its CTEs through unchanged). An empty
      // survivor set (min = NULL) is likewise a fixpoint.
      // one head() per round carries BOTH the convergence probe and the
      // survivor count (sizes the broadcast decision below) — no extra job
      val probe = deg.agg(min(col("deg")),
        sum(when(col("deg") >= k, 1L).otherwise(0L))).head()
      if (probe.isNullAt(0) || probe.getLong(0) >= k) converged = true
      else {
        // keep is node-grain (usually orders of magnitude under the
        // edge frame) — broadcast EXPLICITLY when it fits: the
        // materialized deg is a LogicalRDD leaf whose size statistics
        // are unknown, so the planner otherwise falls back to
        // sort-merge and shuffles the full edge frame TWICE per round.
        // On near-chain graphs (nodes ≈ edges) the survivor set is NOT
        // small; forcing the broadcast there would OOM where sort-merge
        // degrades gracefully, so the force is guarded by an explicit
        // size estimate (~16 B per long row + overhead) against the
        // session's own broadcast threshold.
        val survivors = probe.getLong(1)
        // conf may be a plain long ("-1" disables broadcast) or a byte
        // string ("10MB") — accept both
        val thresholdB = e.sparkSession.conf
          .getOption("spark.sql.autoBroadcastJoinThreshold")
          .map(v => scala.util.Try(v.toLong).getOrElse(
            scala.util.Try(org.apache.spark.network.util.JavaUtils
              .byteStringAsBytes(v)).getOrElse(-1L)))
          .getOrElse(10L * 1024 * 1024)
        val keep0 = deg.filter(col("deg") >= k).select("n")
        val keep = if (survivors * 32L <= thresholdB) broadcast(keep0) else keep0
        e = PlanCache.materialized(e
          .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
          .select("u", "v"))
        r += 1
      }
    }
    e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
  }
}
