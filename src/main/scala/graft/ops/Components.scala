package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of near-duplicate detection: LSH/minhash emits similar PAIRS
  * (SURVEY.md §7.5), but a curation pipeline needs whole duplicate
  * GROUPS (pick one canonical document per group, drop the rest).
  * Pairs are edges; the duplicate groups are the connected components.
  *
  * Two execution paths behind one contract, picked by edge count:
  *
  *  - **Small graphs** (≤ `localEdgeThreshold` edges): union-find on the
  *    driver. Near-dup edge lists are corpus-tiny by construction — LSH
  *    banding emits pairs only for colliding documents, a vanishing
  *    fraction of a deduplicated corpus — so even a 100 TB run's pair
  *    list usually fits in driver memory. The cutover is BYTES-aware:
  *    by default it spends at most 1/16 of the driver's max heap on
  *    collected edges (at a pessimistic 96 B per boxed edge tuple),
  *    overridable via [[LocalEdgeBudgetBytesKey]] — a fixed edge COUNT
  *    would OOM a small driver and waste a big one.
  *    One Spark job (an early-stopping `limit` collect), zero shuffles,
  *    zero iterations — versus 3+ scheduled rounds of join+agg jobs
  *    whose fixed overhead dwarfs the work at this size.
  *
  *  - **Large graphs**: iterative min-label propagation. Every node
  *    starts labeled with its own id; each round, a node's label becomes
  *    the minimum of its own and its neighbors' labels. Labels are
  *    monotone non-increasing and reach the component-minimum id in
  *    O(diameter) rounds — and near-duplicate clusters are dense
  *    (diameter is tiny: members all resemble one another), so 2–3
  *    rounds is typical. Each round is one shuffled join edges⋈labels,
  *    a hash aggregation, and a lineage-truncating `localCheckpoint`
  *    (the classic iterative-Spark trap); convergence is read off the
  *    label SUM — monotonicity makes "sum unchanged ⟺ no label moved" —
  *    so the probe is a partial-aggregable scalar, not another join.
  *
  *  - **High-diameter graphs**: [[connectedComponentsStar]] — the
  *    alternating large-star/small-star contraction (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC'14), which
  *    converges in O(log² n) rounds regardless of diameter where
  *    one-hop propagation needs O(diameter). Near-dup clusters are
  *    dense so the default loop wins there; star contraction is the
  *    right tool when components are path-like (e.g. temporal chains:
  *    A≈B≈C where A and C aren't directly similar).
  *
  * All paths return identical labelings (ComponentsSpec runs its
  * union-find differential against each).
  */
object Components {

  /** Session conf key bounding the DRIVER HEAP the union-find path may
    * spend on collected edges, in bytes. The edge-count threshold is
    * derived from it, so the cutover scales with the memory actually
    * available instead of a fixed 2²¹ count that could overwhelm a
    * small driver or waste a big one. */
  val LocalEdgeBudgetBytesKey = "spark.graft.components.localEdgeBudgetBytes"

  /** On-heap cost of one collected edge: a boxed (Long,Long) Tuple2
    * (~56 B) plus union-find hash-map entry slack. Deliberately
    * pessimistic — underestimating here is what causes driver OOMs. */
  private val EdgeHeapBytes = 96L

  /** Edge-count cutover derived from the byte budget: conf value if
    * set, else 1/16 of the driver's max heap. Capped at 2²⁴ edges —
    * past that the distributed loop's fixed overhead is already
    * amortized, so there is no reason to strain the driver. */
  private[graft] def resolvedLocalEdgeThreshold(
      spark: org.apache.spark.sql.SparkSession): Int = {
    val budgetBytes = spark.conf
      .getOption(LocalEdgeBudgetBytesKey)
      .map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory() / 16)
    math.min(math.max(budgetBytes / EdgeHeapBytes, 0L), (1 << 24).toLong).toInt
  }

  /** @param edges DataFrame with two long columns `src`, `dst`
    *              (undirected; direction and duplicates don't matter)
    * @param localEdgeThreshold edge count at or below which the
    *              driver-side union-find path runs; 0 forces the
    *              distributed loop, negative (the default) derives the
    *              threshold from [[LocalEdgeBudgetBytesKey]] / driver heap
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame, maxIter: Int = 50,
      localEdgeThreshold: Int = -1): DataFrame =
    connectedComponentsImpl(edges, maxIter, localEdgeThreshold)._1

  /** Same as [[connectedComponents]] but also reports which path ran
    * ("local" | "distributed") so specs can pin the cutover boundary. */
  private[graft] def connectedComponentsImpl(
      edges: DataFrame, maxIter: Int = 50,
      localEdgeThreshold: Int = -1): (DataFrame, String) = {
    val spark = edges.sparkSession
    import spark.implicits._

    val threshold =
      if (localEdgeThreshold >= 0) localEdgeThreshold
      else resolvedLocalEdgeThreshold(spark)

    // Null endpoints are dropped up front on BOTH paths: a null id is
    // not a node, and leaving them in would make the paths diverge
    // (union-find would NPE, propagation would silently never join).
    val clean = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop(Seq("src", "dst"))

    if (threshold > 0) {
      // early-stopping probe: collects at most threshold+1 rows, so a
      // billion-edge graph pays one truncated scan, not a full collect
      val probe = clean
        .limit(threshold + 1)
        .as[(Long, Long)].collect()
      if (probe.length <= threshold)
        return (unionFindLocal(spark, probe), "local")
    }
    (propagateDistributed(clean, maxIter), "distributed")
  }

  /** Path-compressed union-find with union-by-min: the component root is
    * always the minimum id seen, so labels equal the distributed path's
    * min-label fixpoint. */
  private def unionFindLocal(
      spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      // path compression
      var c = x
      while (c != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val labeled = parent.keySet().toArray(Array.empty[java.lang.Long])
      .map(k => (k.toLong, find(k)))
    spark.createDataset(labeled.toSeq).toDF("node", "component")
  }

  private def propagateDistributed(edges: DataFrame, maxIter: Int): DataFrame = {
    // symmetrize once: propagation below only follows src→dst
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    // decimal(38,0) sum: overflow-proof for any id range × node count.
    // A null sum over a NON-empty frame can only be overflow (non-ANSI
    // mode nulls instead of throwing) — fail loudly rather than letting
    // two consecutive nulls read as "sum unchanged ⟹ converged".
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(
        sum(col("label").cast("decimal(38,0)")), count(lit(1))).head()
      val v = row.get(0)
      if (v == null) {
        require(row.getLong(1) == 0L,
          "label sum overflowed decimal(38,0) — convergence probe is invalid")
        java.math.BigDecimal.ZERO
      } else v.asInstanceOf[java.math.BigDecimal]
    }

    var curSum = labelSum(labels)
    var round = 0
    var converged = labels.isEmpty
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
      val nextSum = labelSum(next)
      labels = next
      // labels are monotone non-increasing per node, so an unchanged sum
      // means no label moved anywhere
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels.withColumnRenamed("label", "component")
  }

  /** Alternating large-star / small-star contraction (Kiveris et al.,
    * SoCC'14) — O(log² n) rounds on ANY graph shape, where the one-hop
    * propagation loop needs O(diameter) rounds. Same contract as
    * [[connectedComponents]]: (node, component = min reachable id).
    *
    * Each round is two half-steps over the (deduplicated) edge set:
    *
    *  - large-star: per node u over its full neighborhood Γ(u),
    *    m = min(Γ(u) ∪ {u}); every STRICTLY LARGER neighbor v > u is
    *    re-pointed at m — emit (v, m).
    *  - small-star: edges directed larger→smaller (u = max endpoint);
    *    per node u, m = min(N(u) ∪ {u}) over its smaller neighbors;
    *    u and every neighbor re-point at m.
    *
    * Both half-steps preserve connectivity and strictly shrink the
    * potential Σ(v − root(v)); the fixpoint is a forest of stars whose
    * centers are the component minima. Per half-step the plan is ONE
    * hash shuffle on the node id (a min-window over the neighborhood,
    * no sort — unbounded frame), a projection, and a distinct; a
    * `localCheckpoint` per round truncates lineage exactly like the
    * propagation loop. Convergence = the canonical edge set's
    * (count, xor-of-hashes, sum-of-hashes) fingerprint is unchanged by
    * a full round — set equality up to a 128-bit-ish collision, checked
    * on the post-distinct canonical form so duplicate emissions can't
    * mask a change.
    *
    * Skew note (the reason this exists at 100 TB): a hub node's
    * neighborhood lands in one window partition, but large-star only
    * RE-POINTS the hub's larger neighbors — after one round those
    * neighbors attach to the min directly and the hub's degree
    * collapses; the paper bounds total work at O(m log n). No
    * per-round state outlives the round.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .na.drop(Seq("src", "dst"))

    // canonical undirected form, self-loops dropped (they carry no
    // connectivity and would survive every contraction)
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    // overflow-safe set fingerprint: xor never overflows, the sum runs
    // in decimal(38,0) (ANSI mode would throw on a long sum of
    // full-range hashes)
    def fingerprint(df: DataFrame): (Long, Long, Any) = {
      val h = xxhash64(col("u"), col("v"))
      val r = df.agg(
        count(lit(1)),
        coalesce(bit_xor(h), lit(0L)),
        sum(h.cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getLong(1), r.get(2))
    }

    // min over the node's neighborhood INCLUDING itself, one shuffle
    val byU = Window.partitionBy(col("u"))
    def withMin(nbrs: DataFrame): DataFrame =
      nbrs.withColumn("m", least(min(col("v")).over(byU), col("u")))

    def largeStar(es: DataFrame): DataFrame = {
      val nbrs = es.select(col("u"), col("v"))
        .union(es.select(col("v").as("u"), col("u").as("v")))
      canon(withMin(nbrs)
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    def smallStar(es: DataFrame): DataFrame = {
      // es is canonical (u > v) — already directed larger→smaller.
      // No inner distinct on either branch: canon() distincts the whole
      // union, and its map-side partial aggregation already dedups
      // before the exchange — an inner distinct would only add a full
      // extra shuffle of that branch per round.
      val pointed = withMin(es)
      canon(
        pointed.select(col("v").as("u"), col("m").as("v"))
          .union(pointed.select(col("u"), col("m").as("v"))))
    }

    // canon() drops self-loops, but a node whose ONLY edge is a
    // self-loop is still a (singleton) component on the other paths —
    // re-attach such nodes to the final labeling
    val selfOnly = clean.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()

    var cur = canon(clean.select(col("src").as("u"), col("dst").as("v")))
      .localCheckpoint()
    if (cur.isEmpty)
      return selfOnly.select(col("node"), col("node").as("component"))

    var fp = fingerprint(cur)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val nfp = fingerprint(next)
      converged = nfp == fp
      cur = next; fp = nfp
      round += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")

    // fixpoint = stars centered at component minima: every edge is
    // (member, center); centers label themselves. Self-loop-only nodes
    // rejoin as singletons (min over the union keeps real labels for
    // nodes that also had proper edges).
    cur.select(col("u").as("node"), col("v").as("component"))
      .union(cur.select(col("v").as("node"), col("v").as("component")))
      .union(selfOnly.select(col("node"), col("node").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component"))
  }
}
