package graft.queries

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, a random-hyperplane
  * LSH-bucketed variant as the scale path, and embedding-cosine
  * near-duplicate detection.
  *
  * Determinism across engines: float×float products are exact in
  * double; both Spark (native VectorOps loops) and the DuckDB oracles
  * (list_reduce in index order) accumulate left-to-right, so cosines are
  * bit-identical and rankings agree without tolerance.
  *
  * Scale design: brute force broadcasts the (small) query set so the
  * corpus never shuffles — it is the exact-recall baseline and the
  * verifier for the LSH path. The LSH variant shuffles only on the
  * 8-bit signature, so candidate generation is O(corpus/256) per
  * bucket and pair generation never goes quadratic in the corpus.
  */
object Vector {

  private val Bits = 8
  private val NearDupThreshold = 0.9

  /** Independent 8-bit bands OR-ed in the label-confusion index (one
    * band caught the exact top-1 for 0.43 of sf0.1 vectors; 2 bands
    * measured 0.605, 3 measured comfortably over the 0.6 AnnSpec
    * floor). Bands share one wide signature — disjoint hyperplanes. */
  private val ConfusionBands = 3

  /** DuckDB cosine of two list columns — same index-order reduction as
    * VectorOps.cosineSim. */
  private def dCos(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)
       | / (sqrt(list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x,y) -> x+y))
       |  * sqrt(list_reduce(list_transform(range(1, len($b)+1), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y))))""".stripMargin

  // ---- DuckDB replay of fixed-point k-means training ------------------
  // (the x_ann_*_trained oracles). Vectors quantize to 2^20 integers
  // FIRST (the x_pca_power discipline), so every Lloyd-update sum is an
  // integer-valued double — exact at ANY accumulation order — and each
  // centroid is one deterministic DOUBLE/BIGINT division; assignment
  // distances then fold in index order. That is what makes ops/KMeans'
  // distributed training replayable bit-for-bit by unrolled SQL.

  /** Squared-L2 between two list columns, index-order fold (matches
    * KMeans.fit's `aggregate(sequence(…))` spelling exactly). */
  private def dDist(v: String, c: String, dim: Int): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, ${dim + 1}), " +
      s"i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (a, x) -> a + x)"

  /** Argmin-cell assignment of `sv` (vec_id, j, v) against centroids
    * `cent` (j, cell, cent) — ties to the smaller cell, KMeans.fit's
    * strict-< fold contract. Emits rn=1 as the assignment. */
  private def dAssign(sv: String, cent: String, dim: Int): String =
    s"""SELECT s.vec_id, s.j, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY s.vec_id, s.j
       |    ORDER BY ${dDist("s.v", "c.cent", dim)} ASC, c.cell ASC) AS rn
       |  FROM $sv s JOIN $cent c USING (j)""".stripMargin

  /** One Lloyd iteration: assignment `a` against `prev`, then the
    * per-(j, cell, dim) mean as the next codebook `c` — empty cells
    * keep their previous centroid (KMeans.fit's contract). */
  private def dLloyd(sv: String, prev: String, a: String, c: String, dim: Int): String =
    s"""$a AS MATERIALIZED (
       |  SELECT vec_id, j, cell FROM (
       |  ${dAssign(sv, prev, dim)}) WHERE rn = 1),
       |$c AS MATERIALIZED (
       |  SELECT p.j, p.cell, COALESCE(u.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN (
       |    SELECT t.j, t.cell, list(t.sx / t.n ORDER BY t.d) AS cent
       |    FROM (
       |      SELECT aa.j, aa.cell, ds.d, SUM(s.v[ds.d]) AS sx, COUNT(*) AS n
       |      FROM $a aa JOIN $sv s ON s.vec_id = aa.vec_id AND s.j = aa.j
       |      CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS d) ds
       |      GROUP BY 1, 2, 3) t
       |    GROUP BY 1, 2) u USING (j, cell))""".stripMargin

  /** The shared PQ-training CTE chain: 2^20-quantized 16-dim slices
    * (4 subspaces), k=8 codebooks seeded from the first 8 vectors'
    * slices, TWO unrolled Lloyd iterations, final per-subspace codes.
    * Produces CTEs: js, sv, pc0, pa1, pc1, pa2, pc2, enc. */
  private def dPqTrainCtes: String =
    s"""js AS (SELECT unnest(range(0, 4)) AS j),
       |sv AS MATERIALIZED (
       |  SELECT e.vec_id, js.j,
       |    list_transform(range(js.j * 16 + 1, js.j * 16 + 17),
       |      i -> CAST(round(CAST(e.embedding[i] AS DOUBLE)
       |                      * CAST(1048576 AS DOUBLE)) AS DOUBLE)) AS v
       |  FROM embeddings e CROSS JOIN js),
       |pc0 AS MATERIALIZED (
       |  SELECT j, vec_id AS cell, v AS cent FROM sv WHERE vec_id < 8),
       |${dLloyd("sv", "pc0", "pa1", "pc1", 16)},
       |${dLloyd("sv", "pc1", "pa2", "pc2", 16)},
       |enc AS MATERIALIZED (
       |  SELECT vec_id, j, cell AS code FROM (
       |  ${dAssign("sv", "pc2", 16)}) WHERE rn = 1)""".stripMargin

  /** DuckDB hyperplane signature — same weights as
    * VectorOps.hyperplaneSig. */
  private def dSig(e: String, bits: Int = Bits): String =
    s"""list_reduce(list_transform(range(0, $bits), h ->
       |  CASE WHEN list_reduce(list_transform(range(0, len($e)), i ->
       |         CAST($e[i+1] AS DOUBLE) * ((((h+1)*131 + i*31) % 97) - 48)), (x,y) -> x+y) > 0
       |       THEN (CAST(1 AS BIGINT) << h) ELSE CAST(0 AS BIGINT) END), (x,y) -> x+y)""".stripMargin

  /** Near-dup test corpus: embeddings + injected near-duplicates —
    * vec_id + (max+1): scaled ×2 (exact in FP, cosine ≈ 1), every 25th;
    * vec_id + 2·(max+1): first dimension zeroed (cosine ≈ 0.992 on 64
    * dims), every 20th. Natural pairs top out at cosine ≈ 0.51
    * (measured), so the 0.9 threshold isolates exactly the injected
    * pairs. The offset is derived from max(vec_id) (one scalar fetched
    * at plan build from footer statistics), keeping the injected
    * keyspace disjoint (and above all real ids) at every scale factor. */
  /** Per-directory offset cache — same statistics-cache rationale (and
    * same immutable-corpus-only soundness contract, no invalidation) as
    * Text.offCache: the corpus is read-only, so max(vec_id) is a
    * constant per path and need not be re-fetched at every plan build. */
  private val offCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def corpusE(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val off: Long = offCache.computeIfAbsent(dir,
      _ => e.agg(max("vec_id")).head().getLong(0) + 1L)
    e.unionByName(
        e.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + off).as("vec_id"),
            expr("transform(embedding, x -> x * float(2))").as("embedding")))
      .unionByName(
        e.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 2L * off).as("vec_id"),
            expr("transform(sequence(1, size(embedding)), i -> IF(i = 1, float(0), element_at(embedding, i)))")
              .as("embedding")))
  }

  private val CorpusECte =
    """ecorpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings),
      |         list_transform(embedding, x -> x * CAST(2 AS FLOAT))
      |  FROM embeddings WHERE vec_id % 25 = 0
      |  UNION ALL
      |  SELECT vec_id + 2 * (SELECT MAX(vec_id) + 1 FROM embeddings),
      |         list_transform(range(1, len(embedding)+1),
      |           i -> CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE embedding[i] END)
      |  FROM embeddings WHERE vec_id % 20 = 0)""".stripMargin

  /** Verified near-dup pairs (a_id < b_id, cosine ≥ threshold) —
    * shared by the pair listing and the cluster assembly.
    *
    * Scale hardening, mirroring Text.minhashPairsOver's three
    * degenerate-bucket defenses: (1) bit-identical embeddings collapse
    * to one class representative before bucketing, so a corpus of
    * mostly-identical vectors never builds a quadratic bucket;
    * (2) the signature self-join shuffles (rep_id, sig) only — the
    * embedding arrays are joined back by rep_id for the cosine
    * verification, not carried through the bucket exchange; (3) buckets
    * larger than spark.graft.dedup.bandCap are capped in deterministic
    * rep_id order ([[embedBucketDrops]] reports what a cap dropped).
    * Doc-level pairs re-expand from the class map: cross-class pairs
    * inherit their representatives' cosine (identical arrays ⇒
    * identical value), intra-class pairs compute cosine(v, v)
    * numerically — NOT a literal 1.0 — so the sqrt round-trip matches
    * the oracle's per-pair arithmetic bit-for-bit. */
  /** Representative-level signature frame: one row per distinct
    * embedding, keyed by its minimum vec_id. */
  private def sigFrameE(c: DataFrame): DataFrame =
    graft.ops.PlanCache.materialized(
      c.groupBy(col("embedding")).agg(min("vec_id").as("rep_id"))
        .select(col("rep_id"), col("embedding"),
          VectorOps.sig(col("embedding"), Bits).as("sig")))

  /** (vec_id → rep_id) exact-embedding class membership — materialized
    * like the Text mirror (multiple references per query DAG). */
  private def classMembersE(c: DataFrame): DataFrame =
    graft.ops.PlanCache.materialized(
      c.withColumn("rep_id", min("vec_id").over(Window.partitionBy("embedding")))
        .select("vec_id", "rep_id"))

  /** Verified near-dup pairs BETWEEN exact-embedding classes (ra < rb,
    * cosine ≥ threshold) — the distinct-vector-sized graph cluster
    * assembly consumes directly. */
  private def embedRepPairs(c: DataFrame): DataFrame = {
    val cap = Text.bandCap(c.sparkSession)
    val sigs = sigFrameE(c)
    val buckets = sigs.select("rep_id", "sig")
      .withColumn("_rnk", row_number().over(
        Window.partitionBy("sig").orderBy("rep_id")))
      .filter(col("_rnk") <= cap)
      .drop("_rnk")
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.sig") === col("b.sig") && col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("ra"), col("b.rep_id").as("rb"))
      .join(sigs.select(col("rep_id").as("ra"), col("embedding").as("ea")), "ra")
      .join(sigs.select(col("rep_id").as("rb"), col("embedding").as("eb")), "rb")
      .select(col("ra"), col("rb"),
        VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= NearDupThreshold)
  }

  private def embedPairs(s: SparkSession, dir: String): DataFrame = {
    val c = corpusE(s, dir)
    val members = classMembersE(c)
    val cross = embedRepPairs(c)
      .join(members.select(col("rep_id").as("ra"), col("vec_id").as("da")), "ra")
      .join(members.select(col("rep_id").as("rb"), col("vec_id").as("db")), "rb")
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("cosine"))
    val intra = members.as("a")
      .join(members.as("b"),
        col("a.rep_id") === col("b.rep_id") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        col("a.rep_id").as("rep_id"))
      .join(sigFrameE(c).select(col("rep_id"),
        VectorOps.cosine(col("embedding"), col("embedding")).as("cosine")), "rep_id")
      .filter(col("cosine") >= NearDupThreshold)
      .select("a_id", "b_id", "cosine")
    cross.unionByName(intra)
  }

  /** Semantic-dedup clusters on the class-representative graph — the
    * mirror of Text.minhashClustersOver: the vec-level pair set is
    * never materialized; cluster_id (min vec_id reachable) equals the
    * rep-level component id because each representative is its class
    * minimum and Components labels by minimum. Intra-class edges only
    * exist where cosine(v, v) passes the threshold (it is NaN for the
    * zero vector), so the multi-member guard applies the same test. */
  private def embedClusters(c: DataFrame): DataFrame = {
    val repComp = graft.ops.Components.connectedComponents(
      embedRepPairs(c)
        .select(col("ra").as("src"), col("rb").as("dst")))
    val members = classMembersE(c)
    val selfPaired = sigFrameE(c)
      .filter(VectorOps.cosine(col("embedding"), col("embedding")) >= NearDupThreshold)
      .select("rep_id")
    val isolatedMulti = members.groupBy("rep_id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .join(selfPaired, "rep_id")
      .join(repComp.select(col("node").as("rep_id")), Seq("rep_id"), "left_anti")
      .select(col("rep_id").as("node"), col("rep_id").as("component"))
    members
      .join(repComp.unionByName(isolatedMulti)
        .withColumnRenamed("node", "rep_id"), "rep_id")
      .select(col("vec_id"), col("component").as("cluster_id"))
  }

  /** Dropped-candidate report for [[embedPairs]]'s bucket cap — empty
    * when capping changed nothing (every bucket fit). */
  private[graft] def embedBucketDrops(s: SparkSession, dir: String): DataFrame = {
    val cap = Text.bandCap(s)
    corpusE(s, dir).groupBy(col("embedding")).agg(min("vec_id").as("rep_id"))
      .select(VectorOps.sig(col("embedding"), Bits).as("sig"))
      .groupBy("sig").count()
      .filter(col("count") > cap)
      .agg(count(lit(1)).as("overflow_buckets"),
        sum(col("count") - cap).as("dropped_members"))
      .filter(col("overflow_buckets") > 0)
  }

  /** Per-vector top-1 cosine neighbor via the LSH candidate path:
    * [[ConfusionBands]] independent 8-bit hyperplane indexes (the
    * bands of one wide signature — disjoint hyperplane sets, so the
    * bands' miss events are near-independent), each probed at
    * Hamming ≤ 2 (37 probes per band, the x_ann_lsh_mp discipline),
    * candidates capped per (band, bucket) (Text.bandCap), exact cosine
    * re-scoring inside the probed buckets only, SORT-FREE argmax per
    * vector. OR-ing independent indexes is the standard LSH recall
    * amplifier: one band caught the exact top-1 winner for 0.43 of
    * sf0.1 vectors; OR-ing bands compounds toward 1-(1-p)^k (AnnSpec
    * pins the floor). The only corpus-sized shuffle key is
    * (band, signature); nothing broadcasts, no all-pairs stage exists,
    * and a pair surfacing through several bands is harmless — the
    * argmax is duplicate-insensitive. Returns (vec_id, label, n_id,
    * neighbor_label); a vector whose probed buckets hold no other
    * vector emits no row. Shared by x_label_confusion and AnnSpec's
    * agreement floor. */
  private[graft] def top1NeighborLsh(s: SparkSession, dir: String): DataFrame = {
    val cap = Text.bandCap(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorOps.sig(col("embedding"), ConfusionBands * Bits).as("sigw"))
    // band b = bits [8b, 8b+8) — band 0 is bit-identical to the 8-bit
    // index; higher bands use disjoint hyperplane sets
    val banded = e.select(col("vec_id"), col("label"), col("embedding"),
      explode(array((0 until ConfusionBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sigw"), b * Bits).bitwiseAND(lit(255L)).as("sig"))): _*)).as("bk"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("bk.band").as("band"), col("bk.sig").as("sig"))
    val cand = banded
      .select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").as("n_emb"), col("band"), col("sig"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy("band", "sig").orderBy("n_id")))
      .filter(col("_rnk") <= cap)
      .drop("_rnk")
    val probeSigs = expr(
      s"""concat(
         |  array(sig),
         |  transform(sequence(0, ${Bits - 1}),
         |    h -> sig ^ shiftleft(CAST(1 AS BIGINT), h)),
         |  flatten(transform(sequence(0, ${Bits - 2}), i ->
         |    transform(sequence(i + 1, ${Bits - 1}),
         |      j -> sig ^ shiftleft(CAST(1 AS BIGINT), i)
         |             ^ shiftleft(CAST(1 AS BIGINT), j)))))""".stripMargin)
    val probes = banded.select(col("vec_id"), col("label"), col("embedding"),
      col("band"), explode(probeSigs).as("sig"))
    probes.join(cand, Seq("band", "sig"))
      .filter(col("vec_id") =!= col("n_id"))
      .withColumn("cosine", VectorOps.cosine(col("embedding"), col("n_emb")))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("cosine"), (-col("n_id")).as("neg_id"),
        col("n_label"))).as("m"))
      .select(col("vec_id"), col("label"), (-col("m.neg_id")).as("n_id"),
        col("m.n_label").as("neighbor_label"))
  }

  /** Per-vector top-1 cosine neighbor, EXACT all-pairs against the
    * broadcast corpus — x_label_confusion's fixture-scale verifier. */
  private[graft] def top1NeighborExact(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "label", "embedding")
    val nb = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      col("embedding").as("n_emb"))
    e.crossJoin(broadcast(nb))
      .filter(col("vec_id") =!= col("n_id"))
      .withColumn("cosine", VectorOps.cosine(col("embedding"), col("n_emb")))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("cosine"), (-col("n_id")).as("neg_id"),
        col("n_label"))).as("m"))
      .select(col("vec_id"), col("label"), (-col("m.neg_id")).as("n_id"),
        col("m.n_label").as("neighbor_label"))
  }

  /** Winner votes → confusion matrix with per-label share (the window
    * runs on the labels²-sized aggregated frame only). */
  private def confusionMatrix(winners: DataFrame): DataFrame = {
    val byLabel = Window.partitionBy(col("label"))
    winners
      .groupBy(col("label"), col("neighbor_label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(byLabel), 6))
      .orderBy(col("label"), col("neighbor_label"))
  }

  /** DuckDB CTE chain producing the same verified pairs as
    * [[embedPairs]] (names: pairse(a_id, b_id, cosine)). */
  private def EmbedPairsCte: String =
    s"""$CorpusECte,
       |es AS (SELECT vec_id, embedding, ${dSig("embedding")} AS sig FROM ecorpus),
       |pairse AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         ${dCos("a.embedding", "b.embedding")} AS cosine
       |  FROM es a JOIN es b ON a.sig = b.sig AND a.vec_id < b.vec_id
       |  WHERE ${dCos("a.embedding", "b.embedding")} >= $NearDupThreshold)""".stripMargin

  val all: Map[String, Q] = Map(

    // Brute-force cosine top-k: the exact-recall ANN baseline. The
    // query set broadcasts; the corpus is scanned once with the scoring
    // in whole-stage codegen, then per-query top-k via ranked window.
    // Hybrid retrieval — the RAG-stack fusion every serious corpus
    // search runs: the SAME document ranked by BM25 (the production
    // x_bm25 scoring body, shared via Corpus.Bm25Score — derived
    // queries must exercise the production spelling) and by exact
    // cosine against a query vector, the two top-50 lists fused with
    // reciprocal-rank fusion (k=60, the published constant). Scale
    // shape: each side is ONE corpus scan plus a tiny broadcast
    // (3-term stats / a 1-row query vector); per-side top-k is a
    // distributed TakeOrdered heap, NOT a global window (PlanShape's
    // single-task ban) — ranks inside the k-row result come from a
    // bounded k×k better-than join (count-of-better + 1 ≡ ROW_NUMBER,
    // duplicate-free by the id tiebreak), so nothing rank-related ever
    // sees corpus-sized data. Both engines rank the same bit-identical
    // rounded scores, so ranks — and the fused RRF doubles — match
    // exactly.
    "x_hybrid_retrieval" -> Q(
      (s, dir) => {
        val k = 50
        val d = Tables.documents(s, dir)
          .withColumn("t", split(col("text"), " "))
          .withColumn("dl", size(col("t")))
        val aggCols = Seq(count(lit(1)).as("n_docs"),
            sum(col("dl")).cast("double").as("total_tokens")) ++
          Corpus.Terms.map(t =>
            sum(when(array_contains(col("t"), t), 1).otherwise(0)).as(s"df_$t"))
        val stats = d.agg(aggCols.head, aggCols.tail: _*)
        val lexScored = Corpus.Terms
          .foldLeft(d.crossJoin(broadcast(stats))) { (df, t) =>
            df.withColumn(s"tf_$t", expr(s"size(filter(t, w -> w = '$t'))"))
          }
          .withColumn("score", expr(Corpus.Bm25Score))
          .filter(Corpus.Terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
          .select(col("doc_id").as("id"), col("score"))
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val qv = e.filter(col("vec_id") === 3).select(col("embedding").as("q_emb"))
        val vecScored = e.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= 3)
          .select(col("vec_id").as("id"),
            VectorOps.cosine(col("q_emb"), col("embedding")).as("score"))
        def topRanks(scored: DataFrame, rankName: String): DataFrame = {
          val top = scored.orderBy(col("score").desc, col("id").asc)
            .limit(k).localCheckpoint(true)
          val other = top.select(col("id").as("o_id"), col("score").as("o_s"))
          top.join(broadcast(other),
              col("o_s") > col("score") ||
                (col("o_s") === col("score") && col("o_id") < col("id")),
              "left")
            .groupBy(col("id"))
            .agg((count(col("o_id")) + 1).cast("int").as(rankName))
        }
        topRanks(lexScored, "r_lex")
          .join(topRanks(vecScored, "r_vec"), Seq("id"), "full_outer")
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)))
          .orderBy(col("rrf").desc, col("id").asc)
          .limit(20)
          .select(col("id").as("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
      }, {
        val dfAggs = Corpus.Terms
          .map(t => s"SUM(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS df_$t")
          .mkString(",\n           |   ")
        val tfCols = Corpus.Terms
          .map(t => s"CAST(len(list_filter(t, w -> w = '$t')) AS INT) AS tf_$t")
          .mkString(",\n           |   ")
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           |dd AS (SELECT doc_id, t, CAST(len(t) AS INT) AS dl FROM d),
           |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS total_tokens,
           |   $dfAggs
           |   FROM dd),
           |sc AS (SELECT doc_id, dl,
           |   $tfCols,
           |   n_docs, total_tokens, ${Corpus.Terms.map(t => s"df_$t").mkString(", ")}
           |   FROM dd CROSS JOIN stats),
           |lex AS (SELECT doc_id AS id, ${Corpus.Bm25Score} AS score
           |        FROM sc WHERE ${Corpus.Terms.map(t => s"tf_$t").mkString(" + ")} > 0),
           |lr0 AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS INT) AS r_lex FROM lex),
           |lr AS (SELECT * FROM lr0 WHERE r_lex <= 50),
           |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 3),
           |vec AS (SELECT e.vec_id AS id, ${dCos("q.q_emb", "e.embedding")} AS score
           |        FROM embeddings e CROSS JOIN q WHERE e.vec_id != 3),
           |vr0 AS (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS INT) AS r_vec FROM vec),
           |vr AS (SELECT * FROM vr0 WHERE r_vec <= 50),
           |f AS (SELECT COALESCE(lr.id, vr.id) AS doc_id, lr.r_lex, vr.r_vec,
           |        COALESCE(CAST(1 AS DOUBLE) / (60 + lr.r_lex), CAST(0 AS DOUBLE))
           |        + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.r_vec), CAST(0 AS DOUBLE)) AS rrf
           |      FROM lr FULL OUTER JOIN vr ON lr.id = vr.id)
           |SELECT doc_id, r_lex, r_vec, rrf FROM f
           |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin
      }),

    "x_ann_brute" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
      },
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.q_id, e.vec_id, ${dCos("q.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id != q.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // Nearest-neighbor label confusion matrix — the label-noise /
    // class-overlap diagnostic a labeled embedding set gets before
    // training a classifier on it: each vector votes its top-1 cosine
    // neighbor's label; off-diagonal mass = classes that bleed into
    // each other (or mislabeled rows). Engine (the 100 TB shape):
    // candidate generation rides THREE independent 8-bit hyperplane
    // indexes (the bands of one 24-bit signature), each probed at
    // Hamming ≤ 2 (37 probes of 2^8 per band — the x_ann_lsh_mp
    // discipline, OR-amplified across bands), exact cosine re-scores
    // only inside the probed buckets, and the candidate side is capped
    // per (band, bucket) (Text.bandCap, the dedup discipline) so a
    // degenerate bucket can never go quadratic. The only corpus-sized
    // shuffle key is (band, signature); NOTHING is broadcast and no
    // all-pairs stage exists. Per-vector winner is a SORT-FREE argmax
    // (max over a (cosine, −id, label) struct — duplicate-insensitive,
    // so a pair surfacing through both bands is harmless), then a
    // labels²-sized confusion aggregate; the share window runs on that
    // tiny frame only. Approximate by design — x_label_confusion_exact
    // below is the all-pairs fixture-scale verifier, and AnnSpec pins
    // the top-1 agreement floor between the two at sf0.1 (0.70
    // measured, floor 0.6). A vector whose probed buckets hold no
    // other vector casts no vote (both engines drop it identically).
    // Winner determinism: cosine is the bit-portable VectorOps kernel
    // and ties break on vec_id, so both engines elect identical
    // neighbors among identical candidates.
    "x_label_confusion" -> Q(
      (s, dir) => confusionMatrix(top1NeighborLsh(s, dir)),
      s"""WITH es AS (SELECT vec_id, label, embedding, ${dSig("embedding", ConfusionBands * Bits)} AS sigw FROM embeddings),
         |bd AS (
         |  SELECT vec_id, label, embedding, b.band,
         |         (sigw >> (b.band * $Bits)) & 255 AS sig
         |  FROM es, (VALUES ${(0 until ConfusionBands).map(b => s"($b)").mkString(", ")}) b(band)),
         |cd AS (SELECT vec_id AS n_id, label AS n_label, embedding AS n_emb, band, sig,
         |         ROW_NUMBER() OVER (PARTITION BY band, sig ORDER BY vec_id) AS rnk
         |       FROM bd),
         |c2 AS (SELECT n_id, n_label, n_emb, band, sig FROM cd WHERE rnk <= ${Text.BandCapDefault}),
         |pr AS (
         |  SELECT vec_id, label, embedding, band,
         |         unnest([sig]
         |           || list_transform(range(0, $Bits), h -> xor(sig, CAST(1 AS BIGINT) << h))
         |           || flatten(list_transform(range(0, ${Bits - 1}), i ->
         |                list_transform(range(i + 1, $Bits),
         |                  j -> xor(xor(sig, CAST(1 AS BIGINT) << i), CAST(1 AS BIGINT) << j))))) AS sig
         |  FROM bd),
         |sc AS (
         |  SELECT p.vec_id, p.label, c.n_id, c.n_label,
         |         ${dCos("p.embedding", "c.n_emb")} AS cosine
         |  FROM pr p JOIN c2 c USING (band, sig)
         |  WHERE p.vec_id != c.n_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY vec_id ORDER BY cosine DESC, n_id ASC) AS rk
         |      FROM sc),
         |c AS (SELECT label, n_label AS neighbor_label, COUNT(*) AS n
         |      FROM r WHERE rk = 1 GROUP BY 1, 2),
         |tot AS (SELECT label, SUM(n) AS t FROM c GROUP BY 1)
         |SELECT c.label, c.neighbor_label, c.n,
         |       round(CAST(c.n AS DOUBLE) / t, 6) AS share
         |FROM c JOIN tot USING (label)
         |ORDER BY c.label, c.neighbor_label""".stripMargin),

    // The ALL-PAIRS form of the confusion matrix — the fixture-scale
    // verifier for x_label_confusion's LSH candidate generation (the
    // AnnSpec brute-force discipline): one corpus scan against the
    // broadcast corpus scores n² cosines exactly. Deliberately NOT the
    // scale path — broadcasting the corpus stops at executor memory and
    // n² work is a wall regardless; it exists so the approximate
    // variant's quality is measured (top-1 agreement floor in AnnSpec),
    // never assumed.
    "x_label_confusion_exact" -> Q(
      (s, dir) => confusionMatrix(top1NeighborExact(s, dir)),
      s"""WITH sc AS (
         |  SELECT a.vec_id, a.label, b.vec_id AS n_id, b.label AS n_label,
         |         ${dCos("a.embedding", "b.embedding")} AS cosine
         |  FROM embeddings a CROSS JOIN embeddings b
         |  WHERE a.vec_id != b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY vec_id ORDER BY cosine DESC, n_id ASC) AS rk
         |      FROM sc),
         |c AS (SELECT label, n_label AS neighbor_label, COUNT(*) AS n
         |      FROM r WHERE rk = 1 GROUP BY 1, 2),
         |tot AS (SELECT label, SUM(n) AS t FROM c GROUP BY 1)
         |SELECT c.label, c.neighbor_label, c.n,
         |       round(CAST(c.n AS DOUBLE) / t, 6) AS share
         |FROM c JOIN tot USING (label)
         |ORDER BY c.label, c.neighbor_label""".stripMargin),

    // LSH-bucketed ANN: candidates share the query's 8-bit hyperplane
    // signature (single probe), exact cosine re-scoring inside the
    // bucket. Approximate recall by design — the brute-force query
    // above is its verifier.
    "x_ann_lsh" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"),
            VectorOps.sig(col("embedding"), Bits).as("sig"))
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("sig"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.join(broadcast(q), Seq("sig"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 3)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
      },
      s"""WITH es AS (SELECT vec_id, embedding, ${dSig("embedding")} AS sig FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, sig FROM es WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.q_id, e.vec_id, ${dCos("q.q_emb", "e.embedding")} AS cosine
         |  FROM es e JOIN q ON e.sig = q.sig
         |  WHERE e.vec_id != q.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // Multi-probe LSH ANN: same 8-bit hyperplane signature index as
    // x_ann_lsh, but each query probes its own bucket PLUS every bucket
    // at Hamming distance 1 and 2 (8 single-bit + 28 double-bit flips =
    // 37 probes of the 256 buckets). Multi-probe is the standard
    // recall-vs-cost knob for signature LSH: neighbors whose hyperplane
    // side flipped on one or two planes — the dominant miss mode of the
    // single-probe variant — are recovered without adding hash tables
    // or re-indexing. Scale shape is unchanged: the probe set is a
    // 37×|queries| broadcast, candidates join on the signature (the
    // only shuffle key), and exact cosine re-scores inside the probed
    // buckets. Probe signatures are pairwise distinct, so each
    // (query, candidate) pair surfaces at most once — no distinct
    // needed before ranking. AnnSpec pins recall vs x_ann_brute at
    // sf0.1 — recall@5 for this variant, recall@3 for the single-probe
    // variant (which emits top-3) — and asserts multi-probe ≥
    // single-probe at matched k=3.
    "x_ann_lsh_mp" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"),
            VectorOps.sig(col("embedding"), Bits).as("sig"))
        val probeSigs = expr(
          s"""concat(
             |  array(sig),
             |  transform(sequence(0, ${Bits - 1}),
             |    h -> sig ^ shiftleft(CAST(1 AS BIGINT), h)),
             |  flatten(transform(sequence(0, ${Bits - 2}), i ->
             |    transform(sequence(i + 1, ${Bits - 1}),
             |      j -> sig ^ shiftleft(CAST(1 AS BIGINT), i)
             |             ^ shiftleft(CAST(1 AS BIGINT), j)))))""".stripMargin)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(probeSigs).as("sig"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.join(broadcast(q), Seq("sig"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
      },
      s"""WITH es AS (SELECT vec_id, embedding, ${dSig("embedding")} AS sig FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, sig FROM es WHERE vec_id < 8),
         |probes AS (
         |  SELECT q_id, q_emb,
         |         unnest([sig]
         |           || list_transform(range(0, $Bits), h -> xor(sig, CAST(1 AS BIGINT) << h))
         |           || flatten(list_transform(range(0, ${Bits - 1}), i ->
         |                list_transform(range(i + 1, $Bits),
         |                  j -> xor(xor(sig, CAST(1 AS BIGINT) << i), CAST(1 AS BIGINT) << j))))) AS sig
         |  FROM q),
         |sc AS (
         |  SELECT p.q_id, e.vec_id, ${dCos("p.q_emb", "e.embedding")} AS cosine
         |  FROM es e JOIN probes p ON e.sig = p.sig
         |  WHERE e.vec_id != p.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // IVF (inverted-file) ANN: the second scale path, structurally
    // different from LSH — a coarse quantizer partitions the corpus
    // into cells (argmax-cosine assignment against a fixed centroid
    // set), a query probes its nprobe=2 nearest cells and re-scores
    // exactly only inside them. Centroids here are a deterministic
    // subset (vec_id < 16) so the oracle can replay the build; a
    // k-means-trained codebook drops into the same plan unchanged.
    // Scale: assignment is one broadcast pass over the corpus (cells
    // then live as a partition column — the "inverted file"); a query
    // touches ~nprobe/k of the data, and the only shuffle key is the
    // cell id.
    "x_ann_ivf" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        // one cell per vector: argmax cosine, ties to the smaller
        // centroid id — max_by over (cosine, -c_id) == the oracle's
        // ROW_NUMBER(ORDER BY cosine DESC, c_id ASC) = 1
        // group by the unique vec_id only; the vector rides as an
        // aggregated VALUE (first of a single-value group), keeping the
        // 64-float array out of the shuffle/grouping key
        val assigned = e.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("embedding")))
          .groupBy(col("vec_id"))
          .agg(
            first(col("embedding")).as("embedding"),
            max_by(col("c_id"), struct(col("cos_c"), -col("c_id"))).as("cell"))
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val byQc = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_c").desc, col("c_id").asc)
        val probes = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("q_emb")))
          .withColumn("prn", row_number().over(byQc))
          .filter(col("prn") <= 2)
          .select(col("q_id"), col("q_emb"), col("c_id").as("cell"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        assigned.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 3)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
      },
      s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 16),
         |asg AS (
         |  SELECT e.vec_id, c.c_id, ROW_NUMBER() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY ${dCos("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN c),
         |cell AS (SELECT vec_id, c_id AS cell FROM asg WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |pr AS (
         |  SELECT q.q_id, q.q_emb, c.c_id AS cell, ROW_NUMBER() OVER (
         |    PARTITION BY q.q_id
         |    ORDER BY ${dCos("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS prn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT q_id, q_emb, cell FROM pr WHERE prn <= 2),
         |sc AS (
         |  SELECT p.q_id, e.vec_id, ${dCos("p.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e
         |  JOIN cell ce ON e.vec_id = ce.vec_id
         |  JOIN probes p ON ce.cell = p.cell
         |  WHERE e.vec_id != p.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // PRODUCT-QUANTIZATION ANN (Jégou et al., "Product quantization
    // for nearest neighbor search", TPAMI'11) — the MEMORY-bound scale
    // path, structurally different from both LSH (hash buckets) and
    // IVF (coarse cells): the vector space splits into m=4 independent
    // 16-dim subspaces, each with its own k=8-code codebook; a vector
    // compresses to m code ids (4 small ints standing in for 256 bytes
    // of floats — the compression that lets a 100 TB corpus's index
    // live in RAM), and a query scores the WHOLE corpus from a
    // (m × k)-entry distance table without touching raw vectors
    // (asymmetric distance: Σ_j ⟨q_j, codeword(x, j)⟩ = ⟨q, reconstruct
    // x⟩). Codebooks here are deterministic sub-slices of the first 8
    // vectors so the oracle can replay the build (the x_ann_ivf
    // discipline — a trained codebook drops into the same plan
    // unchanged). Encode = one broadcast pass, m·k dots per vector;
    // ADC = a (j, code)-keyed broadcast join against the 32-row
    // distance table; per-vector sums fold in fixed subspace order.
    "x_ann_pq" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val codes = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val ip = (a: String, b: String) =>
          s"""aggregate(zip_with(slice($a, j * 16 + 1, 16),
             |                   slice($b, j * 16 + 1, 16),
             |                   (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             |          0D, (acc, v) -> acc + v)""".stripMargin
        // encode: per (vector, subspace), the max-inner-product code
        val enc = e.select(col("vec_id"), col("embedding"),
            explode(expr("sequence(0, 3)")).as("j"))
          .crossJoin(broadcast(codes))
          .withColumn("d", expr(ip("embedding", "c_emb")))
          .groupBy(col("vec_id"), col("j"))
          .agg(max_by(col("c_id"), struct(col("d"), -col("c_id"))).as("code"))
        // the query-side (subspace, code) distance table: 8q × 4j × 8c
        val dtab = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(expr("sequence(0, 3)")).as("j"))
          .crossJoin(broadcast(codes))
          .withColumn("d", expr(ip("q_emb", "c_emb")))
          .select(col("q_id"), col("j").as("qj"), col("c_id"), col("d"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("adc_score").desc, col("vec_id").asc)
        enc.join(broadcast(dtab),
            enc("j") === dtab("qj") && enc("code") === dtab("c_id"))
          .groupBy(col("vec_id"), col("q_id"))
          .agg(expr("""round(aggregate(
            |  transform(sort_array(collect_list(struct(qj, d))), x -> x.d),
            |  0D, (a, x) -> a + x), 6)""".stripMargin).as("adc_score"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "adc_score")
          .orderBy("q_id", "rnk")
      }, {
        def dIp(a: String, b: String) =
          s"list_reduce(list_transform(range(j * 16 + 1, j * 16 + 17), " +
            s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
        s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
           |           WHERE vec_id < 8),
           |js AS (SELECT unnest(range(0, 4)) AS j),
           |encx AS (
           |  SELECT e.vec_id, js.j, c.c_id, ROW_NUMBER() OVER (
           |    PARTITION BY e.vec_id, js.j
           |    ORDER BY ${dIp("e.embedding", "c.c_emb")} DESC, c.c_id ASC) AS rn
           |  FROM embeddings e CROSS JOIN js CROSS JOIN c),
           |enc AS (SELECT vec_id, j, c_id AS code FROM encx WHERE rn = 1),
           |dt AS (
           |  SELECT q.vec_id AS q_id, js.j, c.c_id,
           |         ${dIp("q.embedding", "c.c_emb")} AS d
           |  FROM embeddings q CROSS JOIN js CROSS JOIN c
           |  WHERE q.vec_id < 8),
           |adc AS (
           |  SELECT e.vec_id, d.q_id,
           |    round(list_reduce([CAST(0 AS DOUBLE)] || list(d.d ORDER BY d.j),
           |                      (a, x) -> a + x), 6) AS adc_score
           |  FROM enc e JOIN dt d ON e.j = d.j AND e.code = d.c_id
           |  GROUP BY e.vec_id, d.q_id),
           |r AS (SELECT *, ROW_NUMBER() OVER (
           |        PARTITION BY q_id ORDER BY adc_score DESC, vec_id ASC) AS rnk
           |      FROM adc WHERE vec_id != q_id)
           |SELECT q_id, rnk, vec_id, adc_score FROM r WHERE rnk <= 5
           |ORDER BY q_id, rnk""".stripMargin
      }),

    // IVF+PQ composed — the production ANN index shape (FAISS IVFPQ):
    // the coarse quantizer bounds WHICH vectors a query considers
    // (nprobe=2 cells of 16, ~1/8 of the corpus) and PQ bounds WHAT is
    // read per considered vector (m code ids, never the raw floats) —
    // memory and compute bounded independently, which is why this is
    // the shape a RAM-resident 100 TB index actually takes. Both
    // stages reuse the family's deterministic codebooks (IVF cells:
    // vec_id < 16 via max-cosine; PQ codes: vec_id < 8 sub-slices via
    // max-IP), so the composed oracle replays the whole build; scoring
    // is pure ADC inside probed cells, fixed-order subspace folds.
    "x_ann_ivfpq" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cc_id"), col("embedding").as("cc_emb"))
        val codes = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val ip = (a: String, b: String) =>
          s"""aggregate(zip_with(slice($a, j * 16 + 1, 16),
             |                   slice($b, j * 16 + 1, 16),
             |                   (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             |          0D, (acc, v) -> acc + v)""".stripMargin
        // coarse assignment: one cell per vector (the IVF stage)
        val cells = e.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("cc_emb"), col("embedding")))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cc_id"), struct(col("cos_c"), -col("cc_id"))).as("cell"))
        // fine codes: m per vector (the PQ stage)
        val enc = e.select(col("vec_id"), col("embedding"),
            explode(expr("sequence(0, 3)")).as("j"))
          .crossJoin(broadcast(codes))
          .withColumn("d", expr(ip("embedding", "c_emb")))
          .groupBy(col("vec_id"), col("j"))
          .agg(max_by(col("c_id"), struct(col("d"), -col("c_id"))).as("code"))
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        // query probes its nprobe=2 nearest cells
        val byQc = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_c").desc, col("cc_id").asc)
        val probes = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("cc_emb"), col("q_emb")))
          .withColumn("prn", row_number().over(byQc))
          .filter(col("prn") <= 2)
          .select(col("q_id").as("pq_id"), col("cc_id").as("cell"))
        // query-side distance table (identical to x_ann_pq's)
        val dtab = q.select(col("q_id"), col("q_emb"),
            explode(expr("sequence(0, 3)")).as("j"))
          .crossJoin(broadcast(codes))
          .withColumn("d", expr(ip("q_emb", "c_emb")))
          .select(col("q_id"), col("j").as("qj"), col("c_id"), col("d"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("adc_score").desc, col("vec_id").asc)
        // ADC over probed cells only: cell-join bounds the candidates,
        // then the (subspace, code) join prices them from the table
        cells.join(broadcast(probes), Seq("cell"))
          .join(enc, Seq("vec_id"))
          .join(broadcast(dtab),
            enc("j") === dtab("qj") && enc("code") === dtab("c_id") &&
              col("pq_id") === dtab("q_id"))
          .groupBy(col("vec_id"), col("q_id"))
          .agg(expr("""round(aggregate(
            |  transform(sort_array(collect_list(struct(qj, d))), x -> x.d),
            |  0D, (a, x) -> a + x), 6)""".stripMargin).as("adc_score"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "adc_score")
          .orderBy("q_id", "rnk")
      }, {
        def dIp(a: String, b: String) =
          s"list_reduce(list_transform(range(j * 16 + 1, j * 16 + 17), " +
            s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
        s"""WITH cc AS (SELECT vec_id AS cc_id, embedding AS cc_emb FROM embeddings
           |            WHERE vec_id < 16),
           |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
           |      WHERE vec_id < 8),
           |js AS (SELECT unnest(range(0, 4)) AS j),
           |cellx AS (
           |  SELECT e.vec_id, cc.cc_id, ROW_NUMBER() OVER (
           |    PARTITION BY e.vec_id
           |    ORDER BY ${dCos("cc.cc_emb", "e.embedding")} DESC, cc.cc_id ASC) AS rn
           |  FROM embeddings e CROSS JOIN cc),
           |cells AS (SELECT vec_id, cc_id AS cell FROM cellx WHERE rn = 1),
           |encx AS (
           |  SELECT e.vec_id, js.j, c.c_id, ROW_NUMBER() OVER (
           |    PARTITION BY e.vec_id, js.j
           |    ORDER BY ${dIp("e.embedding", "c.c_emb")} DESC, c.c_id ASC) AS rn
           |  FROM embeddings e CROSS JOIN js CROSS JOIN c),
           |enc AS (SELECT vec_id, j, c_id AS code FROM encx WHERE rn = 1),
           |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
           |      WHERE vec_id < 8),
           |prx AS (
           |  SELECT q.q_id, cc.cc_id AS cell, ROW_NUMBER() OVER (
           |    PARTITION BY q.q_id
           |    ORDER BY ${dCos("cc.cc_emb", "q.q_emb")} DESC, cc.cc_id ASC) AS prn
           |  FROM q CROSS JOIN cc),
           |probes AS (SELECT q_id, cell FROM prx WHERE prn <= 2),
           |dt AS (
           |  SELECT q.q_id, js.j, c.c_id, ${dIp("q.q_emb", "c.c_emb")} AS d
           |  FROM q CROSS JOIN js CROSS JOIN c),
           |adc AS (
           |  SELECT e.vec_id, d.q_id,
           |    round(list_reduce([CAST(0 AS DOUBLE)] || list(d.d ORDER BY d.j),
           |                      (a, x) -> a + x), 6) AS adc_score
           |  FROM cells ce
           |  JOIN probes p ON ce.cell = p.cell
           |  JOIN enc e ON e.vec_id = ce.vec_id
           |  JOIN dt d ON d.q_id = p.q_id AND d.j = e.j AND d.c_id = e.code
           |  GROUP BY e.vec_id, d.q_id),
           |r AS (SELECT *, ROW_NUMBER() OVER (
           |        PARTITION BY q_id ORDER BY adc_score DESC, vec_id ASC) AS rnk
           |      FROM adc WHERE vec_id != q_id)
           |SELECT q_id, rnk, vec_id, adc_score FROM r WHERE rnk <= 5
           |ORDER BY q_id, rnk""".stripMargin
      }),

    // PERSISTENT IVF index, maintained incrementally (the x_ann_ivf
    // plan with the index as a STORED artifact instead of a per-query
    // recompute): cell assignments live in a graft-tx table partitioned
    // BY CELL — the inverted file is literally the table's partition
    // manifest. A new vector batch is admitted by assigning ONLY the
    // batch against the broadcast codebook and upserting — an
    // O(touched cells) commit, never a corpus re-assignment — and a
    // query reads exactly its nprobe probed cells through the
    // manifest-pruned snapshotPartitions path (at 100 TB: a query
    // touches ~nprobe/k of the data and the index update touches only
    // the cells the batch lands in). Assignment is per-vector
    // independent, so incremental-build ≡ full-build and the oracle is
    // the from-scratch recompute — the strongest statement of index
    // maintenance correctness.
    "x_ann_ivf_incremental" -> Q(
      (s, dir) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_ivf").toString
        val idx = s"$base/ivf"
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        def assign(batch: org.apache.spark.sql.DataFrame) = batch
          .crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("embedding")))
          .groupBy(col("vec_id"))
          .agg(
            first(col("embedding")).as("embedding"),
            max_by(col("c_id"), struct(col("cos_c"), -col("c_id"))).as("cell"))
        // 1. initial build: the base corpus becomes the stored index
        graft.io.TxTable.upsert(s, idx,
          assign(e.filter(col("vec_id") < 400)), "vec_id", "vec_id", "cell")
        // 2. incremental admission: ONLY the new batch is assigned and
        // upserted — the stored corpus is never re-read
        graft.io.TxTable.upsert(s, idx,
          assign(e.filter(col("vec_id") >= 400)), "vec_id", "vec_id", "cell")
        // 3. query the STORED index: probe cells resolve against the
        // codebook, then the manifest prunes the read to exactly the
        // probed cells (nprobe=2 per query; the collect is probe-sized)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val byQc = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_c").desc, col("c_id").asc)
        val probes = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("q_emb")))
          .withColumn("prn", row_number().over(byQc))
          .filter(col("prn") <= 2)
          .select(col("q_id"), col("q_emb"), col("c_id").as("cell"))
          .localCheckpoint(true)
        val cells = probes.select("cell").distinct()
          .collect().map(r => lit(r.getLong(0))).toSeq
        val stored = graft.io.TxTable.snapshotPartitions(s, idx, cells).get
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        val out = stored.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 3)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
          .localCheckpoint(true)
        rmrf(base)
        out
      },
      // the from-scratch recompute (x_ann_ivf's oracle): incremental
      // index maintenance must be invisible in the result
      s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 16),
         |asg AS (
         |  SELECT e.vec_id, c.c_id, ROW_NUMBER() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY ${dCos("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN c),
         |cell AS (SELECT vec_id, c_id AS cell FROM asg WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |pr AS (
         |  SELECT q.q_id, q.q_emb, c.c_id AS cell, ROW_NUMBER() OVER (
         |    PARTITION BY q.q_id
         |    ORDER BY ${dCos("c.c_emb", "q.q_emb")} DESC, c.c_id ASC) AS prn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT q_id, q_emb, cell FROM pr WHERE prn <= 2),
         |sc AS (
         |  SELECT p.q_id, e.vec_id, ${dCos("p.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e
         |  JOIN cell ce ON e.vec_id = ce.vec_id
         |  JOIN probes p ON ce.cell = p.cell
         |  WHERE e.vec_id != p.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // IVF codebook DRIFT detector — the maintenance readout that
    // decides when the stored index (x_ann_ivf_incremental) needs its
    // quantizer retrained: as the corpus drifts away from the codebook,
    // assignments pile into few cells and probe cost degrades toward a
    // scan. One cell-grain rollup over the stored assignments (never
    // the vectors) → occupancy stats + the imbalance ratio
    // (max cell / mean cell) an operator thresholds on. Exact decimal
    // mean so the double compares bit-for-bit.
    "x_ann_ivf_drift" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val assigned = e.crossJoin(broadcast(cents))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("embedding")))
          .groupBy(col("vec_id"))
          .agg(max_by(col("c_id"), struct(col("cos_c"), -col("c_id"))).as("cell"))
        val perCell = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"))
        perCell.agg(
          count(lit(1)).as("n_cells"),
          sum(col("n")).as("n_vectors"),
          max(col("n")).as("max_cell"),
          min(col("n")).as("min_cell"))
          .withColumn("imbalance",
            (col("max_cell") * col("n_cells")).cast("decimal(28,9)")
              .cast("double") / col("n_vectors"))
      },
      s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 16),
         |asg AS (
         |  SELECT e.vec_id, c.c_id, ROW_NUMBER() OVER (
         |    PARTITION BY e.vec_id
         |    ORDER BY ${dCos("c.c_emb", "e.embedding")} DESC, c.c_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN c),
         |pc AS (SELECT c_id AS cell, COUNT(*) AS n FROM asg WHERE rn = 1 GROUP BY 1)
         |SELECT COUNT(*) AS n_cells, CAST(SUM(n) AS BIGINT) AS n_vectors,
         |  MAX(n) AS max_cell, MIN(n) AS min_cell,
         |  CAST(CAST(MAX(n) * COUNT(*) AS DECIMAL(28,9)) AS DOUBLE) / SUM(n)
         |    AS imbalance
         |FROM pc""".stripMargin),

    // TRAINED-codebook PQ — the real FAISS shape: per-subspace k-means
    // (ops/KMeans — Lloyd's, k=8, 2 fixed iterations) replaces
    // x_ann_pq's deterministic sub-slice codebooks; the query plan
    // (encode → broadcast distance table → fixed-order ADC folds) is
    // UNCHANGED — only the codebook frame differs. Training is
    // oracle-replayable via the x_pca_power fixed-point discipline:
    // vectors quantize to 2^20 integers FIRST, so every k-means sum is
    // an integer-valued double (exact at any aggregation order, any
    // parallelism) and each centroid one deterministic DOUBLE/BIGINT
    // division — the DuckDB oracle unrolls the SAME two Lloyd
    // iterations bit-for-bit (AS MATERIALIZED, the k-core discipline).
    // Scale shape: training is 2 broadcast-codebook map passes per
    // subspace plus one (cell, dim)-grain exchange each — the corpus
    // itself never shuffles; encoding rides KMeans' literal-codebook
    // projection (128 values, codegen'd, no join).
    "x_ann_pq_trained" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        def qslice(v: String, j: Int) =
          expr(s"transform(slice($v, ${j * 16 + 1}, 16), x -> " +
            "CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS DOUBLE))")
        // the 4 subspace trainings are independent — overlap them on
        // driver threads (guide §2.6) so one subspace's tiny update
        // aggregates back-fill another's scheduling gaps; each fit is
        // self-contained, so results are unchanged
        val trained = inParallel(4) { j =>
          val sliced = e.select(col("vec_id"), qslice("embedding", j).as("v"))
          val (cb, asg) = graft.ops.KMeans.fit(sliced, "vec_id", "v",
            k = 8, iters = 2)
          (cb.withColumn("j", lit(j)),
            asg.select(col("id").as("vec_id"), col("cell").as("code"),
              lit(j).as("j")))
        }
        val codebook = trained.map(_._1).reduce(_ unionByName _)
        val enc = trained.map(_._2).reduce(_ unionByName _)
        val dtab = (0 until 4).map { j =>
            e.filter(col("vec_id") < 8)
              .select(col("vec_id").as("q_id"), qslice("embedding", j).as("qv"),
                lit(j).as("qj"))
          }.reduce(_ unionByName _)
          .join(broadcast(codebook), col("qj") === col("j"))
          .withColumn("d", expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v)"))
          .select(col("q_id"), col("qj"), col("cell"), col("d"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("adc_score").desc, col("vec_id").asc)
        enc.join(broadcast(dtab),
            enc("j") === dtab("qj") && enc("code") === dtab("cell"))
          .groupBy(enc("vec_id"), dtab("q_id"))
          .agg(expr("""round(aggregate(
            |  transform(sort_array(collect_list(struct(qj, d))), x -> x.d),
            |  0D, (a, x) -> a + x) / CAST(1099511627776 AS DOUBLE), 6)""".stripMargin)
            .as("adc_score"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "adc_score")
          .orderBy("q_id", "rnk")
      },
      s"""WITH $dPqTrainCtes,
         |dt AS (
         |  SELECT s.vec_id AS q_id, s.j, c.cell,
         |    list_reduce([CAST(0 AS DOUBLE)] ||
         |      list_transform(range(1, 17), i -> s.v[i] * c.cent[i]),
         |      (a, x) -> a + x) AS d
         |  FROM sv s JOIN pc2 c USING (j) WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT e.vec_id, d.q_id,
         |    round(list_reduce([CAST(0 AS DOUBLE)] || list(d.d ORDER BY d.j),
         |                      (a, x) -> a + x)
         |          / CAST(1099511627776 AS DOUBLE), 6) AS adc_score
         |  FROM enc e JOIN dt d ON e.j = d.j AND e.code = d.cell
         |  GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY adc_score DESC, vec_id ASC) AS rnk
         |      FROM adc WHERE vec_id != q_id)
         |SELECT q_id, rnk, vec_id, adc_score FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // TRAINED IVF+PQ — both stages of the production index learned
    // from the corpus: a k=16 coarse quantizer trained by ops/KMeans
    // over FULL 2^20-quantized vectors (probes = 2 nearest trained
    // centroids by L2) composed with x_ann_pq_trained's per-subspace
    // codebooks. Same fixed-point replay discipline throughout, so the
    // oracle unrolls BOTH trainings; scoring is ADC inside probed
    // cells only — the cell join bounds candidates, the code table
    // prices them, memory and compute bounded independently.
    "x_ann_ivfpq_trained" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        def qslice(v: String, j: Int) =
          expr(s"transform(slice($v, ${j * 16 + 1}, 16), x -> " +
            "CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS DOUBLE))")
        val fullQ = e.select(col("vec_id"), expr(
          "transform(embedding, x -> " +
            "CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS DOUBLE))")
          .as("v"))
        // all 5 trainings (coarse + 4 fine subspaces) are independent —
        // overlap them on driver threads (guide §2.6); each fit is
        // self-contained, so results are unchanged
        val fits = inParallel(5) {
          case 4 => // coarse quantizer: trained, not picked — 16 cells
            val (cb, asg) = graft.ops.KMeans.fit(fullQ, "vec_id", "v",
              k = 16, iters = 2)
            (cb, asg)
          case j => // fine codebooks: x_ann_pq_trained's training
            val sliced = e.select(col("vec_id"), qslice("embedding", j).as("v"))
            val (cb, asg) = graft.ops.KMeans.fit(sliced, "vec_id", "v",
              k = 8, iters = 2)
            (cb.withColumn("j", lit(j)),
              asg.select(col("id").as("vec_id"), col("cell").as("code"),
                lit(j).as("j")))
        }
        val (coarseCb, coarseAsg) = fits(4)
        val cells = coarseAsg.select(col("id").as("vec_id"), col("cell"))
        val trained = fits.take(4)
        val codebook = trained.map(_._1).reduce(_ unionByName _)
        val enc = trained.map(_._2).reduce(_ unionByName _)
        val q = fullQ.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val byQc = Window.partitionBy(col("q_id"))
          .orderBy(col("dist").asc, col("cell").asc)
        val probes = q.crossJoin(broadcast(coarseCb))
          .withColumn("dist", expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), " +
              "0D, (a, v) -> a + v)"))
          .withColumn("prn", row_number().over(byQc))
          .filter(col("prn") <= 2)
          .select(col("q_id").as("pq_id"), col("cell"))
        val dtab = (0 until 4).map { j =>
            e.filter(col("vec_id") < 8)
              .select(col("vec_id").as("q_id"), qslice("embedding", j).as("qv"),
                lit(j).as("qj"))
          }.reduce(_ unionByName _)
          .join(broadcast(codebook), col("qj") === col("j"))
          .withColumn("d", expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> x * y), 0D, (a, v) -> a + v)"))
          .select(col("q_id"), col("qj"), col("cell").as("dcode"), col("d"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("adc_score").desc, col("vec_id").asc)
        cells.join(broadcast(probes), Seq("cell"))
          .join(enc, Seq("vec_id"))
          .join(broadcast(dtab),
            enc("j") === dtab("qj") && enc("code") === dtab("dcode") &&
              col("pq_id") === dtab("q_id"))
          .groupBy(col("vec_id"), dtab("q_id"))
          .agg(expr("""round(aggregate(
            |  transform(sort_array(collect_list(struct(qj, d))), x -> x.d),
            |  0D, (a, x) -> a + x) / CAST(1099511627776 AS DOUBLE), 6)""".stripMargin)
            .as("adc_score"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "vec_id", "adc_score")
          .orderBy("q_id", "rnk")
      },
      s"""WITH $dPqTrainCtes,
         |fv AS MATERIALIZED (
         |  SELECT e.vec_id, 0 AS j,
         |    list_transform(range(1, 65),
         |      i -> CAST(round(CAST(e.embedding[i] AS DOUBLE)
         |                      * CAST(1048576 AS DOUBLE)) AS DOUBLE)) AS v
         |  FROM embeddings e),
         |cc0 AS MATERIALIZED (
         |  SELECT j, vec_id AS cell, v AS cent FROM fv WHERE vec_id < 16),
         |${dLloyd("fv", "cc0", "ca1", "cc1", 64)},
         |${dLloyd("fv", "cc1", "ca2", "cc2", 64)},
         |cells AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |  ${dAssign("fv", "cc2", 64)}) WHERE rn = 1),
         |prx AS (
         |  SELECT s.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
         |    PARTITION BY s.vec_id
         |    ORDER BY ${dDist("s.v", "c.cent", 64)} ASC, c.cell ASC) AS prn
         |  FROM fv s JOIN cc2 c USING (j) WHERE s.vec_id < 8),
         |probes AS (SELECT q_id, cell FROM prx WHERE prn <= 2),
         |dt AS (
         |  SELECT s.vec_id AS q_id, s.j, c.cell,
         |    list_reduce([CAST(0 AS DOUBLE)] ||
         |      list_transform(range(1, 17), i -> s.v[i] * c.cent[i]),
         |      (a, x) -> a + x) AS d
         |  FROM sv s JOIN pc2 c USING (j) WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT e.vec_id, d.q_id,
         |    round(list_reduce([CAST(0 AS DOUBLE)] || list(d.d ORDER BY d.j),
         |                      (a, x) -> a + x)
         |          / CAST(1099511627776 AS DOUBLE), 6) AS adc_score
         |  FROM cells ce
         |  JOIN probes p ON ce.cell = p.cell
         |  JOIN enc e ON e.vec_id = ce.vec_id
         |  JOIN dt d ON d.q_id = p.q_id AND d.j = e.j AND d.cell = e.code
         |  GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY adc_score DESC, vec_id ASC) AS rnk
         |      FROM adc WHERE vec_id != q_id)
         |SELECT q_id, rnk, vec_id, adc_score FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // IVF index REFRESH — closing the maintenance loop the drift
    // detector (x_ann_ivf_drift) opens: when cell-occupancy imbalance
    // exceeds the operator threshold, the coarse quantizer RETRAINS
    // (ops/KMeans over 2^20-quantized vectors — the replayable
    // fixed-point discipline), every vector reassigns, and the new
    // index lands as ONE TxTable.replaceAll commit — readers see the
    // old index or the new one in full, never a half-built mix
    // (version v reads old, v+1 reads new; a concurrent admission
    // conflicts loudly instead of being clobbered). Oracle = the
    // from-scratch trained build: refresh must be result-invisible
    // versus rebuilding, the same maintenance-correctness statement
    // x_ann_ivf_incremental makes for admission.
    "x_ann_ivf_refresh" -> Q(
      (s, dir) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_ivfref").toString
        val idx = s"$base/ivf"
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        // 1. the aging index: deterministic first-16 codebook (the
        // x_ann_ivf_incremental build)
        val cents0 = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val assigned0 = e.crossJoin(broadcast(cents0))
          .withColumn("cos_c", VectorOps.cosine(col("c_emb"), col("embedding")))
          .groupBy(col("vec_id"))
          .agg(first(col("embedding")).as("embedding"),
            max_by(col("c_id"), struct(col("cos_c"), -col("c_id"))).as("cell"))
        graft.io.TxTable.upsert(s, idx, assigned0, "vec_id", "vec_id", "cell")
        val vBefore = graft.io.TxTable.latestVersion(s, idx)
        // 2. the drift readout decides (threshold 1.0 = any imbalance;
        // a real deployment thresholds higher — the fixture's argmax
        // assignment is never perfectly uniform, so the retrain fires)
        val occ = graft.io.TxTable.snapshot(s, idx).get
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_vec"),
            max(col("n")).as("max_cell")).head()
        val imbalance =
          occ.getLong(2).toDouble * occ.getLong(0) / occ.getLong(1)
        require(imbalance > 1.0,
          f"IVF occupancy perfectly balanced ($imbalance%.3f) — " +
            "nothing to refresh (regenerated fixture?)")
        // 3. retrain + full reassign (replayable: quantized k-means)
        val fullQ = e.select(col("vec_id"), expr(
          "transform(embedding, x -> " +
            "CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS DOUBLE))")
          .as("v"))
        val (cb, asg) = graft.ops.KMeans.fit(fullQ, "vec_id", "v",
          k = 16, iters = 2)
        val refreshed = e.join(
          asg.select(col("id").as("vec_id"), col("cell")), Seq("vec_id"))
        // 4. the atomic swap: exactly one version, old readable at v
        graft.io.TxTable.replaceAll(s, idx, refreshed, "cell")
        require(graft.io.TxTable.latestVersion(s, idx) == vBefore + 1,
          "refresh must land as exactly one commit")
        // 5. query the refreshed stored index: probes resolve against
        // the TRAINED centroids, the manifest prunes to probed cells
        val q = fullQ.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val byQc = Window.partitionBy(col("q_id"))
          .orderBy(col("dist").asc, col("cell").asc)
        val probes = q.crossJoin(broadcast(cb))
          .withColumn("dist", expr(
            "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), " +
              "0D, (a, v) -> a + v)"))
          .withColumn("prn", row_number().over(byQc))
          .filter(col("prn") <= 2)
          .select(col("q_id"), col("cell"))
          .localCheckpoint(true)
        val cellsHit = probes.select("cell").distinct()
          .collect().map(r => lit(r.getInt(0))).toSeq // nprobe-bounded
        val stored = graft.io.TxTable.snapshotPartitions(s, idx, cellsHit).get
        val qRaw = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val byQ = Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        val out = stored.join(broadcast(probes), Seq("cell"))
          .join(broadcast(qRaw), Seq("q_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(byQ))
          .filter(col("rnk") <= 3)
          .select("q_id", "rnk", "vec_id", "cosine")
          .orderBy("q_id", "rnk")
          .localCheckpoint(true)
        rmrf(base)
        out
      },
      s"""WITH fv AS MATERIALIZED (
         |  SELECT e.vec_id, 0 AS j,
         |    list_transform(range(1, 65),
         |      i -> CAST(round(CAST(e.embedding[i] AS DOUBLE)
         |                      * CAST(1048576 AS DOUBLE)) AS DOUBLE)) AS v
         |  FROM embeddings e),
         |cc0 AS MATERIALIZED (
         |  SELECT j, vec_id AS cell, v AS cent FROM fv WHERE vec_id < 16),
         |${dLloyd("fv", "cc0", "ca1", "cc1", 64)},
         |${dLloyd("fv", "cc1", "ca2", "cc2", 64)},
         |cells AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |  ${dAssign("fv", "cc2", 64)}) WHERE rn = 1),
         |prx AS (
         |  SELECT s.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
         |    PARTITION BY s.vec_id
         |    ORDER BY ${dDist("s.v", "c.cent", 64)} ASC, c.cell ASC) AS prn
         |  FROM fv s JOIN cc2 c USING (j) WHERE s.vec_id < 8),
         |probes AS (SELECT q_id, cell FROM prx WHERE prn <= 2),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
         |      WHERE vec_id < 8),
         |sc AS (
         |  SELECT p.q_id, e.vec_id, ${dCos("q.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e
         |  JOIN cells ce ON e.vec_id = ce.vec_id
         |  JOIN probes p ON ce.cell = p.cell
         |  JOIN q ON q.q_id = p.q_id
         |  WHERE e.vec_id != p.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id, rnk, vec_id, cosine FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // Embedding-cosine near-dup: candidate pairs from the signature
    // bucket self-join (the only shuffle key), exact cosine ≥ 0.9
    // verification. Scaled duplicates land in the same bucket by
    // construction (signatures are scale-invariant).
    "x_dedup_embed" -> Q(
      (s, dir) => embedPairs(s, dir).orderBy("a_id", "b_id"),
      s"""WITH $EmbedPairsCte
         |SELECT a_id, b_id, cosine FROM pairse
         |ORDER BY a_id, b_id""".stripMargin),

    // Semantic dedup clusters (SemDeDup-shaped): the embedding near-dup
    // pairs roll up to connected components exactly like the text-side
    // x_dedup_clusters — the cluster id (min vec_id reachable) is the
    // canonical representative a curation pass keeps. Pair generation
    // stays bucket-local (signature shuffle key); cluster assembly is
    // ops/Components' iterative min-label propagation over the
    // repetition-sized pair set, never the corpus. Oracle: recursive-CTE
    // transitive closure over the same verified pairs.
    "x_dedup_semantic" -> Q(
      (s, dir) =>
        embedClusters(corpusE(s, dir))
          .orderBy("vec_id"),
      s"""WITH RECURSIVE $EmbedPairsCte,
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairse
         |          UNION SELECT b_id, a_id FROM pairse),
         |reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
         |)
         |SELECT node AS vec_id, MIN(r) AS cluster_id
         |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin),

    // Int8 scalar quantization — the storage/bandwidth half of ANN at
    // scale (a 64-float vector becomes 64 bytes + one scale): per-vector
    // symmetric max-abs scale, q = round(x·127/scale) clamped to ±127.
    // Pure map pass, no shuffle; every product/division is one fixed
    // IEEE-double evaluation and ties round away from zero in both
    // engines, so the quantized codes hash-match exactly. The codes are
    // emitted as a CSV string (engine-portable), with saturation count
    // and code sum as integrity summaries.
    "x_embed_quantize" -> Q(
      (s, dir) =>
        Tables.embeddings(s, dir)
          .withColumn("scale", expr(
            "aggregate(embedding, CAST(0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
          .filter(col("scale") > 0)
          .withColumn("q", expr(
            "transform(embedding, x -> CAST(greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), CAST(round(CAST(x AS DOUBLE) * 127 / scale) AS BIGINT))) AS INT))"))
          .select(col("vec_id"), col("scale"),
            expr("array_join(transform(q, v -> CAST(v AS STRING)), ',')").as("q_str"),
            expr("aggregate(q, 0, (a, v) -> a + v)").as("sum_q"),
            expr("size(filter(q, v -> abs(v) = 127))").as("n_sat"))
          .orderBy(col("vec_id")),
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_reduce([CAST(0 AS DOUBLE)] || list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
        |                (m, x) -> greatest(m, x)) AS scale
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, scale,
        |    list_transform(embedding, x ->
        |      CAST(greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
        |           CAST(round(CAST(x AS DOUBLE) * 127 / scale) AS BIGINT))) AS INT)) AS q
        |  FROM s WHERE scale > 0)
        |SELECT vec_id, scale, array_to_string(q, ',') AS q_str,
        |  list_reduce([0] || q, (a, v) -> a + v) AS sum_q,
        |  CAST(len(list_filter(q, v -> abs(v) = 127)) AS INT) AS n_sat
        |FROM qz ORDER BY vec_id""".stripMargin),

    // Higher-order array-function surface in one per-row pass:
    // size/filter/aggregate (fold)/index-zip/element access over the
    // embedding column — the vocabulary every vector kernel here is
    // built from, exercised directly. All folds run in index order with
    // double accumulators (float→double per element is exact), so every
    // value is bit-identical to the oracle's list_transform/list_reduce
    // spelling. Pure map stage: no shuffle, codegen end-to-end.
    "f_array_kitchen" -> Q(
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"))
          .select(
            col("vec_id"),
            expr("size(embedding)").as("dim"),
            expr("CAST(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS DOUBLE)")
              .as("sum_all"),
            expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
            expr("CAST(array_max(embedding) AS DOUBLE)").as("max_v"),
            expr("CAST(array_min(embedding) AS DOUBLE)").as("min_v"),
            expr("CAST(element_at(embedding, 1) AS DOUBLE)").as("first_v"),
            expr("""CAST(aggregate(
                   |  transform(sequence(1, size(embedding)),
                   |    i -> CAST(element_at(embedding, i) AS DOUBLE)
                   |       * CAST(element_at(embedding, size(embedding) - i + 1) AS DOUBLE)),
                   |  CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS DOUBLE)""".stripMargin)
              .as("rev_dot"))
          .orderBy(col("vec_id")),
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  list_reduce([CAST(0 AS DOUBLE)] || list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |              (acc, x) -> acc + x) AS sum_all,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  CAST(list_max(embedding) AS DOUBLE) AS max_v,
        |  CAST(list_min(embedding) AS DOUBLE) AS min_v,
        |  CAST(embedding[1] AS DOUBLE) AS first_v,
        |  list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[len(embedding) - i + 1] AS DOUBLE)),
        |    (acc, x) -> acc + x) AS rev_dot
        |FROM embeddings ORDER BY vec_id""".stripMargin),

    // Hard-negative mining — contrastive-training pair construction:
    // per anchor (the query set), the top-1 most-similar SAME-label
    // vector (the positive) and the top-3 most-similar OTHER-label
    // vectors (the hard negatives — the examples that actually move a
    // contrastive loss). One window pass does both: rank within
    // (anchor, same-label?) and keep rank ≤ 1 on the positive side,
    // ≤ 3 on the negative side — WindowGroupLimit keeps a bounded heap
    // per (anchor, side) instead of sorting each anchor's full score
    // list. Scoring reuses the exact fixed-order cosine (VectorOps), so
    // results are bit-identical; the anchor set broadcasts, corpus
    // scans once.
    "x_hard_negative" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"), col("embedding"))
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("q_emb"))
        val w = Window.partitionBy(col("q_id"), col("same"))
          .orderBy(col("cosine").desc, col("vec_id").asc)
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("same", (col("label") === col("q_label")).cast("int"))
          .withColumn("cosine", VectorOps.cosine(col("q_emb"), col("embedding")))
          .withColumn("rnk", row_number().over(w))
          .filter((col("same") === 1 && col("rnk") <= 1) ||
            (col("same") === 0 && col("rnk") <= 3))
          .withColumn("kind",
            when(col("same") === 1, "positive").otherwise("hard_neg"))
          .select(col("q_id"), col("kind"), col("rnk"), col("vec_id"),
            col("label"), col("cosine"))
          .orderBy(col("q_id"), col("kind"), col("rnk"))
      },
      s"""WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.q_id, e.vec_id, e.label,
         |    CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS same,
         |    ${dCos("q.q_emb", "e.embedding")} AS cosine
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id != q.q_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY q_id, same ORDER BY cosine DESC, vec_id ASC) AS rnk
         |      FROM sc)
         |SELECT q_id,
         |  CASE WHEN same = 1 THEN 'positive' ELSE 'hard_neg' END AS kind,
         |  rnk, vec_id, label, cosine
         |FROM r
         |WHERE (same = 1 AND rnk <= 1) OR (same = 0 AND rnk <= 3)
         |ORDER BY q_id, kind, rnk""".stripMargin),

    // Embedding outlier audit — per-label centroid distance, the
    // data-cleaning pass that surfaces mislabeled / out-of-distribution
    // vectors before training. Determinism architecture: the ONLY
    // cross-row float reduction (the centroid mean) runs over
    // fixed-point 2²⁰ quantized bigints (exact, order-free — the
    // x_gram_matrix discipline), and every per-vector computation is a
    // fixed-ascending-order double fold (exact-in-double, like
    // cosine) — so distances are bit-identical at any parallelism with
    // NO rounding fudge. Plan: the (label, dim) partial sums are the
    // only corpus-sized exchange (64·|labels| output rows); centroids
    // collapse to |labels| array rows that broadcast back onto the
    // scan; the distance pass is map-only and top-10 is a driver heap.
    "x_semantic_outliers" -> Q(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(round(cast(x AS double) * 1048576.0d) AS bigint))")
            .as("q"))
        val cent = emb
          .select(col("label"), posexplode(col("q")).as(Seq("i0", "qi")))
          .groupBy(col("label"), (col("i0") + 1).as("i"))
          .agg(sum(col("qi")).as("sm"), count(lit(1)).as("n"))
          .groupBy(col("label"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(i, " +
              "cast(sm AS double) / (n * 1048576.0d) AS c))), p -> p.c)")
            .as("cen"))
        emb.join(broadcast(cent), Seq("label"))
          .withColumn("dist", sqrt(expr(
            """aggregate(sequence(1, 64), cast(0.0d AS double), (acc, i) ->
              |  acc + (cast(element_at(q, i) AS double) / 1048576.0d - element_at(cen, i))
              |      * (cast(element_at(q, i) AS double) / 1048576.0d - element_at(cen, i)))"""
              .stripMargin)))
          .select(col("vec_id"), col("label"), col("dist"))
          .orderBy(col("dist").desc, col("vec_id"))
          .limit(10)
      },
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS BIGINT)) AS q
        |  FROM embeddings),
        |x AS (SELECT vec_id, label, d.i, q[d.i] AS qi
        |      FROM e, (SELECT UNNEST(range(1, 65)) AS i) d),
        |s AS (SELECT label, i, CAST(SUM(qi) AS BIGINT) AS sm, COUNT(*) AS n
        |      FROM x GROUP BY 1, 2),
        |c AS (SELECT label,
        |        list(CAST(sm AS DOUBLE) / (n * CAST(1048576 AS DOUBLE)) ORDER BY i) AS cen
        |      FROM s GROUP BY label)
        |SELECT e.vec_id, e.label,
        |  sqrt(list_reduce([CAST(0 AS DOUBLE)] || list_transform(range(1, 65), i ->
        |    (CAST(e.q[i] AS DOUBLE) / CAST(1048576 AS DOUBLE) - c.cen[i])
        |    * (CAST(e.q[i] AS DOUBLE) / CAST(1048576 AS DOUBLE) - c.cen[i])),
        |    (acc, v) -> acc + v)) AS dist
        |FROM e JOIN c USING (label)
        |ORDER BY dist DESC, vec_id LIMIT 10""".stripMargin),

    // Distributed Gram matrix (XᵀX) of the embedding matrix — the
    // reduction under PCA / covariance / whitening: every (i ≤ j) dim
    // pair's Σ over rows, as d·(d+1)/2 output rows. Cross-ROW float
    // summation is order-dependent (unlike the per-row fixed-order
    // folds of cosine/rev_dot), so exactness comes from FIXED-POINT
    // QUANTIZATION: each element maps to round(x·2²⁰) — a bigint,
    // since scaling a float by a power of two is exact in double and
    // both engines round ties away from zero — and the pair products
    // accumulate as DECIMAL(38,0) integers (order-free, exact at any
    // parallelism and any corpus size; a plain int64 sum would
    // overflow near 10⁹ rows). The result rescales by 2⁻⁴⁰ at the
    // end. Plan: per-row pair generation is one higher-order
    // projection (no join against a dims table), the only exchange
    // carries (i, j) partial sums — 2 080 rows per task whatever the
    // corpus — and the explode's 2080× amplification happens map-side
    // below partial aggregation, so nothing row-amplified ever
    // shuffles.
    "x_gram_matrix" -> Q(
      (s, dir) =>
        Tables.embeddings(s, dir)
          .select(expr(
            """explode(flatten(transform(sequence(1, 64), i ->
              |  transform(sequence(i, 64), j -> struct(
              |    i AS i, j AS j,
              |    cast(round(cast(element_at(embedding, i) AS double) * 1048576.0d) AS bigint)
              |      * cast(round(cast(element_at(embedding, j) AS double) * 1048576.0d) AS bigint)
              |      AS p)))))""".stripMargin).as("e"))
          .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("p").cast("decimal(38,0)")).as("sq"))
          .select(col("i"), col("j"),
            (col("sq").cast("double") / lit(1099511627776.0d)).as("gram"))
          .orderBy(col("i"), col("j")),
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS BIGINT)) AS q
        |  FROM embeddings),
        |d AS (SELECT UNNEST(range(1, 65)) AS i),
        |pr AS (SELECT di.i AS i, dj.i AS j FROM d di, d dj WHERE dj.i >= di.i),
        |prod AS (SELECT pr.i, pr.j,
        |           CAST(q.q[pr.i] * q.q[pr.j] AS DECIMAL(38,0)) AS p
        |         FROM q CROSS JOIN pr)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(SUM(p) AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS gram
        |FROM prod GROUP BY i, j ORDER BY i, j""".stripMargin)
  )
}
