package graft

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The degenerate-bucket defenses of the near-dup pipeline
  * (queries/Text): exact-collapse before banding, compact band shuffle,
  * per-band candidate cap. The contract under test:
  *
  *  1. EQUIVALENCE — below the cap, the hardened pipeline's doc-level
  *     pairs are value-identical to the naive all-docs band self-join
  *     (the pre-hardening formulation, re-spelled here as the test
  *     oracle), including on corpora with many exact duplicates.
  *  2. CLUSTER PATH — minhashClustersOver assembles the same clusters
  *     without materializing intra-class pairs, so a corpus dominated
  *     by identical documents stays linear-cost.
  *  3. CAP — an adversarial band bucket over the cap drops candidates
  *     deterministically AND reports the drop via minhashBandDrops;
  *     under-cap corpora report nothing.
  */
class DedupScaleSpec extends SparkTestBase {

  /** The pre-hardening formulation: band self-join over ALL docs with
    * shingle sets carried through the shuffle. Kept verbatim as the
    * semantic oracle for the hardened path. */
  private def naivePairs(c: DataFrame): DataFrame = {
    val bands = c
      .withColumn("t", split(col("text"), " "))
      .withColumn("sh", TextHash.shingleSet(col("t"), 3))
      .withColumn("mh", TextHash.minhash(col("sh"), 8))
      .filter(col("mh").isNotNull)
      .withColumn("bkey", explode(expr(
        "transform(sequence(0, 3), b -> concat(cast(b AS string), ':', cast(element_at(mh, 2*b+1) AS string), ':', cast(element_at(mh, 2*b+2) AS string)))")))
      .select("doc_id", "sh", "bkey")
    bands.as("a")
      .join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sh").as("sa"), col("b.sh").as("sb"))
      .distinct()
      .withColumn("jaccard", TextHash.jaccardSim(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id", "jaccard")
  }

  /** Mixed corpus: unique texts, exact-duplicate families, near-dup
    * variants, and a too-short text that never bands. */
  private def mixed: DataFrame = {
    val s = spark
    import s.implicits._
    val base = (1 to 20).map(i =>
      (i.toLong, s"document number $i talks about topic ${i % 4} in detail with several shared tokens"))
    val exact = Seq(101L -> base(2)._2, 102L -> base(2)._2, 103L -> base(7)._2)
    val near = Seq(
      201L -> (base(4)._2 + " extra tail marker"),
      202L -> (base(9)._2 + " different suffix here"))
    val short = Seq(301L -> "too short")
    (base ++ exact ++ near ++ short).toDF("doc_id", "text")
  }

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("hardened pairs are value-identical to the naive band self-join") {
    val got = graft.queries.Text.minhashPairsOver(mixed)
    val want = naivePairs(mixed)
    assert(canon(got) === canon(want),
      s"hardened pair set diverges from the naive formulation")
    // sanity: exact duplicates did produce Jaccard-1 pairs
    assert(got.filter(col("jaccard") === 1.0).count() >= 3)
  }

  test("cluster assembly matches CC over doc-level pairs, without building them") {
    val got = graft.queries.Text.minhashClustersOver(mixed)
    val want = graft.ops.Components.connectedComponents(
        naivePairs(mixed).select(col("a_id").as("src"), col("b_id").as("dst")))
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    assert(canon(got) === canon(want))
  }

  test("an identical-document corpus stays rep-level-tiny: zero rep pairs, one cluster") {
    val s = spark
    import s.implicits._
    val n = 500
    val c = (1 to n).map(i =>
      (i.toLong, "the same boilerplate text repeated verbatim across every document in this corpus"))
      .toDF("doc_id", "text")
    // the candidate graph collapses to ONE class: no rep pairs at all
    assert(graft.queries.Text.minhashRepPairsOver(c).count() === 0)
    // yet every doc clusters, labeled by the minimum id
    val cl = graft.queries.Text.minhashClustersOver(c)
    assert(cl.count() === n)
    assert(cl.select("cluster_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
    // and the doc-level pair listing still expands correctly (n·(n−1)/2)
    val pairs = graft.queries.Text.minhashPairsOver(c)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    assert(pairs.filter(col("jaccard") =!= 1.0).count() === 0)
  }

  test("per-band cap drops candidates deterministically and reports the loss") {
    val s = spark
    import s.implicits._
    // 8 distinct texts sharing most shingles: same band buckets, all
    // distinct classes — the boilerplate-near-identical shape
    val c = (1 to 8).map(i =>
      (i.toLong, s"shared prefix tokens run along here for every doc while v$i differs"))
      .toDF("doc_id", "text")
    val uncapped = canon(graft.queries.Text.minhashPairsOver(c))
    assert(graft.queries.Text.minhashBandDrops(c).count() === 0,
      "under-cap corpus reported drops")
    spark.conf.set("spark.graft.dedup.bandCap", "3")
    try {
      val capped = canon(graft.queries.Text.minhashPairsOver(c))
      assert(capped.subsetOf(uncapped),
        "capped pairs are not a subset of the uncapped pairs")
      assert(capped.size < uncapped.size,
        "cap=3 on an 8-doc shared bucket dropped nothing")
      val drops = graft.queries.Text.minhashBandDrops(c).collect()
      assert(drops.nonEmpty && drops.head.getLong(1) > 0,
        "cap dropped candidates without reporting them")
    } finally spark.conf.unset("spark.graft.dedup.bandCap")
  }
}
