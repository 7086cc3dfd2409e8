package graft

import graft.functions.TextHash
import graft.queries.Text
import org.apache.spark.sql.functions._

/** End-to-end QUALITY pin for the MinHash+LSH near-dup pipeline — the
  * text-side sibling of AnnSpec's recall floors. The oracle proves the
  * LSH output equals DuckDB's spelling of the same bands; this spec
  * measures it against the GROUND TRUTH the bands approximate: exact
  * all-pairs shingle Jaccard over the same dedup corpus.
  *
  * Precision is asserted EXACT (== 1): every emitted pair is verified
  * with the exact Jaccard kernel at the same ≥ 0.5 threshold, so a
  * single false positive means the verification join broke. Recall is
  * the quantity banding actually trades away (missed buckets, caps) —
  * pinned to a floor so a band-construction regression (hash family
  * typo, band-count change) fails here instead of shipping.
  */
class MinHashRecallSpec extends SparkTestBase {

  test("LSH pairs: precision exactly 1, recall >= 0.9 vs exact all-pairs Jaccard") {
    val c = Text.corpus(spark, sfSmoke)
    // mirror the pipeline's eligibility: documents whose shingle set is
    // empty (< 3 tokens) have NULL minhash and never enter banding
    val sh = c.withColumn("t", split(col("text"), " "))
      .withColumn("sh", TextHash.shingleSet(col("t"), 3))
      .filter(size(col("sh")) > 0)
      .select("doc_id", "sh")
    val truth = sh.as("a")
      .join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", TextHash.jaccardSim(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "injected duplicates must produce true pairs")

    val found = SparkEntry.queries("x_dedup_minhash_lsh")(spark, sfSmoke)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val falsePositives = found -- truth
    assert(falsePositives.isEmpty,
      s"verified pairs outside ground truth (verification broke): " +
        falsePositives.take(5).mkString(", "))
    val recall = found.size.toDouble / truth.size
    info(f"minhash-LSH pair recall = $recall%.3f (${found.size}/${truth.size})")
    assert(recall >= 0.9, f"recall $recall%.3f below the 0.9 floor")
  }
}
