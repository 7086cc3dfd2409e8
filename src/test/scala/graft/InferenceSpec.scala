package graft

import graft.ops.Inference
import org.apache.spark.util.LongAccumulator

/** Batch-shape laws of the inference seam (ops.Inference): the model is
  * called once per batch (not per row), partial tail batches are sized
  * honestly, and output values are invariant to partitioning — only the
  * batch bookkeeping may differ.
  */
class InferenceSpec extends SparkTestBase {

  private final class CountingModel(
      calls: LongAccumulator, oversize: LongAccumulator, limit: Int)
      extends Inference.BatchModel {
    private val inner = new Inference.StubModel(4)
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      calls.add(1)
      if (texts.length > limit) oversize.add(1)
      inner.embed(texts)
    }
  }

  test("one model call per batch; tail batch is partial, never padded") {
    val s = spark
    import s.implicits._
    val docs = (1L to 25L).map(i => (i, s"doc number $i"))
      .toDF("id", "text").as[(Long, String)].repartition(1)
    val out = Inference.embedDocuments(docs, new Inference.StubModel(4), batchSize = 10)
      .collect().sortBy(_.doc_id)
    assert(out.length === 25)
    // single partition → batches of 10, 10, 5 in order
    assert(out.groupBy(_.batch_seq).view.mapValues(_.length).toMap ===
      Map(0 -> 10, 1 -> 10, 2 -> 5))
    out.foreach(e => assert(e.batch_n === (if (e.batch_seq == 2) 5 else 10)))
  }

  test("model call count is batches, not rows") {
    val s = spark
    import s.implicits._
    val calls = s.sparkContext.longAccumulator("calls")
    val oversize = s.sparkContext.longAccumulator("oversize")
    val docs = (1L to 100L).map(i => (i, s"text $i"))
      .toDF("id", "text").as[(Long, String)].repartition(4)
    Inference.embedDocuments(docs, new CountingModel(calls, oversize, 16), batchSize = 16)
      .collect()
    // 4 partitions × ceil(25/16)=2 calls = 8 (exact only if rows split
    // evenly; bound it instead): between ceil(100/16)=7 and 7+4 calls
    assert(calls.value >= 7 && calls.value <= 11,
      s"${calls.value} model calls for 100 rows / batch 16 / 4 partitions")
    assert(oversize.value === 0L, "a batch exceeded batchSize")
  }

  test("embedding values are partition-invariant; only batch bookkeeping moves") {
    val s = spark
    import s.implicits._
    def run(parts: Int) = {
      val docs = (1L to 50L).map(i => (i, s"payload $i"))
        .toDF("id", "text").as[(Long, String)].repartition(parts)
      Inference.embedDocuments(docs, new Inference.StubModel(4))
        .collect().map(e => e.doc_id -> e.vec.toSeq).toMap
    }
    assert(run(1) === run(7))
  }
}
