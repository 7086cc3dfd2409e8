package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Batched model-inference seam — the "embed every document" stage of a
  * training-data pipeline, shaped for models that want BATCH calls.
  *
  * [[MultiModal.extractFeatures]] amortizes per-partition init for
  * row-at-a-time decoders; inference needs one more property: the model
  * is called once per fixed-size BATCH of rows (the batch dimension is
  * what GPUs and ONNX/Arrow bridges are throughput-bound on — the JVM
  * analog of a Pandas-UDF `mapInPandas` body receiving record batches).
  * `embedDocuments` therefore: resolves the model once per partition
  * (weights load amortized, never per row, never on the driver),
  * re-chunks the partition iterator into `batchSize` groups, makes one
  * `embed(texts)` call per group, and streams results out without
  * materializing the partition.
  *
  * The shipped model is a deterministic stub (md5-derived coordinates —
  * the real embedding runtimes aren't dependencies of this engine,
  * deliberately); its values are engine-portable by construction
  * ((byte − 128)/128 is an exact binary division), so the whole
  * plumbing is value-oracle-tested, not just smoke-tested. Batch
  * composition depends on partitioning; output VALUES don't — the
  * reproducibility contract sampling and dedup already follow.
  */
object Inference {

  case class DocEmbedding(
      doc_id: Long, vec: Array[Float], batch_seq: Int, batch_n: Int)

  /** One model call per batch of texts. Implementations wrap the real
    * runtime (ONNX session, JNI bridge, remote endpoint); the engine
    * requires only per-input determinism. */
  trait BatchModel extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic stand-in for an embedding model: dimension i is
    * md5-byte i mapped to [−1, 1) by an exact power-of-two division —
    * bit-identical in any engine, which is what lets the inference
    * PLUMBING be value-tested end-to-end. */
  final class StubModel(val dims: Int) extends BatchModel {
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val d = MessageDigest.getInstance("MD5")
      texts.map { t =>
        val h = d.digest(t.getBytes("UTF-8"))
        Array.tabulate(dims)(i => ((h(i) & 0xff) - 128) / 128.0f)
      }
    }
  }

  /** Partition-batched embedding: one model resolution per partition,
    * one model call per `batchSize` rows, streaming both directions.
    * batch_seq/batch_n expose the batch shape for tests and diagnostics
    * — they are partitioning-dependent; values are not. */
  def embedDocuments(
      ds: Dataset[(Long, String)],
      model: BatchModel,
      batchSize: Int = 64): Dataset[DocEmbedding] = {
    require(batchSize > 0, "batchSize must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val m = model // per-partition init point for heavyweight runtimes
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
        val vecs = m.embed(batch.map(_._2))
        require(vecs.length == batch.length,
          s"model returned ${vecs.length} vectors for ${batch.length} inputs")
        batch.lazyZip(vecs).map { case ((id, _), v) =>
          DocEmbedding(id, v, bi, batch.length)
        }
      }
    }
  }
}
