package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

/** Multimodal column handling: media as opaque `binary` content with
  * typed metadata, and partition-batched feature extraction through a
  * pluggable decoder (SURVEY.md §7.5).
  *
  * The decode step is where a real deployment would call an image/audio
  * codec; those libraries are deliberately NOT a dependency of this
  * engine, so the shipped decoder is a deterministic stub ([[StubDecoder]])
  * that fingerprints the raw bytes. The Spark-side plumbing — binary
  * column schema, typed Dataset, mapPartitions batching with one decoder
  * instance per partition (the JVM analog of mapInPandas batch shape:
  * codec init is amortized across a partition, never per row, and no
  * data ever funnels through the driver) — is real and oracle-tested.
  */
object MultiModal {

  /** One media object: opaque bytes + modality-typed metadata.
    * width/height populate for image/video, duration for audio/video. */
  case class MediaRecord(
      doc_id: Long, media_type: String, content: Array[Byte],
      width: Option[Int], height: Option[Int], duration_s: Option[Double])

  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      content_fp: String, thumb_fp: String,
      width: Option[Int], height: Option[Int], duration_s: Option[Double])

  /** The decode seam. A production implementation wraps a codec
    * (JPEG/PNG decode, PCM resample, keyframe extraction); the engine
    * only requires determinism per input bytes. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in for a codec: md5 content fingerprint and a
    * "thumbnail" that is the first 64 bytes refingerprinted — enough to
    * exercise schema, batching and the oracle without native image
    * libraries. */
  object StubDecoder extends MediaDecoder {
    private def md5hex(b: Array[Byte]): String = {
      // MessageDigest is not thread-safe and not serializable — create
      // per call; cost is trivial next to the digest itself.
      val d = MessageDigest.getInstance("MD5")
      d.digest(b).map("%02x".format(_)).mkString
    }
    override def decode(r: MediaRecord): MediaFeatures =
      MediaFeatures(
        r.doc_id, r.media_type, r.content.length,
        md5hex(r.content), md5hex(r.content.take(64)),
        r.width, r.height, r.duration_s)
  }

  /** Partition-batched feature extraction: the decoder is resolved once
    * per partition (mapInPandas-style batch shape), rows stream through
    * without materializing the partition. */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val d = decoder // per-partition init point for heavyweight codecs
      it.map(d.decode)
    }
  }
}
