package graft.queries

import graft.Tables
import graft.ops.MultiModal
import graft.ops.MultiModal.MediaRecord
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: documents re-materialized as opaque
  * `binary` media with typed metadata (SURVEY.md §7.5). The corpus text
  * is pure ASCII (verified: octet_length(encode(text)) == length(text)
  * at every scale factor), so the DuckDB oracle can express the same
  * byte operations on VARCHAR while the Spark side runs on genuine
  * BinaryType columns.
  */
object Multimodal {

  /** documents → MediaRecord rows: modality from doc_id mod 3, content
    * as UTF-8 bytes, deterministic metadata from n_chars. */
  private def records(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"),
      col("text").cast("binary").as("content"),
      when(col("doc_id") % 3 =!= 1, (lit(16) + col("n_chars") % 640).cast("int"))
        .as("width"),
      when(col("doc_id") % 3 =!= 1, (lit(16) + col("n_chars") % 480).cast("int"))
        .as("height"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") / 8.0).as("duration_s"))

  val all: Map[String, Q] = Map(

    // Typed-Dataset decode path: mapPartitions feature extraction with
    // the stub codec (per-partition decoder init — the mapInPandas batch
    // shape). Every emitted feature is byte-deterministic, so the oracle
    // verifies the full pipeline including the binary round-trip.
    "x_mm_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        MultiModal
          .extractFeatures(records(s, dir).as[MediaRecord])
          .toDF()
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  md5(text) AS content_fp,
        |  md5(substring(text, 1, 64)) AS thumb_fp,
        |  CASE WHEN doc_id % 3 != 1 THEN CAST(16 + n_chars % 640 AS INT) END AS width,
        |  CASE WHEN doc_id % 3 != 1 THEN CAST(16 + n_chars % 480 AS INT) END AS height,
        |  CASE WHEN doc_id % 3 != 0 THEN n_chars / 8.0 END AS duration_s
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Resize (stub codec): image rows are "decoded" (the ASCII stub's
    // decode is a binary→string cast), downsampled by a stride-2 byte
    // drop — a real resize kernel slots into the same
    // decode→transform→fingerprint shape — and re-fingerprinted, with
    // halved dimensions in the metadata. The stride is a single global
    // regex, so the whole pass stays one codegen'd projection.
    "x_mm_resize" -> Q(
      (s, dir) =>
        records(s, dir)
          .filter(col("media_type") === "image")
          .withColumn("decoded", col("content").cast("string"))
          .withColumn("resized", regexp_replace(col("decoded"), "(.).", "$1"))
          .select(
            col("doc_id"),
            (col("width") / 2).cast("int").as("new_width"),
            (col("height") / 2).cast("int").as("new_height"),
            octet_length(col("resized")).as("resized_bytes"),
            md5(col("resized").cast("binary")).as("resized_fp"))
          .orderBy("doc_id"),
      """SELECT doc_id,
        |  CAST((16 + n_chars % 640) // 2 AS INT) AS new_width,
        |  CAST((16 + n_chars % 480) // 2 AS INT) AS new_height,
        |  CAST(length(regexp_replace(text, '(.).', '\1', 'g')) AS INT) AS resized_bytes,
        |  md5(regexp_replace(text, '(.).', '\1', 'g')) AS resized_fp
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin),

    // Frame sampling: video rows explode into up to 4 fixed-stride byte
    // windows ("frames"), each fingerprinted — binary slicing and
    // generation fully inside whole-stage codegen.
    "x_mm_frames" -> Q(
      (s, dir) =>
        records(s, dir)
          .filter(col("media_type") === "video")
          .withColumn("n_frames",
            least(lit(4L), greatest(lit(1L), floor(octet_length(col("content")) / 256))))
          .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
          .select(
            col("doc_id"), col("frame_idx"),
            expr("octet_length(substring(content, cast(frame_idx * 256 + 1 AS INT), 256))")
              .as("frame_bytes"),
            expr("md5(substring(content, cast(frame_idx * 256 + 1 AS INT), 256))")
              .as("frame_fp"))
          .orderBy("doc_id", "frame_idx"),
      """WITH v AS (
        |  SELECT doc_id, text,
        |         least(4, greatest(1, length(text) // 256)) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, n_frames)) AS frame_idx
        |  FROM v)
        |SELECT doc_id, frame_idx,
        |       CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS INT) AS frame_bytes,
        |       md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_fp
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin),

    // Batched model inference (ops/Inference): the "embed every
    // document" stage, with the model called once per 64-row BATCH
    // inside mapPartitions (the GPU/Arrow batch shape) and loaded once
    // per partition. The stub model's coordinates are md5-derived with
    // an exact power-of-two scale, so the oracle value-checks the whole
    // batching pipeline — batch composition varies with partitioning,
    // values never do (a float (b−128)/128 widens to the identical
    // double the oracle computes).
    "x_embed_infer" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        graft.ops.Inference
          .embedDocuments(docs, new graft.ops.Inference.StubModel(4))
          .toDF()
          .select(col("doc_id") +:
            (0 until 4).map(i => col("vec")(i).cast("double").as(s"d$i")): _*)
          .orderBy("doc_id")
      },
      s"""SELECT doc_id,
         |${(0 until 4).map(i =>
            s"  (CAST(('0x' || substr(md5(text), ${2 * i + 1}, 2)) AS INT) - 128) / 128.0 AS d$i")
            .mkString(",\n")}
         |FROM documents ORDER BY doc_id""".stripMargin),

    // Audio-frame energy profile — the audio kernel of the modality
    // family (decode is x_mm_decode's stub; frames are x_mm_frames'
    // byte windows): audio rows split into fixed 256-byte frames (the
    // PCM-chunk shape), each frame's energy is the exact integer sum
    // of its byte values, and the per-document profile reports frame
    // count, total/peak energy and the loudest frame's index (min
    // index on ties — array_position's first match in both engines).
    // A real PCM RMS kernel slots into the same frame→reduce shape;
    // integer arithmetic end-to-end means the oracle matches
    // bit-for-bit with no float-order caveats. Zero shuffles before
    // the presentation sort.
    "x_mm_audio_energy" -> Q(
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(col("doc_id") % 3 === 1)
          .withColumn("n", length(col("text")))
          .withColumn("nw", expr("CAST(ceil(n / 256.0) AS INT)"))
          .withColumn("energies", expr(
            """transform(sequence(0, nw - 1), w ->
              |  aggregate(
              |    transform(sequence(1 + w * 256, least(n, (w + 1) * 256)),
              |              i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
              |    0L, (a, c) -> a + c))""".stripMargin))
          .select(col("doc_id"),
            col("nw").as("n_frames"),
            expr("aggregate(energies, 0L, (a, c) -> a + c)").as("total_energy"),
            expr("array_max(energies)").as("peak_energy"),
            expr("CAST(array_position(energies, array_max(energies)) - 1 AS INT)")
              .as("peak_frame"))
          .orderBy("doc_id"),
      """WITH a AS (SELECT doc_id, text, length(text) AS n,
        |             CAST(ceil(length(text) / 256.0) AS INT) AS nw
        |           FROM documents WHERE doc_id % 3 = 1),
        |e AS (SELECT doc_id, nw,
        |        list_transform(range(0, nw), w ->
        |          list_reduce(
        |            [CAST(0 AS BIGINT)] || list_transform(
        |              range(1 + w * 256, 1 + least(n, (w + 1) * 256)),
        |              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |            (acc, c) -> acc + c)) AS energies
        |      FROM a)
        |SELECT doc_id, nw AS n_frames,
        |  list_reduce([CAST(0 AS BIGINT)] || energies, (acc, c) -> acc + c) AS total_energy,
        |  list_max(energies) AS peak_energy,
        |  CAST(list_position(energies, list_max(energies)) - 1 AS INT) AS peak_frame
        |FROM e ORDER BY doc_id""".stripMargin)
  )
}
