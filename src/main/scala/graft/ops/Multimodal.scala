package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3): media as opaque `binary`
  * columns + typed metadata extracted by batched per-partition pipelines.
  * The decode here is a clearly-marked deterministic STUB (JPEG/MP4 libs
  * are not in this container); everything Spark-side — binary payload
  * column, schema, partition-parallel batch processing via mapPartitions,
  * 1→N frame explosion, typed outputs — is real and oracle-checked. For
  * a REAL container decode through the same plumbing see [[ImageCodec]]
  * (lib-free BMP encode/decode, pixel statistics gated against a
  * byte-blind oracle).
  *
  * The four operators mirror a production media pipeline:
  *  - [[multimodalMeta]]  : container-header decode → typed metadata
  *  - [[frameSample]]     : video frame sampling (1 payload → N frames)
  *  - [[mediaResize]]     : thumbnail/resize (payload → smaller payload)
  *  - [[mediaFeatures]]   : feature extraction (payload → numeric features)
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** typed metadata a real decoder would emit */
  case class MediaMeta(doc_id: Long, n_bytes: Long, n_frames: Long, duration_s: Double)

  /** STUB decoder: a real implementation would parse the container header
    * (e.g. JPEG/FLAC/MP4) from `payload`; here the metadata is derived
    * deterministically from the byte stream so the full pipeline is
    * value-checkable without media libraries. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n, n % 30L, n / 1000.0)
  }

  private def md5hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  /** binary payload column: deterministic fake "media" bytes (UTF-8 of the
    * text) standing in for image/audio blobs */
  private def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // batched decode: one JVM-side pass per partition, no per-row driver work
    withPayload(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }

  /** frames are FrameBytes-sized payload slices; sampling keeps every
    * `FrameStride`-th frame — the 1→N batch shape of real frame sampling */
  val FrameBytes = 100
  val FrameStride = 4

  /** STUB frame extraction: a real video decoder would emit pixel buffers;
    * the slice boundaries, 1→N explosion, and per-frame identity (md5)
    * are the real plumbing a sampler needs, and are exactly checkable. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        // ceil-division: an exact-multiple payload must NOT emit a phantom
        // empty trailing frame; an empty payload has no frames at all
        val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
        (0 until nFrames by FrameStride).iterator.map { f =>
          val frame = bytes.slice(f * FrameBytes,
            math.min((f + 1) * FrameBytes, bytes.length))
          (id, f.toLong, frame.length.toLong, md5hex(frame))
        }
      })
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  /** STUB resize: keep every `ResizeStride`-th byte (a real implementation
    * would decode + rescale pixels); output is the "thumbnail" identity +
    * size, the contract a storage-side resize stage has to honor */
  val ResizeStride = 4

  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val thumb = bytes.indices.collect {
          case i if i % ResizeStride == 0 => bytes(i)
        }.toArray
        (id, thumb.length.toLong, md5hex(thumb))
      })
      .toDF("doc_id", "thumb_bytes", "thumb_md5")
      .orderBy("doc_id")
  }

  /** STUB feature extraction: byte-class histogram + mean byte value (a
    * real implementation would run an image/audio embedding model over the
    * decoded buffer) — numeric per-payload features as typed columns */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val h = new Array[Long](4)
        var s = 0L
        bytes.foreach { b => val u = b & 0xff; h(u % 4) += 1; s += u }
        val n = math.max(bytes.length, 1)
        (id, h(0), h(1), h(2), h(3), s.toDouble / n)
      })
      .toDF("doc_id", "h0", "h1", "h2", "h3", "mean_byte")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> multimodalMeta,
    "q_frame_sample" -> frameSample,
    "q_media_resize" -> mediaResize,
    "q_media_features" -> mediaFeatures)

  // documents are ASCII (verified in round 2), so byte i of the UTF-8
  // payload equals unicode(substr(text, i+1, 1)) and byte slices equal
  // substrings — which is what lets DuckDB replay the stub decoders.
  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 30 AS BIGINT) AS n_frames,
        | octet_length(encode(text)) / 1000.0 AS duration_s
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, u.f,
         |    substr(text, u.f * $FrameBytes + 1, $FrameBytes) AS frame
         |  FROM documents,
         |    UNNEST(range(0, (length(text) + ${FrameBytes - 1}) // $FrameBytes, $FrameStride)) AS u(f)
         |)
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
         |  CAST(length(frame) AS BIGINT) AS frame_bytes, md5(frame) AS frame_md5
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_resize" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(
         |      range(1, length(text) + 1, $ResizeStride),
         |      i -> substr(text, i, 1)), '') AS thumb
         |  FROM documents
         |)
         |SELECT doc_id, CAST(length(thumb) AS BIGINT) AS thumb_bytes,
         |  md5(thumb) AS thumb_md5
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_media_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) + 1),
        |      i -> unicode(substr(text, i, 1))) AS us
        |  FROM documents
        |)
        |SELECT doc_id,
        | CAST(len(list_filter(us, u -> u % 4 = 0)) AS BIGINT) AS h0,
        | CAST(len(list_filter(us, u -> u % 4 = 1)) AS BIGINT) AS h1,
        | CAST(len(list_filter(us, u -> u % 4 = 2)) AS BIGINT) AS h2,
        | CAST(len(list_filter(us, u -> u % 4 = 3)) AS BIGINT) AS h3,
        | CAST(COALESCE(CAST(list_sum(us) AS BIGINT), 0) AS DOUBLE)
        |   / greatest(len(us), 1) AS mean_byte
        |FROM b ORDER BY doc_id""".stripMargin)
}
