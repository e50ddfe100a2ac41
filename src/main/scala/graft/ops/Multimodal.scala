package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3): media as opaque `binary`
  * columns + typed metadata extracted by a batched per-partition decode
  * pipeline. The decode itself is a clearly-marked deterministic STUB
  * (image/audio libs are not in this container); everything Spark-side —
  * binary payload column, schema, partition-parallel batch decode via
  * mapPartitions, typed output — is real and oracle-checked. */
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

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // binary payload column: deterministic fake "media" bytes (UTF-8 of the
    // text) standing in for image/audio blobs
    val withPayload = Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    // batched decode: one JVM-side pass per partition, no per-row driver work
    withPayload.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("q_multimodal_meta" -> multimodalMeta)

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 30 AS BIGINT) AS n_frames,
        | octet_length(encode(text)) / 1000.0 AS duration_s
        |FROM documents ORDER BY doc_id""".stripMargin)
}
