package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL image-container codec for the multimodal family — BMP, the one
  * mainstream raster format whose full spec fits in a page and needs no
  * library: 14-byte file header + 40-byte BITMAPINFOHEADER, 24-bit BGR
  * pixels, rows stored BOTTOM-UP and padded to 4-byte boundaries.
  * [[Multimodal]]'s JPEG/MP4 decoders are honest stubs (those libs are
  * not in this container); this file is the non-stub proof that the
  * batched binary-column plumbing carries a real decode: the operators
  * ENCODE a procedural image to spec-correct BMP bytes, then an
  * independent DECODER parses the container back (header fields, row
  * order, padding, channel order) and aggregates pixel statistics —
  * while the DuckDB oracle computes the same statistics from the
  * closed-form pixel generator without ever touching bytes. An encoder
  * or decoder bug (padding slip, RGB/BGR swap, top-down rows) cannot
  * cancel out: the oracle is byte-blind, so only a correct round-trip
  * hashes equal. (Reference scope: multimodal columns over opaque
  * binaries — the LLM-pipeline surface of SURVEY §2.3.)
  *
  * Scale shape: one mapPartitions pass per operator, no shuffle before
  * the final per-image row; payloads never leave the executor. */
object ImageCodec {
  type Q = (SparkSession, String) => DataFrame

  /** procedural pixel: channel values are a deterministic function of
    * (image seed, x, y) — the SQL oracle evaluates the same formulas */
  @inline def red(seed: Long, x: Int, y: Int): Int = ((seed * 31 + x * 7 + y * 13) % 256).toInt
  @inline def green(seed: Long, x: Int, y: Int): Int = ((seed * 17 + x * 3 + y * 5) % 256).toInt
  @inline def blue(seed: Long, x: Int, y: Int): Int = ((seed * 11 + x + y * 2) % 256).toInt

  /** image geometry per doc: small and varied, with widths whose 3·w row
    * length is NOT a multiple of 4 so the padding path is always live */
  def widthOf(docId: Long): Int = 8 + (docId % 9).toInt  // 8..16
  def heightOf(docId: Long): Int = 6 + (docId % 5).toInt // 6..10

  /** spec-correct 24-bit BMP encoder (pure JVM, no imageio) */
  def encodeBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val size = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    // BITMAPINFOHEADER
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // pixel array: bottom-up rows, BGR, zero padding
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { b.put(0.toByte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** independent BMP decoder: parses the headers (magic, pixel offset,
    * dimensions, bpp), walks the bottom-up padded rows, returns
    * (w, h, pixel accessor). Throws on any malformed container. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B' && b.get(1) == 'M', "not a BMP")
    val off = b.getInt(10)
    val w = b.getInt(18)
    val h = b.getInt(22)
    require(b.getShort(28) == 24, s"not 24-bit: ${b.getShort(28)}")
    val rowStride = (w * 3 + 3) / 4 * 4
    require(bytes.length >= off + rowStride * h, "truncated pixel array")
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val base = off + (h - 1 - y) * rowStride + x * 3
      ((bytes(base + 2) & 0xff, bytes(base + 1) & 0xff, bytes(base) & 0xff))
    }
    (w, h, px)
  }

  private case class ImgStats(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, sum_r: Long, sum_g: Long, sum_b: Long, mean_luma: Double)

  private def statsOf(docId: Long, bytes: Array[Byte]): ImgStats = {
    val (w, h, px) = decodeBmp(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        sr += r; sg += g; sb += bl
        x += 1
      }
      y += 1
    }
    // integer-weighted luma (Rec.601 ×1000) keeps the mean division the
    // only FP op — bit-identical across engines
    val luma1000 = 299L * sr + 587L * sg + 114L * sb
    ImgStats(docId, w, h, bytes.length, sr, sg, sb,
      luma1000.toDouble / (1000.0 * w * h))
  }

  /** encode→decode round trip per document: procedural pixels → real BMP
    * bytes → independent parse → per-channel sums. The oracle computes
    * the sums from the generator formulas (byte-blind). */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = (widthOf(id), heightOf(id))
        val bmp = encodeBmp(w, h, (x, y) => (red(id, x, y), green(id, x, y), blue(id, x, y)))
        statsOf(id, bmp)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** nearest-neighbor downsample ON REAL PIXELS: decode the BMP, take
    * every 2nd pixel, re-ENCODE the half-size BMP, decode it again and
    * aggregate — the full storage-side thumbnail pipeline with the codec
    * live in both directions. */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = (widthOf(id), heightOf(id))
        val bmp = encodeBmp(w, h, (x, y) => (red(id, x, y), green(id, x, y), blue(id, x, y)))
        val (_, _, px) = decodeBmp(bmp)
        val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
        val thumb = encodeBmp(w2, h2, (x, y) => px(2 * x, 2 * y))
        statsOf(id, thumb).copy(doc_id = id)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_image_decode" -> imageDecode,
    "q_image_resize" -> imageResize)

  /** pixel-sum CTE from the generator formulas over a (doc, x, y) grid */
  private def gridSql(wExpr: String, hExpr: String, xMap: String, yMap: String): String =
    s"""WITH g AS (
       |  SELECT doc_id, $wExpr AS w, $hExpr AS h FROM documents
       |), p AS (
       |  SELECT doc_id, w, h,
       |    SUM((doc_id * 31 + ($xMap) * 7 + ($yMap) * 13) % 256) AS sum_r,
       |    SUM((doc_id * 17 + ($xMap) * 3 + ($yMap) * 5) % 256) AS sum_g,
       |    SUM((doc_id * 11 + ($xMap) + ($yMap) * 2) % 256) AS sum_b
       |  FROM g, UNNEST(range(0, w)) ux(x), UNNEST(range(0, h)) uy(y)
       |  GROUP BY doc_id, w, h
       |)""".stripMargin

  /** 54-byte headers + bottom-up rows padded to 4 bytes — the byte-size
    * formula the oracle uses to predict n_bytes without seeing bytes */
  private val bmpBytes = "54 + ((3 * W + 3) // 4 * 4) * H"

  val oracles: Map[String, String] = Map(
    "q_image_decode" ->
      (gridSql("8 + doc_id % 9", "6 + doc_id % 5", "x", "y") +
        s"""
           |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           |  CAST(${bmpBytes.replace("W", "w").replace("H", "h")} AS BIGINT) AS n_bytes,
           |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
           |  CAST(sum_b AS BIGINT) AS sum_b,
           |  CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS DOUBLE)
           |    / (1000.0 * w * h) AS mean_luma
           |FROM p ORDER BY doc_id""".stripMargin),
    "q_image_resize" ->
      (gridSql("(8 + doc_id % 9 + 1) // 2", "(6 + doc_id % 5 + 1) // 2",
        "2 * x", "2 * y") +
        s"""
           |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           |  CAST(${bmpBytes.replace("W", "w").replace("H", "h")} AS BIGINT) AS n_bytes,
           |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
           |  CAST(sum_b AS BIGINT) AS sum_b,
           |  CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS DOUBLE)
           |    / (1000.0 * w * h) AS mean_luma
           |FROM p ORDER BY doc_id""".stripMargin))
}
