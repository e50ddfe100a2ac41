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

  // --- PNG: the second real container (zlib via java.util.zip) -------------
  // Everything a spec-correct 8-bit truecolor PNG needs is JVM-built-in:
  // CRC32 for chunk checksums, Deflater/Inflater for the IDAT zlib
  // stream. The encoder exercises ALL FIVE scanline filters (None, Sub,
  // Up, Average, Paeth) on a deterministic per-row schedule; the decoder
  // independently re-derives them, verifies every chunk CRC, and rejects
  // malformed containers — so the round trip covers the whole filter
  // reconstruction matrix, and the byte-blind oracle again guarantees an
  // encoder/decoder bug pair cannot cancel.

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** the Paeth predictor (PNG spec §9, exact tie-break order) */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** spec-correct 8-bit truecolor PNG encoder; `filterOf(y)` picks each
    * row's filter type (0..4) so callers can force any filter class */
  def encodePng(w: Int, h: Int, filterOf: Int => Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = w * 3
    val raw = Array.ofDim[Byte](h * (stride + 1))
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        cur(x * 3) = r & 0xff; cur(x * 3 + 1) = g & 0xff; cur(x * 3 + 2) = b & 0xff
        x += 1
      }
      val ft = filterOf(y)
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= 3) cur(i - 3) else 0
        val up = if (y > 0) prior(i) else 0
        val ul = if (y > 0 && i >= 3) prior(i - 3) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - left
          case 2 => cur(i) - up
          case 3 => cur(i) - (left + up) / 2
          case 4 => cur(i) - paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad filter $other")
        }
        raw(y * (stride + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** independent PNG decoder: signature + chunk walk with per-chunk CRC
    * verification, multi-IDAT zlib inflate, all five filter
    * reconstructions. Throws on any malformed container. */
  def decodePng(bytes: Array[Byte]): (Int, Int, (Int, Int) => (Int, Int, Int)) = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG")
    val b = java.nio.ByteBuffer.wrap(bytes) // chunk fields are big-endian
    b.position(8)
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(b.remaining >= 8, "truncated chunk header")
      val len = b.getInt
      val tb = new Array[Byte](4); b.get(tb)
      val typ = new String(tb, "US-ASCII")
      require(len >= 0 && b.remaining >= len + 4, s"truncated $typ chunk")
      val data = new Array[Byte](len); b.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      require(b.getInt == crc.getValue.toInt, s"bad CRC on $typ")
      typ match {
        case "IHDR" =>
          val ib = java.nio.ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          require(ib.get() == 8 && ib.get() == 2, "not 8-bit truecolor")
          require(ib.get() == 0 && ib.get() == 0 && ib.get() == 0,
            "unsupported compression/filter/interlace")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks are skippable by spec
      }
    }
    require(w > 0 && h > 0, "missing IHDR")
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    var off = 0
    while (!infl.finished() && off < raw.length) {
      val n = infl.inflate(raw, off, raw.length - off)
      if (n == 0)
        require(!infl.needsInput && !infl.needsDictionary, "truncated zlib stream")
      off += n
    }
    infl.end()
    require(off == raw.length, s"short pixel stream: $off of ${raw.length}")
    val img = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      var i = 0
      while (i < stride) {
        val v = raw(y * (stride + 1) + 1 + i) & 0xff
        val left = if (i >= 3) img(y * stride + i - 3) else 0
        val up = if (y > 0) img((y - 1) * stride + i) else 0
        val ul = if (y > 0 && i >= 3) img((y - 1) * stride + i - 3) else 0
        val rec = ft match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad filter $other")
        }
        img(y * stride + i) = rec & 0xff
        i += 1
      }
      y += 1
    }
    def px(x: Int, yy: Int): (Int, Int, Int) =
      (img(yy * stride + x * 3), img(yy * stride + x * 3 + 1),
        img(yy * stride + x * 3 + 2))
    (w, h, px)
  }

  private case class PngStats(doc_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, mean_luma: Double)

  /** PNG encode→decode round trip per document: the per-row filter
    * schedule `(doc_id + y) % 5` puts every filter class on the hot path
    * of every run; no n_bytes column — deflate output size has no
    * closed form for the byte-blind oracle to predict. */
  def imageDecodePng(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = (widthOf(id), heightOf(id))
        val png = encodePng(w, h, y => ((id + y) % 5).toInt,
          (x, y) => (red(id, x, y), green(id, x, y), blue(id, x, y)))
        val (w2, h2, px) = decodePng(png)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            val (r, g, bl) = px(x, y)
            sr += r; sg += g; sb += bl
            x += 1
          }
          y += 1
        }
        PngStats(id, w2, h2, sr, sg, sb,
          (299L * sr + 587L * sg + 114L * sb).toDouble / (1000.0 * w2 * h2))
      })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_image_decode" -> imageDecode,
    "q_image_resize" -> imageResize,
    "q_image_decode_png" -> imageDecodePng)

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
           |FROM p ORDER BY doc_id""".stripMargin),
    "q_image_decode_png" ->
      (gridSql("8 + doc_id % 9", "6 + doc_id % 5", "x", "y") +
        s"""
           |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
           |  CAST(sum_b AS BIGINT) AS sum_b,
           |  CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS DOUBLE)
           |    / (1000.0 * w * h) AS mean_luma
           |FROM p ORDER BY doc_id""".stripMargin))
}
