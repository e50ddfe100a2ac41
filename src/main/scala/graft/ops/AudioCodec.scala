package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL audio-container codec for the multimodal family — WAV/RIFF with
  * 16-bit PCM, the audio format whose complete container spec needs no
  * library: a 12-byte RIFF header, a chunk walk, a 16-byte PCM `fmt `
  * body, and little-endian interleaved frames. [[Multimodal]]'s
  * MP3/OGG-style decoders stay honest stubs (those libs are not in this
  * container); like [[ImageCodec]] (BMP, PNG) this file is the non-stub
  * proof for AUDIO: operators ENCODE a procedural PCM signal to
  * spec-correct WAV bytes, an independent DECODER chunk-walks the
  * container back (magics, PCM format gate, block alignment, frame
  * interleave), and the DuckDB oracle computes the same statistics from
  * the closed-form sample generator WITHOUT touching bytes — an
  * encoder/decoder bug pair (endianness slip, channel deinterleave
  * swap, off-by-one chunk walk) cannot cancel out.
  *
  * Scale shape: one mapPartitions pass per operator, no shuffle before
  * the final per-clip row; payloads never leave the executor — the same
  * contract a 100 TB audio corpus needs (decode is embarrassingly
  * parallel; only per-clip stats move). */
object AudioCodec {
  type Q = (SparkSession, String) => DataFrame

  /** procedural 16-bit sample: a deterministic integer function of
    * (clip seed, flat sample index) the SQL oracle replays exactly */
  @inline def sample(seed: Long, i: Long): Int =
    (((seed * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt

  /** per-clip geometry: mono/stereo alternating, three sample rates,
    * varied frame counts — every decoder path stays live */
  def channelsOf(docId: Long): Int = 1 + (docId % 2).toInt
  def rateOf(docId: Long): Int = 8000 + (docId % 3).toInt * 4000
  def framesOf(docId: Long): Int = 200 + (docId % 50).toInt

  /** spec-correct RIFF/WAVE PCM-16 encoder (pure JVM, no javax.sound) */
  def encodeWav(channels: Int, sampleRate: Int, pcm: Array[Int]): Array[Byte] = {
    require(pcm.length % channels == 0, "partial frame")
    val dataSize = pcm.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < pcm.length) { b.putShort(pcm(i).toShort); i += 1 }
    b.array()
  }

  /** independent WAV decoder: verifies RIFF/WAVE magics, WALKS the chunk
    * list (unknown chunks are skipped by their declared size — the spec's
    * extensibility rule, so containers with LIST/fact chunks still
    * parse), gates on PCM/16-bit, checks block alignment, and returns
    * (channels, sampleRate, frames, sample(frame, channel)). Throws on
    * any malformed container. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Int, (Int, Int) => Int) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated RIFF header")
    require(b.get(0) == 'R' && b.get(1) == 'I' && b.get(2) == 'F' && b.get(3) == 'F',
      "not RIFF")
    require(b.get(8) == 'W' && b.get(9) == 'A' && b.get(10) == 'V' && b.get(11) == 'E',
      "not WAVE")
    var pos = 12
    var channels = -1; var rate = -1; var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = b.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"chunk '$id' overruns file")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          require(b.getShort(pos + 8) == 1, s"not PCM: format ${b.getShort(pos + 8)}")
          channels = b.getShort(pos + 10)
          rate = b.getInt(pos + 12)
          require(b.getShort(pos + 20) == channels * 2,
            s"block align ${b.getShort(pos + 20)} != ${channels * 2}")
          require(b.getShort(pos + 22) == 16, s"not 16-bit: ${b.getShort(pos + 22)}")
        case "data" =>
          require(channels > 0, "data chunk before fmt")
          dataOff = pos + 8; dataLen = len
        case _ => // unknown chunk: skip by declared size
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(channels > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(dataLen % (channels * 2) == 0, "partial trailing frame")
    val frames = dataLen / (channels * 2)
    (channels, rate, frames,
      (f: Int, c: Int) => b.getShort(dataOff + (f * channels + c) * 2).toInt)
  }

  private case class WavStats(doc_id: Long, channels: Long, sample_rate: Long,
      n_frames: Long, n_bytes: Long, sum_s: Long, sum_abs: Long, peak: Long,
      mean_abs: Double)

  private def statsOf(docId: Long, bytes: Array[Byte]): WavStats = {
    val (ch, sr, nf, s) = decodeWav(bytes)
    var sum = 0L; var sumAbs = 0L; var peak = 0L
    var f = 0
    while (f < nf) {
      var c = 0
      while (c < ch) {
        val v = s(f, c).toLong
        sum += v; sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
        c += 1
      }
      f += 1
    }
    // the mean division is the only FP op — bit-identical across engines
    WavStats(docId, ch, sr, nf, bytes.length.toLong, sum, sumAbs, peak,
      sumAbs.toDouble / (nf.toLong * ch))
  }

  /** encode → independently decode → per-clip signal statistics */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (ch, sr, nf) = (channelsOf(id), rateOf(id), framesOf(id))
        val pcm = Array.tabulate(nf * ch)(i => sample(id, i.toLong))
        statsOf(id, encodeWav(ch, sr, pcm))
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** decimating resample (the frame-sampling move of a training
    * pipeline): decode, keep every 2nd frame, RE-ENCODE at half the
    * rate, decode the new container, stats — both codec directions run
    * again on the derived clip, so a resample bug or a stale-header slip
    * breaks the hash */
  def audioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (ch, sr, nf) = (channelsOf(id), rateOf(id), framesOf(id))
        val pcm = Array.tabulate(nf * ch)(i => sample(id, i.toLong))
        val (dch, dsr, dnf, s) = decodeWav(encodeWav(ch, sr, pcm))
        val nf2 = (dnf + 1) / 2
        val dec = Array.tabulate(nf2 * dch)(i => s(2 * (i / dch), i % dch))
        statsOf(id, encodeWav(dch, dsr / 2, dec))
      })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_audio_decode" -> audioDecode,
    "q_audio_resample" -> audioResample)

  /** byte-blind sample replay over (doc geometry × flat index) */
  private def genSql(nfExpr: String, idxExpr: String): String =
    s"""WITH d AS (
       |  SELECT doc_id, 1 + doc_id % 2 AS ch,
       |    8000 + (doc_id % 3) * 4000 AS sr,
       |    200 + doc_id % 50 AS nf
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, ch, sr, nf, CAST($nfExpr AS BIGINT) AS nf2, u.i AS i
       |  FROM d, UNNEST(range(0, CAST(($nfExpr) * ch AS BIGINT))) u(i)),
       |s AS (
       |  SELECT doc_id, ch, sr, nf, nf2,
       |    ((doc_id * 2654435761 + ($idxExpr) * 40503) % 65536) - 32768 AS v
       |  FROM g),
       |p AS (
       |  SELECT doc_id, MAX(ch) AS ch, MAX(sr) AS sr, MAX(nf2) AS nf2,
       |    CAST(SUM(v) AS BIGINT) AS sum_s,
       |    CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       |    CAST(MAX(ABS(v)) AS BIGINT) AS peak
       |  FROM s GROUP BY doc_id)
       |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_audio_decode" ->
      (genSql("nf", "i") +
        s"""SELECT doc_id, CAST(ch AS BIGINT) AS channels,
           |  CAST(sr AS BIGINT) AS sample_rate, nf2 AS n_frames,
           |  CAST(44 + nf2 * ch * 2 AS BIGINT) AS n_bytes,
           |  sum_s, sum_abs, peak,
           |  CAST(sum_abs AS DOUBLE) / CAST(nf2 * ch AS DOUBLE) AS mean_abs
           |FROM p ORDER BY doc_id""".stripMargin),
    // decimated frame j reads original frame 2j: flat index i of the
    // derived clip maps to 2*(i//ch)*ch + i%ch in the generator
    "q_audio_resample" ->
      (genSql("(nf + 1) // 2", "2 * (i // ch) * ch + i % ch") +
        s"""SELECT doc_id, CAST(ch AS BIGINT) AS channels,
           |  CAST(sr // 2 AS BIGINT) AS sample_rate, nf2 AS n_frames,
           |  CAST(44 + nf2 * ch * 2 AS BIGINT) AS n_bytes,
           |  sum_s, sum_abs, peak,
           |  CAST(sum_abs AS DOUBLE) / CAST(nf2 * ch AS DOUBLE) AS mean_abs
           |FROM p ORDER BY doc_id""".stripMargin))
}
