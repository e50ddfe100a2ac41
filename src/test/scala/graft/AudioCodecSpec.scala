package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AudioCodec._

/** The WAV/PCM codec round-trip and its refusal paths — no Spark job. */
class AudioCodecSpec extends AnyFunSuite {

  private def pcmOf(id: Long, frames: Int, ch: Int): Array[Int] =
    Array.tabulate(frames * ch)(i => sample(id, i.toLong))

  test("round-trip: every (channels, rate, frame-count) shape is exact") {
    for (ch <- Seq(1, 2); sr <- Seq(8000, 12000, 16000); nf <- Seq(1, 7, 200, 249)) {
      val pcm = pcmOf(ch * 1000L + nf, nf, ch)
      val (dch, dsr, dnf, s) = decodeWav(encodeWav(ch, sr, pcm))
      assert((dch, dsr, dnf) == (ch, sr, nf))
      for (f <- 0 until nf; c <- 0 until ch)
        assert(s(f, c) == pcm(f * ch + c), s"sample ($f,$c) ch=$ch")
    }
  }

  test("full 16-bit range survives, including the sign boundary") {
    val pcm = Array(-32768, -1, 0, 1, 32767, -32768)
    val (_, _, nf, s) = decodeWav(encodeWav(2, 8000, pcm))
    assert(nf == 3)
    assert((0 until 3).flatMap(f => Seq(s(f, 0), s(f, 1))) == pcm.toSeq)
  }

  test("chunk walk skips unknown chunks (LIST before data), word-aligned") {
    val canon = encodeWav(1, 8000, pcmOf(3L, 5, 1))
    // rebuild with an odd-sized junk chunk between fmt and data: the
    // decoder must skip it by declared size + pad byte
    val junkBody = Array[Byte](1, 2, 3) // len 3, padded to 4
    val b = java.nio.ByteBuffer.allocate(canon.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(canon, 0, 36) // RIFF..fmt chunk end
    b.put("LIST".getBytes("US-ASCII")).putInt(3).put(junkBody).put(0.toByte)
    b.put(canon, 36, canon.length - 36)
    val bytes = b.array()
    // fix the RIFF size field for the inserted chunk
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val (ch, sr, nf, s) = decodeWav(bytes)
    assert((ch, sr, nf) == (1, 8000, 5))
    assert(s(4, 0) == sample(3L, 4L))
  }

  test("malformed containers are refused, not misread") {
    val good = encodeWav(1, 8000, pcmOf(9L, 4, 1))
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException] { decodeWav(notRiff) }
    val notWave = good.clone(); notWave(8) = 'X'.toByte
    intercept[IllegalArgumentException] { decodeWav(notWave) }
    // non-PCM format code
    val alaw = good.clone(); alaw(20) = 6.toByte
    intercept[IllegalArgumentException] { decodeWav(alaw) }
    // declared data length overruns the file
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 9999)
    intercept[IllegalArgumentException] { decodeWav(overrun) }
    // truncated mid-header
    intercept[IllegalArgumentException] { decodeWav(good.take(10)) }
    // partial trailing frame (stereo data of odd sample count)
    val stereo = encodeWav(2, 8000, pcmOf(9L, 4, 2))
    val partial = stereo.take(stereo.length - 2)
    java.nio.ByteBuffer.wrap(partial).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, partial.length - 8)
    java.nio.ByteBuffer.wrap(partial).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 16 - 2)
    intercept[IllegalArgumentException] { decodeWav(partial) }
  }

  test("resample decimation keeps even frames at half the rate") {
    val id = 42L
    val ch = channelsOf(id)
    val pcm = pcmOf(id, 9, ch)
    val (_, _, _, s) = decodeWav(encodeWav(ch, 16000, pcm))
    val nf2 = 5 // ceil(9/2)
    val dec = Array.tabulate(nf2 * ch)(i => s(2 * (i / ch), i % ch))
    val (dch, dsr, dnf, d) = decodeWav(encodeWav(ch, 8000, dec))
    assert((dch, dsr, dnf) == (ch, 8000, nf2))
    for (f <- 0 until nf2; c <- 0 until ch)
      assert(d(f, c) == pcm(2 * f * ch + c))
  }
}
