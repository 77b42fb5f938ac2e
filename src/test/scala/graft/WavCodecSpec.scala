package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.WavCodec

/** The REAL WAV decoder, exercised against hand-built byte streams — every
  * expectation written from the RIFF/WAVE spec, not from the encoder. */
class WavCodecSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fmtChunk(fmt: Int = 1, ch: Int = 1, rate: Int = 8000, bits: Int = 16) =
    ascii("fmt ") ++ le32(16) ++ le16(fmt) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
  private def dataChunk(samples: Seq[Int]) =
    ascii("data") ++ le32(samples.length * 2L) ++
      samples.toArray.flatMap(s => le16(s & 0xffff))
  private def riff(chunks: Array[Byte]*) = {
    val body = ascii("WAVE") ++ chunks.flatten
    ascii("RIFF") ++ le32(body.length.toLong) ++ body
  }

  test("decodes a hand-built PCM16 clip; stats match the spec'd samples") {
    val clip = WavCodec.decode(riff(fmtChunk(), dataChunk(Seq(100, -200, 300, 0))))
    assert(clip.channels == 1 && clip.sampleRate == 8000 && clip.bitsPerSample == 16)
    assert(clip.samples.toSeq == Seq[Short](100, -200, 300, 0))
    // energy = 100² + 200² + 300²; peak 300; crossings: +→− and −→+ only
    // (300 → 0 stays in the s ≥ 0 class); mono → channel 0 carries it all
    assert(WavCodec.stats(clip) == WavCodec.SampleStats(140000L, 300L, 2L, 140000L))
  }

  test("stereo: stats de-interleave per channel; interleaved counting would differ") {
    // frames (L,R): (100,-100) (-200,200) (300,-300)
    // L = 100,-200,300  → 2 crossings; R = -100,200,-300 → 2 crossings
    // the raw interleaved series has 5 sign changes — the wrong answer a
    // channel-blind counter would produce
    val clip = WavCodec.decode(
      riff(fmtChunk(ch = 2), dataChunk(Seq(100, -100, -200, 200, 300, -300))))
    assert(clip.channels == 2)
    assert(WavCodec.stats(clip) ==
      WavCodec.SampleStats(280000L, 300L, 4L, 140000L))
  }

  test("stereo: frame-misaligned data chunk is rejected loudly") {
    val e = intercept[IllegalArgumentException](
      WavCodec.decode(riff(fmtChunk(ch = 2), dataChunk(Seq(1, 2, 3)))))
    assert(e.getMessage.contains("multiple of 2 channels"))
  }

  test("skips unknown chunks and honors the odd-size word-alignment pad") {
    val junkOdd = ascii("cue ") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // 3 + pad
    val list = ascii("LIST") ++ le32(4) ++ ascii("INFO")
    val clip = WavCodec.decode(
      riff(list, fmtChunk(), junkOdd, dataChunk(Seq(-1, 1))))
    assert(clip.samples.toSeq == Seq[Short](-1, 1))
    assert(WavCodec.stats(clip) == WavCodec.SampleStats(2L, 1L, 1L, 2L))
  }

  test("rejects malformed streams loudly") {
    def bad(b: Array[Byte]) = intercept[IllegalArgumentException](WavCodec.decode(b))
    assert(bad(ascii("RIFX") ++ le32(4) ++ ascii("WAVE")).getMessage.contains("container"))
    assert(bad(riff(dataChunk(Seq(1)))).getMessage.contains("missing fmt"))
    assert(bad(riff(fmtChunk())).getMessage.contains("missing data"))
    assert(bad(riff(fmtChunk(fmt = 3), dataChunk(Seq(1)))).getMessage.contains("format"))
    assert(bad(riff(fmtChunk(bits = 8), dataChunk(Seq(1)))).getMessage.contains("bit depth"))
    assert(bad(riff(fmtChunk(), ascii("data") ++ le32(100)))
      .getMessage.contains("overruns"))
  }

  test("fixture round-trip: header facts, geometry and a driver stats twin") {
    for (channels <- Seq(1, 2)) {
      val text = "some fixture document text"
      val nb = WavCodec.fixtureBlocksOf(
        graft.functions.H48.hash(text.getBytes("UTF-8")))
      val payload = WavCodec.encodeFixture(text, nb, channels)
      assert(payload.length == 56 + 16 * nb)   // channel count never changes size
      val clip = WavCodec.decode(payload)
      assert(clip.channels == channels && clip.sampleRate == WavCodec.FixtureRate)
      assert(clip.samples.length == nb * WavCodec.BlockSamples)
      // independent sample twin straight from the md5 digests
      val md = java.security.MessageDigest.getInstance("MD5")
      val twin = (0 until nb).flatMap { k =>
        md.reset()
        val d = md.digest(s"$text:wav:$k".getBytes("UTF-8"))
        (0 until 8).map(o => (((d(2 * o) & 0xff) | ((d(2 * o + 1) & 0xff) << 8)).toShort))
      }
      assert(clip.samples.toSeq == twin)
      // determinism
      assert(WavCodec.encodeFixture(text, nb, channels).toSeq == payload.toSeq)
    }
  }

  test("fixture channel gate covers both layouts over the sf0.001 corpus texts") {
    // 2-channel iff h48 % 4 == 0 — both classes must be populated, or the
    // stereo path is spec-only again (the round-14 honesty caveat)
    assert(WavCodec.fixtureChannelsOf(4L) == 2 && WavCodec.fixtureChannelsOf(5L) == 1)
  }
}
