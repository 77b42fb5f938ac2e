package graft.multimodal

/** A REAL pure-JVM decoder for RIFF/WAVE audio (PCM16 mono/stereo), plus
  * the sample statistics the audio tier (q157) extracts — the audio twin of
  * [[PpmCodec]]: the PARSER is format-honest (RIFF container walk, chunk
  * skipping, fmt validation, loud rejection of malformed streams —
  * WavCodecSpec drives it with hand-built byte streams), while the audio
  * FILES are synthesized ([[encodeFixture]], deterministic, oracle-mirrored)
  * because the container ships none.
  */
object WavCodec {

  /** One decoded clip: format facts + the raw PCM16 samples. */
  final case class Clip(channels: Int, sampleRate: Int, bitsPerSample: Int,
                        samples: Array[Short])

  // ---------------------------------------------------------------- decode

  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one RIFF/WAVE stream: the container header, then a chunk walk
    * that validates `fmt ` (PCM, 16-bit) and extracts `data`, SKIPPING any
    * other chunk (LIST/INFO/fact/cue — real files carry them; chunks are
    * word-aligned, so odd sizes consume a pad byte). Throws
    * IllegalArgumentException on malformation. */
  def decode(payload: Array[Byte]): Clip = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"WAV parse error: $msg")
    if (payload.length < 12) fail("shorter than a RIFF header")
    if (tag(payload, 0) != "RIFF") fail(s"bad container tag '${tag(payload, 0)}'")
    if (tag(payload, 8) != "WAVE") fail(s"bad form type '${tag(payload, 8)}'")
    val riffEnd = math.min(payload.length.toLong, 8L + le32(payload, 4))
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None   // (channels, rate, bits)
    var data: Option[Array[Short]] = None
    while (pos + 8 <= riffEnd) {
      val id = tag(payload, pos)
      val sz = le32(payload, pos + 4)
      val body = pos + 8
      if (body + sz > riffEnd) fail(s"chunk '$id' overruns the container")
      id match {
        case "fmt " =>
          if (sz < 16) fail(s"fmt chunk too short ($sz)")
          val audioFormat = le16(payload, body)
          if (audioFormat != 1) fail(s"unsupported audio format $audioFormat (PCM only)")
          val channels = le16(payload, body + 2)
          val rate = le32(payload, body + 4).toInt
          val bits = le16(payload, body + 14)
          if (bits != 16) fail(s"unsupported bit depth $bits (PCM16 only)")
          if (channels < 1 || rate <= 0) fail(s"bad fmt: channels=$channels rate=$rate")
          fmt = Some((channels, rate, bits))
        case "data" =>
          if (sz % 2 != 0) fail(s"odd PCM16 data size $sz")
          val n = (sz / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = le16(payload, body + 2 * i).toShort
            i += 1
          }
          data = Some(out)
        case _ => ()   // unknown chunk: skipped by the walk below
      }
      pos = body + sz.toInt + (sz.toInt & 1)   // word alignment pad
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some(s)) =>
        // PCM frames interleave one sample per channel — a data chunk that
        // is not frame-aligned means the fmt/data pair is inconsistent and
        // every per-channel statistic downstream would silently desync
        if (s.length % ch != 0)
          fail(s"data chunk holds ${s.length} samples, not a multiple of $ch channels")
        Clip(ch, rate, bits, s)
      case (None, _) => fail("missing fmt chunk")
      case (_, None) => fail("missing data chunk")
    }
  }

  // ---------------------------------------------------- real sample stats

  /** Exact-integer sample statistics of one clip — see [[stats]]. `energy`
    * and `peak` range over ALL samples (channel-agnostic by definition);
    * `zeroCrossings` is summed over per-channel sign-change counts;
    * `energyCh0` is channel 0's energy alone — the interleaving canary (a
    * decoder that mixes channels changes it even when the totals agree). */
  final case class SampleStats(energy: Long, peak: Long,
                               zeroCrossings: Long, energyCh0: Long)

  /** Exact-integer sample statistics of a decoded clip: total squared
    * energy, peak amplitude, zero crossings, and channel-0 energy. PCM
    * interleaves channels frame by frame, so a crossing is a sign change
    * between CONSECUTIVE SAMPLES OF THE SAME CHANNEL (stride = channel
    * count); counting over the raw interleaved series would compare L
    * against R and invent crossings neither channel has. `s ≥ 0` is the
    * positive class, so silence → non-negative counts once per channel.
    * All longs — no float accumulation order for the two engines to
    * disagree on. */
  def stats(c: Clip): SampleStats = {
    var energy = 0L; var peak = 0L; var zc = 0L; var e0 = 0L
    val ch = c.channels
    var i = 0
    while (i < c.samples.length) {
      val s = c.samples(i).toLong
      energy += s * s
      if (i % ch == 0) e0 += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (i >= ch) {
        val p = c.samples(i - ch).toLong
        if ((p < 0 && s >= 0) || (p >= 0 && s < 0)) zc += 1
      }
      i += 1
    }
    SampleStats(energy, peak, zc, e0)
  }

  // ------------------------------------------------------ FIXTURE encode

  val FixtureRate = 8000
  /** Samples per md5 block: one digest = 16 bytes = 8 PCM16 samples. */
  val BlockSamples = 8

  /** Number of sample blocks a text renders to: 32 + h48 % 97 (256..1024
    * samples — sub-second clips at 8 kHz). */
  def fixtureBlocksOf(h48: Long): Int = 32 + (h48 % 97).toInt

  /** Stereo gate for the fixture corpus: documents whose h48 is divisible
    * by 4 render 2-channel clips (~25% of the corpus), the rest mono — so
    * both channel layouts are exercised end-to-end by q157's oracle, not
    * just by hand-built spec bytes. */
  def fixtureChannelsOf(h48: Long): Int = if (h48 % 4 == 0) 2 else 1

  /** FIXTURE — the harness's stand-in for real audio files: a PCM16 WAV at
    * [[FixtureRate]] Hz whose sample block k is the 16 bytes of
    * md5(text ":wav:" k) read as 8 little-endian int16s, with a LIST/INFO
    * chunk between fmt and data so the decoder's chunk skipping is
    * exercised on every document. `channels` writes the fmt facts (count,
    * byte rate, block align); the SAME digest byte stream is then read as
    * interleaved frames, so a stereo clip's per-channel series differ from
    * its interleaved series and the decoder's de-interleaving is what the
    * oracle checks. Deterministic and mirrored in the oracle. */
  def encodeFixture(text: String, nBlocks: Int, channels: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 2, s"fixture channels: $channels")
    val md = java.security.MessageDigest.getInstance("MD5")
    val dataLen = nBlocks * BlockSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + 12 + dataLen)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes(ascii)); w32(4 + 24 + 12 + 8 + dataLen)
    out.write("WAVE".getBytes(ascii))
    out.write("fmt ".getBytes(ascii)); w32(16)
    w16(1); w16(channels); w32(FixtureRate)
    w32(FixtureRate * 2L * channels); w16(2 * channels); w16(16)
    out.write("LIST".getBytes(ascii)); w32(4); out.write("INFO".getBytes(ascii))
    out.write("data".getBytes(ascii)); w32(dataLen)
    var k = 0
    while (k < nBlocks) {
      md.reset()
      out.write(md.digest(s"$text:wav:$k".getBytes("UTF-8")))
      k += 1
    }
    out.toByteArray
  }
}
