package graft.multimodal

/** A REAL pure-JVM decoder for (concatenated) binary PPM — `P6` — image
  * streams, plus the pixel-statistics and perceptual-hash primitives the
  * multimodal queries (q52/q53/q67/q133/q136) extract from decoded frames.
  *
  * The decoder is format-honest: it parses any spec-conforming P6 stream —
  * magic, `#` comments, arbitrary whitespace, multi-digit dimensions,
  * maxval, then `width·height·3` raw bytes — and rejects malformed input
  * loudly (PpmCodecSpec drives it with hand-built byte streams, including
  * comment/whitespace torture cases, independent of the fixture below).
  * Multi-image streams model animation: frames are parsed until the buffer
  * is exhausted (the natural container for P6, which has no frame count).
  *
  * The container has no real image FILES, so the harness synthesizes them:
  * [[encodeFixture]] (clearly marked FIXTURE) renders each document as an
  * animation of 16-px-wide P6 frames — one pixel row per 64-char text
  * chunk, RGB bytes taken from the md5 digests of (chunk, frame, row,
  * slot). The synthesis is deterministic and mirrored in the DuckDB oracle,
  * so every downstream pixel statistic — including the ones computed by
  * THIS decoder from the parsed frames — is hash-checked end to end. Near-
  * identical documents render to images agreeing on most pixel rows, which
  * is exactly the structure the perceptual tier exists to catch.
  */
object PpmCodec {

  /** One decoded image: dimensions plus the raw interleaved RGB plane. */
  final case class Frame(width: Int, height: Int, maxVal: Int,
                         pixels: Array[Byte])

  // ---------------------------------------------------------------- decode

  /** Parse a stream of one or more concatenated binary PPM (P6) images.
    * Throws IllegalArgumentException on any malformation: wrong magic,
    * missing header fields, non-positive dimensions, or a truncated pixel
    * block. An empty payload yields zero frames.
    */
  def decode(payload: Array[Byte]): Seq[Frame] = {
    val out = Seq.newBuilder[Frame]
    var pos = 0
    while (pos < payload.length) {
      val (frame, next) = decodeOne(payload, pos)
      out += frame
      pos = next
    }
    out.result()
  }

  /** Parse a single P6 image starting at `from`; returns (frame, nextPos). */
  private def decodeOne(b: Array[Byte], from: Int): (Frame, Int) = {
    var pos = from
    def fail(msg: String) =
      throw new IllegalArgumentException(s"PPM parse error at byte $pos: $msg")
    // header token scanner: skips whitespace and '#' comments (to EOL)
    def skipSpace(): Unit = {
      var done = false
      while (!done && pos < b.length) {
        val c = b(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else done = true
      }
    }
    def token(): String = {
      skipSpace()
      val start = pos
      while (pos < b.length && !Character.isWhitespace(b(pos).toChar) &&
             b(pos) != '#') pos += 1
      if (pos == start) fail("expected header token, found end of input")
      new String(b, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    def intToken(name: String): Int = {
      val t = token()
      try t.toInt catch { case _: NumberFormatException => fail(s"bad $name '$t'") }
    }
    val magic = token()
    if (magic != "P6") fail(s"bad magic '$magic' (binary PPM required)")
    val w = intToken("width"); val h = intToken("height")
    val mv = intToken("maxval")
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (mv <= 0 || mv > 255) fail(s"unsupported maxval $mv (single-byte only)")
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= b.length || !Character.isWhitespace(b(pos).toChar))
      fail("missing raster separator")
    pos += 1
    // raster size in LONG: spec-conforming huge headers (w·h·3 > 2³¹) would
    // overflow Int and could wrap to a small positive n, silently mis-sizing
    // the raster and desyncing the concatenated-frame walk — fail loudly
    val nL = 3L * w * h
    if (nL > b.length - pos)
      fail(s"truncated raster: need $nL bytes, have ${b.length - pos}")
    val n = nL.toInt   // safe: ≤ remaining buffer length, an Int
    val px = java.util.Arrays.copyOfRange(b, pos, pos + n)
    (Frame(w, h, mv, px), pos + n)
  }

  // ---------------------------------------------------- real pixel stats

  /** Integer luminance of one pixel scaled by 1000: 299·R + 587·G + 114·B
    * (the ITU-R BT.601 weights as exact integers — no float accumulation
    * order for the two engines to disagree on). Range [0, 255000]. */
  @inline def lum1000(r: Int, g: Int, bl: Int): Long =
    299L * r + 587L * g + 114L * bl

  /** Per-row luminance sums (scaled by 1000) of a frame — the projection
    * profile every blockhash/dHash-family perceptual hash downsamples. */
  def rowLums(f: Frame): Array[Long] = {
    val out = new Array[Long](f.height)
    var r = 0
    while (r < f.height) {
      var acc = 0L; var c = 0
      val base = r * f.width * 3
      while (c < f.width) {
        val i = base + c * 3
        acc += lum1000(f.pixels(i) & 0xff, f.pixels(i + 1) & 0xff,
          f.pixels(i + 2) & 0xff)
        c += 1
      }
      out(r) = acc; r += 1
    }
    out
  }

  /** Per-channel byte sums over a frame's raster: (sumR, sumG, sumB). */
  def channelSums(f: Frame): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < f.pixels.length) {
      sr += f.pixels(i) & 0xff
      sg += f.pixels(i + 1) & 0xff
      sb += f.pixels(i + 2) & 0xff
      i += 3
    }
    (sr, sg, sb)
  }

  // -------------------------------------------------- perceptual hashing

  /** Quantization thresholds for one 16-pixel row's luminance sum (scale
    * 1000): uniform-random pixels give μ = 16·127500 = 2 040 000 and
    * σ ≈ 197 000, so the three cuts at μ−δ, μ, μ+δ (δ = 100 000 ≈ 0.5 σ)
    * all carry real signal (bit probabilities ≈ 0.69 / 0.50 / 0.31). */
  val RowLumTauLo  = 1940000L
  val RowLumTauMid = 2040000L
  val RowLumTauHi  = 2140000L
  private val Taus = Array(RowLumTauLo, RowLumTauMid, RowLumTauHi)

  /** Rows the hash reads (3 bits each → 48 bits total). */
  val PhashRows = 16

  /** 48-bit row-luminance-profile perceptual hash of a decoded frame:
    * quantize each of the first [[PhashRows]] row sums against the three
    * [[Taus]] cuts. A frame SHORTER than [[PhashRows]] rows contributes
    * zero bits for the missing rows (it hashes as itself, not as resampled
    * noise) — note the FIXTURE never produces one (every fixture frame is
    * a full 16 rows; its short-document degeneracy is empty tail slices
    * hashing to shared digests, see Multimodal.MediaMaxBucket).
    *
    * Bit LAYOUT is interleaved across the 4 LSH bands the consumer
    * (Multimodal.mediaNearPairsOf) extracts as contiguous 12-bit fields:
    * row r, cut k → bit (r % 4)·12 + (r / 4)·3 + k. Every band therefore
    * mixes head rows with tail rows, so no band degenerates into an
    * all-corpus-identical value on short images (head rows 0–3 land one in
    * each band) — the banding-index analog of bit-interleaving in Z-order.
    * A single-row edit touches exactly one band's 3 bits, so pigeonhole
    * completeness at Hamming ≤ 3 is preserved.
    */
  def phashOf(f: Frame): Long = {
    val rl = rowLums(f)
    var ph = 0L
    var r = 0
    val n = math.min(rl.length, PhashRows)
    while (r < n) {
      var k = 0
      while (k < 3) {
        if (rl(r) > Taus(k)) ph |= 1L << ((r % 4) * 12 + (r / 4) * 3 + k)
        k += 1
      }
      r += 1
    }
    ph
  }

  // ------------------------------------------------------ FIXTURE encode

  /** Frame geometry of the synthesized fixture: fixed 16×16 thumbnails
    * (the fixed-size resize every perceptual pipeline normalizes to). One
    * pixel row = 48 RGB bytes = exactly three md5 digests; each row reads
    * one sixteenth of the text. */
  val FixtureW = 16
  val FixtureH = 16

  /** Characters per pixel row: the text split into [[FixtureH]] equal
    * slices (≥ 1 char each). */
  def fixtureSliceLen(textLen: Int): Int =
    math.max(1, (textLen + FixtureH - 1) / FixtureH)

  /** FIXTURE — the harness's stand-in for real image files (none exist in
    * this container). Renders `text` as `nFrames` concatenated 16×16 P6
    * frames: pixel row r of frame f is the 48 bytes of
    * md5(slice_r ":" f ":" r ":" j) for j ∈ 0..2, where slice_r is the
    * r-th sixteenth of the text ([[fixtureSliceLen]] chars). Deterministic
    * and mirrored in the oracle; near-identical same-length texts produce
    * images agreeing on all unedited rows, so perceptual similarity tracks
    * text similarity, and every hash row carries real signal regardless of
    * document length (no shared all-zero padding rows). */
  def encodeFixture(text: String, nFrames: Int): Array[Byte] = {
    val cl = fixtureSliceLen(text.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.io.ByteArrayOutputStream()
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var f = 0
    while (f < nFrames) {
      out.write(s"P6\n$FixtureW $FixtureH\n255\n".getBytes(ascii))
      var r = 0
      while (r < FixtureH) {
        val from = math.min(r * cl, text.length)
        val until = math.min((r + 1) * cl, text.length)
        val slice = text.substring(from, until)
        var j = 0
        while (j < 3) {
          md.reset()
          out.write(md.digest(s"$slice:$f:$r:$j".getBytes("UTF-8")))
          j += 1
        }
        r += 1
      }
      f += 1
    }
    out.toByteArray
  }
}
