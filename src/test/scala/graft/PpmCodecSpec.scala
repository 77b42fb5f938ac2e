package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.PpmCodec
import graft.multimodal.PpmCodec.Frame

/** The REAL decoder, exercised against hand-built byte streams — no
  * fixture-synthesis circularity: every expectation here is written from
  * the P6 spec, not from the encoder. */
class PpmCodecSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("decodes a hand-built P6 with comments, tabs and multi-space headers") {
    val raster = Array[Byte](
      10, 20, 30,   40, 50, 60,      // row 0: two pixels
      70, 80, 90,  100, 110, 120)    // row 1
    val bytes = ascii("P6 # a comment\n 2 # width\n\t2\n# another\n255\n") ++ raster
    val frames = PpmCodec.decode(bytes)
    assert(frames.length == 1)
    val f = frames.head
    assert(f.width == 2 && f.height == 2 && f.maxVal == 255)
    assert(f.pixels.toSeq == raster.toSeq)
    // pixel statistics straight from the spec'd raster layout
    assert(PpmCodec.channelSums(f) == ((10 + 40 + 70 + 100).toLong,
      (20 + 50 + 80 + 110).toLong, (30 + 60 + 90 + 120).toLong))
    val lums = PpmCodec.rowLums(f)
    assert(lums.toSeq == Seq(
      299L * 10 + 587L * 20 + 114L * 30 + 299L * 40 + 587L * 50 + 114L * 60,
      299L * 70 + 587L * 80 + 114L * 90 + 299L * 100 + 587L * 110 + 114L * 120))
  }

  test("decodes concatenated frames as an animation stream") {
    val f1 = ascii("P6\n1 1\n255\n") ++ Array[Byte](1, 2, 3)
    val f2 = ascii("P6\n2 1\n255\n") ++ Array[Byte](4, 5, 6, 7, 8, 9)
    val frames = PpmCodec.decode(f1 ++ f2)
    assert(frames.map(f => (f.width, f.height)) == Seq((1, 1), (2, 1)))
    assert(frames(1).pixels.toSeq == Seq[Byte](4, 5, 6, 7, 8, 9))
    assert(PpmCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("rejects malformed streams loudly") {
    def bad(b: Array[Byte]) =
      intercept[IllegalArgumentException](PpmCodec.decode(b))
    assert(bad(ascii("P5\n1 1\n255\n") ++ Array[Byte](0, 0, 0))
      .getMessage.contains("magic"))
    assert(bad(ascii("P6\n0 1\n255\n")).getMessage.contains("dimensions"))
    assert(bad(ascii("P6\n2 2\n255\n") ++ Array[Byte](1, 2, 3))
      .getMessage.contains("truncated"))
    assert(bad(ascii("P6\n1 1\n70000\n") ++ Array[Byte](1, 2, 3))
      .getMessage.contains("maxval"))
    assert(bad(ascii("P6\n1 x\n255\n")).getMessage.contains("bad height"))
  }

  test("fixture round-trip: encode → decode recovers geometry, frames differ, " +
       "and near-identical texts agree on unedited rows") {
    val text = ("alpha " * 40).trim   // 239 chars → 15-char slices
    val nf = 7
    val payload = PpmCodec.encodeFixture(text, nf)
    val frames = PpmCodec.decode(payload)
    assert(frames.length == nf)
    assert(frames.forall(f => f.width == PpmCodec.FixtureW &&
      f.height == PpmCodec.FixtureH && f.maxVal == 255))
    assert(frames.head.pixels.toSeq != frames(1).pixels.toSeq,
      "animation frames must differ")
    // determinism
    assert(PpmCodec.encodeFixture(text, nf).toSeq == payload.toSeq)
    // a same-length edit inside one text slice changes exactly that row
    val cl = PpmCodec.fixtureSliceLen(text.length)
    val editPos = 70
    val edited = text.updated(editPos, 'Z').mkString
    val g = PpmCodec.decode(PpmCodec.encodeFixture(edited, nf)).head
    val a = PpmCodec.rowLums(frames.head); val b = PpmCodec.rowLums(g)
    val row = editPos / cl
    assert(a.indices.count(r => a(r) != b(r)) == 1 && a(row) != b(row),
      s"a slice-$row edit must perturb pixel row $row and only it")
    // …so the phashes differ by at most the 3 bits of one row (= one band)
    assert(java.lang.Long.bitCount(
      PpmCodec.phashOf(frames.head) ^ PpmCodec.phashOf(g)) <= 3)
  }

  test("phashOf quantizes the row-luminance profile into interleaved bands") {
    def solidRow(v: Int): Array[Byte] = Array.fill(16 * 3)(v.toByte)
    // h=5: rows 0 and 4 white (all three cuts), row 1 gray 125 (row sum
    // 2 000 000: above the low cut only), rows 2-3 black (no bits)
    val px = solidRow(255) ++ solidRow(125) ++ solidRow(0) ++
      solidRow(0) ++ solidRow(255)
    val f = Frame(16, 5, 255, px)
    assert(PpmCodec.rowLums(f).toSeq ==
      Seq(4080000L, 2000000L, 0L, 0L, 4080000L))
    // row 0 → bits 0,1,2; row 4 → (4%4)·12+(4/4)·3 = bits 3,4,5;
    // row 1 → (1%4)·12 = bit 12 (low cut only)
    assert(PpmCodec.phashOf(f) == ((63L) | (1L << 12)))
  }
}
