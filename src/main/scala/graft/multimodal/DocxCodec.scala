package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Inflater, ZipEntry, ZipOutputStream}

/** Pure-JVM DOCX (OOXML) container codec — the PpmCodec/WavCodec format
  * discipline applied to the ONE binary format the reference itself ships:
  * `real_estate_backend/templates/template.docx`, the engagement-letter
  * template whose `word/document.xml` carries the 12-placeholder schema of
  * SURVEY §1.3 and is loaded by `report_generator.py:57-58`.
  *
  * The PARSER is hand-written against the ZIP APPNOTE structures:
  * central-directory walk (EOCD `PK\x05\x06` → central entries `PK\x01\x02`
  * → local headers `PK\x03\x04`), STORED and DEFLATE entries (raw-deflate
  * `Inflater(nowrap = true)` — a public JDK primitive, exactly like
  * WavCodec's `PCM16` math), with loud, named malformation errors. Driving
  * the central directory rather than scanning local headers is what makes
  * data-descriptor containers (general-purpose bit 3, which docx writers
  * emit) parseable: the authoritative sizes live in the central record.
  *
  * The OOXML layer extracts per-PARAGRAPH text by concatenating every
  * `<w:t>` run inside each `<w:p>` — the docx text model, and the property
  * that makes template parsing correct at all: real writers SPLIT a
  * placeholder across adjacent runs (the reference's own template splits
  * `{{parcel_id}}`, `{{initial_2}}` and `{{initial_3}}` mid-name;
  * DocxCodecSpec parses the actual file and proves the merged schema), so
  * a run-at-a-time scan silently loses placeholders.
  *
  * The WRITER ([[DocxCodec.buildDocx]]) emits a real minimal OOXML package
  * through `java.util.zip.ZipOutputStream` — genuine cross-implementation
  * interop for the parser, the same honesty WavCodecSpec gets from
  * hand-built RIFF bytes.
  */
object DocxCodec {

  final case class ZipEntryData(name: String, data: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"docx: $msg")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a ZIP container via its central directory. Supports compression
    * methods 0 (stored) and 8 (deflate); anything else is a loud error. */
  def zipEntries(bytes: Array[Byte]): Seq[ZipEntryData] = {
    if (bytes.length < 22) fail(s"container too short (${bytes.length} bytes)")
    // EOCD: fixed 22-byte record + variable comment; scan backwards
    var eocd = -1
    var i = bytes.length - 22
    val lo = math.max(0, bytes.length - 22 - 0xffff)
    while (eocd < 0 && i >= lo) {
      if (bytes(i) == 0x50 && bytes(i + 1) == 0x4b &&
          bytes(i + 2) == 0x05 && bytes(i + 3) == 0x06) eocd = i
      i -= 1
    }
    if (eocd < 0) fail("no end-of-central-directory record (not a ZIP)")
    val nEntries = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16).toInt
    if (cdOff < 0 || cdOff > bytes.length) fail(s"central directory offset $cdOff out of range")
    val out = scala.collection.mutable.ArrayBuffer[ZipEntryData]()
    var p = cdOff
    var k = 0
    while (k < nEntries) {
      if (p + 46 > bytes.length || u32(bytes, p) != 0x02014b50L)
        fail(s"central entry $k: bad signature at offset $p")
      val method = u16(bytes, p + 10)
      val csize = u32(bytes, p + 20).toInt
      val usize = u32(bytes, p + 24).toInt
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val lho = u32(bytes, p + 42).toInt
      val name = new String(bytes, p + 46, nameLen, UTF_8)
      // local header: sizes there may be zero under bit 3 (data
      // descriptor); the central record above is authoritative
      if (lho + 30 > bytes.length || u32(bytes, lho) != 0x04034b50L)
        fail(s"entry '$name': bad local header at offset $lho")
      val dataOff = lho + 30 + u16(bytes, lho + 26) + u16(bytes, lho + 28)
      if (dataOff + csize > bytes.length)
        fail(s"entry '$name': data (${csize}B at $dataOff) past end of container")
      val data = method match {
        case 0 =>
          if (csize != usize) fail(s"entry '$name': stored sizes disagree ($csize vs $usize)")
          java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize)
        case 8 =>
          val inf = new Inflater(true)
          inf.setInput(bytes, dataOff, csize)
          val buf = new Array[Byte](math.max(64, usize))
          val dst = new ByteArrayOutputStream(math.max(64, usize))
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished())
              fail(s"entry '$name': truncated deflate stream")
            dst.write(buf, 0, n)
          }
          inf.end()
          val d = dst.toByteArray
          if (d.length != usize)
            fail(s"entry '$name': inflated ${d.length}B, central record says $usize")
          d
        case m => fail(s"entry '$name': unsupported compression method $m")
      }
      out += ZipEntryData(name, data)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    out.toSeq
  }

  /** The main document part, decoded as UTF-8. */
  def documentXml(entries: Seq[ZipEntryData]): String =
    entries.find(_.name == "word/document.xml")
      .map(e => new String(e.data, UTF_8))
      .getOrElse(fail("no word/document.xml part (not a DOCX package)"))

  // a paragraph is `<w:p/>` (empty, keeps its index), `<w:p .../>`, or a
  // full `<w:p ...> ... </w:p>` block — the block arm must NOT stop at an
  // inner self-closing tag (`<w:pPr/>`, `<w:pStyle .../>` precede the runs
  // in real writers' output; the reference's template is full of them)
  private val ParaRe = """(?s)<w:p(?:/>|\s[^>]*/>|(?:\s[^>]*)?>.*?</w:p>)""".r
  private val RunTextRe = "(?s)<w:t(?: [^>]*)?(?:/>|>(.*?)</w:t>)".r

  private def unescapeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&") // amp LAST

  /** Per-paragraph RUN texts, in document order: the `<w:t>` contents of
    * each `<w:p>`, entities unescaped, runs NOT yet merged (callers that
    * need paragraph text concatenate — [[paragraphTexts]]). */
  def paragraphRuns(xml: String): Seq[Seq[String]] =
    ParaRe.findAllIn(xml).map { para =>
      RunTextRe.findAllMatchIn(para)
        .map(m => Option(m.group(1)).map(unescapeXml).getOrElse(""))
        .toSeq
    }.toSeq

  /** Merged paragraph texts — the docx text model (runs are formatting
    * boundaries, not text boundaries). */
  def paragraphTexts(xml: String): Seq[String] =
    paragraphRuns(xml).map(_.mkString)

  private val PlaceholderRe = """\{\{\s*([A-Za-z0-9_]+)\s*\}\}""".r

  final case class Placeholder(ord: Int, name: String, paragraphIdx: Int,
                               splitAcrossRuns: Boolean)

  /** The placeholder inventory of a parsed document, in document order.
    * `splitAcrossRuns` records whether the placeholder's full `{{name}}`
    * token was NOT contained in any single run of its paragraph — the
    * run-boundary pathology the merge exists to survive. */
  def placeholders(runsPerParagraph: Seq[Seq[String]]): Seq[Placeholder] = {
    var ord = 0
    runsPerParagraph.zipWithIndex.flatMap { case (runs, pi) =>
      val text = runs.mkString
      PlaceholderRe.findAllMatchIn(text).map { m =>
        ord += 1
        Placeholder(ord, m.group(1), pi,
          splitAcrossRuns = !runs.exists(_.contains(m.matched)))
      }.toSeq
    }
  }

  /** docxtpl-style render over merged paragraph texts: `{{name}}` →
    * `ctx(name)`, ABSENT keys render as "" (the reference's observed
    * behavior on the never-supplied initial/signature keys — SURVEY §1.3,
    * confirmed in `reports/Agreement_ram.docx`). */
  def render(paragraphs: Seq[String], ctx: Map[String, String]): String =
    paragraphs.map(p => PlaceholderRe.replaceAllIn(p, m =>
      scala.util.matching.Regex.quoteReplacement(ctx.getOrElse(m.group(1), ""))))
      .mkString("\n")

  // -------------------------------------------------------------------- //
  // Writer: a real minimal OOXML package                                  //
  // -------------------------------------------------------------------- //

  private def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val ContentTypesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val RelsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  /** Build a docx whose body has one `<w:p>` per outer element and one
    * `<w:r><w:t>` per inner string — run boundaries exactly where the
    * caller puts them, so a template synthesizer can split placeholders
    * across runs the way real writers do. `store` emits entries with
    * method 0 instead of deflate (spec coverage for both paths). */
  def buildDocx(paragraphRuns: Seq[Seq[String]], store: Boolean = false): Array[Byte] = {
    val body = paragraphRuns.map { runs =>
      val rs = runs.map(t =>
        s"""<w:r><w:t xml:space="preserve">${escapeXml(t)}</w:t></w:r>""").mkString
      s"<w:p>$rs</w:p>"
    }.mkString
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body</w:body></w:document>""".stripMargin
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    // Per-record emit is the hot path (the S6 sink builds one container per
    // letter): compression level is the WRITER'S choice under APPNOTE, and
    // BEST_SPEED on a ~2 KB XML part costs ~½ the cycles of the default
    // level for a few dozen bytes of size — the trade every bulk docx
    // emitter makes. The parser handles any level (deflate is deflate).
    z.setLevel(java.util.zip.Deflater.BEST_SPEED)
    def put(name: String, text: String, asStored: Boolean): Unit = {
      val data = text.getBytes(UTF_8)
      val e = new ZipEntry(name)
      if (asStored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val crc = new CRC32(); crc.update(data); e.setCrc(crc.getValue)
      }
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    // the two package-plumbing parts are CONSTANT across every letter —
    // stored (method 0, valid OOXML) skips recompressing them per record;
    // the document part itself stays deflate unless the caller asks for an
    // all-stored container (spec coverage for both parse paths)
    put("[Content_Types].xml", ContentTypesXml, asStored = true)
    put("_rels/.rels", RelsXml, asStored = true)
    put("word/document.xml", documentXml, asStored = store)
    z.close()
    bos.toByteArray
  }
}
