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

  /** Central-directory walk shared by the one-shot [[zipEntries]] and the
    * reusable [[ZipReader]]: `inflate(name, dataOff, csize, usize)` is the
    * only varying piece (a fresh vs a reused Inflater). */
  private def parseEntries(bytes: Array[Byte],
      inflate: (String, Int, Int, Int) => Array[Byte]): Seq[ZipEntryData] = {
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
        case 8 => inflate(name, dataOff, csize, usize)
        case m => fail(s"entry '$name': unsupported compression method $m")
      }
      out += ZipEntryData(name, data)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    out.toSeq
  }

  /** Run `inf` (raw-deflate, already reset) over one entry's bytes. */
  private def inflateEntry(inf: Inflater, bytes: Array[Byte], name: String,
      dataOff: Int, csize: Int, usize: Int, scratch: Array[Byte]): Array[Byte] = {
    inf.setInput(bytes, dataOff, csize)
    val dst = new ByteArrayOutputStream(math.max(64, usize))
    while (!inf.finished()) {
      val n = inf.inflate(scratch)
      if (n == 0 && !inf.finished())
        fail(s"entry '$name': truncated deflate stream")
      dst.write(scratch, 0, n)
    }
    val d = dst.toByteArray
    if (d.length != usize)
      fail(s"entry '$name': inflated ${d.length}B, central record says $usize")
    d
  }

  /** Parse a ZIP container via its central directory. Supports compression
    * methods 0 (stored) and 8 (deflate); anything else is a loud error. */
  def zipEntries(bytes: Array[Byte]): Seq[ZipEntryData] =
    parseEntries(bytes, (name, dataOff, csize, usize) => {
      val inf = new Inflater(true)
      try inflateEntry(inf, bytes, name, dataOff, csize, usize,
        new Array[Byte](math.max(64, usize)))
      finally inf.end()
    })

  /** Reusable parser for bulk per-row container reads (the q163 round-trip
    * parses one container per letter): a `java.util.zip.Inflater` carries a
    * native allocation plus a Cleaner registration, so a fresh one per row
    * is pure GC/native churn — this holds ONE Inflater and one scratch
    * buffer for a whole partition. Identical parse semantics to
    * [[zipEntries]] (same walk, same errors — DocxCodecSpec pins entry
    * equality). NOT thread-safe: one instance per partition/thread. */
  final class ZipReader {
    private val inf = new Inflater(true)
    private var scratch = new Array[Byte](8192)
    def entries(bytes: Array[Byte]): Seq[ZipEntryData] =
      parseEntries(bytes, (name, dataOff, csize, usize) => {
        if (scratch.length < usize) scratch = new Array[Byte](usize)
        inf.reset()
        inflateEntry(inf, bytes, name, dataOff, csize, usize, scratch)
      })
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
    if (s.indexOf('&') < 0) s // no entities: the bulk-parse common case
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
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
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

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
    val documentXml = docXmlOf(paragraphRuns)
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

  /** The document part's XML for the given paragraph runs — shared by the
    * general writer and the bulk emitter (entry equality by construction). */
  private def docXmlOf(paragraphRuns: Seq[Seq[String]]): String = {
    val body = paragraphRuns.map { runs =>
      val rs = runs.map(t =>
        s"""<w:r><w:t xml:space="preserve">${escapeXml(t)}</w:t></w:r>""").mkString
      s"<w:p>$rs</w:p>"
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
       |<w:body>$body</w:body></w:document>""".stripMargin
  }

  // -------------------------------------------------------------------- //
  // Bulk-sink tier: compiled render + reusable emitter (round 17)         //
  // -------------------------------------------------------------------- //

  /** A CONSTANT template's render plan, decomposed once: per paragraph, the
    * literal segments around its placeholders and the placeholder keys in
    * order (`segments(i).length == keys(i).length + 1`). The per-row render
    * is then pure StringBuilder concatenation — the regex work [[render]]
    * does per call happens once per template, not once per letter (the
    * docxtpl model itself: `DocxTemplate` compiles on load,
    * `report_generator.py:57` parses the template once per process). Law
    * (DocxCodecSpec): output identical to [[render]] for any context. */
  final case class CompiledTemplate(segments: Array[Array[String]],
                                    keys: Array[Array[String]]) {
    /** Render every paragraph against `ctx` (absent-key semantics live in
      * the caller's function — pass `m.getOrElse(_, "")` for docxtpl). */
    def renderParagraphs(ctx: String => String): Array[String] = {
      val out = new Array[String](segments.length)
      var i = 0
      while (i < segments.length) {
        val segs = segments(i); val ks = keys(i)
        if (ks.length == 0) out(i) = segs(0)
        else {
          val sb = new java.lang.StringBuilder(64)
          var j = 0
          while (j < ks.length) { sb.append(segs(j)); sb.append(ctx(ks(j))); j += 1 }
          sb.append(segs(ks.length))
          out(i) = sb.toString
        }
        i += 1
      }
      out
    }
  }

  /** Compile merged paragraph texts into a [[CompiledTemplate]]. */
  def compileTemplate(paragraphs: Seq[String]): CompiledTemplate = {
    val segs = Array.newBuilder[Array[String]]
    val keys = Array.newBuilder[Array[String]]
    paragraphs.foreach { p =>
      val lits = Array.newBuilder[String]
      val ks = Array.newBuilder[String]
      var pos = 0
      PlaceholderRe.findAllMatchIn(p).foreach { m =>
        lits += p.substring(pos, m.start); ks += m.group(1); pos = m.end
      }
      lits += p.substring(pos)
      segs += lits.result(); keys += ks.result()
    }
    CompiledTemplate(segs.result(), keys.result())
  }

  private def w16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def w32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Reusable per-partition container writer for the bulk S6 sink (one
    * docx per letter, `report_generator.py:88-89`). [[buildDocx]] is the
    * general writer, but per record it allocates a `ZipOutputStream` whose
    * embedded `Deflater` costs a native allocation plus a Cleaner
    * registration, and it re-emits the two CONSTANT package-plumbing parts
    * every call — at corpus scale that churn was the dominant GC line of
    * the first q163 cut. This emitter holds ONE `Deflater`/`CRC32`/buffer
    * set for a whole partition and precomputes the constant parts' local
    * records and central entries as byte blobs; per letter it deflates just
    * `word/document.xml` and assembles the APPNOTE records directly
    * (the same structures [[zipEntries]] walks). Output is a valid ZIP any
    * reader accepts — DocxCodecSpec pins entry-level equality with
    * [[buildDocx]] AND a `java.util.zip.ZipInputStream` read-back — and is
    * byte-deterministic (fixed DOS timestamp) where `ZipOutputStream`
    * stamps wall-clock time. NOT thread-safe: one instance per partition.
    */
  final class DocxEmitter {
    import DocxEmitter._
    private val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    private val crc = new CRC32
    private var docBytes = new Array[Byte](4096)

    def emit(paragraphRuns: Seq[Seq[String]]): Array[Byte] =
      emitDocumentXml(docXmlOf(paragraphRuns))

    /** One run per paragraph — the rendered-letter shape, no Seq wrappers. */
    def emitParagraphs(paragraphs: Array[String]): Array[Byte] = {
      val sb = new java.lang.StringBuilder(1024)
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        .append('\n')
        .append("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""")
        .append('\n').append("<w:body>")
      var i = 0
      while (i < paragraphs.length) {
        sb.append("""<w:p><w:r><w:t xml:space="preserve">""")
          .append(escapeXml(paragraphs(i)))
          .append("</w:t></w:r></w:p>")
        i += 1
      }
      sb.append("</w:body></w:document>")
      emitDocumentXml(sb.toString)
    }

    private def emitDocumentXml(documentXml: String): Array[Byte] = {
      val data = documentXml.getBytes(UTF_8)
      crc.reset(); crc.update(data); val docCrc = crc.getValue
      deflater.reset(); deflater.setInput(data); deflater.finish()
      var csize = 0
      while (!deflater.finished()) {
        if (csize == docBytes.length)
          docBytes = java.util.Arrays.copyOf(docBytes, docBytes.length * 2)
        csize += deflater.deflate(docBytes, csize, docBytes.length - csize)
      }
      val docLho = ConstLocal.length.toLong
      val cdOff = docLho + 30 + DocName.length + csize
      val out = new Array[Byte](
        (cdOff + ConstCentral.length + 46 + DocName.length + 22).toInt)
      var p = 0
      System.arraycopy(ConstLocal, 0, out, p, ConstLocal.length); p += ConstLocal.length
      // local header for word/document.xml
      w32(out, p, 0x04034b50L); w16(out, p + 4, 20); w16(out, p + 6, 0)
      w16(out, p + 8, 8); w16(out, p + 10, DosTime); w16(out, p + 12, DosDate)
      w32(out, p + 14, docCrc); w32(out, p + 18, csize.toLong)
      w32(out, p + 22, data.length.toLong); w16(out, p + 26, DocName.length)
      w16(out, p + 28, 0); p += 30
      System.arraycopy(DocName, 0, out, p, DocName.length); p += DocName.length
      System.arraycopy(docBytes, 0, out, p, csize); p += csize
      // central directory: two constant entries (offsets pre-baked) + doc
      System.arraycopy(ConstCentral, 0, out, p, ConstCentral.length); p += ConstCentral.length
      w32(out, p, 0x02014b50L); w16(out, p + 4, 20); w16(out, p + 6, 20)
      w16(out, p + 8, 0); w16(out, p + 10, 8)
      w16(out, p + 12, DosTime); w16(out, p + 14, DosDate)
      w32(out, p + 16, docCrc); w32(out, p + 20, csize.toLong)
      w32(out, p + 24, data.length.toLong); w16(out, p + 28, DocName.length)
      w16(out, p + 30, 0); w16(out, p + 32, 0); w16(out, p + 34, 0)
      w16(out, p + 36, 0); w32(out, p + 38, 0L); w32(out, p + 42, docLho)
      p += 46
      System.arraycopy(DocName, 0, out, p, DocName.length); p += DocName.length
      // EOCD
      val cdSize = p - cdOff.toInt
      w32(out, p, 0x06054b50L); w16(out, p + 4, 0); w16(out, p + 6, 0)
      w16(out, p + 8, 3); w16(out, p + 10, 3)
      w32(out, p + 12, cdSize.toLong); w32(out, p + 16, cdOff)
      w16(out, p + 20, 0)
      out
    }
  }

  object DocxEmitter {
    // fixed DOS timestamp (2020-01-01 00:00:00) — deterministic output
    private val DosTime = 0
    private val DosDate = ((2020 - 1980) << 9) | (1 << 5) | 1
    private val DocName = "word/document.xml".getBytes(UTF_8)

    private def storedLocal(name: String, text: String): Array[Byte] = {
      val nameB = name.getBytes(UTF_8); val data = text.getBytes(UTF_8)
      val c = new CRC32; c.update(data)
      val b = new Array[Byte](30 + nameB.length + data.length)
      w32(b, 0, 0x04034b50L); w16(b, 4, 20); w16(b, 6, 0); w16(b, 8, 0)
      w16(b, 10, DosTime); w16(b, 12, DosDate); w32(b, 14, c.getValue)
      w32(b, 18, data.length.toLong); w32(b, 22, data.length.toLong)
      w16(b, 26, nameB.length); w16(b, 28, 0)
      System.arraycopy(nameB, 0, b, 30, nameB.length)
      System.arraycopy(data, 0, b, 30 + nameB.length, data.length)
      b
    }
    private def storedCentral(name: String, text: String, lho: Long): Array[Byte] = {
      val nameB = name.getBytes(UTF_8); val data = text.getBytes(UTF_8)
      val c = new CRC32; c.update(data)
      val b = new Array[Byte](46 + nameB.length)
      w32(b, 0, 0x02014b50L); w16(b, 4, 20); w16(b, 6, 20); w16(b, 8, 0)
      w16(b, 10, 0); w16(b, 12, DosTime); w16(b, 14, DosDate)
      w32(b, 16, c.getValue); w32(b, 20, data.length.toLong)
      w32(b, 24, data.length.toLong); w16(b, 28, nameB.length)
      w16(b, 30, 0); w16(b, 32, 0); w16(b, 34, 0); w16(b, 36, 0)
      w32(b, 38, 0L); w32(b, 42, lho)
      System.arraycopy(nameB, 0, b, 46, nameB.length)
      b
    }
    // the two constant package-plumbing parts, stored (method 0), as local
    // records at offsets 0 and |first| — byte-identical across every letter
    private val ConstLocal: Array[Byte] = {
      val a = storedLocal("[Content_Types].xml", ContentTypesXml)
      val b = storedLocal("_rels/.rels", RelsXml)
      a ++ b
    }
    private val ConstCentral: Array[Byte] =
      storedCentral("[Content_Types].xml", ContentTypesXml, 0L) ++
        storedCentral("_rels/.rels", RelsXml,
          storedLocal("[Content_Types].xml", ContentTypesXml).length.toLong)
  }
}
