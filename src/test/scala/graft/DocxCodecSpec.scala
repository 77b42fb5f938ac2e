package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.DocxCodec
import graft.pipeline.Letter

/** The DOCX container codec (S5 made format-honest, round 16): ZIP
  * central-directory parse laws on synthesized containers (deflated AND
  * stored), loud malformation errors, run-merge placeholder extraction,
  * docxtpl-style render, and — the format-honesty anchor — a parse of the
  * REFERENCE'S OWN `templates/template.docx` recovering exactly the
  * 12-placeholder schema of SURVEY §1.3 including its split-run keys. */
class DocxCodecSpec extends AnyFunSuite {

  private val runs = Letter.TemplateParagraphRuns

  test("build → parse round-trip (deflated entries)") {
    val bytes = DocxCodec.buildDocx(runs)
    val entries = DocxCodec.zipEntries(bytes)
    assert(entries.map(_.name) ==
      Seq("[Content_Types].xml", "_rels/.rels", "word/document.xml"))
    val paras = DocxCodec.paragraphTexts(DocxCodec.documentXml(entries))
    assert(paras == runs.map(_.mkString))
  }

  test("build → parse round-trip (stored entries, method 0)") {
    val bytes = DocxCodec.buildDocx(runs, store = true)
    val paras = DocxCodec.paragraphTexts(
      DocxCodec.documentXml(DocxCodec.zipEntries(bytes)))
    assert(paras == runs.map(_.mkString))
  }

  test("the JDK reads back what the writer emits (cross-implementation)") {
    val bytes = DocxCodec.buildDocx(runs)
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val names = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toSeq
    assert(names.contains("word/document.xml"))
  }

  test("placeholder inventory: 12 keys in document order, split flags derived") {
    val inv = DocxCodec.placeholders(
      DocxCodec.paragraphRuns(DocxCodec.documentXml(
        DocxCodec.zipEntries(DocxCodec.buildDocx(runs)))))
    assert(inv.map(_.name) == Seq("date", "name", "address",
      "property_under_appraisal", "parcel_id", "fee", "due_signing",
      "due_completion", "initial_1", "initial_2", "initial_3",
      "customer_signature_name"))
    assert(inv.map(_.ord) == (1 to 12))
    val split = inv.filter(_.splitAcrossRuns).map(_.name).toSet
    assert(split == Set("date", "property_under_appraisal", "parcel_id", "initial_2"))
    // a run-at-a-time scan finds NONE of the split keys — the merge is load-bearing
    val perRun = runs.flatten.flatMap(r =>
      """\{\{\s*([A-Za-z0-9_]+)\s*\}\}""".r.findAllMatchIn(r).map(_.group(1)))
    assert((inv.map(_.name).toSet -- perRun.toSet) == split)
  }

  test("malformed containers fail loudly, not silently") {
    val good = DocxCodec.buildDocx(runs)
    def err(b: Array[Byte]) =
      intercept[IllegalArgumentException](DocxCodec.zipEntries(b)).getMessage
    assert(err("not a zip at all, just text".getBytes) contains "end-of-central")
    assert(err(good.dropRight(30)) contains "docx:")
    // corrupt the first local-header signature
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(err(bad) contains "local header")
    // a package without the document part
    val noDoc = DocxCodec.buildDocx(Seq.empty) // still has the part, so:
    val entries = DocxCodec.zipEntries(noDoc).filterNot(_.name.startsWith("word/"))
    assert(intercept[IllegalArgumentException](
      DocxCodec.documentXml(entries)).getMessage contains "word/document.xml")
  }

  test("XML entities in run text unescape (round-trip through the writer's escape)") {
    val tricky = Seq(Seq("Fee & <tax> \"quoted\" {{fee}}"))
    val paras = DocxCodec.paragraphTexts(DocxCodec.documentXml(
      DocxCodec.zipEntries(DocxCodec.buildDocx(tricky))))
    assert(paras == Seq("Fee & <tax> \"quoted\" {{fee}}"))
  }

  test("docxtpl render law: supplied keys substitute, absent keys render empty") {
    val paras = DocxCodec.paragraphTexts(DocxCodec.documentXml(
      DocxCodec.zipEntries(DocxCodec.buildDocx(runs))))
    val rendered = DocxCodec.render(paras, Map(
      "date" -> "2024-01-02", "name" -> "Acme Corp", "address" -> "Segment 40",
      "fee" -> "$1,200", "due_signing" -> "40", "due_completion" -> "60",
      "property_under_appraisal" -> "Engagement_Letter_Acme_Corp.pdf",
      "parcel_id" -> "77"))
    assert(rendered == Seq(
      "Date: 2024-01-02", "Client: Acme Corp", "Address: Segment 40",
      "Property under appraisal: Engagement_Letter_Acme_Corp.pdf",
      "Parcel ID: 77", "Fee: $1,200", "Due at signing: 40",
      "Due at completion: 60",
      "Initials:   ", // three absent keys render "" — separators survive
      "Signature: ").mkString("\n"))
  }

  test("compiled template render ≡ regex render for any context (incl. absent keys)") {
    val paras = DocxCodec.paragraphTexts(DocxCodec.documentXml(
      DocxCodec.zipEntries(DocxCodec.buildDocx(runs))))
    val compiled = DocxCodec.compileTemplate(paras)
    val ctxs = Seq(
      Map("date" -> "2024-01-02", "name" -> "Acme & Sons", "address" -> "Segment 40",
        "fee" -> "$1,200", "due_signing" -> "40", "due_completion" -> "60",
        "property_under_appraisal" -> "a.pdf", "parcel_id" -> "77"),
      Map.empty[String, String],                       // everything absent
      Map("name" -> "{{date}}"))                       // value that LOOKS like a key: no re-scan
    ctxs.foreach { m =>
      val want = paras.map(p => DocxCodec.render(Seq(p), m))
      val got = compiled.renderParagraphs(m.getOrElse(_, "")).toSeq
      assert(got == want)
    }
  }

  test("DocxEmitter ≡ buildDocx at entry level; deterministic; reusable") {
    val emitter = new DocxCodec.DocxEmitter
    // multi-run form against the general writer
    val a = DocxCodec.zipEntries(emitter.emit(runs))
    val b = DocxCodec.zipEntries(DocxCodec.buildDocx(runs))
    assert(a.map(_.name) == b.map(_.name))
    a.zip(b).foreach { case (x, y) => assert(x.data.sameElements(y.data), x.name) }
    // single-run-paragraph form (the rendered-letter shape)
    val paras = Array("Date: 2024-01-02", "Fee & <tax> \"quoted\"", "")
    val c = DocxCodec.zipEntries(emitter.emitParagraphs(paras))
    val d = DocxCodec.zipEntries(DocxCodec.buildDocx(paras.toSeq.map(Seq(_))))
    c.zip(d).foreach { case (x, y) => assert(x.data.sameElements(y.data), x.name) }
    assert(DocxCodec.paragraphTexts(DocxCodec.documentXml(c)) == paras.toSeq)
    // deterministic bytes (fixed DOS timestamp — ZipOutputStream stamps clock)
    assert(emitter.emitParagraphs(paras).sameElements(emitter.emitParagraphs(paras)))
    // the JDK reads the emitter's container back (cross-implementation)
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(emitter.emitParagraphs(paras)))
    val seen = Iterator.continually(zis.getNextEntry).takeWhile(_ != null).map { e =>
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      Iterator.continually(zis.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      e.getName -> bos.toByteArray
    }.toMap
    c.foreach(e => assert(seen(e.name).sameElements(e.data), e.name))
  }

  test("ZipReader ≡ zipEntries; one Inflater survives many containers and errors") {
    val reader = new DocxCodec.ZipReader
    val containers = Seq(
      DocxCodec.buildDocx(runs),
      DocxCodec.buildDocx(runs, store = true),
      new DocxCodec.DocxEmitter().emitParagraphs(Array("a", "b & c")))
    containers.foreach { bytes =>
      val want = DocxCodec.zipEntries(bytes)
      val got = reader.entries(bytes)
      assert(got.map(_.name) == want.map(_.name))
      got.zip(want).foreach { case (x, y) => assert(x.data.sameElements(y.data)) }
    }
    // a malformed container fails loudly AND leaves the reader usable
    intercept[IllegalArgumentException](reader.entries(containers.head.dropRight(40)))
    assert(reader.entries(containers.head).map(_.name) ==
      Seq("[Content_Types].xml", "_rels/.rels", "word/document.xml"))
  }

  test("emitter round-trip law over generated paragraphs (scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // paragraph texts incl. XML specials, entities-looking text, unicode,
    // empty paragraphs, and placeholder-looking tokens
    val para: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.alphaNumStr,
      Gen.const(""),
      Gen.const("a & b < c > d"),
      Gen.const("&amp; literal entity text &lt;"),
      Gen.const("{{fee}} placeholder-looking"),
      Gen.const("多字节 héllo wörld"),
      Gen.const("x" * 500))
    val docs: Seq[List[String]] = Gen.listOfN(60,
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, para)))
      .pureApply(Gen.Parameters.default, Seed(17L))
    val emitter = new DocxCodec.DocxEmitter
    val reader = new DocxCodec.ZipReader
    docs.foreach { paras =>
      val bytes = emitter.emitParagraphs(paras.toArray)
      // reusable reader parse == one-shot parse == original paragraphs
      val got = DocxCodec.paragraphTexts(DocxCodec.documentXml(reader.entries(bytes)))
      assert(got == paras, s"round-trip mismatch for $paras")
      // entry-level equality with the general writer
      val want = DocxCodec.zipEntries(DocxCodec.buildDocx(paras.map(Seq(_))))
      reader.entries(bytes).zip(want).foreach { case (x, y) =>
        assert(x.name == y.name && x.data.sameElements(y.data), x.name)
      }
    }
  }

  test("emitter output-buffer growth: incompressible payload past the initial 4 KB") {
    // pseudo-random chars barely compress, so the deflated document part
    // exceeds the emitter's initial 4 KB buffer and must double (twice)
    val rnd = new scala.util.Random(17)
    val big = Array.fill(3)(Array.fill(8192)(
      (33 + rnd.nextInt(94)).toChar).mkString)
    val emitter = new DocxCodec.DocxEmitter
    val bytes = emitter.emitParagraphs(big)
    assert(bytes.length > 8192) // genuinely incompressible
    val got = DocxCodec.paragraphTexts(DocxCodec.documentXml(
      DocxCodec.zipEntries(bytes)))
    assert(got == big.toSeq)
    // and the grown buffer is reused correctly for a small follow-up emit
    val small = emitter.emitParagraphs(Array("tiny"))
    assert(DocxCodec.paragraphTexts(DocxCodec.documentXml(
      DocxCodec.zipEntries(small))) == Seq("tiny"))
  }

  test("the reference's real template.docx parses to the §1.3 schema") {
    val p = Paths.get("/root/reference/real_estate_backend/templates/template.docx")
    assume(Files.exists(p), "reference template not present in this environment")
    val inv = DocxCodec.placeholders(
      DocxCodec.paragraphRuns(DocxCodec.documentXml(
        DocxCodec.zipEntries(Files.readAllBytes(p)))))
    assert(inv.map(_.name).distinct.sorted == Seq("address",
      "customer_signature_name", "date", "due_completion", "due_signing",
      "fee", "initial_1", "initial_2", "initial_3", "name", "parcel_id",
      "property_under_appraisal"))
    // the real file's split-run keys — the pathology the run merge exists
    // for (a raw single-run scan of its document.xml misses exactly these)
    val split = inv.filter(_.splitAcrossRuns).map(_.name).toSet
    assert(Set("parcel_id", "initial_2", "initial_3").subsetOf(split))
  }
}
