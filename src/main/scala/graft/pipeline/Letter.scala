package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Formatters._

/** The reference's engagement-letter pipeline (SURVEY.md §3.2, §7.2)
  * re-expressed as one declarative DataFrame program over the test tables:
  * request ingest → validate (F1/F6) → enrich join (J2) → found-filter (F10)
  * → formatter projection (P1–P6) → template render (P13).
  *
  * Role mapping (FIXTURES.md §B): orders = generate_report requests,
  * customer = the enrichment dimension (parcel lookup), o_orderdate =
  * report_date, o_totalprice = fee, derived percents = due_signing /
  * due_completion.
  *
  * Single shuffle (orders⋈customer on custkey — co-bucketable at scale);
  * everything downstream is narrow and codegen'd.
  */
object Letter {

  /** The wire-format request record: all-string fields, exactly like the
    * reference's `data.get(...)` schema-on-read plane (app.py:70-81).
    * due_signing/due_completion derive deterministically from the order key;
    * every 13th record violates the sum-to-100 constraint and every 17th has
    * an unparsable fee — exercising the validation + null channels.
    */
  def requests(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ds = (col("o_orderkey") % 5).cast("int") * 20
    o.select(
      col("o_orderkey").as("request_id"),
      col("o_custkey").as("cust_id"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("report_date"),
      // decimal-stable wire string ("123.45"): double→string rendering is
      // engine/JVM-specific, decimal(18,2)→string is not.
      when(col("o_orderkey") % 17 === 0, lit("not-a-number"))
        .otherwise(graft.functions.PortableHash.pround(col("o_totalprice"), 2)
          .cast("decimal(18,2)").cast("string")).as("fee"),
      ds.cast("string").as("due_signing"),
      when(col("o_orderkey") % 13 === 0, (lit(101) - ds).cast("string"))
        .otherwise((lit(100) - ds).cast("string")).as("due_completion"),
      concat(lit("Parcel "), col("o_orderkey") % 1000).as("property_under_appraisal"))
  }

  /** F6: the sum-to-100 cross-column constraint + non-negativity + fee>0
    * (App.js:388-394), as a reusable validity column.
    */
  def step3Valid: org.apache.spark.sql.Column = {
    val fee = safeNumeric(col("fee"))
    val s   = safeNumeric(col("due_signing"))
    val c   = safeNumeric(col("due_completion"))
    fee.isNotNull && (fee > 0) && s.isNotNull && (s >= 0) &&
      c.isNotNull && (c >= 0) && (s + c === 100.0)
  }

  /** q12: the validation operator — route records into valid/violation
    * channels and count per channel with a violation-reason breakdown
    * (the set-oriented form of returning 400 per record).
    */
  def validationSummary(spark: SparkSession, dir: String): DataFrame = {
    val r = requests(spark, dir)
    val fee = safeNumeric(col("fee"))
    val s   = safeNumeric(col("due_signing"))
    val c   = safeNumeric(col("due_completion"))
    r.select(
        when(fee.isNull, "bad_fee")
          .when(!(fee > 0), "nonpositive_fee")
          .when(s.isNull || c.isNull, "bad_percent")
          .when(s < 0 || c < 0, "negative_percent")
          .when(s + c =!= 100.0, "sum_not_100")
          .otherwise("valid").as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("channel"))
  }

  /** q13 / flagship: the full letter pipeline. Valid requests only, enriched
    * with the customer dimension, formatted, rendered.
    */
  def letters(spark: SparkSession, dir: String): DataFrame =
    lettersPlane(spark, dir).orderBy(col("request_id"))

  /** The letters pipeline WITHOUT the presentation sort — the plane every
    * aggregate/render consumer should read: a global sort feeding an
    * explode+aggregate (q161) or a per-row render (q163) is pure wasted
    * exchange work that Catalyst does not remove below a shuffle. */
  def lettersPlane(spark: SparkSession, dir: String): DataFrame = {
    val r = requests(spark, dir).filter(step3Valid)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    r.join(cust, r("cust_id") === cust("c_custkey"), "left")
      .filter(col("c_custkey").isNotNull)                    // F10 found-filter
      .select(
        col("request_id"),
        formatDate(col("report_date")).as("letter_date"),
        col("c_name").as("client_name"),
        formatCurrency(col("fee")).as("fee_formatted"),
        formatPercent(col("due_signing")).as("due_signing_pct"),
        formatPercent(col("due_completion")).as("due_completion_pct"),
        composeFilename(col("c_name")).as("pdf_filename"))
      .withColumn("letter_text",
        renderLetter(
          date = col("letter_date"), name = col("client_name"),
          address = concat(lit("Segment "), col("due_signing_pct")),
          fee = col("fee_formatted"),
          dueSigning = col("due_signing_pct"), dueCompletion = col("due_completion_pct"),
          property = col("pdf_filename"), parcelId = col("request_id").cast("string")))
  }

  /** The synthesized engagement-letter TEMPLATE as paragraph runs — the
    * q149/q151/q160 fixture discipline applied to S5: a real OOXML package
    * is BUILT from these runs ([[graft.multimodal.DocxCodec.buildDocx]]),
    * then PARSED back by the hand-written container codec, and q161's
    * oracle mirrors this documented layout verbatim. The placeholder schema
    * is SURVEY §1.3's 12-key set (`templates/template.docx`,
    * `word/document.xml`), including its run-boundary pathology: real
    * writers split placeholders across adjacent `<w:r>` runs (the
    * reference's own file splits `{{parcel_id}}`/`{{initial_2}}`/
    * `{{initial_3}}`), so four placeholders here are deliberately split —
    * a parser that fails to merge runs cannot find them at all. */
  private[graft] val TemplateParagraphRuns: Seq[Seq[String]] = Seq(
    Seq("Date: ", "{{", "date", "}}"),
    Seq("Client: {{name}}"),
    Seq("Address: {{address}}"),
    Seq("Property under appraisal: {{property", "_under_appraisal}}"),
    Seq("Parcel ID: {{", "parcel_id}}"),
    Seq("Fee: {{fee}}"),
    Seq("Due at signing: {{due_signing}}"),
    Seq("Due at completion: {{due_completion}}"),
    Seq("Initials: {{initial_1}} {{init", "ial_2}} {{initial_3}}"),
    Seq("Signature: {{customer_signature_name}}"))

  /** Placeholders the backend context never supplies (docxtpl renders them
    * as "" — `report_generator.py:75-86` vs the §1.3 schema). */
  private[graft] val UnsuppliedKeys =
    Set("initial_1", "initial_2", "initial_3", "customer_signature_name")

  /** q161: the DOCX template SOURCE made format-honest — parse the real
    * ZIP/OOXML container (built from [[TemplateParagraphRuns]], the same
    * synthesize-then-really-decode contract as q52/q157's PPM/WAV tiers),
    * extract the placeholder inventory ACROSS run boundaries, and check the
    * render against q13's context: per placeholder, how many of the valid
    * letters render it non-blank (unsupplied keys render "" — docxtpl's
    * absent-key behavior) plus the lowest-request sample value.
    *
    * Scale shape: the template is ONE driver-side artifact (the reference
    * loads it once per process, `report_generator.py:57`); the corpus-sized
    * work is a narrow 8-way value explode over the letters plane into an
    * 8-key hash aggregate. Nothing else leaves the driver.
    */
  def templateInventory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.DocxCodec
    val parsed = DocxCodec.placeholders(
      DocxCodec.paragraphRuns(
        DocxCodec.documentXml(
          DocxCodec.zipEntries(DocxCodec.buildDocx(TemplateParagraphRuns)))))
    val inv = parsed.map(p => (p.ord.toLong, p.name, p.paragraphIdx.toLong,
        p.splitAcrossRuns, !UnsuppliedKeys.contains(p.name)))
      .toDF("ord", "placeholder", "paragraph_idx", "split_across_runs", "supplied")
    val ctx = lettersPlane(spark, dir)
    val valueFor: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "date" -> col("letter_date"),
      "name" -> col("client_name"),
      "address" -> concat(lit("Segment "), col("due_signing_pct")),
      "fee" -> col("fee_formatted"),
      "due_signing" -> col("due_signing_pct"),
      "due_completion" -> col("due_completion_pct"),
      "property_under_appraisal" -> col("pdf_filename"),
      "parcel_id" -> col("request_id").cast("string"))
    val entries = array(valueFor.map { case (n, v) =>
      struct(lit(n).as("placeholder"), v.as("v")) }: _*)
    val counts = ctx.select(explode(entries).as("e"))
      .select(col("e.placeholder").as("placeholder"), col("e.v").as("v"))
      .groupBy(col("placeholder"))
      .agg(count(when(col("v") =!= "", 1)).as("n_rendered_nonblank"))
    // one sample row (lowest request id) — a bounded driver materialization,
    // exactly the letter the reference's golden artifact renders
    val sampleOpt = ctx.orderBy(col("request_id")).limit(1)
      .select(valueFor.map { case (n, v) => v.as(n) }: _*).collect().headOption
    val sampleDf = valueFor.map(_._1).zipWithIndex.map { case (n, i) =>
      (n, sampleOpt.map(r => if (r.isNullAt(i)) "" else r.get(i).toString)
        .getOrElse(""))
    }.toDF("placeholder", "sample_value")
    // explicit broadcast hints: the counts side has no stats at initial
    // planning (micro-sized but corpus-derived), so the unhinted initial
    // plan exchanged BOTH sides for a sort-merge join and AQE's late BHJ
    // conversion left a vestigial shuffle stage on the 12-row inventory
    inv.join(broadcast(counts), Seq("placeholder"), "left")
      .join(broadcast(sampleDf), Seq("placeholder"), "left")
      .select(col("ord"), col("placeholder"), col("paragraph_idx"),
        col("split_across_runs"), col("supplied"),
        coalesce(col("n_rendered_nonblank"), lit(0L)).as("n_rendered_nonblank"),
        coalesce(col("sample_value"), lit("")).as("sample_value"))
      .orderBy(col("ord"))
  }

  /** S6 made format-honest (round 17): each valid letter rendered into a
    * REAL binary `.docx` container — the reference's sink emits one docx
    * per record (`report_generator.py:88-89`, the golden pairs in
    * `reports/`), so the engine's archive column is the genuine OOXML
    * package, not a text stand-in. The template is parsed ONCE driver-side
    * through the full container codec (build → zip-parse → run-merge — the
    * q161 chain, one artifact per process exactly like
    * `report_generator.py:57`); per row the merged paragraphs render with
    * docxtpl absent-key semantics (unsupplied keys → "") and
    * [[graft.multimodal.DocxCodec.buildDocx]] emits the package. The
    * per-row codec work runs inside `mapPartitions` (the renderExternal /
    * media-decode discipline: binary codecs never leave the executor, no
    * scalar UDFs), so render parallelism == partition parallelism and the
    * driver never sees a payload. */
  def renderedDocx(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.BinaryType
    import graft.multimodal.DocxCodec
    // fan the letters plane out across the executor cores BEFORE the
    // per-row codec work: the harness tables are single parquet files (one
    // input split), and render parallelism == partition parallelism for a
    // mapPartitions stage — without this the whole corpus zips on one core
    // (measured 9.2 s vs 1.4 s at sf0.1). At 100 TB the scan arrives
    // thousands-of-splits wide and the fanout exchange is a no-op by
    // comparison (~200 B/row keys, far cheaper than the codec stage).
    val ctx = lettersPlane(spark, dir).transform(graft.Tables.fanout)
    val outSchema = ctx.schema.add("letter_docx", BinaryType)
    val idx = ctx.schema.fieldNames.zipWithIndex.toMap
    val iReq = idx("request_id"); val iDate = idx("letter_date")
    val iName = idx("client_name"); val iFee = idx("fee_formatted")
    val iSign = idx("due_signing_pct"); val iComp = idx("due_completion_pct")
    val iPdf = idx("pdf_filename")
    // one template parse per PROCESS, COMPILED once (the docxtpl model —
    // `DocxTemplate` parses on load, `report_generator.py:57`): the render
    // plan ships as a tiny driver constant, so the per-row render is pure
    // string concatenation and the per-row container build reuses one
    // Deflater/CRC32/buffer set per partition ([[DocxCodec.DocxEmitter]] —
    // a fresh ZipOutputStream per record was the first cut's dominant GC
    // line: one native Deflater + Cleaner registration per letter)
    val compiled = DocxCodec.compileTemplate(
      DocxCodec.paragraphTexts(
        DocxCodec.documentXml(
          DocxCodec.zipEntries(DocxCodec.buildDocx(TemplateParagraphRuns)))))
    ctx.mapPartitions { rows =>
      val emitter = new DocxCodec.DocxEmitter
      rows.map { r =>
        val lookup: String => String = {
          case "date" => r.getString(iDate)
          case "name" => r.getString(iName)
          case "address" => s"Segment ${r.getString(iSign)}"
          case "fee" => r.getString(iFee)
          case "due_signing" => r.getString(iSign)
          case "due_completion" => r.getString(iComp)
          case "property_under_appraisal" => r.getString(iPdf)
          case "parcel_id" => r.getLong(iReq).toString
          case _ => "" // docxtpl absent-key semantics (SURVEY §1.3)
        }
        val rendered = compiled.renderParagraphs(lookup)
        Row.fromSeq(r.toSeq :+ emitter.emitParagraphs(rendered))
      }
    }(Encoders.row(outSchema))
  }

  /** q163: the S6 round-trip LAW as an oracle-checked query — every line of
    * every letter is recovered FROM the binary container ([[renderedDocx]]'s
    * bytes re-parsed through the hand-written ZIP/OOXML codec), and the
    * oracle computes the same lines independently from the source tables
    * (q13's formatter SQL), so any corruption in render → build → zip-parse
    * → run-merge shows up as a hash mismatch. n_paragraphs pins the
    * container's paragraph structure; the initials/signature lines pin the
    * docxtpl absent-key semantics (unsupplied placeholders render ""). */
  def docxRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    import graft.multimodal.DocxCodec
    val src = renderedDocx(spark, dir)
    val iReq = src.schema.fieldIndex("request_id")
    val iDocx = src.schema.fieldIndex("letter_docx")
    val names = Seq("date_line", "client_line", "address_line", "property_line",
      "parcel_line", "fee_line", "signing_line", "completion_line",
      "initials_line", "signature_line")
    val outSchema = StructType(
      StructField("request_id", LongType, nullable = false) +:
      StructField("n_paragraphs", LongType, nullable = false) +:
      names.map(StructField(_, StringType, nullable = false)))
    val parsed = src.mapPartitions { rows =>
      val reader = new DocxCodec.ZipReader // one Inflater per partition
      rows.map { r =>
        val texts = DocxCodec.paragraphTexts(
          DocxCodec.documentXml(
            reader.entries(r.getAs[Array[Byte]](iDocx))))
        require(texts.length == names.length,
          s"letter container must carry ${names.length} paragraphs, got ${texts.length}")
        Row.fromSeq(r.getLong(iReq) +: texts.length.toLong +: texts)
      }
    }(Encoders.row(outSchema))
    parsed.orderBy(col("request_id"))
  }

  /** q09: `_format_percent` over the request plane (LOCKED truncation +
    * "" null channel).
    */
  def percentFormatting(spark: SparkSession, dir: String): DataFrame =
    requests(spark, dir)
      .select(col("request_id"), col("fee"),
        formatPercent(col("fee")).as("fee_pct"),
        formatPercent(col("due_signing")).as("signing_pct"))
      .orderBy(col("request_id"))

  /** q10: `_format_currency` (grouping + cents-iff-fractional + "" channel). */
  def currencyFormatting(spark: SparkSession, dir: String): DataFrame =
    requests(spark, dir)
      .select(col("request_id"), col("fee"),
        formatCurrency(col("fee")).as("fee_usd"))
      .orderBy(col("request_id"))

  /** q11: filename sanitize/compose + basename + header-extract (P5/P6/P9/P12). */
  def filenameOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
        col("c_custkey"),
        composeFilename(col("c_name")).as("pdf_name"),
        basename(concat(lit("reports/2024/"), col("c_name"))).as("base"),
        dispositionFilename(
          concat(lit("attachment; filename=\""), col("c_name"), lit(".pdf\"")))
          .as("header_name"),
        digitClamp(col("c_name")).as("digits"))
      .orderBy(col("c_custkey"))
  }
}
