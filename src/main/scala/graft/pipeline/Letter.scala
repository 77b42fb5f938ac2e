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
  def letters(spark: SparkSession, dir: String): DataFrame = {
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
      .orderBy(col("request_id"))
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
