package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-parity scalar operators (SURVEY.md §2.2, P2–P16) as composable
  * Column functions — built-in expression trees only (no `udf()`), so every
  * formatter stays inside whole-stage codegen and survives predicate pushdown.
  *
  * LOCKED semantics cited from the reference:
  *  - `_format_percent`  — real_estate_backend/report_generator.py:12-20
  *  - `_format_currency` — real_estate_backend/report_generator.py:23-30
  *  - `_format_date`     — real_estate_backend/report_generator.py:34-41
  *  - sanitize/compose   — report_generator.py:63-65, app.py:108-109
  *  - trim/NBSP          — app.py:27-28, crs_ui_bot.py:223
  *  - digit clamp / safe numeric — real_estate_frontend/src/App.js:226-234
  *
  * Null channel: every formatter returns `""` (never throws) on bad input,
  * exactly like the reference's `except: return ""` blocks — hence `try_cast`
  * everywhere (safe under Spark 4's default ANSI mode).
  *
  * Cross-engine determinism: arithmetic is decomposed so the DuckDB oracle can
  * run the *identical* float operations (no `format_number` rounding surprises):
  * currency = round-half-away(2dp) → integer part + zero-padded cents.
  */
object Formatters {

  /** P11: numeric-string → double, null on failure (`Number(v)` + NaN guard). */
  def safeNumeric(c: Column): Column = c.try_cast("double")

  /** P2 `_format_percent`: numeric-string → "NN%" with *truncating* int cast
    * (Python `int(float(x))` truncates toward zero); "" on parse failure.
    * DuckDB oracle must use `trunc()` (its double→int cast rounds).
    * Values outside int64 (and NaN/Inf) take the "" failure channel — the
    * truncating cast is `try_cast` so no input can throw (ANSI casts abort
    * the whole job on one bad record at scale; property-tested total).
    */
  def formatPercent(c: Column): Column = {
    val i = safeNumeric(c).try_cast("long")
    when(i.isNotNull, concat(i.cast("string"), lit("%")))
      .otherwise(lit(""))
  }

  /** Thousands-grouped rendering of a non-negative integral long ("1,234"). */
  private def grouped(i: Column): Column = format_number(i, 0)

  /** P3 `_format_currency`: float → "$1,234.56", or "$1,234" when the *input*
    * is integer-valued; "" on failure. Decomposed as round(x,2) →
    * integer part (grouped) + "." + lpad(cents) so DuckDB reproduces it
    * bit-for-bit (`format_number`'s HALF_EVEN vs round()'s HALF_UP would
    * otherwise diverge on .xx5 boundaries).
    */
  def formatCurrency(c: Column): Column = {
    val d  = safeNumeric(c)
    val r  = PortableHash.pround(d, 2)         // portable half-up: identical FP ops in DuckDB
    val ip = r.try_cast("long")                // truncation toward zero; null outside int64
    // cents from the |fractional| part — the sign lives on the integer part
    // (a negative remainder would otherwise render "$-70.-7")
    val cents = floor(abs(r - ip.cast("double")) * 100 + 0.5).try_cast("long")
    val isInt = d === d.try_cast("long").cast("double")
    when(d.isNull || ip.isNull, lit(""))       // parse failure OR beyond-int64/NaN/Inf
      .when(isInt, concat(lit("$"), grouped(ip)))
      .otherwise(concat(lit("$"), grouped(ip), lit("."), lpad(cents.cast("string"), 2, "0")))
  }

  /** P4 `_format_date`: 'yyyy-MM-dd' string → "Month DD, YYYY"; fallback to
    * *today* on parse failure (report_generator.py:41 — nondeterministic by
    * design; fixtures in oracle queries use only valid dates).
    */
  def formatDate(c: Column): Column =
    date_format(coalesce(try_to_date(c, "yyyy-MM-dd"), current_date()), "MMMM dd, yyyy")

  /** P5 filename sanitize: `replace(" ","_").replace("/","_")`. */
  def sanitizeName(c: Column): Column = translate(c, " /", "__")

  /** P6 filename compose: `Engagement_Letter_{safe_name}.pdf`. */
  def composeFilename(c: Column): Column =
    concat(lit("Engagement_Letter_"), sanitizeName(c), lit(".pdf"))

  /** P7+P8: trim + NBSP normalize (crs_ui_bot.py:223). */
  def cleanText(c: Column): Column = trim(translate(c, "\u00a0", " "))

  /** P9 basename of a path. */
  def basename(c: Column): Column = element_at(split(c, "/"), -1)

  /** P10 digit clamp: strip all non-[0-9.] (App.js:226-229). */
  def digitClamp(c: Column): Column = regexp_replace(c, "[^0-9.]", "")

  /** P12: filename from a Content-Disposition header. */
  def dispositionFilename(c: Column): Column =
    regexp_extract(c, "filename=\"?([^\"]+)\"?", 1)

  /** P13 template render (§1.3): the 12-placeholder engagement letter as a
    * pure scalar projection. Placeholders the backend never supplies
    * (initial_1..3, customer_signature_name) render as "" — reproduced by
    * simply omitting them, exactly like docxtpl's absent-key behavior.
    */
  def renderLetter(date: Column, name: Column, address: Column, fee: Column,
                   dueSigning: Column, dueCompletion: Column,
                   property: Column, parcelId: Column): Column =
    concat(
      lit("Date: "), date,
      lit("\nClient: "), name,
      lit("\nAddress: "), address,
      lit("\nProperty under appraisal: "), property,
      lit("\nParcel ID: "), parcelId,
      lit("\nFee: "), fee,
      lit("\nDue at signing: "), dueSigning,
      lit("\nDue at completion: "), dueCompletion,
      lit("\nInitials: __ __ __\nSignature: "))
}
