package graft

import org.apache.spark.sql.functions._
import graft.functions.Formatters._

/** LOCKED formatter semantics from the reference (FIXTURES.md edge-case
  * table; report_generator.py:10-41): truncating percent, grouped currency
  * with cents-iff-fractional, Month DD YYYY dates, "" null channels.
  */
class FormattersSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Option(in)).toDF("x").select(f(col("x")).as("y")).collect()(0).getString(0)

  test("_format_percent truncates toward zero and empties on failure") {
    assert(one("50", formatPercent) == "50%")
    assert(one("50.9", formatPercent) == "50%")
    assert(one("1000", formatPercent) == "1000%")
    assert(one("1234.5", formatPercent) == "1234%")
    assert(one("abc", formatPercent) == "")
    assert(one(null, formatPercent) == "")
  }

  test("_format_currency groups thousands, drops cents when integer-valued") {
    assert(one("50", formatCurrency) == "$50")
    assert(one("50.9", formatCurrency) == "$50.90")
    assert(one("1000", formatCurrency) == "$1,000")
    assert(one("1234.5", formatCurrency) == "$1,234.50")
    assert(one("1234567.89", formatCurrency) == "$1,234,567.89")
    assert(one("abc", formatCurrency) == "")
    assert(one(null, formatCurrency) == "")
  }

  test("_format_date renders Month DD, YYYY with today-fallback on bad parse") {
    assert(one("2025-12-06", formatDate) == "December 06, 2025")
    assert(one("2024-01-31", formatDate) == "January 31, 2024")
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val expected = today.format(java.time.format.DateTimeFormatter
      .ofPattern("MMMM dd, yyyy", java.util.Locale.US))
    assert(one("garbage", formatDate) == expected)
    assert(one(null, formatDate) == expected)
  }

  test("sanitize replaces spaces and slashes; filename composes") {
    assert(one("John Q / Smith", sanitizeName) == "John_Q___Smith")
    assert(one("Jane Doe", composeFilename) == "Engagement_Letter_Jane_Doe.pdf")
  }

  test("cleanText trims and normalizes NBSP (crs_ui_bot.py:223)") {
    assert(one("  123 Main St  ", cleanText) == "123 Main St")
  }

  test("digitClamp strips non-numerics; idempotent") {
    assert(one("$1,234.56", digitClamp) == "1234.56")
    assert(one("abc", digitClamp) == "")
    val once  = one("a1b2.3c", digitClamp)
    val twice = one(once, digitClamp)
    assert(once == twice)
  }

  test("dispositionFilename extracts quoted and bare filenames") {
    assert(one("attachment; filename=\"report.pdf\"", dispositionFilename) == "report.pdf")
    assert(one("attachment; filename=report.pdf", dispositionFilename) == "report.pdf")
  }
}
