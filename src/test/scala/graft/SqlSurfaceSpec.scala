package graft

import org.apache.spark.sql.functions._

/** The engine's SQL front door: every table registered as a temp view is
  * queryable with `spark.sql(...)`, and SQL plans match the DataFrame DSL
  * results (same Catalyst underneath). Also covers CSV/JSON sink round-trips
  * for the letter artifacts.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over temp views equals the DSL plan (q01 shape)") {
    Tables.names.foreach { t =>
      Tables(spark, sf001, t).createOrReplaceTempView(t)
    }
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDsl = graft.operators.Relational.pricingSummary(spark, sf001)
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("count_order"))
      .collect()
    assert(viaSql.length == viaDsl.length)
    viaSql.zip(viaDsl).foreach { case (a, b) => assert(a == b) }
  }

  test("DuckDB oracle dialect: locale-sensitive shapes pinned (duckdb 1.0.0)") {
    // The q10/q13 oracles lean on DuckDB `format('{:,}', …)` digit grouping
    // and `strftime` month names / %d zero-padding (SURVEY §7.4 risk 1) —
    // all locale/engine-version-sensitive. Run the exact fragments through
    // the harness's pinned DuckDB AND the Spark-side formatters, so an
    // oracle-side engine bump (or a locale drift on either side) fails this
    // unit test instead of the scoring gate. Cancels (not fails) where the
    // driver-side python3+duckdb toolchain is absent — that toolchain is
    // the oracle's, never the library's.
    import scala.sys.process._
    val script =
      """import json, duckdb
        |con = duckdb.connect()
        |print(json.dumps({
        |  "version":  duckdb.__version__,
        |  "grouping": con.sql("select format('{:,}', 1234567)").fetchone()[0],
        |  "march":    con.sql("select strftime(DATE '2024-03-05', '%B %d, %Y')").fetchone()[0],
        |  "november": con.sql("select strftime(DATE '2024-11-23', '%B %d, %Y')").fetchone()[0]}))
        |""".stripMargin
    val out = try Some(Seq("python3", "-c", script).!!.trim)
              catch { case _: Throwable => None }
    assume(out.isDefined, "driver-side python3+duckdb not available")
    val s = out.get
    assert(s.contains("\"version\": \"1.0.0\""),
      s"oracle DuckDB version drifted — re-pin the dialect shapes: $s")
    assert(s.contains("\"grouping\": \"1,234,567\""), s)
    assert(s.contains("\"march\": \"March 05, 2024\""), s)
    assert(s.contains("\"november\": \"November 23, 2024\""), s)
    // Spark side produces the SAME three shapes through the LOCKED formatters
    import spark.implicits._
    val row = Seq(("1234567", "2024-03-05", "2024-11-23")).toDF("amt", "d1", "d2")
      .select(
        graft.functions.Formatters.formatCurrency(col("amt")).as("cur"),
        graft.functions.Formatters.formatDate(col("d1")).as("m"),
        graft.functions.Formatters.formatDate(col("d2")).as("n"))
      .head
    assert(row.getString(0) == "$1,234,567")
    assert(row.getString(1) == "March 05, 2024")
    assert(row.getString(2) == "November 23, 2024")
  }

  test("letters round-trip through json and csv sinks") {
    val letters = graft.pipeline.Letter.letters(spark, sf001)
      .select(col("request_id"), col("client_name"), col("fee_formatted"), col("letter_text"))
    val n = letters.count()

    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json").toString
    letters.write.mode("overwrite").json(jsonDir)
    val backJson = spark.read.json(jsonDir)
    assert(backJson.count() == n)
    assert(backJson.columns.sorted.sameElements(letters.columns.sorted))

    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    letters.drop("letter_text")   // embedded newlines need the multiline mode
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    val backCsv = spark.read.option("header", "true").csv(csvDir)
    assert(backCsv.count() == n)
    // values survive: spot-check one known row
    val row = backCsv.filter(col("request_id") === "1").collect()
    assert(row.length == 1 && row(0).getAs[String]("fee_formatted").startsWith("$"))
  }
}
