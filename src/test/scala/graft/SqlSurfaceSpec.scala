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
