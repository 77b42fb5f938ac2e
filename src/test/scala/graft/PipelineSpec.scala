package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Letter

/** End-to-end letter pipeline (the reference's §3.2 flow) + validation. */
class PipelineSpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("letters renders the full golden template for one known request") {
    val row = Letter.letters(spark, sf001).filter(col("request_id") === 1).collect()
    assert(row.length == 1)
    val r = row(0)
    val expected =
      s"Date: ${r.getAs[String]("letter_date")}\n" +
      s"Client: ${r.getAs[String]("client_name")}\n" +
      s"Address: Segment ${r.getAs[String]("due_signing_pct")}\n" +
      s"Property under appraisal: ${r.getAs[String]("pdf_filename")}\n" +
      s"Parcel ID: 1\n" +
      s"Fee: ${r.getAs[String]("fee_formatted")}\n" +
      s"Due at signing: ${r.getAs[String]("due_signing_pct")}\n" +
      s"Due at completion: ${r.getAs[String]("due_completion_pct")}\n" +
      "Initials: __ __ __\nSignature: "
    assert(r.getAs[String]("letter_text") == expected)
    assert(r.getAs[String]("due_signing_pct") == "20%")   // orderkey 1 → (1%5)*20
    assert(r.getAs[String]("due_completion_pct") == "80%")
    assert(r.getAs[String]("fee_formatted").startsWith("$"))
    assert(r.getAs[String]("pdf_filename").matches("Engagement_Letter_.*\\.pdf"))
  }

  test("validation splits requests into complete, mutually exclusive channels") {
    val channels = Letter.validationSummary(spark, sf001).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Long]("n")).toMap
    val total = Letter.requests(spark, sf001).count()
    assert(channels.values.sum == total, "channels must partition the input")
    assert(channels.contains("valid"))
    assert(channels.contains("sum_not_100"), "every 13th request violates sum-to-100")
    assert(channels.contains("bad_fee"), "every 17th request has an unparsable fee")
  }

  test("letters keeps only valid, enrichable requests") {
    val letters = Letter.letters(spark, sf001)
    val nValid = Letter.requests(spark, sf001).filter(Letter.step3Valid).count()
    assert(letters.count() <= nValid)
    assert(letters.filter(col("fee_formatted") === "").count() == 0)
  }
}
