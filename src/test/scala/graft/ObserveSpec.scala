package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Letter

/** `Dataset.observe` — in-flight accounting without a second pass: the
  * engine form of the reference's partial-success status reporting
  * (app.py:131-133 archives but reports "email skipped"; every stage tells
  * the caller how much it actually processed). Observed metrics ride the
  * executed plan, so row counts and sums come back from the SAME job that
  * produced the output — no extra scan, no stale numbers.
  */
class ObserveSpec extends SparkSpec {

  test("observed metrics report pipeline accounting from the same job") {
    val letters = Letter.letters(spark, sf001)
      .observe("letters_metrics",
        count(lit(1)).as("n_letters"),
        sum(length(col("letter_text"))).as("total_chars"))
    val out = letters.collect()
    val metrics = letters.queryExecution.observedMetrics("letters_metrics")
    assert(metrics.getAs[Long]("n_letters") == out.length)
    assert(metrics.getAs[Long]("total_chars") ==
      out.map(_.getAs[String]("letter_text").length.toLong).sum)
  }

  test("observe counts the rejected channel without rescanning") {
    val o = Tables.orders(spark, sf001)
      .observe("scan_metrics", count(lit(1)).as("n_read"))
      .filter(col("o_orderkey") % 2 === 0)
    // read metrics from the EXECUTED QueryExecution (a count() would build
    // a different one and observe nothing)
    val kept = o.collect().length.toLong
    val read = o.queryExecution.observedMetrics("scan_metrics").getAs[Long]("n_read")
    assert(read > kept, "observe sees pre-filter traffic")
    assert(read == Tables.orders(spark, sf001).count())
  }
}
