package graft

import org.apache.spark.sql.functions._
import graft.functions.Formatters

/** Adversarial rounding-boundary values for the currency formatter.
  *
  * Contract: pipeline wire strings for money are decimal-stable (≤ 2
  * fractional digits — `Letter.requests` routes fees through
  * `decimal(18,2)`), and on that domain Spark and DuckDB agree exactly
  * (verified by the q10/q13 hash-match).
  *
  * The formatter rounds with the portable floor(x·100 + 0.5)/100 form —
  * identical FP ops in Spark and DuckDB, so ".xx5" literals agree across
  * engines wherever the inputs are bit-identical ("1.005" → $1.00 in both,
  * matching Python's true-value behavior; 0.125 → $0.13 where Python's
  * half-even gives $0.12 — the one residual divergence from the reference,
  * on inputs its own UI never produces). This spec locks the contract.
  */
class CurrencyBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("currency formatter boundary values follow the pinned contract") {
    val cases = Seq(
      // agreed with DuckDB's decomposition on the same inputs:
      "999.995"       -> "$1,000.00",   // cents carry into the integer part
      "0.005"         -> "$0.01",
      "1.005"         -> "$1.00",       // true-value rounding (1.00499…)
      "2.675"         -> "$2.68",
      "1234.565"      -> "$1,234.57",
      "0.125"         -> "$0.13",
      "99.995"        -> "$100.00",
      "100.0"         -> "$100",
      "0.0"           -> "$0",
      "1e6"           -> "$1,000,000",
      "123456789.995" -> "$123,456,790.00")
    val got = cases.map(_._1).toDF("x")
      .select(col("x"), Formatters.formatCurrency(col("x")).as("usd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"input $in: got ${got(in)}, pinned $want")
    }
  }

  test("decimal-stable wire strings (the oracle domain) never hit the divergence") {
    // every representable 2-decimal string round-trips exactly
    val rnd = new scala.util.Random(3)
    val wires = Seq.fill(500)(f"${rnd.nextInt(2000000)}.${rnd.nextInt(100)}%02d")
    val bad = wires.toDF("x")
      .select(col("x"),
        Formatters.formatCurrency(col("x")).as("usd"),
        // reconstruct the numeric from the formatted string and compare
        regexp_replace(col("usd"), "[$,]", "").as("back"))
      .filter(col("back").cast("decimal(18,2)") =!= col("x").cast("decimal(18,2)"))
      .count()
    assert(bad == 0)
  }
}
