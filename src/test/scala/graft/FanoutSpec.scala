package graft

/** The `graft.fanout.enabled` gate (Tables.fanout): local single-file scans
  * need a round-robin exchange to use all cores; a real cluster's scans are
  * already wide and must be able to turn the extra shuffle OFF without
  * changing results. Asserts both the plan shape under each setting and
  * value-identity across them.
  */
class FanoutSpec extends SparkSpec {

  private def roundRobinCount(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange RoundRobinPartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("fanout gate: exchange present by default, absent when disabled, values identical") {
    def run() = graft.operators.TextOps.repetitionStats(spark, sf001)

    // default (unset) → enabled: the single-file scan fans out
    spark.conf.unset("graft.fanout.enabled")
    val on = run()
    on.collect()
    assert(roundRobinCount(on) >= 1, "fan-out exchange expected when enabled")

    // disabled → no round-robin exchange anywhere in the plan
    spark.conf.set("graft.fanout.enabled", "false")
    try {
      val off = run()
      val offRows = off.collect()
      assert(roundRobinCount(off) == 0,
        s"no fan-out exchange expected when disabled:\n${off.queryExecution.executedPlan}")
      // bit-identical results either way (both sides are ordered queries)
      assert(offRows.toSeq == on.collect().toSeq)
    } finally spark.conf.unset("graft.fanout.enabled")
  }

  test("fanout gate covers the similarity path too") {
    spark.conf.set("graft.fanout.enabled", "false")
    try {
      val off = graft.operators.SimilarityOps.cosineTopK(spark, sf001)
      off.collect()
      assert(roundRobinCount(off) == 0)
    } finally spark.conf.unset("graft.fanout.enabled")
  }
}
