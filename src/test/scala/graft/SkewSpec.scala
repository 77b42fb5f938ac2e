package graft

import org.apache.spark.sql.functions._

/** Proves the AQE skew-join lever the scale design relies on (PERF.md):
  * a sort-merge join with one hot key gets its oversized partition split at
  * runtime (`skew=true` in the final plan) — no salting required when the
  * skew is only discovered at run time. The salted forms (q47/q57) remain
  * for planned-ahead skew; this is the adaptive fallback.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",          // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // two thirds of the fact lands on key 7; the rest spreads over 1000 keys
      val fact = spark.range(300000).select(
        when(col("id") % 3 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        (col("id") * 17 % 1000).as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS plan (AQE finalizes on the executed QueryExecution;
      // count() would build and adapt a different one)
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
        .linesIterator.takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n${plan.take(2000)}")
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition skew=true in:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
