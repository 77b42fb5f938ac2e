package graft

import org.apache.spark.sql.functions._

/** Proves runtime filter injection (`InjectRuntimeFilter`): a selective
  * filter on the build side of a shuffled join gets turned into a bloom
  * filter applied to the probe side's scan — at 100 TB this prunes the fact
  * table before the shuffle, the same effect dynamic partition pruning has
  * for partitioned layouts but for arbitrary keys.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective build-side filter injects a bloom filter on the probe side") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",   // force a shuffled join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf01)
      val p = Tables.part(spark, sf01).filter(col("p_brand") === "Brand#21")
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
        .agg(round(sum(col("l_quantity")), 2).as("q"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom-filter probe in:\n${plan.take(2000)}")
      assert(plan.contains("bloom_filter_agg"),
        s"expected the bloom-filter build aggregate in:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
