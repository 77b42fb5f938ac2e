package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: the 100 TB mechanism that removes the
  * fact-fact shuffle entirely. Writes orders/customer bucketed by the join
  * key into a temp warehouse, joins, and asserts the plan contains **no
  * shuffle exchange** — the physical proof behind the "co-bucket at scale"
  * notes in Relational.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on custkey plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is a
    // static conf and cannot be redirected per-test
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables.orders(spark, sf001)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf001)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join must choose a non-broadcast strategy;
    // bucketing then makes it shuffle-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last   // below the agg
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // same aggregate through the unbucketed path must match
      val expect = Tables.orders(spark, sf001)
        .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("q109 bucketed twin of q03 joins with no exchange; legacy flag elides sorts") {
    val q = graft.operators.Relational.bucketedJoin(spark, sf001)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    // below the presentation Sort (rangepartitioning is the orderBy — allowed),
    // the join itself must consume bucket layout: no hash exchange on either side
    val joinSection = plan.split("SortMergeJoin").last
    assert(plan.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed q109 join must not shuffle:\n$plan")

    // with one file per bucket the legacy outputOrdering flag is sound and
    // removes the per-side bucket-local sorts as well
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val q2 = graft.operators.Relational.bucketedJoin(spark, sf001)
      q2.count()
      val section2 = q2.queryExecution.executedPlan.toString.split("SortMergeJoin").last
      assert(!section2.contains("Sort ["),
        s"sorted single-file buckets must not re-sort under the legacy flag:\n$section2")
    } finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")

    // rows equal the unbucketed q03 exactly
    val q03 = graft.operators.Relational.enrichOrders(spark, sf001).collect()
    val q109 = q.collect()
    assert(q109.length == q03.length)
    assert(q109.map(_.toString).sameElements(q03.map(_.toString)))
  }
}
