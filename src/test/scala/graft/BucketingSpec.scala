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

  test("q138's power iteration consumes a src-bucketed edge table with zero edge-side exchanges") {
    // The production layout pageRank's scaladoc names, demonstrated: bucket
    // the (src, dst, outdeg) edge table by src once, and every one of the 8
    // rank⋈edges iterations reads it co-located — the 100 TB edge list is
    // never shuffled per iteration; the only exchanges an iteration pays
    // are node-sized (the rank frame onto src, the contribution sum onto
    // dst). Broadcast is disabled because at scale the rank side is
    // node-sized, NOT broadcastable — this is exactly the regime where the
    // bucket layout is the lever.
    import graft.operators.Analytics
    spark.sql("DROP TABLE IF EXISTS b_edges")
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, sf001).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct()
    val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .union(pairs.select(col("sn").as("src"), col("cn").as("dst")))
    val edgesDeg = edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
    edgesDeg.write.bucketBy(8, "src").sortBy("src")
      .mode("overwrite").saveAsTable("b_edges")
    // restore the PRE-TEST value afterwards (not a hard-coded default):
    // later suites share this session, and a literal would silently
    // override any ambient conf the harness set
    val prevThreshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val bEdges = spark.table("b_edges")
      val n = bEdges.select(col("src")).distinct().count()
      val r0 = Analytics.PrScale / n
      val base = 15L * r0 / 100L
      def iterate(rank: org.apache.spark.sql.DataFrame) =
        bEdges.join(rank, bEdges("src") === rank("node"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(s * 85) div 100")).as("rank"))
      val rank0 = bEdges.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(r0)).localCheckpoint()
      val it = iterate(rank0)
      it.collect()
      val plan = it.queryExecution.executedPlan.toString
        .linesIterator.takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
      // the edge side must be exchange-free: no hash exchange keyed on src
      // anywhere in the iteration (the bucket layout satisfies the join's
      // src-distribution requirement directly from the scan)
      assert(!plan.contains("Exchange hashpartitioning(src"),
        s"bucketed edges must not shuffle on src:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"non-broadcast join expected in the at-scale regime:\n$plan")
      // the same iteration over the UNBUCKETED edge frame pays the src
      // exchange — the lever is visible as exactly that plan delta
      val unb = edgesDeg.localCheckpoint()
      val itU = unb.join(rank0, unb("src") === rank0("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(s * 85) div 100")).as("rank"))
      itU.collect()
      val planU = itU.queryExecution.executedPlan.toString
        .linesIterator.takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
      assert(planU.contains("Exchange hashpartitioning(src"),
        s"unbucketed control should shuffle edges on src:\n$planU")
      // and the iteration's VALUES are identical through both layouts
      val a = it.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val b = itU.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(a.sameElements(b), "bucketed and unbucketed iterations must agree")
    } finally {
      prevThreshold match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_edges")
    }
  }
}
