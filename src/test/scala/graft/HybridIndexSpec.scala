package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.SimilarityOps

/** q142's conf-gated dense-arm lever (`graft.hybrid.denseIndex`): the
  * production path feeds the hybrid fusion from q144's IVF-PQ candidates
  * instead of an exhaustive exact-cosine corpus scan. These tests prove the
  * three claims the lever rests on: (1) the indexed arm never scores the
  * full corpus densely (metrics-verified, not just plan-text), (2) its
  * recall vs the exact arm clears a floor, and (3) the recorded-mode oracle
  * threading renders the form that actually ran.
  */
class HybridIndexSpec extends SparkSpec {

  private def withIndexed[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption("graft.hybrid.denseIndex")
    spark.conf.set("graft.hybrid.denseIndex", on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("graft.hybrid.denseIndex", v)
      case None    => spark.conf.unset("graft.hybrid.denseIndex")
    }
  }

  test("indexed dense arm clears the recall floor vs the exact arm") {
    // at the harness correctness SF (sf0.01): the sf0.001 fixture's 16
    // cells hold ~37 random vectors each — too coarse to measure anything
    // but quantization noise
    val e = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (a, x) => a + x)))
    val qids = Tables.documents(spark, sf01)
      .filter(col("doc_id") % graft.operators.TextOps.RetrQueryMod === 0)
      .select(col("doc_id")).orderBy(col("doc_id"))
      .limit(graft.operators.TextOps.RetrQueryCap)
      .select(col("doc_id").as("query_id"))
    val qv = e.join(broadcast(qids), col("vec_id") === col("query_id"))
      .select(col("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val wd = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("doc_id"))
    val exact = e.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b),
          lit(0.0), (a, x) => a + x).divide(col("norm") * col("qn")).as("cos"))
      .withColumn("r", row_number().over(wd))
      .filter(col("r") <= SimilarityOps.HybridPoolK)
      .select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // indexed dense arm: the exact helper q142 routes through
    val idx = SimilarityOps.ivfPqTopKOf(spark, sf01,
      ee => ee.join(broadcast(qids), ee("vec_id") === qids("query_id")).drop("query_id"),
      nprobe = SimilarityOps.HybridIvfProbes, rerank = SimilarityOps.HybridIvfReRank)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.nonEmpty && idx.keySet == exact.keySet,
      s"both arms must rank the same query batch: ${idx.keySet.size} vs ${exact.keySet.size}")
    val recalls = exact.map { case (q, ex) =>
      idx(q).intersect(ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    // measured 0.633 at sf0.01 with nprobe=4/16 and a 60-deep ADC pool —
    // far above the 25% probed-cell baseline, on PQ's adversarial case
    // (uncorrelated random vectors). Deterministic: a drop below the floor
    // means the machinery changed, not weather.
    assert(mean >= 0.5, f"mean recall@${SimilarityOps.HybridPoolK} = $mean%.3f < 0.5 floor")
  }

  test("indexed mode never scores the full corpus densely (join metrics), exact mode does") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps executed subtrees in AdaptiveSparkPlanExec/QueryStageExec
    // whose TreeNode children are empty — expand them to reach the real
    // operators and their runtime metrics
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec        => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    def maxBnljRows(on: Boolean): Long = withIndexed(on) {
      val df = SparkEntry.queries("q142_hybrid_retrieval")(spark, sf001)
      df.collect()
      val rows = allNodes(df.queryExecution.executedPlan)
        .filter(_.nodeName.contains("BroadcastNestedLoopJoin"))
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
      if (rows.isEmpty) 0L else rows.max
    }
    val corpusN = Tables.embeddings(spark, sf001).count()
    val batchCap = graft.operators.TextOps.RetrQueryCap.toLong
    val idxMax = maxBnljRows(on = true)
    // the only nested-loop join the indexed plan may contain is the
    // batch×IvfK codebook probe — bounded by the QUERY BATCH, not the corpus
    assert(idxMax <= batchCap * SimilarityOps.IvfK,
      s"indexed dense arm leaked a corpus-sized nested-loop join: $idxMax rows")
    val exactMax = maxBnljRows(on = false)
    assert(exactMax >= corpusN,
      s"control: the exact arm's full scan should exceed corpus size, got $exactMax")
  }

  test("oracle renders the dense-arm form the execution recorded") {
    withIndexed(on = true) {
      SparkEntry.queries("q142_hybrid_retrieval")(spark, sf001).count()
      assert(SimilarityOps.hybridDenseIndexUsed.contains(true))
      assert(SimilarityOps.hybridRetrievalSql.contains("iqsel"),
        "indexed execution must render the IVF-PQ oracle chain")
    }
    withIndexed(on = false) {
      SparkEntry.queries("q142_hybrid_retrieval")(spark, sf001).count()
      assert(SimilarityOps.hybridDenseIndexUsed.contains(false))
      assert(!SimilarityOps.hybridRetrievalSql.contains("iqsel"),
        "exact execution must render the exhaustive-cosine oracle")
    }
  }
}
