package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary timing harness — not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime() - s) / 1e9}%.3f s"); r
    }
    // warm
    t("warm_q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).collect())
    import graft.operators.{SimilarityOps, TextOps}
    val all = Tables.embeddings(spark, dir).transform(Tables.fanout)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    println("embeddings rows: " + all.count())
    val isNew = col("vec_id") % 5 === 0
    val corpus = all.filter(!isNew)
    val seeds = t("seeds")(corpus.orderBy(col("vec_id")).limit(SimilarityOps.IvfK))
    val (cents, _) = t("trainedCodebookOf")(SimilarityOps.trainedCodebookOf(spark, corpus, seeds))
    val (cids, cvs) = SimilarityOps.collectCodebook(cents, "cluster", "cv")
    val nc = graft.functions.NearestCentroid(col("v"), lit(0.0), cids, cvs, byCosine = false)
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), nc.as("nc")).select(col("vec_id"), col("nc.cluster").as("cluster"))
    val admittedIds = t("incrementalDedup(q111)")(
      TextOps.incrementalDedup(spark, dir).filter(col("verdict") === "new")
        .select(col("doc_id").as("vec_id")).localCheckpoint())
    val incr = t("incr assign")(assign(all.filter(isNew).join(admittedIds, Seq("vec_id"))).localCheckpoint())
    val asgAll = t("asgAll")(assign(all).localCheckpoint())
    val rebuild = asgAll.join(admittedIds, Seq("vec_id"))
    val mism = t("mismatch")(incr.withColumnRenamed("cluster", "ci")
      .join(rebuild.withColumnRenamed("cluster", "cr"), Seq("vec_id"), "full")
      .filter(!(col("ci") <=> col("cr"))).agg(count(lit(1)).as("n_mismatch")).collect())
    val drift = t("drift")(SimilarityOps.embeddingDriftOf(spark,
      all.withColumn("slice", when(isNew, lit("cand")).otherwise(lit("ref")))
        .select(col("slice"), col("v")))
      .agg(sum(when(col("drifted"), 1L).otherwise(0L)).as("n_drifted_dims")).collect())
    t("full q152")(SparkEntry.queries("q152_index_maintenance")(spark, dir).collect())
    t("full q152 again")(SparkEntry.queries("q152_index_maintenance")(spark, dir).collect())
    t("q118")(SparkEntry.queries("q118_kmeans_train")(spark, dir).collect())
    spark.stop()
  }
}
