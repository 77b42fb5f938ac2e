package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-level dissection of the rewritten q62 (round 7). */
object Prof62c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"[prof62c] r$r $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        t0 = System.nanoTime()
      }
      val s = graft.operators.TextOps.simhashDocs(spark, dir).localCheckpoint()
      lap("simhashDocs ck")
      val groups = s.groupBy(col("simhash")).agg(min(col("doc_id")).as("rep"))
      val np = graft.operators.TextOps.simhashNearPairsDistinct(s)
      val repPairs = np
        .join(groups.select(col("simhash").as("sim_a"), col("rep").as("rep_a")), "sim_a")
        .join(groups.select(col("simhash").as("sim_b"), col("rep").as("rep_b")), "sim_b")
        .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"))
        .localCheckpoint()
      val nEdges = repPairs.count()
      lap(s"repPairs ck n=$nEdges")
      val n = graft.operators.TextOps.dedupClusters(spark, dir).count()
      lap("dedupClusters(full)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
