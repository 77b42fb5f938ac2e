package graft

import org.apache.spark.sql.SparkSession

/** One-off loop-timing dissection of q62 (test scope scratch). */
object Prof62 {
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
        println(f"[prof62] r$r $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        t0 = System.nanoTime()
      }
      val pairs = graft.operators.TextOps.simhashPairs(spark, dir)
        .select("doc_a", "doc_b").localCheckpoint()
      lap("simhashPairs")
      val n = graft.operators.TextOps.dedupClusters(spark, dir).count()
      lap(s"dedupClusters(all)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
