package graft
import org.apache.spark.sql.SparkSession
object ProbeHybridTime {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (mode <- Seq(false, true, false, true, false, true)) {
      spark.conf.set("graft.hybrid.denseIndex", mode.toString)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q142_hybrid_retrieval")(spark, dir).count()
      println(f"HYB indexed=$mode%-5s ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
