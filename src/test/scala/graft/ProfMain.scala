package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (test scope; not part of the library surface).
  * Times a named subset of SparkEntry.queries with per-query wall clock.
  * Usage: Test/runMain graft.ProfMain <sfDir> <query...>
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q35_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (round <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[prof] round=$round $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
