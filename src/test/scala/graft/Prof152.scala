package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for q152 (index maintenance) — the Prof107
  * pattern: warm the JVM once, then time each stage of the pipeline in
  * isolation so the conf-gate work targets the stage that actually costs.
  * Run: `sbt "Test/runMain graft.Prof152 [sfDir]"`.
  */
object Prof152 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime() - s) / 1e9}%.3f s"); r
    }
    // warm
    t("warm_q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).collect())
    t("q111 cold")(SparkEntry.queries("q111_incremental_dedup")(spark, dir).collect())
    t("q111 warm")(SparkEntry.queries("q111_incremental_dedup")(spark, dir).collect())
    t("q118 (train only) warm1")(SparkEntry.queries("q118_kmeans_train")(spark, dir).collect())
    t("q118 (train only) warm2")(SparkEntry.queries("q118_kmeans_train")(spark, dir).collect())
    t("q146 drift warm1")(SparkEntry.queries("q146_embedding_drift")(spark, dir).collect())
    t("q146 drift warm2")(SparkEntry.queries("q146_embedding_drift")(spark, dir).collect())
    for (i <- 1 to 3) t(s"full q152 #$i")(
      SparkEntry.queries("q152_index_maintenance")(spark, dir).collect())
    spark.conf.set("graft.ann.verifyRebuild", "true")
    for (i <- 1 to 3) t(s"q152 verifyRebuild=on #$i")(
      SparkEntry.queries("q152_index_maintenance")(spark, dir).collect())
    spark.conf.unset("graft.ann.verifyRebuild")
    spark.stop()
  }
}
