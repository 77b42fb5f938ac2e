package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q139/q142/q143 phase timing (noop sink).
  * Usage: Test/runMain graft.Prof142 [sfDir]
  */
object Prof142 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p142] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      println(s"-- round $r"); spark.catalog.clearCache(); System.gc()
      t("lexicalScored (noop)")(noop(graft.operators.TextOps.lexicalScored(spark, dir)))
      t("q139 full")({ SparkEntry.queries("q139_lexical_retrieval")(spark, dir).count(); () })
      spark.catalog.clearCache(); System.gc()
      t("q142 full")({ SparkEntry.queries("q142_hybrid_retrieval")(spark, dir).count(); () })
      spark.catalog.clearCache(); System.gc()
      t("q143 full")({ SparkEntry.queries("q143_neardup_decontaminate")(spark, dir).count(); () })
    }
    spark.stop()
  }
}
