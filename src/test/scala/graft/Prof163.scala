package graft

import org.apache.spark.sql.SparkSession

/** Stage-level timing probe for q163 (docx round-trip) — splits the
  * pipeline at the container column so the render+emit stage and the
  * re-parse stage price separately. Run:
  * `sbt "Test/runMain graft.Prof163 [sfDir]"`.
  */
object Prof163 {
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
    t("warm_q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).collect())
    // the letters plane alone (joins + formatters, no codec work)
    for (i <- 1 to 2) t(s"letters plane #$i")(
      graft.pipeline.Letter.lettersPlane(spark, dir).count())
    // render + emit (the S6 sink column), no re-parse
    for (i <- 1 to 2) t(s"renderedDocx #$i")(
      graft.pipeline.Letter.renderedDocx(spark, dir).count())
    // the full round-trip query
    for (i <- 1 to 3) t(s"full q163 #$i")(
      SparkEntry.queries("q163_docx_roundtrip")(spark, dir).collect())
    spark.stop()
  }
}
