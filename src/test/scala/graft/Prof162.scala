package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for q162 (streaming incremental admission) —
  * the Prof152 pattern. Run: `sbt "Test/runMain graft.Prof162 [sfDir]"`. */
object Prof162 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime() - s) / 1e9}%.3f s"); r
    }
    t("warm_q01")(SparkEntry.queries("q01_pricing_summary")(spark, dir).collect())
    val (idx, changed) = t("carriedIndexFor")(
      graft.streaming.DocsStream.carriedIndexFor(spark, dir))
    t("changed.count")(changed.count())
    t("bands.count")(idx.bands.count())
    t("sets.count")(idx.shingleSets.count())
    // bisect the stream side
    import graft.operators.TextOps
    val offset = TextOps.snapRekeyOffsetShared(spark, dir)
    val changedStatus = changed.select(col("doc_id"), col("status")).localCheckpoint()
    def streamChanged = TextOps.snapshotB(
        Tables.readStreamTable(spark, dir, "documents")
          .select(col("doc_id"), col("text")), Some(offset))
      .join(broadcast(changedStatus), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("status"))
    val cnt = new java.util.concurrent.atomic.AtomicInteger(100)
    def runStream(df: org.apache.spark.sql.DataFrame): Long = {
      val name = s"prof162_${cnt.incrementAndGet()}"
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).count()
    }
    for (i <- 1 to 2) t(s"stream: changed only #$i")(runStream(streamChanged))
    t("stream: + md5+sig+bloom") {
      val e = graft.streaming.DocsStream.profEnriched(spark, streamChanged, idx)
      runStream(e.select(col("doc_id"), col("status"), col("exact_match"), col("suspect")))
    }
    t("batch twin: enriched") {
      println("  rows=" + graft.streaming.DocsStream
        .profEnriched(spark, changed, idx).count())
    }
    t("batch twin: cands") {
      val c = graft.streaming.DocsStream.profCands(spark, changed, idx)
      println("  rows=" + c.count())
      println(c.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(200)).mkString("\n"))
    }
    t("stream: + candidate joins (no fMGWS)") {
      val c = graft.streaming.DocsStream.profCands(spark, streamChanged, idx)
      println("  rows=" + runStream(c))
    }
    for (i <- 1 to 2)
      t(s"full q162 #$i")(
        SparkEntry.queries("q162_stream_neardedup")(spark, dir).collect())
    t("q159 warm")(SparkEntry.queries("q159_incremental_neardup")(spark, dir).collect())
    spark.stop()
  }
}
