package graft

import org.apache.spark.sql.SparkSession

/** Streaming-tier time breakdown (test scope): runs named streaming queries
  * once, attaching a listener that records every StreamingQueryProgress, and
  * prints per-batch durationMs components (addBatch / getBatch / latestOffset
  * / queryPlanning / triggerExecution / walCommit / commitOffsets) plus the
  * wall time around the whole query function. Identifies whether a streaming
  * query's cost is batch compute, per-batch planning, state-store commit, or
  * harness fixed cost (query start/stop, sink read-back).
  *
  * Usage: Test/runMain graft.ProfStream <q1,q2,...> <sfDir> <cpus> [k=v,k=v]
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q58_stream_join").split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val confs: Seq[(String, String)] =
      if (args.length > 3 && args(3).nonEmpty)
        args(3).split(",").toSeq.map { kv =>
          val Array(k, v) = kv.split("=", 2); (k, v) }
      else Seq.empty
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("graft.stream.statePartitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    if (confs.nonEmpty) println(s"[profstream] session confs: $confs")
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = { progress.add(e.progress); () }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    names.foreach { n =>
      // warm once, then measure the second run (JIT / memoized index warm)
      (1 to 2).foreach { pass =>
        progress.clear()
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment on the last pass
        Thread.sleep(400)
        import scala.jdk.CollectionConverters._
        val ps = progress.asScala.toSeq
        val batchSum = ps.flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sum
        println(f"[profstream] $n pass$pass wall=$wall%.3f s, batches=${ps.size}, sum(triggerExecution)=${batchSum}ms")
        ps.foreach { p =>
          val d = p.durationMs
          def g(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
          println(s"  batch=${p.batchId} rows=${p.numInputRows} trigger=${g("triggerExecution")} addBatch=${g("addBatch")} getBatch=${g("getBatch")} latestOffset=${g("latestOffset")} planning=${g("queryPlanning")} walCommit=${g("walCommit")} commitOffsets=${g("commitOffsets")}" +
            (if (p.stateOperators.nonEmpty)
              p.stateOperators.map(so => s" state[commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}]").mkString
             else ""))
        }
      }
    }
    spark.stop()
  }
}
