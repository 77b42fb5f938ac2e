ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automatedpropertydataingestiondocumentpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// All suites share one SparkSession (SparkSpec.getOrCreate); several tests
// temporarily mutate session confs (broadcast threshold, skew/bloom-filter
// knobs) and assert plan shapes, so concurrent suites would race on the
// shared conf. Run suites sequentially in the forked JVM.
Test / parallelExecution := false
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger —
// the bench harness parses the JSON result line and the default
// "[info] "-prefixed logging breaks that parse.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Dozens of codegen'd queries in one JVM generate a lot of classes; the
  // default 240m code cache can fill and silently stop JIT compilation
  // (generated code then runs in the bytecode interpreter). Size it up and
  // keep full tiered compilation for steady-state throughput.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // Throughput collector, not G1 (the JDK-17 default): this workload is a
  // single-JVM batch engine — allocation-heavy scan/shuffle bursts, no
  // latency SLO — and ParallelGC measured a 15-17% TOTAL bench win on the
  // same box/code (full 148-query run: 140-147 s under G1, 119.4 s under
  // ParallelGC; bench-phase gc_count fell 1563 -> 619). Pause-time goals
  // buy nothing here and G1's concurrent cycles tax every query's mutator
  // throughput.
  "-XX:+UseParallelGC",
) ++
  // Optional extra JVM flags for forked runs (GC experiments etc.):
  // GRAFT_JAVA_OPTS="-XX:+UseParallelGC" sbt "runMain graft.Bench"
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
