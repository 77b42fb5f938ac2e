package graft
import org.apache.spark.sql.SparkSession

/** Scratch: driver-side cost of spark.read.parquet schema inference vs an
  * explicit schema (catalog stand-in). Usage: Test/runMain graft.ProbeSchemaCost [dir]
  */
object ProbeSchemaCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("orders", "lineitem", "documents", "events", "customer")
    // warm both paths
    names.foreach(n => spark.read.parquet(s"$dir/$n.parquet").schema)
    val schemas = names.map(n => n -> spark.read.parquet(s"$dir/$n.parquet").schema).toMap
    val reps = 100
    var t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      names.foreach(n => spark.read.parquet(s"$dir/$n.parquet").schema)
    }
    val inferred = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      names.foreach(n => spark.read.schema(schemas(n)).parquet(s"$dir/$n.parquet").schema)
    }
    val explicit = (System.nanoTime() - t0) / 1e9
    println(f"[schemacost] ${reps} reps x ${names.size} tables: inferred=$inferred%.2f s, explicit=$explicit%.2f s, per-read saved=${(inferred - explicit) / (reps * names.size) * 1000}%.2f ms")
    spark.stop()
  }
}
