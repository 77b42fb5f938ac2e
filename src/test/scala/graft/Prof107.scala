package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Scratch: per-variant timing of q107 candidate shapes (one variant per
  * JVM to keep JIT/GC state comparable: warm once, then min of 3).
  */
object Prof107 {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxBlock = 64
    def keyedAll = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        explode(graft.functions.SymDeleteHashes(col("c_name"))).as("vhash"))

    def candidates(): DataFrame = variant match {
      case "old" => operators.Relational.fuzzyCandidates(spark, dir)
        .select(col("cust_a"), col("cust_b"))
      case "window" =>
        val w = Window.partitionBy(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
        keyedAll
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= maxBlock + 1)
          .groupBy(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
          .agg(collect_list(col("c_custkey")).as("ids"), count(lit(1)).as("df"))
          .filter(col("df").between(2, maxBlock))
          .withColumn("cust_a", explode(col("ids")))
          .withColumn("cust_b", explode(col("ids")))
          .filter(col("cust_a") < col("cust_b"))
          .select(col("cust_a"), col("cust_b"), col("c_nationkey"), col("c_mktsegment"))
          .distinct().select(col("cust_a"), col("cust_b"))
      case "minmax" =>
        val ka = keyedAll
        val stats = ka
          .groupBy(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("df"), min(col("c_custkey")).as("lo"),
            max(col("c_custkey")).as("hi"))
        val pairBlocks = stats.filter(col("df") === 2)
          .select(col("lo").as("cust_a"), col("hi").as("cust_b"),
            col("c_nationkey"), col("c_mktsegment"))
        val bigBlocks = stats.filter(col("df").between(3, maxBlock))
          .select(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
        val bigMembers = ka.join(broadcast(bigBlocks),
          Seq("vhash", "c_nationkey", "c_mktsegment"), "left_semi")
        val bigPairs = bigMembers.as("x").join(bigMembers.as("y"),
            col("x.vhash") === col("y.vhash")
              && col("x.c_nationkey") === col("y.c_nationkey")
              && col("x.c_mktsegment") === col("y.c_mktsegment")
              && col("x.c_custkey") < col("y.c_custkey"))
          .select(col("x.c_custkey").as("cust_a"), col("y.c_custkey").as("cust_b"),
            col("x.c_nationkey").as("c_nationkey"),
            col("x.c_mktsegment").as("c_mktsegment"))
        pairBlocks.unionByName(bigPairs).distinct()
          .select(col("cust_a"), col("cust_b"))
    }
    if (args.contains("explain")) {
      val plan = candidates().queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("WindowGroupLimit") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Aggregate") || l.contains("Sort"))
        .mkString("\n"))
      spark.stop(); return
    }
    // warm
    candidates().count()
    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = candidates().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof107] $variant $dt%.2f s pairs=$n"); dt
    }
    println(f"[prof107] $variant MIN ${times.min}%.2f s")
    spark.stop()
  }
}
