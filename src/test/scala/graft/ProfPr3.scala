package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q138 NEW-shape phase timing + the executed plan of one
  * iteration block (the part localCheckpoint hides from ExplainMain).
  * Usage: Test/runMain graft.ProfPr3 [sfDir]
  */
object ProfPr3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Analytics._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof3] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      spark.catalog.clearCache(); System.gc()
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val edges = pairs.select(explode(array(
          struct(col("cn").as("src"), col("sn").as("dst")),
          struct(col("sn").as("src"), col("cn").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val wDeg = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      val edgesDeg = t("edges build+ckpt") {
        edges.withColumn("outdeg", count(lit(1)).over(wDeg)).localCheckpoint()
      }
      val nodes = t("nodes ckpt")(edgesDeg.select(col("src")).distinct().localCheckpoint())
      val n = t("node count")(nodes.count())
      val r0 = PrScale / n
      val base = 15L * r0 / 100L
      var rank = nodes.select(col("src").as("node")).withColumn("rank", lit(r0))
      var blockPrinted = false
      for (k <- 1 to PrIters) {
        val it = edgesDeg.join(rank, edgesDeg("src") === rank("node"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("s"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(s * 85) div 100")).as("rank"))
        if (k % 4 == 0 || k == PrIters) {
          rank = t(s"iter block ..$k ckpt") {
            if (round == 2 && !blockPrinted) {
              it.collect()  // materialize once to finalize AQE
              println("==== iteration block executed plan (k=" + k + ") ====")
              println(it.queryExecution.executedPlan.toString)
              blockPrinted = true
            }
            it.localCheckpoint()
          }
        } else rank = it
      }
      t("final sort")(rank.orderBy(col("rank").desc).count())
    }
    spark.stop()
  }
}
