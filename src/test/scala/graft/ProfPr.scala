package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Scratch: phase timing for q138 pagerank (scale debugging). */
object ProfPr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .union(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg = t("edges build+checkpoint") {
        edges.join(outdeg, Seq("src")).localCheckpoint()
      }
      println(s"[prof] edges=${edgesDeg.count()}")
      val n = t("node count")(edgesDeg.select(col("src")).distinct().count())
      val r0 = Analytics.PrScale / n
      val base = 15L * r0 / 100L
      var rank = t("rank init") {
        edgesDeg.select(col("src").as("node")).distinct()
          .withColumn("rank", lit(r0)).localCheckpoint()
      }
      for (k <- 1 to Analytics.PrIters) {
        val it = edgesDeg.join(rank, edgesDeg("src") === rank("node"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("s"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(s * 85) div 100")).as("rank"))
        rank = t(s"iter $k")(if (k % 8 == 0) it.localCheckpoint() else it)
        if (k == 1 && round == 2) {
          it.collect()
          println(it.queryExecution.executedPlan.toString
            .linesIterator.takeWhile(!_.contains("== Initial Plan ==")).mkString("\n"))
        }
      }
      t("final sort")(rank.orderBy(col("rank").desc, col("node")).count(): Unit)
    }
    spark.stop()
  }
}
