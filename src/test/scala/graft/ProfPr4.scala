package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q138 iteration shape with a pinned (non-coalescable) edge
  * partitioning — does the per-block edge Exchange disappear?
  * Usage: Test/runMain graft.ProfPr4 [sfDir] [ckptEvery] [pin]
  */
object ProfPr4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ckptEvery = if (args.length > 1) args(1).toInt else 4
    val pin = if (args.length > 2) args(2).toBoolean else true
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Analytics._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof4] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val widths = if (args.length > 4) args(4).split(";").map(_.toInt) else Array(0)
    val totals = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    for (round <- 1 to 8) {
      val wSel = widths(round % widths.length)
      println(s"-- round $round pin=$pin ckptEvery=$ckptEvery w=$wSel")
      spark.catalog.clearCache(); System.gc()
      val tAll0 = System.nanoTime()
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val edges0 = pairs.select(explode(array(
          struct(col("cn").as("src"), col("sn").as("dst")),
          struct(col("sn").as("src"), col("cn").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val nParts = if (wSel > 0) wSel
                   else if (args.length > 3) args(3).toInt
                   else spark.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = if (pin) edges0.repartition(nParts, col("src")) else edges0
      val wDeg = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      def noAqe[A](f: => A): A =
        if (!pin) f
        else {
          val prev = spark.conf.get("spark.sql.adaptive.enabled")
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
        }
      val edgesDeg = t("edges build+ckpt") { noAqe {
        edges.withColumn("outdeg", count(lit(1)).over(wDeg)).localCheckpoint()
      } }
      println(s"[prof4] edgesDeg rdd partitions = ${edgesDeg.rdd.getNumPartitions}")
      println(s"[prof4] edgesDeg logical partitioning = ${edgesDeg.queryExecution.optimizedPlan.asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].outputPartitioning}")
      val nodes = t("nodes ckpt")(noAqe(edgesDeg.select(col("src")).distinct().localCheckpoint()))
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
        if (k % ckptEvery == 0 || k == PrIters) {
          rank = t(s"iter block ..$k ckpt") {
            if (round == 3 && !blockPrinted) {
              it.collect()
              println("==== iteration block executed plan (k=" + k + ") ====")
              println(it.queryExecution.executedPlan.toString)
              blockPrinted = true
            }
            it.localCheckpoint()
          }
        } else rank = it
      }
      val cnt = t("final sort")(rank.orderBy(col("rank").desc).count())
      val tot = (System.nanoTime() - tAll0) / 1e9
      println(f"[prof4] TOTAL $tot%.2f s rows=$cnt")
      if (round > 2) totals(wSel) = tot :: totals(wSel)
    }
    totals.toSeq.sortBy(_._1).foreach { case (w, ts) =>
      println(f"[prof4] SUMMARY w=$w min=${ts.min}%.2f median=${ts.sorted.apply(ts.size / 2)}%.2f n=${ts.size}")
    }
    spark.stop()
  }
}
