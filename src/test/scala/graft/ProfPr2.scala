package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch: PageRank checkpoint-cadence sweep (argv: cadence list). */
object ProfPr2 {
  def main(args: Array[String]): Unit = {
    val cadences = args(0).split(",").map(_.toInt)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Analytics._
    def run(cadence: Int): Long = {
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cn"), (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .union(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg = edges.join(outdeg, Seq("src")).localCheckpoint()
      val n = edgesDeg.select(col("src")).distinct().count()
      val r0 = PrScale / n
      val base = 15L * r0 / 100L
      var rank: DataFrame = edgesDeg.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(r0)).localCheckpoint()
      for (k <- 1 to PrIters) {
        val it = edgesDeg.join(rank, edgesDeg("src") === rank("node"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("s"))
          .select(col("dst").as("node"),
            (lit(base) + expr("(s * 85) div 100")).as("rank"))
        rank = if (k % cadence == 0 || k == PrIters) it.localCheckpoint() else it
      }
      rank.count()
    }
    // warm once
    run(4)
    cadences.foreach { c =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); run(c); (System.nanoTime() - t0) / 1e9
      }
      println(f"[prpr] cadence=$c min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
