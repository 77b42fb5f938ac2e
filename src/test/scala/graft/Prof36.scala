package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._

/** Stage-by-stage dissection of q36 (test scope scratch). */
object Prof36 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[prof36] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (round <- 1 to 2) {
      val d = Tables.documents(spark, dir).repartition(32)
      val sh = d.select(col("doc_id"), explode(shingles(tokens(col("text")))).as("sh"))
        .select(col("doc_id"), (h48(col("sh")) % M31).as("shash"))
        .distinct().cache()
      t(s"r$round shingleRows") { sh.count() }
      val minAggs = (0 until 64).map(j => min(permuted(lit(j), col("shash"))).as(s"m$j"))
      val sig = sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      t(s"r$round sig64") { sig.count() }
      val bandCols = array((0 until 16).map(bi =>
        concat_ws(":", (0 until 4).map(k => col(s"m${bi * 4 + k}").cast("string")): _*)): _*)
      val bands = sig.select(col("doc_id"), posexplode(bandCols))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_sig")
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") && col("x.band_sig") === col("y.band_sig")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      t(s"r$round cand") { cand.count() }
      val candC = cand.cache()
      candC.count()
      val inter = candC
        .join(sh.select(col("doc_id").as("doc_a"), col("shash")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shash")), Seq("doc_b", "shash"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
      t(s"r$round inter") { inter.count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
