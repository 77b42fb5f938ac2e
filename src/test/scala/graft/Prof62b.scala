package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure the simhash-collapse potential for q62/q117 (round 7). */
object Prof62b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def lap(name: String): Unit =
      println(f"[prof62b] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s total")
    val s = graft.operators.TextOps.simhashDocs(spark, dir).cache()
    val nDocs = s.count()
    val nDistinct = s.select("simhash").distinct().count()
    lap(s"simhash docs=$nDocs distinct=$nDistinct")
    val top = s.groupBy("simhash").count().orderBy(col("count").desc).limit(5).collect()
    println(s"[prof62b] top groups: ${top.map(r => r.getLong(1)).mkString(",")}")
    spark.stop()
  }
}
