package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHash._

/** Stage-by-stage dissection of q35 (test scope scratch). */
object Prof35 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[prof35] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (round <- 1 to 2) {
      val sh = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(shingles(tokens(col("text")))).as("sh"))
        .select(col("doc_id"), (h48(col("sh")) % M31).as("shash"))
        .distinct().cache()
      t(s"r$round shingleRows") { sh.count() }
      t(s"r$round distinct shash") { sh.select("shash").distinct().count() }
      // doc-frequency distribution of shingles
      val df = sh.groupBy("shash").agg(count(lit(1)).as("f"))
      val hot = df.filter(col("f") > 1)
      t(s"r$round shingles f>1") { hot.count() }
      t(s"r$round sum f^2 (pair rows)") {
        df.agg(sum(col("f") * col("f"))).head().getLong(0)
      }
      t(s"r$round top-f") {
        df.orderBy(desc("f")).limit(10).collect().map(r => r.getLong(1)).sum
      }
      val a = sh.select(col("doc_id").as("doc_a"), col("shash"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shash"))
      val inter = a.join(b, Seq("shash"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      t(s"r$round inter pairs") { inter.count() }
      sh.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
