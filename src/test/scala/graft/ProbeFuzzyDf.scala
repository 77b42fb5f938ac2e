package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: distribution of q107 variant-block sizes at a given SF. */
object ProbeFuzzyDf {
  def main(a: Array[String]): Unit = {
    val sfDir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keyed = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        explode(graft.functions.SymDeleteHashes(col("c_name"))).as("vhash"))
    val df = keyed.groupBy("vhash", "c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("df"))
    df.agg(max(col("df")).as("max_df"),
        expr("percentile(df, 0.999)").as("p999"),
        expr("percentile(df, 0.99)").as("p99"),
        count(lit(1)).as("n_blocks")).show(false)
    Seq(4, 8, 16, 32).foreach { k =>
      val n = df.filter(col("df") > k).count()
      println(s"blocks with df > $k: $n")
    }
    spark.stop()
  }
}
