package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Prof107c {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Relational
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p107c] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    val keyedAll = c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        explode(graft.functions.SymDeleteHashes(col("c_name"), Relational.FuzzyWindow)).as("vhash"))
      .select(col("c_custkey"),
        xxhash64(col("vhash"), col("c_nationkey"), col("c_mktsegment")).as("bkey"))
    for (r <- 1 to 3) {
      println(s"-- round $r"); spark.catalog.clearCache(); System.gc()
      t("explode only")(noop(keyedAll))
      t("hashagg count only")(noop(keyedAll.groupBy(col("bkey")).agg(count(lit(1)).as("df"))))
      t("hashagg collect_list")(noop(keyedAll.groupBy(col("bkey"))
        .agg(collect_list(col("c_custkey")).as("ids"), count(lit(1)).as("df"))))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bkey")).orderBy(col("c_custkey"))
      t("window+agg (current)")(noop(keyedAll
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 65)
        .groupBy(col("bkey")).agg(collect_list(col("c_custkey")).as("ids"), count(lit(1)).as("df"))))
    }
    spark.stop()
  }
}
