package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q107 phase timing via the noop sink (guide §1.4) — where do the
  * ~2-3 s go? Usage: Test/runMain graft.Prof107b [sfDir]
  */
object Prof107b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Relational
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p107] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    for (round <- 1 to 3) {
      println(s"-- round $round")
      spark.catalog.clearCache(); System.gc()
      // 1. variant explode only (narrow): SymDeleteHashes CPU
      val keyedAll = c.select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment"),
        explode(graft.functions.SymDeleteHashes(col("c_name"), Relational.FuzzyWindow)).as("vhash"))
      t("1 explode (noop)")(noop(keyedAll))
      // 2. + window cap + collect_list block agg
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
      val blocks = keyedAll
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 65)
        .groupBy(col("vhash"), col("c_nationkey"), col("c_mktsegment"))
        .agg(collect_list(col("c_custkey")).as("ids"), count(lit(1)).as("df"))
      t("2 +window+agg (noop)")(noop(blocks))
      // 3. full candidate ids (pairs + distinct)
      t("3 candIds (noop)")(noop(Relational.fuzzyCandidates(spark, dir)
        .select(col("cust_a"), col("cust_b"))))
      // 4. full query
      t("4 full q107")(
        { SparkEntry.queries("q107_fuzzy_match")(spark, dir).count(); () })
    }
    spark.stop()
  }
}
