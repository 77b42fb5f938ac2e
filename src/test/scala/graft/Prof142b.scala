package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: lexicalScored postings-stage shapes. */
object Prof142b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.TextOps
    import graft.functions.PortableHash.tokens
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p142b] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val d0 = Tables.documents(spark, dir)
    val dF = d0.transform(Tables.fanout)
    for (r <- 1 to 3) {
      println(s"-- round $r"); spark.catalog.clearCache(); System.gc()
      t("explode nofan (noop)")(noop(
        d0.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))))
      t("explode fanout (noop)")(noop(
        dF.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))))
      t("post agg nofan (noop)")(noop(
        d0.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
      t("post agg fanout (noop)")(noop(
        dF.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))))
    }
    spark.stop()
  }
}
