package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: inside lexicalScored — which job burns the time? */
object Prof142c {
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
      println(f"[p142c] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      println(s"-- round $r"); spark.catalog.clearCache(); System.gc()
      val d = Tables.documents(spark, dir)
      var queries: DataFrame = null
      t("queries ckpt") {
        queries = d.filter(col("doc_id") % TextOps.RetrQueryMod === 0)
          .select(col("doc_id"), col("text"))
          .orderBy(col("doc_id")).limit(TextOps.RetrQueryCap)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(slice(tokens(lower(col("text"))), 1, TextOps.RetrQueryLen))).as("term"))
          .localCheckpoint()
      }
      val qterms = queries.select(col("term")).distinct()
      var post: DataFrame = null
      t("post ckpt") {
        post = d.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
          .join(broadcast(qterms), Seq("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint()
      }
      val dfq = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      t("score (noop)")(noop(post
        .join(broadcast(dfq), Seq("term"))
        .join(broadcast(queries), Seq("term"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf") * expr(s"${TextOps.RetrIdfC} div df")).as("score"))))
      val wT = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      t("score wdf (noop)")(noop(post
        .withColumn("df", count(lit(1)).over(wT))
        .join(broadcast(queries), Seq("term"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf") * expr(s"${TextOps.RetrIdfC} div df")).as("score"))))
    }
    spark.stop()
  }
}
