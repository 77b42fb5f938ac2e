package graft

import org.apache.spark.sql.functions._

/** Proves dynamic partition pruning: with the fact table laid out
  * partitioned-by-year (the archive layout S9 models), a selective filter on
  * a joined dimension prunes fact partitions at RUNTIME — the scan reads
  * only the years the dimension's surviving rows can match, without the
  * filter ever mentioning the partition column.
  */
class PartitionPruningSpec extends SparkSpec {

  test("a dimension filter dynamically prunes fact partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val o = Tables.orders(spark, sf01)
      .withColumn("o_year", year(col("o_orderdate")))
    o.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    // a tiny year dimension, filtered to one year
    val years = o.select(col("o_year").as("d_year")).distinct()
      .withColumn("label", concat(lit("Y"), col("d_year")))
    val fact = spark.read.parquet(dir)
    val j = fact.join(years.filter(col("label") === "Y1995"),
        col("o_year") === col("d_year"))
      .agg(count(lit(1)).as("n"))
    val n = j.collect()(0).getAs[Long]("n")
    assert(n > 0, "expected 1995 orders")

    val plan = j.queryExecution.executedPlan.toString
    // match the prefix: the plan printer may truncate
    // "dynamicpruningexpression(...)" inside the PartitionFilters list
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n${plan.take(2000)}")

    // and the pruned scan must equal a direct single-year read
    val direct = spark.read.parquet(dir).filter(col("o_year") === 1995).count()
    assert(n == direct)
  }
}
