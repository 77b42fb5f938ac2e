package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: sign-LSH band-bucket occupancy distribution at a given dir. */
object Prof41 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args(0) == "time") {
      // time q41 under conf overrides: time <dir> <bandBits> <maxBucket>
      val (dir, bits, cap) = (args(1), args(2), args(3))
      spark.conf.set("graft.lsh.bandBits", bits)
      spark.conf.set("graft.lsh.maxBucket", cap)
      operators.SimilarityOps.lshNearDupPairs(spark, dir).count()  // warm
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val n = operators.SimilarityOps.lshNearDupPairs(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof41] time $dir bits=$bits cap=$cap min=${times.map(_._1).min}%.2f s pairs=${times.head._2}")
      spark.stop(); return
    }
    args.foreach { dir =>
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val bandVals = graft.functions.SignSketch(col("v"), "bplane",
        operators.SimilarityOps.Bands, operators.SimilarityOps.BandBits,
        operators.SimilarityOps.Dim)
      val sizes = e.select(posexplode(bandVals).as(Seq("band_idx", "band_val")))
        .groupBy("band_idx", "band_val").count()
      val q = sizes.agg(max("count").as("max"),
        expr("percentile(count, array(0.5, 0.9, 0.99))").as("pct"),
        count(lit(1)).as("n_buckets"), sum("count").as("rows")).collect()(0)
      println(s"[prof41] $dir max=${q.get(0)} p50/90/99=${q.get(1)} buckets=${q.get(2)} rows=${q.get(3)}")
    }
    spark.stop()
  }
}
