package graft
import org.apache.spark.sql.SparkSession
/** Scratch runner: dump selected queries for a local oracle check. */
object VerifyOne {
  def main(a: Array[String]): Unit = {
    val names = a(0).split(",")
    val sfDir = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    val out = if (a.length > 2) a(2) else "/tmp/vone"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional 4th arg: comma-separated k=v session confs (conf-gated forms)
    if (a.length > 3) a(3).split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    val sqls = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").parquet(s"$out/$n")
      SparkEntry.oracleSql.get(n).foreach(sqls += n -> _)
      println(s"[vone] $n dumped")
    }
    def esc(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
    val json = sqls.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
