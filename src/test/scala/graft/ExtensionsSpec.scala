package graft

import graft.plans.GraftExtensions
import graft.functions.H48

/** The SparkSessionExtensions seam: graft's native expressions reachable from
  * plain SQL text, value-identical to the Column API. */
class ExtensionsSpec extends SparkSpec {

  test("h48 is callable from SQL after install and matches the native value") {
    GraftExtensions.install(spark)
    val viaSql = spark.sql("SELECT h48('shingle one two') AS h").head().getLong(0)
    assert(viaSql == H48.hash("shingle one two".getBytes("UTF-8")))
  }

  test("dot_product is callable from SQL and folds left-to-right") {
    GraftExtensions.install(spark)
    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
  }

  test("SQL h48 agrees with the Column-API h48 over real data") {
    GraftExtensions.install(spark)
    Tables.documents(spark, sf001).createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql("SELECT doc_id, h48(text) AS h FROM docs_ext ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.PortableHash.h48(org.apache.spark.sql.functions.col("text")).as("h"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol))
  }

  test("minhash_sig and shingle_hashes are callable from SQL and match the Column API") {
    GraftExtensions.install(spark)
    Tables.documents(spark, sf001).createOrReplaceTempView("docs_ext2")
    val m31 = graft.functions.PortableHash.M31
    val viaSql = spark.sql(
      s"SELECT doc_id, minhash_sig(text, 3, ${m31}L, 8) AS sg, " +
      s"shingle_hashes(text, 3, ${m31}L) AS sh FROM docs_ext2 ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val viaCol = Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.MinHashSig(org.apache.spark.sql.functions.col("text"), 3, m31, 8).as("sg"),
        graft.functions.ShingleHashes(org.apache.spark.sql.functions.col("text"), 3, m31).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    assert(viaSql.sameElements(viaCol))
  }
}
