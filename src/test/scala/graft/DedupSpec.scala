package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dedup operator semantics on the planted near-duplicates. */
class DedupSpec extends SparkSpec {

  test("minhash-LSH pairs are exactly the exact-Jaccard pairs above 0.8") {
    // q35 computes exact J ≥ 0.5 via inverted index; q36 is LSH candidates
    // verified at J ≥ 0.8 — so q36 must equal q35 restricted to ≥ 0.8 iff
    // LSH recall is total (it is at these similarity levels: 16 bands of 4).
    val exact = TextOps.ngramJaccardPairs(spark, sf001)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.minhashLshPairs(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
    assert(lsh.nonEmpty, "test data plants near-duplicates")
  }

  test("exact dedup keeps the minimum doc_id per content hash") {
    val d = TextOps.dedupExact(spark, sf001).collect()
    assert(d.forall(_.getAs[Long]("n_copies") >= 1))
    val keepers = d.map(_.getAs[Long]("keeper_doc_id"))
    assert(keepers.distinct.length == keepers.length)
  }

  test("simhash pairs respect the hamming bound") {
    val p = TextOps.simhashPairs(spark, sf001).collect()
    assert(p.forall(_.getAs[Long]("hamming") <= 3))
    assert(p.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("jaccard pairs are symmetric-free and correctly bounded") {
    val p = TextOps.ngramJaccardPairs(spark, sf001).collect()
    assert(p.forall(r => r.getAs[Double]("jaccard") >= 0.5 && r.getAs[Double]("jaccard") <= 1.0))
    assert(p.forall(r => r.getAs[Long]("n_inter") <= r.getAs[Long]("n_union")))
  }
}
