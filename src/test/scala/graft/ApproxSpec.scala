package graft

import graft.operators.Relational

/** Error bounds for the approximate operators (declared rows-only in the
  * oracle contract because the sketches are engine-specific): the approximate
  * answer must track the exact one closely enough to stand in for it at
  * scale.
  */
class ApproxSpec extends SparkSpec {

  test("approx percentiles track exact percentiles within 1%") {
    val exact = Relational.percentiles(spark, sf01).collect()
      .map(r => r.getAs[String]("l_returnflag") -> (r.getAs[Double]("p50"), r.getAs[Double]("p90")))
      .toMap
    val approx = Relational.approxPercentiles(spark, sf01).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (p50, p90) = exact(r.getAs[String]("l_returnflag"))
      val a50 = r.getAs[Double]("ap50")
      val a90 = r.getAs[Double]("ap90")
      assert(math.abs(a50 - p50) / p50 < 0.01, s"p50 off: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"p90 off: $a90 vs $p90")
    }
  }

  test("HLL distinct counts track exact distinct counts within 5%") {
    val exact = Relational.distinctCounts(spark, sf01).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts")).toMap
    val approx = Relational.approxDistinct(spark, sf01).collect()
    approx.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag")).toDouble
      val a = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(a - e) / e < 0.05, s"HLL off: $a vs $e")
    }
  }
}
