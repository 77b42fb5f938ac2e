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
    val approx = Relational.approxPercentilesRaw(spark, sf01).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (p50, p90) = exact(r.getAs[String]("l_returnflag"))
      val a50 = r.getAs[Double]("ap50")
      val a90 = r.getAs[Double]("ap90")
      assert(math.abs(a50 - p50) / p50 < 0.01, s"p50 off: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"p90 off: $a90 vs $p90")
    }
    // and the oracle-facing audit bit must hold at this SF too
    val audited = Relational.approxPercentiles(spark, sf01).collect()
    assert(audited.forall(_.getAs[Boolean]("within_1pct")))
  }

  test("KMV sketch estimates track exact distinct within 35% and are partitioning-invariant") {
    val rows = Relational.kmvDistinct(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("kmv_est").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - exact) / exact < 0.35, s"KMV off: $est vs $exact")
    }
    // determinism under a different physical partitioning: K-smallest-distinct
    // is merge-order independent, so the estimate must be bit-identical
    import org.apache.spark.sql.functions.{col, udaf}
    import graft.functions.{KmvSketch, PortableHash}
    val li = Tables.lineitem(spark, sf01)
      .repartition(3, col("l_orderkey"))   // different layout than the query's scan
      .select(col("l_returnflag"), PortableHash.h48(col("l_partkey").cast("string")).as("hv"))
    val kmv = udaf(KmvSketch)
    val again = li.groupBy(col("l_returnflag"))
      .agg(kmv(col("hv")).as("kmv_est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kmv_est")).toMap
    rows.foreach { r =>
      assert(again(r.getAs[String]("l_returnflag")) == r.getAs[Long]("kmv_est"))
    }
  }

  test("HLL distinct counts track exact distinct counts within 5%") {
    val exact = Relational.distinctCounts(spark, sf01).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts")).toMap
    val approx = Relational.approxDistinctRaw(spark, sf01).collect()
    approx.foreach { r =>
      val e = exact(r.getAs[String]("l_returnflag")).toDouble
      val a = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(a - e) / e < 0.05, s"HLL off: $a vs $e")
    }
    // and the oracle-facing audit bit must hold at this SF too
    val audited = Relational.approxDistinct(spark, sf01).collect()
    assert(audited.forall(_.getAs[Boolean]("within_5pct")))
  }

  test("q122 recursive refinement (tiny task budget) equals the single-level path") {
    // a 10-row task budget forces MULTIPLE sub-histogram levels at sf0.01
    // (~60k rows → level-1 buckets ≫ 10), exercising the deep path the
    // production threshold only reaches at 100 TB; results must be
    // bit-identical to the effectively-single-level default
    val deep = Relational.histogramQuantilesImpl(spark, sf01, 10L).collect()
    val wide = Relational.histogramQuantilesImpl(spark, sf01, Relational.RefineTaskRows).collect()
    assert(deep.toSeq == wide.toSeq)
    // sanity: the audit bit itself — exact value lands in the estimated
    // bucket for this distribution
    assert(deep.forall(_.getAs[Boolean]("within_bucket")))
  }

  test("q122 refinement terminates when one exact value outweighs the task budget") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 50k copies of ONE double (plus a thin tail so the extent is
    // non-degenerate): value-range bucketing can never split the mass, the
    // exact class of input that made the pre-guard loop spin forever once
    // the sub-bucket width underflowed. The guard must re-anchor, detect
    // the single-value chain, and resolve every quantile to that value.
    val heavy = (1L to 50000L).map(i => (1234.5678, i, 1))
    // tail large enough that rank ceil(0.99·n) = 54549 falls inside it
    val tail = (50001L to 55100L).map(i => (9999.0 + i, i, 1))
    val li = (heavy ++ tail).toDF("x", "l_orderkey", "l_linenumber")
      .withColumn("l_linenumber", col("l_linenumber").cast("int"))
    val out = Relational.histogramQuantilesOf(spark, li, taskRows = 1000L).collect()
    assert(out.length == 3)
    // ranks 0.5 and 0.9 fall inside the heavy mass; 0.99 in the tail
    assert(out.filter(r => r.getDouble(0) <= 0.9)
      .forall(_.getAs[Double]("exact_p") == 1234.5678))
    assert(out.find(_.getDouble(0) == 0.99).get.getAs[Double]("exact_p") > 9999.0)
  }
}
