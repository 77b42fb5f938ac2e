package graft

import org.apache.spark.sql.functions._

/** Proves the q55 scale claim: with the vector corpus laid out PARTITIONED BY
  * IVF cell, a probe touches only its nprobe cells' files — static partition
  * pruning turns the ANN cell restriction into an I/O restriction (at 100 TB
  * a probe reads ~nprobe/K of the corpus from disk, not just from memory).
  */
class AnnPartitionSpec extends SparkSpec {

  test("probing an IVF-cell-partitioned corpus prunes to the probed cells") {
    import graft.functions.DotProduct
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cells").toString

    // assign every vector to its nearest-centroid cell (q55's coarse
    // quantizer: codebook = first IvfK corpus vectors) and lay the corpus
    // out partitioned by cell
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(DotProduct(col("v"), col("v"))))
    val cents = e.filter(col("vec_id") < graft.operators.SimilarityOps.IvfK)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("norm"), col("cent_id"),
        (DotProduct(col("v"), col("cv")) / (col("norm") * col("cn"))).as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cent_id").as("cell"))
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dir)

    val nCells = assigned.select("cell").distinct().count()
    assert(nCells > 2, "need multiple cells for pruning to mean anything")

    // probe two cells — the static filter must prune the scan to 2 partitions
    val probed = spark.read.parquet(dir).filter(col("cell").isin(3, 7))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"expected a cell partition filter in: $pf")

    // file-level proof: only the probed cells' directories are readable work
    val readCells = probed.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(readCells.subsetOf(Set(3, 7)))
    // and pruning did not lose rows vs the unpartitioned corpus
    val direct = assigned.filter(col("cell").isin(3, 7)).count()
    assert(probed.count() == direct)
  }

  test("centroid means are independent of partition count (scaled-integer sums)") {
    // the rounded mean must not depend on accumulation order: a 1-partition
    // (sequential) and a many-partition run must agree cell-for-cell —
    // a plain double avg() flips 4-dp roundings at boundaries
    def fingerprint(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s.conf.set("graft.fanout.enabled", (parts > 1).toString)
      graft.operators.SimilarityOps.labelCentroids(s, sf001).collect().toSeq
    }
    val one = fingerprint(1)
    val many = fingerprint(32)
    assert(one == many, "labelCentroids drifted with partition count")

    def kstep(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s.conf.set("graft.fanout.enabled", (parts > 1).toString)
      graft.operators.SimilarityOps.kmeansStep(s, sf001).collect().toSeq
    }
    assert(kstep(1) == kstep(32), "kmeansStep drifted with partition count")
  }

  test("PQ recall audit is partition-independent and its codes are exact argmins") {
    // q125's ranking keys are exact int64 (assignment distances, ADC dots),
    // so the recall table must be identical at any partitioning
    def pq(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s.conf.set("graft.fanout.enabled", (parts > 1).toString)
      graft.operators.SimilarityOps.pqRecall(s, sf001).collect().toSeq
    }
    val one = pq(1)
    assert(one == pq(32), "pqRecall drifted with partition count")
    // recall must be non-degenerate: PQ with PqCodes=64 centroids per subspace on
    // this corpus should recover a decent share of the float top-10
    val avg = one.map(_.getAs[Double]("recall")).sum / one.size
    assert(avg >= 0.3, s"suspiciously low PQ recall: $avg")
    assert(one.forall(r => r.getAs[Long]("n_overlap") >= 0L &&
      r.getAs[Long]("n_overlap") <= graft.operators.SimilarityOps.RecallK))
  }

  test("q144 IVF-PQ recall@10 clears the floor and is partition-independent") {
    import graft.operators.SimilarityOps
    // driver brute force: exact 6-dp cosine top-10 per query (identical
    // rounding and id tie-break to the operator's re-rank stage)
    val rows = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val norm = rows.map { case (id, v) => id -> math.sqrt(dotp(v, v)) }.toMap
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val exactTop = rows.filter(_._1 < 10).map { case (q, qv) =>
      q -> rows.filter(_._1 != q)
        .map { case (n, nv) => (pr6(dotp(qv, nv) / (norm(q) * norm(n))), n) }
        .sortBy { case (c, n) => (-c, n) }.take(SimilarityOps.RecallK)
        .map(_._2).toSet
    }.toMap
    val got = SimilarityOps.ivfPqAnn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == exactTop.keySet, "every query must emit results")
    byQ.foreach { case (_, g) => assert(g.length == SimilarityOps.RecallK) }
    val recalls = exactTop.map { case (q, ex) =>
      byQ(q).map(_._2).toSet.intersect(ex).size.toDouble / SimilarityOps.RecallK
    }
    val avg = recalls.sum / recalls.size
    // measured 0.73 at sf0.001 with nprobe=2/16 cells and 30-deep re-rank;
    // the floor is the accept/reject gate — an ADC or cell-assignment bug
    // craters recall long before it reaches 0.5
    assert(avg >= 0.5, s"IVF-PQ recall@10 below floor: $avg")
    // every ranking key is exact int64 or 6-dp-rounded, so the result is
    // identical at any partitioning
    def run(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s.conf.set("graft.fanout.enabled", (parts > 1).toString)
      SimilarityOps.ivfPqAnn(s, sf001).collect().toSeq
    }
    assert(run(1) == run(32), "ivfPqAnn drifted with partition count")
  }

  test("k-means training loop is partition-independent and conserves the corpus") {
    def train(parts: Int): Seq[org.apache.spark.sql.Row] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s.conf.set("graft.fanout.enabled", (parts > 1).toString)
      graft.operators.SimilarityOps.kmeansTrain(s, sf001).collect().toSeq
    }
    val one = train(1)
    assert(one == train(32), "kmeansTrain drifted with partition count")
    // shape: IvfK clusters × Dim dims, every cluster present even if empty
    import graft.operators.SimilarityOps.{Dim, IvfK}
    assert(one.size == IvfK * Dim)
    // each corpus vector is assigned to exactly one cluster in the final pass
    val nVecs = one.groupBy(_.getAs[Long]("cluster"))
      .map(_._2.head.getAs[Long]("n_vecs")).sum
    val corpus = Tables.embeddings(spark, sf001).count()
    assert(nVecs == corpus, s"final assignment covers $nVecs of $corpus vectors")
  }
}
