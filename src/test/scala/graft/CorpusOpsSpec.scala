package graft

import org.apache.spark.sql.functions._
import graft.operators.{SimilarityOps, TextOps}

/** Laws for the round-2 corpus operators: PII scrubbing, repetition stats,
  * stratified corpus mix, connected-component dedup clusters, and label
  * centroids.
  */
class CorpusOpsSpec extends SparkSpec {

  test("scrubPii masks every email/url/phone and counts one of each") {
    val rows = TextOps.scrubPii(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getAs[String]("scrubbed")
      assert(r.getAs[Long]("n_emails") == 1L)
      assert(r.getAs[Long]("n_urls") == 1L)
      assert(r.getAs[Long]("n_phones") == 1L)
      assert(scrubbed.contains("[EMAIL]") && scrubbed.contains("[URL]") && scrubbed.contains("[PHONE]"))
      assert(!scrubbed.matches(s".*${TextOps.EmailRe}.*"))
      assert(!scrubbed.matches(s".*${TextOps.UrlRe}.*"))
      assert(!scrubbed.matches(s".*${TextOps.PhoneRe}.*"))
    }
  }

  test("repetitionStats invariants: distinct ≤ total, top share in (0,1], flag matches") {
    val rows = TextOps.repetitionStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_bigrams")
      val dist  = r.getAs[Long]("n_distinct")
      val top   = r.getAs[Long]("top_count")
      val share = r.getAs[Double]("top_share")
      assert(dist <= total && top <= total && top >= 1)
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Boolean]("repetitive") == (top * 5 >= total))
    }
  }

  test("corpusMix takes at most 30 per language with contiguous ranks and non-increasing quality") {
    val rows = TextOps.corpusMix(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.length <= 30)
      assert(ranks.toSeq == (1L to ranks.length).toSeq, "ranks must be 1..k")
      val quals = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("quality"))
      assert(quals.zip(quals.tail).forall { case (a, b) => a >= b }, "quality non-increasing")
    }
  }

  test("dedupClusters equals a union-find over the simhash pair graph") {
    val pairs = TextOps.simhashPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TextOps.dedupClusters(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toMap

    // reference union-find on the driver
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = clusters.keys.map(d => d -> find(d)).toMap
    val expectedSizes = expected.values.groupBy(identity).view.mapValues(_.size.toLong).toMap

    assert(clusters.size == expected.size)
    clusters.foreach { case (doc, (cid, sz)) =>
      assert(cid == expected(doc), s"doc $doc cluster mismatch")
      assert(sz == expectedSizes(expected(doc)), s"doc $doc size mismatch")
    }
    // cluster_id is the minimum member of its cluster
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(cid == members.keys.min)
    }
  }

  test("labelCentroids: one row per (label, dim), centroid bounded by component range") {
    val e = graft.Tables.embeddings(spark, sf001)
    val nLabels = e.select("label").distinct().count()
    val rows = SimilarityOps.labelCentroids(spark, sf001).collect()
    assert(rows.length == nLabels * SimilarityOps.Dim)
    val counts = e.groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label").toLong -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == counts(r.getAs[Int]("label").toLong))
      assert(math.abs(r.getAs[Double]("centroid")) <= 1.0)
    }
  }
}
