package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, SimilarityOps, TextOps}

/** Driver-reference twins for the round-9 breadth wave 3: q138 (fixed-point
  * PageRank) and q139 (lexical retrieval). Each test recomputes
  * the operator sequentially on the driver from the raw sf0.001 tables and
  * requires exact equality — the same discipline as CorpusOpsSpec's BPE twin.
  */
class GraphRetrievalSpec extends SparkSpec {

  test("q138 pageRank: equals a sequential fixed-point power iteration; mass conserved") {
    val got = Analytics.pageRank(spark, sf001).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_fp"), r.getAs[String]("kind")))

    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edgesOneWay = Tables.lineitem(spark, sf001).select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (o(r.getLong(0)) * 2, r.getLong(1) * 2 + 1)).distinct
    val edges = edgesOneWay ++ edgesOneWay.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val nodes = edges.map(_._1).distinct
    val n = nodes.size.toLong
    val r0 = Analytics.PrScale / n
    val base = 15L * r0 / 100L
    var rank = nodes.map(nd => (nd, r0)).toMap
    for (_ <- 1 to Analytics.PrIters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst) => contrib(dst) += rank(src) / outdeg(src) }
      rank = nodes.map(nd => (nd, base + 85L * contrib(nd) / 100L)).toMap
    }

    assert(got.length == n)
    got.foreach { case (node, rf, kind) =>
      assert(rank(node) == rf, s"node $node")
      assert(kind == (if (node % 2 == 0) "customer" else "supplier"))
      assert(rf >= base)
    }
    val mass = got.map(_._2).sum
    assert(mass <= Analytics.PrScale, "truncating fixed-point ops never create mass")
    assert(mass >= (Analytics.PrScale * 8) / 10, "≥80% of the mass survives truncation")
    // emitted ordering: rank desc, node asc
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }

  test("q139 lexicalRetrieval: equals a sequential inverted-index scorer") {
    val got = TextOps.lexicalRetrieval(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq

    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def tok(t: String): Array[String] = t.toLowerCase.trim.split("\\s+")
    val tf = docs.flatMap { case (id, t) => tok(t).map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val queries = docs.filter(_._1 % TextOps.RetrQueryMod == 0)
      .sortBy(_._1).take(TextOps.RetrQueryCap)
      .map { case (id, t) => (id, tok(t).take(TextOps.RetrQueryLen).distinct.toSet) }
    val qterms = queries.flatMap(_._2).toSet
    val df = tf.keys.filter(k => qterms(k._2)).toSeq
      .groupBy(_._2).map { case (w, v) => (w, v.size.toLong) }
    val expected = queries.flatMap { case (qid, terms) =>
      val scores = docs.map(_._1).flatMap { d =>
        val s = terms.toSeq.flatMap(t => tf.get((d, t)).map(_ * (TextOps.RetrIdfC / df(t)))).sum
        if (s > 0) Some((d, s)) else None
      }
      scores.sortBy { case (d, s) => (-s, d) }.take(TextOps.RetrTopK).zipWithIndex
        .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }.sortBy(t => (t._1, t._2)).toSeq

    assert(got == expected)
    assert(got.nonEmpty, "the fixture has at least one query doc")
  }

  test("q142 hybridRetrieval: equals a driver-side RRF fusion of both retrievers") {
    val got = SimilarityOps.hybridRetrieval(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_score"),
                 r.getAs[Long]("rank_lex"), r.getAs[Long]("rank_dense"))).toSeq

    // lexical scorer, re-derived from raw text (the q139 twin's machinery)
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def tok(t: String): Array[String] = t.toLowerCase.trim.split("\\s+")
    val tf = docs.flatMap { case (id, t) => tok(t).map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val queries = docs.filter(_._1 % TextOps.RetrQueryMod == 0)
      .sortBy(_._1).take(TextOps.RetrQueryCap)
      .map { case (id, t) => (id, tok(t).take(TextOps.RetrQueryLen).distinct.toSet) }
    val qterms = queries.flatMap(_._2).toSet
    val dfm = tf.keys.filter(k => qterms(k._2)).toSeq
      .groupBy(_._2).map { case (w, v) => (w, v.size.toLong) }

    // dense scorer, re-derived from raw embeddings (sequential-fold dots)
    val emb = Tables.embeddings(spark, sf001).select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def pr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val norm = emb.map { case (id, v) => (id, math.sqrt(dot(v, v))) }

    val batch = queries.filter(q => emb.contains(q._1))
    val expected = batch.flatMap { case (qid, terms) =>
      val lex = docs.map(_._1).filter(_ != qid).flatMap { d =>
        val s = terms.toSeq.flatMap(t => tf.get((d, t)).map(_ * (TextOps.RetrIdfC / dfm(t)))).sum
        if (s > 0) Some((d, s)) else None
      }.sortBy { case (d, s) => (-s, d) }.take(SimilarityOps.HybridPoolK)
        .zipWithIndex.map { case ((d, _), i) => (d, (i + 1).toLong) }.toMap
      val den = emb.keys.filter(_ != qid).toSeq
        .map(d => (d, pr6(dot(emb(d), emb(qid)) / (norm(d) * norm(qid)))))
        .sortBy { case (d, c) => (-c, d) }.take(SimilarityOps.HybridPoolK)
        .zipWithIndex.map { case ((d, _), i) => (d, (i + 1).toLong) }.toMap
      val fusedDocs = (lex.keySet ++ den.keySet).toSeq
      fusedDocs.map { d =>
        val rl = lex.getOrElse(d, 0L)
        val rd = den.getOrElse(d, 0L)
        val rrf = (if (rl > 0) SimilarityOps.RrfScale / (SimilarityOps.RrfRankK + rl) else 0L) +
                  (if (rd > 0) SimilarityOps.RrfScale / (SimilarityOps.RrfRankK + rd) else 0L)
        (d, rrf, rl, rd)
      }.sortBy { case (d, rrf, _, _) => (-rrf, d) }.take(SimilarityOps.HybridTopK)
        .zipWithIndex.map { case ((d, rrf, rl, rd), i) =>
          (qid, (i + 1).toLong, d, rrf, rl, rd) }
    }.sortBy(t => (t._1, t._2)).toSeq

    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._5 > 0) && got.exists(_._6 > 0),
      "both retrievers contribute to the fused lists")
  }

  test("q142 rrfFuse: a doc present in BOTH lists sums both contributions") {
    // the harness fixture's embeddings are uncorrelated with its text, so
    // the end-to-end query never produces a dual-membership row — drive the
    // fusion stage directly on synthetic lists where it must fire
    import spark.implicits._
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "doc_id", "rank_lex")
    val den = Seq((1L, 10L, 2L), (1L, 12L, 1L))
      .toDF("query_id", "doc_id", "rank_dense")
    val got = SimilarityOps.rrfFuse(lex, den).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
                 r.getAs[Long]("rrf_score"), r.getAs[Long]("rank_lex"),
                 r.getAs[Long]("rank_dense"))).toSeq
    val c1 = SimilarityOps.RrfScale / (SimilarityOps.RrfRankK + 1)  // 16393442
    val c2 = SimilarityOps.RrfScale / (SimilarityOps.RrfRankK + 2)  // 16129032
    assert(got == Seq(
      (1L, 10L, c1 + c2, 1L, 2L),   // in both lists: contributions SUM
      (2L, 12L, c1, 0L, 1L),        // dense-only
      (3L, 11L, c2, 2L, 0L)))       // lexical-only
  }
}
