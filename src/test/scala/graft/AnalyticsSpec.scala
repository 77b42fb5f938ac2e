package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Relational, SimilarityOps, TextOps}
import graft.multimodal.Multimodal

/** Laws for the round-3 profiling / behavioral / corpus-statistics operators. */
class AnalyticsSpec extends SparkSpec {

  test("statMoments: variance = stddev², |corr| ≤ 1, groups partition the table") {
    val rows = Analytics.statMoments(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = Tables.lineitem(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val sd = r.getAs[Double]("sd_qty"); val v = r.getAs[Double]("var_qty")
      assert(math.abs(sd * sd - v) < 1e-3, "var ≈ sd² (up to display rounding)")
      assert(math.abs(r.getAs[Double]("corr_qty_price")) <= 1.0)
    }
  }

  test("ntileDeciles: balanced buckets, ordered non-overlapping ranges") {
    val rows = Analytics.ntileDeciles(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      val byDec = rs.sortBy(_.getAs[Long]("decile"))
      assert(byDec.map(_.getAs[Long]("decile")).toSeq == (1L to byDec.length).toSeq)
      val ns = byDec.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, "ntile buckets differ by at most one row")
      byDec.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi_bal") <= b.getAs[Double]("lo_bal"), "decile ranges ordered")
        case _ =>
      }
      byDec.foreach(r => assert(r.getAs[Double]("lo_bal") <= r.getAs[Double]("hi_bal")))
    }
  }

  test("funnel: stage counts are monotone and rates consistent") {
    val r = Analytics.funnel(spark, sf001).collect().head
    val nu = r.getAs[Long]("n_users"); val nv = r.getAs[Long]("n_viewed")
    val nc = r.getAs[Long]("n_clicked_after_view"); val np = r.getAs[Long]("n_purchased_after_click")
    assert(nu >= nv && nv >= nc && nc >= np && np >= 0)
    assert(r.getAs[Double]("view_rate") <= 1.0 && r.getAs[Double]("click_through") <= 1.0
      && r.getAs[Double]("purchase_through") <= 1.0)
  }

  test("cohortRetention: offset-0 rows count every user exactly once") {
    val rows = Analytics.cohortRetention(spark, sf001).collect()
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0))
    val atZero = rows.filter(_.getAs[Long]("week_offset") == 0L).map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sf001).select(col("user_id")).distinct().count()
    assert(atZero == users, "every user appears in its own cohort week")
    rows.groupBy(_.getAs[java.time.LocalDateTime]("cohort_week")).foreach { case (_, rs) =>
      val zero = rs.find(_.getAs[Long]("week_offset") == 0L).get.getAs[Long]("n_users")
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= zero, "retention never exceeds cohort size"))
    }
  }

  test("orderStreaks: streak accounting matches a driver-side recomputation") {
    val rows = Analytics.orderStreaks(spark, sf001).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ((r.getAs[Long]("n_streaks"), r.getAs[Long]("n_active_months"), r.getAs[Long]("max_streak"))))
      .toMap
    val months = Tables.orders(spark, sf001)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("mo"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toList).toMap
    assert(rows.keySet == months.keySet)
    months.foreach { case (ck, mos) =>
      val streaks = scala.collection.mutable.ListBuffer.empty[Long]
      var prev = Long.MinValue
      mos.foreach { m =>
        if (m == prev + 1) streaks(streaks.length - 1) += 1 else streaks += 1L
        prev = m
      }
      val (nStreaks, nMonths, maxStreak) = rows(ck)
      assert(nMonths == mos.length, s"cust $ck month count")
      assert(maxStreak == streaks.max, s"cust $ck max streak")
      assert(nStreaks == streaks.length, s"cust $ck streak count")
    }
  }

  test("tfidfTerms: contiguous ranks, df ≤ corpus size, non-negative scores") {
    val nDocs = Tables.documents(spark, sf001).count()
    val rows = TextOps.tfidfTerms(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") >= 1 && r.getAs[Long]("df") >= 1 && r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[Double]("tfidf") >= 0.0)
    }
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 3)
    }
  }

  test("vocabGrowth: types ≤ tokens, hapax ≤ types, ratios in (0,1]") {
    val rows = TextOps.vocabGrowth(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Double]("type_token_ratio") > 0 && r.getAs[Double]("type_token_ratio") <= 1.0)
      assert(r.getAs[Double]("hapax_share") >= 0 && r.getAs[Double]("hapax_share") <= 1.0)
    }
  }

  test("collocations: bigram counts bounded by unigram counts, ranks contiguous") {
    val rows = TextOps.collocations(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cxy = r.getAs[Long]("c_xy")
      assert(cxy >= 3)
      assert(r.getAs[Long]("c_x") >= cxy && r.getAs[Long]("c_y") >= cxy)
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 15)
    }
  }

  test("chunkDedup matches a driver-side md5 recomputation") {
    val expected = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0); val t = r.getString(1)
        t.grouped(Multimodal.ChunkSize).map(c => (md5Hex(c), id))
      }
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).distinct.length.toLong, v.map(_._2).min))
      .filter(_._2._1 > 1)
      .map { case (m, (copies, docs, keeper)) => (m.take(12), copies, docs, keeper) }
      .toSet
    val got = Multimodal.chunkDedup(spark, sf001).collect()
      .map(r => (r.getAs[String]("md5_12"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("keeper_doc_id"))).toSet
    assert(got == expected)
  }

  test("chunkDedup emits no phantom chunks for empty payloads") {
    // sequence(0, -1) counts DOWN in Spark — an unguarded generator turns an
    // empty payload into two phantom md5("") chunk rows.
    import spark.implicits._
    val d = Seq((1L, ""), (2L, ""), (3L, "shared chunk"), (4L, "shared chunk"))
      .toDF("doc_id", "text")
    val got = Multimodal.chunkDedupOf(d).collect()
    assert(got.length == 1, "only the genuinely shared chunk survives")
    assert(got.head.getAs[String]("md5_12") == md5Hex("shared chunk").take(12))
    assert(got.head.getAs[Long]("n_copies") == 2L)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("quantizedRecall: one row per query, recall = overlap/k in [0,1]") {
    val rows = SimilarityOps.quantizedRecall(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= SimilarityOps.RecallK)
      assert(math.abs(r.getAs[Double]("recall") - ov.toDouble / SimilarityOps.RecallK) < 1e-9)
    }
    // int8 over 64 dims should not destroy the ranking on this corpus
    assert(rows.map(_.getAs[Long]("n_overlap")).sum >= 5 * rows.length,
      "mean quantized recall ≥ 0.5")
  }

  test("uniformSampleK: exactly k rows, contiguous ranks, hash-stable membership") {
    val rows = TextOps.uniformSampleK(spark, sf001).collect()
    val total = Tables.documents(spark, sf001).count()
    assert(rows.length == math.min(TextOps.UniformSampleK, total.toInt))
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    // membership is a pure function of content: re-running yields the set
    val again = TextOps.uniformSampleK(spark, sf001).collect().map(_.getAs[Long]("doc_id"))
    assert(rows.map(_.getAs[Long]("doc_id")).sameElements(again))
  }

  test("stratifiedSample: sampled ⊆ total and consistent percentages") {
    val rows = TextOps.stratifiedSample(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_total"); val s = r.getAs[Long]("n_sampled")
      assert(s >= 0 && s <= n)
      assert(math.abs(r.getAs[Double]("actual_pct")
        - math.floor(s * 100.0 / n * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("skewProfile: ranked non-increasing counts with cumulative share ≤ 1") {
    val rows = Analytics.skewProfile(spark, sf001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val ns = rows.map(_.getAs[Long]("n_orders"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1.0 + 1e-9)
  }

  test("lmQuality: rare-token docs score higher than common-token docs") {
    val rows = TextOps.lmQuality(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(nll > 0.0, "cross-entropy positive")
      assert(r.getAs[Boolean]("high_perplexity") == (nll > 7.0))
      assert(math.abs(r.getAs[Double]("ppl_proxy") - math.floor(math.exp(nll) * 100 + 0.5) / 100) < 1e-6
        || r.getAs[Double]("ppl_proxy") > 0)
    }
  }

  test("centroidSimilarity: symmetric bounds and consistent distance") {
    val rows = SimilarityOps.centroidSimilarity(spark, sf001).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf001).select("label").distinct().count()
    assert(rows.length == labels * (labels - 1) / 2, "one row per unordered label pair")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9)
      assert(r.getAs[Double]("euclid") >= 0.0)
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
    }
  }

  test("activityReconcile: statuses partition the key space correctly") {
    val rows = Analytics.activityReconcile(spark, sf001).collect()
    val orderKeys = Tables.orders(spark, sf001).select("o_custkey").distinct().count()
    val eventKeys = Tables.events(spark, sf001).select("user_id").distinct().count()
    rows.foreach { r =>
      val o = r.getAs[Long]("n_orders"); val e = r.getAs[Long]("n_events")
      r.getAs[String]("status") match {
        case "both"        => assert(o > 0 && e > 0)
        case "orders_only" => assert(o > 0 && e == 0)
        case "events_only" => assert(o == 0 && e > 0)
      }
    }
    assert(rows.count(r => r.getAs[Long]("n_orders") > 0) == orderKeys)
    assert(rows.count(r => r.getAs[Long]("n_events") > 0) == eventKeys)
  }

  test("multisetOps: bag algebra against driver-side multiplicity math") {
    val l = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_returnflag").collect()
    val rC = l.filter(_.getString(1) == "R").groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val aC = l.filter(_.getString(1) == "A").groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val interRows = rC.map { case (k, c) => math.min(c, aC.getOrElse(k, 0)) }.sum
    val interKeys = rC.count { case (k, c) => math.min(c, aC.getOrElse(k, 0)) > 0 }
    val exceptRows = rC.map { case (k, c) => math.max(0, c - aC.getOrElse(k, 0)) }.sum
    val exceptKeys = rC.count { case (k, c) => c - aC.getOrElse(k, 0) > 0 }
    val got = Analytics.multisetOps(spark, sf001).collect()
      .map(r => r.getAs[String]("tag") -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys")))).toMap
    assert(got("intersect_all") == ((interRows.toLong, interKeys.toLong)))
    assert(got("except_all") == ((exceptRows.toLong, exceptKeys.toLong)))
  }

  test("xpathExtract pulls the labelled cells out of real markup") {
    val rows = graft.sources.ParcelLookup.xpathExtract(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ck = r.getAs[Long]("c_custkey")
      assert(r.getAs[String]("parcel_id") == s"P-${ck * 7 % 100000}")
      assert(r.getAs[String]("owner").startsWith("Customer#"))
      assert(r.getAs[Long]("acreage") == ck % 50 + 1)
      assert(r.getAs[Long]("n_fields") == 3L)
    }
  }

  test("csvParse: malformed balance takes the null channel, rest round-trip") {
    val rows = Relational.csvParse(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ck = r.getAs[Long]("c_custkey")
      assert(r.getAs[Boolean]("bal_ok") == (ck % 13 != 0))
      if (ck % 13 == 0) assert(r.isNullAt(r.fieldIndex("parsed_bal")))
      assert(r.getAs[String]("parsed_name").startsWith("Customer#"))
    }
  }

  test("corpusPipeline accounting equals a composition of its verified stages") {
    val quality = TextOps.qualityScore(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val exactVictims = docs.groupBy(t => md5Hex(t._2)).values
      .flatMap(g => g.map(_._1).sorted.drop(1)).toSet
    val nearVictims = TextOps.minhashLshPairs(spark, sf001)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val expected = docs
      .filter(t => quality(t._1) > 0.0)
      .filterNot(t => exactVictims(t._1))
      .filterNot(t => nearVictims(t._1))
      .map { case (id, text, lang, nChars) =>
        val b = graft.functions.H48.hash(text.getBytes("UTF-8")) % 100
        val split = if (b < 80) "train" else if (b < 90) "val" else "test"
        (lang, split, nChars, quality(id))
      }
      .groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
    val got = TextOps.corpusPipeline(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("split")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars")))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("peakHour matches a driver-side recomputation") {
    val rows = Analytics.peakHour(spark, sf001).collect()
    val hourly = Tables.events(spark, sf001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.time.LocalDateTime]("h"), r.getAs[Long]("n")))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val mine = hourly.filter(_._1 == et)
      val best = mine.minBy { case (_, h, n) => (-n, h) }
      assert(r.getAs[Long]("n_total") == mine.map(_._3).sum)
      assert(r.getAs[java.time.LocalDateTime]("peak_hour") == best._2)
      assert(r.getAs[Long]("peak_n") == best._3)
    }
  }

  test("rateAnomalies: z recomputes from trailing history; flag matches |z| > 3") {
    val rows = Analytics.rateAnomalies(spark, sf001).collect()
    assert(rows.nonEmpty)
    // recompute one partition's stats driver-side from the raw hourly counts
    val hourly = Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"),
                 String.valueOf(r.getAs[Any]("h")), r.getAs[Long]("n")))
    val byType = hourly.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    rows.foreach { r =>
      val flag = r.getAs[Boolean]("anomaly")
      if (r.isNullAt(r.fieldIndex("z"))) assert(!flag)
      else assert(flag == (math.abs(r.getAs[Double]("z")) > 3.0))
    }
    // every row has >= AnomalyMinHistory trailing hours by construction
    val perType = rows.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length)
    perType.foreach { case (et, k) =>
      assert(k <= math.max(0, byType(et).length - Analytics.AnomalyMinHistory))
    }
  }

  test("countMinAudit: estimates never undercount and cover the exact top-20") {
    val rows = Analytics.countMinAudit(spark, sf001).collect()
    val nUsers = Tables.events(spark, sf001).select("user_id").distinct().count()
    val expectK = math.min(Analytics.CmTopK.toLong, nUsers)
    assert(rows.length == expectK)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact_n"),
        "count-min must never underestimate")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact_n"))
    }
    assert(rows.map(_.getAs[Long]("hh_rank")).toSeq == (1L to expectK))
    // the exact side really is the global top-K
    val exact = Tables.events(spark, sf001).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n")))
      .sortBy { case (u, n) => (-n, u) }.take(expectK.toInt).toMap
    rows.foreach { r =>
      assert(exact(r.getAs[Long]("user_id")) == r.getAs[Long]("exact_n"))
    }
  }

  test("histogramQuantiles: estimate bucket always contains the exact rank value") {
    val rows = Relational.histogramQuantiles(spark, sf001).collect()
    assert(rows.map(_.getAs[Double]("q")).toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { r =>
      // by construction cum(b-1) < k <= cum(b), so the rank-k value falls in
      // the estimated bucket — the within_bucket audit must always hold
      assert(r.getAs[Boolean]("within_bucket"),
        s"q=${r.getAs[Double]("q")}: exact value escaped the estimated bucket")
      assert(r.getAs[Double]("est_p") <= r.getAs[Double]("exact_p"))
    }
    val n = Tables.lineitem(spark, sf001).count()
    rows.foreach(r => assert(r.getAs[Long]("n") == n))
  }

  test("sketchRollup: merging daily KMV sketches equals sketching each full window") {
    val K = graft.functions.KmvSketch.K
    val domain = graft.functions.KmvSketch.Domain
    val rows = Analytics.sketchRollup(spark, sf001).collect()
    assert(rows.nonEmpty)
    // driver ground truth: per-day distinct user-hash sets straight off the
    // events table
    val ev = Tables.events(spark, sf001)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        graft.functions.PortableHash.h48(col("user_id").cast("string")).as("uh"),
        col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val r = Analytics.RollupDays
    rows.foreach { row =>
      val winEnd = row.getAs[Long]("win_end")
      // the mergeability identity: k-min over the union of per-day k-mins
      // == k-min over the union of the FULL daily sets (what one giant
      // sketch of the window would hold)
      val dailyKmins = (winEnd - (r - 1) to winEnd)
        .flatMap(d => byDay.getOrElse(d, Set.empty).toSeq.sorted.take(K)).toSet
      val fullUnion = (winEnd - (r - 1) to winEnd)
        .flatMap(d => byDay.getOrElse(d, Set.empty)).toSet
      def estOf(s: Set[Long]): Long = {
        val mins = s.toSeq.sorted.take(K)
        if (mins.size < K) mins.size.toLong else (K - 1).toLong * domain / mins.last
      }
      assert(estOf(dailyKmins) == estOf(fullUnion), s"win_end=$winEnd merge identity")
      assert(row.getAs[Long]("est_distinct") == estOf(fullUnion), s"win_end=$winEnd estimate")
      // exact audit is the true distinct-user count
      val exactUsers = ev.filter(e => e._1 >= winEnd - (r - 1) && e._1 <= winEnd)
        .map(_._3).toSet.size.toLong
      assert(row.getAs[Long]("exact_distinct") == exactUsers)
    }
    // every full window in range is present, exactly once
    val days = byDay.keySet
    val expectedWins = (days.min + (r - 1) to days.max)
    assert(rows.map(_.getAs[Long]("win_end")).toSeq == expectedWins.toSeq)
  }

  test("sourceOverlapKmv equals a driver twin of the full KMV set algebra") {
    val K = graft.functions.KmvSketch.K
    val domain = graft.functions.KmvSketch.Domain
    // driver ground truth: per-source distinct 3-gram hash sets, same
    // tokenize → shingle → h48 derivation
    val docs = Tables.documents(spark, sf001).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingleHashes(t: String): Set[Long] = {
      val toks = t.toLowerCase.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(w =>
        graft.functions.H48.hash(w.mkString(" ").getBytes("UTF-8"))).toSet
    }
    val bySource: Map[String, Set[Long]] = docs.groupBy(_._1).view
      .mapValues(_.map(t => shingleHashes(t._2)).reduce(_ ++ _)).toMap
    def kmins(s: Set[Long]): Seq[Long] = s.toSeq.sorted.take(K)
    val expected = (for {
      (sa, a) <- bySource.toSeq; (sb, b) <- bySource.toSeq if sa < sb
    } yield {
      val mg = (kmins(a).toSet ++ kmins(b).toSet).toSeq.sorted
      val keff = math.min(mg.size, K).toLong
      val mk = mg.take(K)
      val kOverlap = mk.count(v => kmins(a).contains(v) && kmins(b).contains(v)).toLong
      val estUnion = if (mg.size < K) mg.size.toLong else (K - 1).toLong * domain / mg(K - 1)
      val estInter = kOverlap * estUnion / keff
      val xInter = (a & b).size.toLong
      val xUnion = (a ++ b).size.toLong
      def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (sa, sb, kOverlap, estUnion, estInter, xUnion, xInter,
        p6(kOverlap * 1.0 / keff), p6(xInter * 1.0 / xUnion))
    }).sortBy(t => (t._1, t._2))
    spark.conf.set("graft.overlap.exactAudit", "true")
    val got =
      try Analytics.sourceOverlapKmv(spark, sf001).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)))
        .toSeq
      finally spark.conf.unset("graft.overlap.exactAudit")
    assert(got == expected, s"first diff: ${got.zip(expected).find(x => x._1 != x._2)}")
    // the DEFAULT (no-audit) form sketches the raw token stream instead of
    // the materialized distinct set — KMV insert has distinct-set
    // semantics, so its estimator columns must be BIT-IDENTICAL
    val ship = Analytics.sourceOverlapKmv(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(ship == got.map(t => (t._1, t._2, t._3, t._4, t._5, t._8)),
      "default estimator diverged from the audit form's estimator columns")
    // the fixture must exercise the ESTIMATOR branch (union > K), not just
    // the degenerate exact branch — otherwise this law proves nothing about
    // the kth-min arithmetic
    assert(expected.exists(_._6 > K), "fixture unions too small to estimate")
    assert(expected.exists(_._7 > 0), "fixture should have real cross-source overlap")
  }

  test("q140 holtForecast: equals a sequential fixed-point Holt recurrence") {
    val S = Analytics.HoltScale
    val got = Analytics.holtForecast(spark, sf001).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_obs"),
       r.getAs[Long]("level_fp"), r.getAs[Long]("trend_fp"),
       r.getAs[Long]("forecast_1_fp"), r.getAs[Long]("forecast_7_fp"))
    }.toSeq

    val raw = Tables.events(spark, sf001)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = raw.groupBy(_._1).toSeq.map { case (et, evs) =>
      val ys = evs.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.size.toLong)
      (et, ys)
    }.filter(_._2.size >= 2).map { case (et, ys) =>
      var l = ys.head * S
      var t = (ys(1) - ys.head) * S
      ys.drop(2).foreach { y =>
        val lNew = (2 * y * S + 8 * (l + t)) / 10 // JVM long div = truncation,
        val tNew = (lNew - l + 9 * t) / 10        // same as DuckDB `//`
        l = lNew; t = tNew
      }
      (et, ys.size.toLong, l, t, l + t, l + 7 * t)
    }.sortBy(_._1)

    assert(got == expected)
    assert(got.nonEmpty, "the fixture has multi-day event series")
    // forecast columns are pure affine reads of the final state
    got.foreach { case (_, _, l, t, f1, f7) =>
      assert(f1 == l + t); assert(f7 == l + 7 * t)
    }
  }

  test("q141 tableProfile: equals a sequential per-column profile") {
    val got = Analytics.tableProfile(spark, sf001).collect().map { r =>
      (r.getAs[String]("column_name"), r.getAs[Long]("n_rows"),
       r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
       Option(r.getAs[java.lang.Double]("min_num")).map(_.toDouble),
       Option(r.getAs[java.lang.Double]("max_num")).map(_.toDouble),
       Option(r.getAs[String]("min_str")), Option(r.getAs[String]("max_str")))
    }.toSeq

    val cols = Analytics.ProfileCols.map(_._1)
    val rows = Tables.lineitem(spark, sf001)
      .select(cols.map(col): _*).collect()
    val n = rows.length.toLong
    val expected = Analytics.ProfileCols.map { case (c, kind) =>
      val idx = cols.indexOf(c)
      val vs = rows.map(_.get(idx)).filter(_ != null)
      val nNull = n - vs.length
      val nd = vs.distinct.length.toLong
      kind match {
        case "num" =>
          val ds = vs.map {
            case l: java.lang.Long => l.toDouble
            case d: java.lang.Double => d.toDouble
            case i: java.lang.Integer => i.toDouble
          }
          (c, n, nNull, nd, Some(ds.min), Some(ds.max), None, None)
        case _ =>
          // render temporals the way Spark's string cast does (JDBC style,
          // "1995-01-02 00:00:00"), not LocalDateTime's ISO "T" form
          val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
          val ss = vs.map {
            case t: java.time.LocalDateTime => t.format(fmt)
            case v => v.toString
          }
          (c, n, nNull, nd, None, None, Some(ss.min), Some(ss.max))
      }
    }.sortBy(_._1)
    assert(got == expected)
    assert(got.map(_._1) == cols.sorted)
  }

  test("q146 embedding drift equals a driver PSI/TV twin; planted shift trips the verdict") {
    import graft.operators.SimilarityOps
    import SimilarityOps.{DriftBins, DriftBinWidth, DriftPsiThreshold}
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // driver twin over any (slice -> vectors) split, folding bin terms in
    // bin order exactly like the operator
    def twin(slices: Map[String, Seq[Array[Double]]]): Seq[(Long, Long, Long, Double, Double, Boolean)] = {
      val ref = slices("ref"); val cand = slices("cand")
      def bin(x: Double): Int =
        math.min(math.max(math.floor((x + 1.0) / DriftBinWidth), 0.0), (DriftBins - 1).toDouble).toInt
      (0 until SimilarityOps.Dim).map { d =>
        val ca = Array.fill(DriftBins)(0L); val cb = Array.fill(DriftBins)(0L)
        ref.foreach(v => ca(bin(v(d))) += 1)
        cand.foreach(v => cb(bin(v(d))) += 1)
        val nA = ref.size.toLong; val nB = cand.size.toLong
        var psi = 0.0; var tvNum = 0L
        for (b <- 0 until DriftBins) {
          val pa = (ca(b) + 1.0) / (nA + DriftBins)
          val pb = (cb(b) + 1.0) / (nB + DriftBins)
          psi += (pa - pb) * math.log(pa / pb)
          tvNum += math.abs(ca(b) * nB - cb(b) * nA)
        }
        (d.toLong, nA, nB, p6(psi), p6(tvNum * 1.0 / (nA * nB * 2.0)), p6(psi) >= DriftPsiThreshold)
      }
    }
    // law 1: the shipped query equals the twin on the real corpus split
    val rows = Tables.embeddings(spark, sf001)
      .select(col("label").cast("long"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val corpus = Map(
      "ref" -> rows.filter(_._1 % 2 == 0).map(_._2).toSeq,
      "cand" -> rows.filter(_._1 % 2 != 0).map(_._2).toSeq)
    val got = SimilarityOps.embeddingDrift(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == twin(corpus), "drift table must equal the driver twin")
    // law 2: a planted mean shift on dims 0-3 must trip drifted=true there
    // and ONLY there (unshifted dims share one distribution)
    import spark.implicits._
    val base = (0 until 400).map { i =>
      Array.tabulate(SimilarityOps.Dim)(d => ((i * 31 + d * 7) % 16) / 16.0 * 0.4 - 0.2)
    }
    val shifted = base.map { v =>
      val w = v.clone(); for (d <- 0 until 4) w(d) = w(d) + 0.6; w
    }
    val planted = Map("ref" -> base, "cand" -> shifted.toSeq)
    val df = (base.map(("ref", _)) ++ shifted.map(("cand", _))).toDF("slice", "v")
    val gotP = SimilarityOps.embeddingDriftOf(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(gotP == twin(planted), "planted-shift drift table must equal the twin")
    val flagged = gotP.filter(_._6).map(_._1).toSet
    assert(flagged == Set(0L, 1L, 2L, 3L),
      s"exactly the shifted dims must trip the PSI threshold: $flagged")
  }

  test("q152 maintenance: incremental == rebuild (zero mismatch), accounting ties out, " +
       "proof-on == proof-off on the shared columns, " +
       "and a widespread planted shift flips the verdict to retrain") {
    import graft.operators.{SimilarityOps, TextOps}
    // proof form (graft.ann.verifyRebuild): carries the rebuild twin and
    // its n_mismatch column — the form Verify ships to the oracle
    spark.conf.set("graft.ann.verifyRebuild", "true")
    val rows =
      try SimilarityOps.indexMaintenance(spark, sf001).collect()
      finally spark.conf.unset("graft.ann.verifyRebuild")
    assert(rows.length == SimilarityOps.IvfK, s"one row per cell: ${rows.length}")
    // the maintenance invariant: incremental assignment == batch rebuild
    rows.foreach(r => assert(r.getAs[Long]("n_mismatch") == 0L))
    // conf-gate equivalence law: the default (bench) form is the proof
    // form minus the n_mismatch column — bit-identical shared columns
    val defRows = SimilarityOps.indexMaintenance(spark, sf001).collect()
    val shared = Seq("cluster", "n_existing", "n_new", "n_drifted_dims",
      "retrain", "action")
    assert(defRows.map(r => shared.map(r.getAs[Any])).toSeq ==
           rows.map(r => shared.map(r.getAs[Any])).toSeq,
      "proof-off must equal proof-on on the shared columns")
    assert(!defRows.head.schema.fieldNames.contains("n_mismatch"))
    // the action is exactly the gate applied to the measured drift count
    val nd = rows.head.getAs[Long]("n_drifted_dims")
    val expected =
      if (nd >= SimilarityOps.RetrainMinDriftedDims) "retrain" else "assign_incremental"
    rows.foreach(r => assert(r.getAs[String]("action") == expected))
    // accounting: n_new sums to q111's admitted count; n_existing to the
    // pre-batch corpus slice
    val admitted = TextOps.incrementalDedup(spark, sf001)
      .filter(col("verdict") === "new").count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == admitted)
    val corpusN = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") % 5 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_existing")).sum == corpusN)
    // drift-triggered path: same corpus, but the incoming batch's vectors
    // shifted on half the dimensions — widespread real drift, so the gate
    // must fire, while the incremental==rebuild equality (which is a
    // property of the ASSIGNMENT, not the data) still holds
    val dir = java.nio.file.Files.createTempDirectory("graft_q152").toString
    spark.read.parquet(s"$sf001/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf001)
      .withColumn("embedding",
        when(col("vec_id") % 5 === 0,
          transform(col("embedding"), (x, i) =>
            when(i < SimilarityOps.Dim / 2, x + lit(0.6f)).otherwise(x)))
          .otherwise(col("embedding")))
      .write.parquet(s"$dir/embeddings.parquet")
    spark.conf.set("graft.ann.verifyRebuild", "true")
    val drifted =
      try SimilarityOps.indexMaintenance(spark, dir).collect()
      finally spark.conf.unset("graft.ann.verifyRebuild")
    assert(drifted.head.getAs[Long]("n_drifted_dims") >= SimilarityOps.RetrainMinDriftedDims,
      s"planted widespread shift not detected: ${drifted.head.getAs[Long]("n_drifted_dims")}")
    drifted.foreach(r => assert(r.getAs[String]("action") == "retrain"))
    drifted.foreach(r => assert(r.getAs[Long]("n_mismatch") == 0L))
  }
}
