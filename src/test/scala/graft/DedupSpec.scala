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

  test("capped minhash equals a driver-side exact Jaccard over the capped shingle sets") {
    val cap = TextOps.MaxShingleDf
    val docs = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingleSet(t: String): Set[Long] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(w =>
        graft.functions.H48.hash(w.mkString(" ").getBytes("UTF-8")) % graft.functions.PortableHash.M31
      ).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sets.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val capped = sets.view.mapValues(_.filter(h => df(h) <= cap)).toMap
    val expected = (for {
      (a, sa) <- capped.toSeq; (b, sb) <- capped.toSeq if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size; union = sa.size + sb.size - inter
      if inter * 5 >= union * 4
    } yield (a, b)).toSet
    val got = TextOps.minhashCapped(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"capped LSH=${got.size} exact=${expected.size}")
  }

  test("the hot-df index derives every consumer's hot list exactly (q158 asset law)") {
    // The q158 asset materializes (shash, df) at df > HotIndexMinDf; every
    // capped pipeline derives its df>cap hot list by FILTERING the asset.
    // Valid iff filtering the asset at any cap ≥ the floor equals filtering
    // the full df aggregate at that cap — checked at the boundary cap (the
    // floor itself) and both production caps (q102's 20, q36's 128).
    val full = TextOps.shingleRowsShared(spark, sf01)
      .groupBy(col("shash")).agg(count(lit(1)).as("df"))
    for (cap <- Seq(TextOps.HotIndexMinDf, TextOps.MaxShingleDf, TextOps.DefaultDfCap)) {
      val direct = full.filter(col("df") > cap)
        .select("shash").collect().map(_.getLong(0)).toSet
      val derived = TextOps.hotDfIndex(spark, sf01).filter(col("df") > cap)
        .select("shash").collect().map(_.getLong(0)).toSet
      assert(derived == direct, s"cap $cap: derived=${derived.size} direct=${direct.size}")
    }
    // the asset itself must be non-vacuous at harness scale — an empty
    // index would make q158 the same class of vacuous pass q25 was
    assert(TextOps.hotDfIndex(spark, sf01).count() > 0)
  }

  test("q102's two hot-list strategies are bit-identical on a gate-tripping corpus") {
    import spark.implicits._
    // 30 docs share a boilerplate banner, so every boilerplate shingle has
    // df = 30 > MaxShingleDf = 20 (the hot set is non-empty and the capped
    // semantics are actually exercised); docs 1 and 2 carry near-identical
    // bodies that survive the cap as a genuine near-dup pair.
    val boiler = "all rights reserved contact the site admin for terms of use and privacy policy details"
    val bodyA = "quick brown fox jumps over the lazy dog near the river bank today"
    val docs = (0 until 30).map { i =>
      val body =
        if (i == 1) bodyA
        else if (i == 2) bodyA.replace("today", "tonight")
        else s"unique body $i with words alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"
      (i.toLong, s"$boiler $body")
    }.toDF("doc_id", "text")
    def run(): Seq[(Long, Long, Long, Long, Double)] =
      TextOps.minhashCappedOf(spark, docs).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val driverPath = run()
    // conf 0: any non-empty measured hot list exceeds the gate → the
    // fully-distributed anti-join + 64-min-aggregate strategy runs instead
    spark.conf.set("graft.minhash.hotListMaxDriver", "0")
    val distributedPath = try run() finally
      spark.conf.unset("graft.minhash.hotListMaxDriver")
    assert(driverPath == distributedPath,
      s"driver=${driverPath.size} rows, distributed=${distributedPath.size} rows")
    assert(driverPath.exists { case (a, b, _, _, _) => (a, b) == (1L, 2L) },
      "the planted near-dup pair must survive the cap on both paths")
    // the boilerplate-only overlap must NOT pair anything else: every shared
    // shingle between distinct-body docs is hot and dropped
    assert(driverPath.size == 1, s"only the planted pair: $driverPath")
  }

  test("q36's default df cap is vacuous at harness scale (bit-identical to the " +
       "uncapped baseline) and binding on a hot corpus") {
    import spark.implicits._
    // harness corpus: max shingle df ≪ DefaultDfCap (measured 25 at sf0.1,
    // 9 at sf0.001), so the default capped form must equal the conf-0
    // uncapped baseline exactly — the oracle stays byte-stable by default
    val capped = TextOps.minhashLshPairs(spark, sf001).collect().toSeq
    spark.conf.set("graft.minhash.dfCap", "0")
    val uncapped =
      try TextOps.minhashLshPairs(spark, sf001).collect().toSeq
      finally spark.conf.unset("graft.minhash.dfCap")
    assert(capped == uncapped, s"capped=${capped.size} uncapped=${uncapped.size}")
    assert(capped.nonEmpty, "test data plants near-duplicates")
    // binding case: a banner carried by DefaultDfCap + 12 documents trips
    // the q36 cap (df = 140 > 128) — its shingles must not generate pairs,
    // while the planted near-dup pair (distinct bodies, one word apart)
    // still clears 0.8 over the SURVIVING shingle sets
    val n = TextOps.DefaultDfCap + 12
    val banner = "all rights reserved contact the site admin for terms of use"
    val bodyA = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve")
    val hot = (0 until n).map { i =>
      val body =
        if (i == 1) bodyA
        else if (i == 2) bodyA.replace("twelve", "thirteen")
        else s"unique body $i with words aa$i bb$i cc$i dd$i ee$i ff$i gg$i"
      (i.toLong, s"$banner $body")
    }.toDF("doc_id", "text")
    val got = TextOps.minhashCappedOf(spark, hot, TextOps.DefaultDfCap)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      s"cap must kill banner-only pairs and keep the planted one: $got")
  }

  test("q126 semantic-dup pairs equal the global-threshold pairs within probed cells") {
    import graft.operators.SimilarityOps
    val assigned = SimilarityOps.semanticAssigned(spark, sf001)
    val rows = assigned.select("vec_id", "cluster", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    // brute-force 6-dp cosine with the SAME sequential left-fold order
    def pround6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def dot(a: Array[Double], b: Array[Double]) = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val norm = rows.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val globalPairs = (for {
      (a, _, va) <- rows; (b, _, vb) <- rows if a < b
      if pround6(dot(va, vb) / (norm(a) * norm(b))) >= SimilarityOps.SemDedupThreshold
    } yield (a, b)).toSet
    val cellOf = rows.map { case (id, c, _) => id -> c }.toMap
    val emitted = SimilarityOps.semanticPairsOf(assigned).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: every emitted pair clears the global threshold
    assert(emitted.subsetOf(globalPairs),
      s"unsound pairs: ${(emitted -- globalPairs).take(5)}")
    // completeness within cells: a global pair whose members share a cluster
    // is always emitted — pruning loses ONLY cross-cluster pairs
    val sameCell = globalPairs.filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(emitted == sameCell,
      s"emitted=${emitted.size} sameCell=${sameCell.size} global=${globalPairs.size}")
    // the verdict layer: exactly one keeper per group, and it is the
    // centroid-cosine argmax (ties to the lower id)
    val out = SimilarityOps.semanticDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val byGroup = out.groupBy(_._4)
    assert(byGroup.forall { case (_, g) => g.count(_._6) == 1 })
    byGroup.values.foreach { g =>
      val keeper = g.find(_._6).get
      val best = g.minBy(m => (-m._3, m._1))
      assert(keeper == best, s"keeper $keeper is not the argmax $best")
      assert(g.forall(_._5 == g.length), "group_size must equal the member count")
    }
    assert(out.count(!_._6) == out.length - byGroup.size,
      "non-keepers = vectors minus groups")
  }

  test("media banded-hamming pairs equal driver brute force, uncapped AND capped") {
    // q133's completeness law: 4-band banding over the 48-bit phash loses
    // nothing at Hamming ≤ 3 (pigeonhole), so with the hot-bucket cap
    // inactive the pair set must equal all-pairs brute force over the
    // per-document fingerprints computed independently on the driver.
    import graft.multimodal.{Multimodal, PpmCodec}
    val phashes = Multimodal.mediaPhash(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver twin of the whole pipeline: fixture synthesis → REAL PPM
    // decode → row-luminance profile → quantized phash (the decoder's own
    // correctness against hand-built byte streams lives in PpmCodecSpec)
    val docs = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val driverPh = docs.map { case (id, text) =>
      val nf = (1L + graft.functions.H48.hash(text.getBytes("UTF-8")) % 30).toInt
      val frames = PpmCodec.decode(PpmCodec.encodeFixture(text, nf))
      assert(frames.length == nf && frames.head.width == 16)
      (id, PpmCodec.phashOf(frames.head))
    }
    assert(phashes.sorted.toSeq == driverPh.sorted.toSeq,
      "mapPartitions decode seam must equal the driver decode pipeline")
    // Completeness law needs the hot-bucket cap OFF (it is ACTIVE even at
    // this SF: short documents render to short images whose tail hash rows
    // are zero, so structurally-close fingerprints share band values) —
    // force the uncapped path through the same conf lever the oracle
    // resolves (the q102/q41 spec pattern).
    val brute = (for {
      (a, pa) <- driverPh; (b, pb) <- driverPh
      if a < b && java.lang.Long.bitCount(pa ^ pb) <= Multimodal.MediaMaxHamming
    } yield (a, b, java.lang.Long.bitCount(pa ^ pb).toLong)).toSet
    spark.conf.set("graft.media.maxBucket", Int.MaxValue.toString)
    val uncapped =
      try Multimodal.mediaNearDup(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      finally spark.conf.unset("graft.media.maxBucket")
    assert(uncapped == brute, s"uncapped=${uncapped.size} brute=${brute.size}")
    // Capped (default) semantics on a SYNTHETIC fingerprint set that
    // provably trips the cap: 40 hot phashes are pairwise Hamming-close but
    // share ONLY over-cap band buckets (bands 1–3, value 0, bucket 42 > 32)
    // — the cap must drop every such pair whole; the one planted pair (A,
    // B) shares an in-cap band-0 bucket of size 2 at Hamming 1 and must be
    // the ONLY emission. The capped machinery is thereby exercised
    // end-to-end, independent of whether the corpus trips it at this SF.
    import spark.implicits._
    val phA = 1L
    val phB = 1L | (1L << 24)
    val hot = (0 until 40).map(i => (i + 2).toLong)  // band-0 values 2..41
    val synth = ((100L, phA) +: (101L, phB) +:
      hot.zipWithIndex.map { case (ph, i) => (200L + i, ph) })
      .toDF("doc_id", "phash")
    assert(hot.exists(x => hot.exists(y =>
        x < y && java.lang.Long.bitCount(x ^ y) <= Multimodal.MediaMaxHamming)),
      "hot cluster must contain Hamming-close pairs the cap then drops")
    val cappedGot = Multimodal.mediaNearPairsOf(synth.localCheckpoint())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cappedGot == Set((100L, 101L, 1L)),
      s"cap must drop hot-bucket pairs whole and keep the planted pair: $cappedGot")
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

  test("banded sign-LSH candidate volume is bounded by the OR-construction collision rate") {
    import graft.operators.SimilarityOps
    val n = Tables.embeddings(spark, sf001).count()
    val cands = SimilarityOps.lshCandidates(spark, sf001).count()
    val pairs = SimilarityOps.lshNearDupPairs(spark, sf001).collect()
    // random-pair collision probability is Bands·2^-BandBits; correlated
    // pairs push the measured volume above that floor, but it must stay
    // within a small constant of it (old single-8-bit-bucket blocking sat at
    // a FIXED n²/256 with no similarity dependence at all)
    val floorV = n * (n - 1) / 2.0 * SimilarityOps.Bands * math.pow(2.0, -SimilarityOps.BandBits)
    assert(cands <= 4 * floorV, s"candidates=$cands collision-floor=${floorV.toLong}")
    assert(pairs.nonEmpty, "fixture plants at least one verified near-dup pair")
    assert(pairs.forall(r => r.getAs[Long]("n_bands") >= 1 && r.getAs[Long]("n_bands") <= SimilarityOps.Bands))
  }

  test("a degenerate embedding cluster cannot quadratic an LSH bucket (bucket cap)") {
    import graft.operators.SimilarityOps
    import spark.implicits._
    // 500 byte-identical vectors land in ONE bucket per band: uncapped, the
    // bucket join would emit C(500,2) ≈ 125k pairs per band. With the cap,
    // all 8 of the cluster's buckets exceed maxBucket and drop wholesale,
    // while a sparse near-identical pair (signs untouched by the tiny
    // perturbation → same band values) still collides.
    val hotVec = Array.fill(64)(1.0)
    val pairBase = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val pairTwin = pairBase.clone(); pairTwin(0) = 0.9
    val rows = (1L to 500L).map(i => (i, hotVec.toSeq)) ++
      Seq((2001L, pairBase.toSeq), (2002L, pairTwin.toSeq))
    val e = rows.toDF("vec_id", "v")
    val capped = SimilarityOps.lshCandidatesOf(e, SimilarityOps.BandBits, maxBucket = 32)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((2001L, 2002L)), s"got ${capped.size} candidates: ${capped.take(5)}")
    // with the cap above the cluster size, the quadratic volume comes back
    val uncapped = SimilarityOps.lshCandidatesOf(e, SimilarityOps.BandBits, maxBucket = 2000)
    assert(uncapped.count() >= 500L * 499 / 2, "uncapped must include the hot cluster")
    // and the capped shape with an inactive cap reproduces the naive banded
    // self-join exactly (pair set AND per-pair shared-band counts)
    import org.apache.spark.sql.functions.{col, count, lit, posexplode}
    val bandVals = graft.functions.SignSketch(col("v"), "bplane",
      SimilarityOps.Bands, SimilarityOps.BandBits, SimilarityOps.Dim)
    val banded = e.select(col("vec_id"), posexplode(bandVals).as(Seq("band_idx", "band_val")))
    val naive = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(count(lit(1)).as("n_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val reshaped = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reshaped == naive, s"reshaped=${reshaped.size} naive=${naive.size}")
  }

  test("fuzzy match via deletion-neighborhood blocking equals the naive all-pairs join") {
    import graft.operators.Relational
    val c = Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    val naive = c.as("x").join(c.as("y"),
        col("x.c_nationkey") === col("y.c_nationkey")
          && col("x.c_mktsegment") === col("y.c_mktsegment")
          && col("x.c_custkey") < col("y.c_custkey")
          && levenshtein(col("x.c_name"), col("y.c_name")) <= 2)
      .select(col("x.c_custkey"), col("y.c_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Relational.fuzzyMatch(spark, sf001)
      .select("cust_a", "cust_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == naive, s"blocked=${blocked.size} naive=${naive.size}")
    assert(naive.nonEmpty, "fixture must contain at least one fuzzy pair")
  }

  test("fuzzy-match candidate volume tracks match density, not corpus size") {
    import graft.operators.Relational
    // Deletion-neighborhood blocking only pairs records agreeing on all but
    // ≤4 characters, so candidate volume must stay within a small constant
    // of the true match count (measured ratios: 1.2× at sf0.001, 2.4× at
    // sf0.01, 4.3× at sf0.1) — unlike the old (nation, segment) blocking,
    // whose candidate volume was n²/250 regardless of how many true
    // duplicates exist.
    val cands = Relational.fuzzyCandidates(spark, sf001).count()
    val matches = Relational.fuzzyMatch(spark, sf001).count()
    assert(matches > 0, "fixture must contain at least one fuzzy pair")
    assert(cands <= 10 * matches, s"candidates=$cands matches=$matches")
  }

  test("a hot name cannot quadratic a fuzzy-match block (df cap)") {
    import graft.operators.Relational
    import spark.implicits._
    // 1000 identical "John Smith"s in one (nation, segment) block: uncapped
    // blocking would emit ~500k candidate pairs from the shared variants.
    // With the cap, every variant block of the hot name exceeds maxBlock and
    // is dropped wholesale, while the sparse background names still pair.
    val hot = (1L to 1000L).map(i => (i, "John Smith", 1L, "AUTOMOBILE"))
    val bg = Seq(
      (2001L, "Maria Delgado", 1L, "AUTOMOBILE"),
      (2002L, "Maria Delgadoo", 1L, "AUTOMOBILE"),   // dist 1 from 2001
      (2003L, "Viktor Petrov", 1L, "AUTOMOBILE"))
    val c = (hot ++ bg).toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val capped = Relational.fuzzyCandidatesOf(c, maxBlock = 64)
      .select("cust_a", "cust_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot block is fully suppressed; the rare-variant pair survives
    assert(capped == Set((2001L, 2002L)), s"got ${capped.size} candidates: $capped")
    // and with the cap above the block size, the quadratic volume comes back
    val uncapped = Relational.fuzzyCandidatesOf(c, maxBlock = 2000).count()
    assert(uncapped >= 1000L * 999 / 2, s"uncapped=$uncapped")
  }

  test("CDC chunking re-aligns after insertions; fixed-size chunking cannot") {
    import graft.functions.CdcChunkHashes
    def chunks(s: String): Seq[Long] =
      CdcChunkHashes.compute(s.getBytes("UTF-8")).toLongArray().toSeq
    // varied (non-periodic) text: a repeated sentence can share its handful
    // of distinct window hashes and legitimately never hit the 1-in-64
    // boundary condition — real documents (and this mix) do not
    val base = (0 until 240).map(i => s"word${i * 7919 % 1000}").mkString(" ") + " "
    // insertion at the FRONT: every byte of the shared suffix shifts
    val front = "an inserted header sentence goes here first " + base
    // insertion in the MIDDLE
    val mid = base.substring(0, base.length / 2) +
      "some new words appear here " + base.substring(base.length / 2)
    val b = chunks(base)
    assert(b.length >= 8, s"expected a non-trivial chunking, got ${b.length}")
    for ((edited, where) <- Seq(front -> "front", mid -> "middle")) {
      val e = chunks(edited).toSet
      val shared = b.count(e.contains)
      // boundaries depend only on local content, so all chunks outside the
      // edit's neighborhood must re-align and hash-match
      assert(shared.toDouble / b.length >= 0.7,
        s"$where insertion: only $shared/${b.length} chunks re-aligned")
    }
    // the fixed-size chunker CANNOT re-align after a front insertion that
    // is not a multiple of its chunk size — this is the property gap CDC
    // closes, shown on the same input (q90's ChunkSize boundary grid)
    def fixed(s: String): Seq[String] =
      s.grouped(graft.multimodal.Multimodal.ChunkSize).toSeq
    val fShared = fixed(base).toSet.intersect(fixed(front).toSet).size
    assert(fShared <= 1, s"fixed chunking unexpectedly re-aligned: $fShared")
    // the byte=character precondition is ENFORCED, not assumed: multi-byte
    // UTF-8 input (which would silently diverge from any ascii()-indexed
    // oracle) must fail loudly rather than hash differently
    val ex = intercept[IllegalArgumentException] { chunks("café " + base) }
    assert(ex.getMessage.contains("ASCII"))
  }

  test("q143 near-dup decontamination equals driver brute force (bands ∩ Jaccard ≥ 0.5)") {
    // The law: a corpus doc is flagged for eval doc e iff (a) at least one
    // of its 16 LSH bands collides with e's (the candidate screen — q36's
    // band layout) AND (b) the exact 3-shingle Jaccard is ≥ 0.5
    // (2·|∩| ≥ |∪|, integer arithmetic). Driver twin recomputes BOTH
    // predicates independently: signatures via MinHashSig.compute (the same
    // native kernel, called directly), shingle sets via H48 (the q102
    // pattern), then compares the full output frame — n_matches, min
    // eval_id, max intersection — not just the flagged-id set.
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perms = TextOps.MinHashPerms
    val sigs = docs.map { case (id, src, t) =>
      val arr = graft.functions.MinHashSig.compute(
        UTF8String.fromString(t), 3, graft.functions.PortableHash.M31, perms)
      (id, src, (0 until arr.numElements()).map(arr.getLong).toArray)
    }.filter(_._3.nonEmpty)
    def bandsOf(sig: Array[Long]): Seq[(Int, String)] =
      (0 until TextOps.Bands).map(bi =>
        bi -> (0 until TextOps.RowsPerBand)
          .map(k => sig(bi * TextOps.RowsPerBand + k)).mkString(":"))
    def shingleSet(t: String): Set[Long] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(w =>
        graft.functions.H48.hash(w.mkString(" ").getBytes("UTF-8")) % graft.functions.PortableHash.M31).toSet
    }
    val evalSide   = sigs.filter(_._2 == "src0")
    val corpusSide = sigs.filter(_._2 != "src0")
    val sh = docs.map { case (id, _, t) => id -> shingleSet(t) }.toMap
    val verified = for {
      (c, _, cs) <- corpusSide.toSeq
      cb = bandsOf(cs).toSet
      (e, _, es) <- evalSide.toSeq
      if bandsOf(es).exists(cb.contains)                  // (a) band collision
      inter = (sh(c) & sh(e)).size
      if inter * 2 >= sh(c).size + sh(e).size - inter     // (b) J ≥ 0.5 exact
    } yield (c, e, inter.toLong)
    val expected = verified.groupBy(_._1).map { case (c, hits) =>
      (c, hits.size.toLong, hits.map(_._2).min, hits.map(_._3).max)
    }.toSeq.sortBy(_._1)
    val got = TextOps.neardupDecontaminate(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
    assert(expected.nonEmpty, "fixture should plant cross-source near-dups")
  }
}
