package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash._
import graft.functions.PortableHash.pround

/** Text analysis + deduplication over the `documents` table — the
  * LLM-training-pipeline extension surface (BASELINE.json north star), built
  * entirely from codegen'd built-in expressions and the portable hash toolkit
  * so every operator has an exact DuckDB oracle.
  *
  * Scale design (100 TB):
  *  - Everything is per-document narrow work (tokenize/hash/score) followed
  *    by key-partitioned shuffles on *hash* keys (uniform by construction —
  *    no skew). No driver materialization anywhere.
  *  - Near-dup joins go through bounded-width candidate generation (LSH bands
  *    / band buckets), never all-pairs. Exact Jaccard verification touches
  *    only candidate pairs.
  *  - Pathological hot shingles (boilerplate) would skew the inverted-index
  *    join; production would drop shingles with doc-frequency above a cap
  *    before the join (cheap pre-aggregation) — noted here, not needed at
  *    test scale.
  */
object TextOps {

  private val StopEn = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
  private val StopEs = Seq("el", "la", "de", "y", "en", "que", "los", "un", "por", "con")
  private val StopDe = Seq("der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "im")

  private def litArray(xs: Seq[String]): Column = array(xs.map(lit): _*)

  private def hits(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => array_contains(litArray(stop), t))).cast("long")

  /** q30: quality scoring — length / punctuation / stopword signals with a
    * blended score (the "does this document look like prose" heuristic every
    * training-data pipeline runs first).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nCh  = length(col("text")).cast("long")
    val punct = (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long")
    val alpha = (length(col("text")) - length(regexp_replace(col("text"), "[a-zA-Z]", ""))).cast("long")
    val stop  = hits(toks, StopEn)
    d.select(
        col("doc_id"), nTok.as("n_tokens"), nCh.as("n_chars_m"),
        punct.as("n_punct"),
        pround(stop * lit(1.0) / nTok, 4).as("stopword_ratio"),
        pround(alpha * lit(1.0) / nCh, 4).as("alpha_ratio"),
        pround(punct * lit(1.0) / nCh, 4).as("punct_ratio"),
        pround(stop * lit(1.0) / nTok + (alpha * lit(1.0) / nCh) * 0.5
              - (punct * lit(1.0) / nCh) * 2.0, 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** q31: language ID — n-gram/stopword-hit heuristic with a deterministic
    * argmax tie-break (en > es > de > und).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(lower(col("text")))
    val en = hits(toks, StopEn); val es = hits(toks, StopEs); val de = hits(toks, StopDe)
    d.select(col("doc_id"), col("lang").as("labeled_lang"),
        en.as("hits_en"), es.as("hits_es"), de.as("hits_de"),
        when(en + es + de === 0, "und")
          .when(en >= es && en >= de, "en")
          .when(es >= de, "es")
          .otherwise("de").as("predicted_lang"))
      .orderBy(col("doc_id"))
  }

  /** q32: token counting — whitespace tokens plus a BPE-ish subword estimate
    * (⌈len/4⌉ pieces per word — the standard chars/4 rule of thumb).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    d.select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
          .as("n_subword_est"),
        // BPE-ish regex pieces: letter runs, digit runs, single symbols
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .cast("long").as("n_regex_pieces"))
      .orderBy(col("doc_id"))
  }

  /** q33: document fingerprinting — rolling polynomial hash over the
    * lowercased, ASCII-normalized text (Rabin–Karp content key).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")
    d.select(col("doc_id"),
        polyFingerprint(norm).as("fp"),
        substring(md5(col("text")), 1, 16).as("md5_16"))
      .orderBy(col("doc_id"))
  }

  /** q34: exact dedup — hash-groupBy on full-content md5, keep min doc_id
    * (one shuffle on an md5 key: perfectly uniform, no skew at any scale).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_doc_id"), col("n_copies"), substring(col("content_md5"), 1, 12).as("md5_12"))
      .orderBy(col("keeper_doc_id"))
  }

  /** Distinct (doc_id, shingle-hash) rows — shared by the Jaccard/MinHash
    * operators. Hash values land in [0, M31).
    *
    * The input is a single small parquet file → one scan partition; the
    * shingle explosion is CPU-bound narrow work, so fan out to all cores
    * first (a few-MB shuffle buys 32× parallelism — at 100 TB the scan is
    * already thousands of partitions and this becomes a no-op to remove).
    */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    d.select(col("doc_id"),
        explode(shingles(tokens(col("text")))).as("sh"))
      .select(col("doc_id"), (h48(col("sh")) % M31).as("shash"))
      .distinct()
  }

  /** q35: exact n-gram Jaccard near-dup pairs via an inverted-index join —
    * pairs share ≥1 shingle, intersection counted per pair, Jaccard ≥ 0.5
    * decided with *integer* arithmetic (3·|∩| ≥ |A|+|B| ⇔ J ≥ 0.5), so both
    * engines agree exactly.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleRows(spark, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shash"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shash"))
    val inter = a.join(b, Seq("shash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .filter(col("n_inter") * 3 >= col("sz_a") + col("sz_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("sz_a") + col("sz_b") - col("n_inter")).as("n_union"),
        pround(col("n_inter") * lit(1.0) / (col("sz_a") + col("sz_b") - col("n_inter")), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val MinHashPerms = 64
  private val Bands = 16
  private val RowsPerBand = MinHashPerms / Bands   // 4 → LSH threshold ≈ 0.5

  /** q36: MinHash + LSH near-dup pairs — signature (64 portable permutations)
    * → 16 bands of 4 → band-bucket self-join for candidates → exact Jaccard
    * ≥ 0.8 verification (5·|∩| ≥ 4·|∪|, integer-exact). The 100 TB path:
    * candidates come from equality joins on (band, signature) — uniform hash
    * keys, bounded buckets — never from an all-pairs product.
    *
    * Physical shape (everything whole-stage-codegen'd, no interpreted
    * higher-order functions, no array payloads in any shuffle):
    *  - signatures: ONE hash aggregate over the (doc_id, shash) rows with 64
    *    `min(permuted(j, shash))` aggregates — partial-aggregated map-side,
    *    so the shuffle carries 5k rows × 64 longs, not 260k shingles;
    *  - candidates: band-bucket equi-join on (band_idx, band_sig) strings;
    *  - exact verification: re-join the candidate pairs to the shingle rows
    *    on (doc, shash) and COUNT matches per pair — a broadcast-able join
    *    (candidates ≪ corpus) replacing per-pair O(|A|·|B|) interpreted
    *    array intersection. A candidate pair sharing zero shingles drops out
    *    of the inner join, which is harmless: it cannot pass J ≥ 0.8.
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleRows(spark, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val minAggs = (0 until MinHashPerms).map(j =>
      min(permuted(lit(j), col("shash"))).as(s"m$j"))
    val sig = sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = array((0 until Bands).map(bi =>
      concat_ws(":", (0 until RowsPerBand).map(k =>
        col(s"m${bi * RowsPerBand + k}").cast("string")): _*)): _*)
    // One row per (doc, band) — tiny relative to the shingle set. Cache it so
    // the self-join's two sides read the materialized bands instead of each
    // re-running the 64-aggregate signature pipeline (AQE then sizes the join
    // from real stats; at corpus scale this stays a shuffled equi-join on
    // uniform band-signature keys).
    val bands = sig.select(col("doc_id"), posexplode(bandCols))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_sig")
      .cache()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.band_sig") === col("y.band_sig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shash")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shash")), Seq("doc_b", "shash"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_inter"))
      .filter(col("n_inter") * 5 >= col("n_union") * 4)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        pround(col("n_inter") * lit(1.0) / col("n_union"), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q38: the deduplicated corpus — drop every document that matched a
    * lower-id near-duplicate (greedy keep-lowest over the MinHash-LSH ≥0.8
    * pairs, the standard training-corpus dedup step). Anti-join against the
    * pair victims: one broadcast-able distinct id set at any scale.
    */
  def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val victims = minhashLshPairs(spark, dir).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(spark, dir)
      .join(victims, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val SimBits = 48
  private val SimBands = 4
  private val SimBandBits = SimBits / SimBands     // 12 bits per band
  private val MaxHamming = 3                       // < SimBands ⇒ pigeonhole-complete

  /** Per-document 48-bit SimHash from distinct unigram token hashes.
    *
    * Physical shape: explode tokens → distinct (doc_id, token-hash) → ONE
    * hash aggregate with 48 codegen'd `sum(±1)` bit-balance aggregates
    * (partial-aggregated map-side), then fold the 48 balances into the
    * fingerprint. This replaces 48 interpreted `aggregate()` passes over a
    * per-doc array (CodegenFallback — the old hot spot) with whole-stage
    * codegen end-to-end, and the shuffle carries one row per distinct
    * (doc, token) instead of token arrays.
    */
  private def simhashDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)   // CPU-bound fan-out
    val th = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), h48(col("tok")).as("th"))
      .distinct()
    val balAggs = (0 until SimBits).map(i =>
      sum(shiftright(col("th"), i).bitwiseAND(1) * 2 - 1).as(s"b$i"))
    val bal = th.groupBy(col("doc_id")).agg(balAggs.head, balAggs.tail: _*)
    val simhash: Column = (0 until SimBits).map(i =>
      when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    bal.select(col("doc_id"), simhash.as("simhash"))
  }

  /** q37: SimHash near-dup pairs — band the 48-bit fingerprint into 4×12-bit
    * keys; Hamming ≤ 3 guarantees at least one equal band (pigeonhole), so
    * the band join is a *complete* candidate generator, then filter on exact
    * Hamming distance via bit_count(xor).
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val s = simhashDocs(spark, dir).cache()
    val banded = s.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until SimBands).map(b =>
          shiftright(col("simhash"), b * SimBandBits).bitwiseAND((1 << SimBandBits) - 1)): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_val")
    // Hamming cut applied as a join predicate (codegen'd, before the
    // dedup shuffle) so dropDuplicates only shuffles surviving pairs.
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.band_val") === col("y.band_val")
          && col("x.doc_id") < col("y.doc_id")
          && bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= MaxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
