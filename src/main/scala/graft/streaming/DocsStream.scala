package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Streaming corpus admission (the continuous form of q111's screen): new
  * documents arrive as an unbounded stream and are admitted against a
  * write-once corpus index, per-row and stateless — no aggregation, so the
  * query runs in append mode with zero state store.
  *
  * Two screening layers, mirroring what a production ingest runs in-stream:
  *  - **exact** (q112, oracle-declared): stream-static left join against the
  *    corpus md5 index (distinct key → no row duplication). Authoritative.
  *  - **near-dup suspect screen** (spec-verified, not oracle-declared): a
  *    Bloom filter built over the corpus's MinHash band signatures, probed
  *    per row via `might_contain` over the document's 16 bands (the narrow
  *    [[graft.functions.MinHashSig]] projection — the only signature
  *    formulation a stateless stream can evaluate). One-sided error: a true
  *    band collision is NEVER missed, so every real near-duplicate is
  *    flagged for the async batch verify (q111's exact-Jaccard layer);
  *    false positives only cost spurious verification work. At 100 TB the
  *    band index doesn't fit a broadcast join but its Bloom filter fits
  *    executor memory — this is the screen's honest scale shape, which is
  *    why the oracle-declared surface keeps to the md5 layer.
  */
object DocsStream {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private val M31 = graft.functions.PortableHash.M31
  import graft.operators.TextOps.MinHashPerms

  /** The band-key strings of a document as an array column: band index
    * prefixed onto the SHARED batch band layout (TextOps.bandSigCols — one
    * definition, so the stream's Bloom keys can never diverge from the
    * q111 batch bands). A document with fewer than n tokens has an empty
    * signature and yields an EMPTY key array (`exists` → not suspect; a
    * corpus-side `explode` → no index entries) — guarded here because
    * `element_at` past the end throws under ANSI mode, and an unguarded
    * concat would collapse every shingle-less doc onto shared degenerate
    * keys, flagging all short docs as mutual suspects.
    */
  def bandSigs(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sg = graft.functions.MinHashSig(text, 3, M31, MinHashPerms)
    val keyed = graft.operators.TextOps.bandSigCols(sg).zipWithIndex.map {
      case (b, bi) => concat(lit(s"$bi:"), b)
    }
    when(size(sg) === MinHashPerms, array(keyed: _*))
      .otherwise(array().cast("array<string>"))
  }

  /** q112: exact-layer streaming admission — each arriving incoming document
    * (doc_id % 5 = 0) gets `exact`/`new` against the static corpus md5
    * index, emitted once, append mode, stateless.
    *
    * The static side is broadcast here because the harness corpus is small.
    * At 100 TB the md5 index no longer broadcasts; the production forms are
    * (a) a shuffled stream-static join — still stateless, each micro-batch
    * shuffles only its own rows against the bucketed index — or (b) the same
    * Bloom screen [[bloomBandScreen]] uses, with exact-match suspects
    * verified async in batch (q111's layer). The join SHAPE is identical in
    * all three; only the distribution strategy changes.
    */
  def streamingAdmission(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_admission_${counter.incrementAndGet()}"
    val corpusMd5 = broadcast(
      Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0)
        .select(md5(col("text")).as("content_md5"), col("doc_id"))
        .groupBy(col("content_md5")).agg(min(col("doc_id")).as("exact_match")))
    val q = Tables.readStreamTable(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("content_md5", md5(col("text")))
      .join(corpusMd5, Seq("content_md5"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, lit("exact"))
          .otherwise(lit("new")).as("verdict"),
        col("exact_match").as("match_doc"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("doc_id"))
  }

  /** The in-stream near-dup suspect screen: returns (doc_id, suspect) for
    * the incoming role, probing a Bloom filter of the corpus band index.
    * Exercised by SimilarityStreamingSpec (soundness: no false negatives vs
    * the batch band join; false-positive rate bounded); not oracle-declared
    * because the filter's bit pattern is engine-specific.
    */
  def bloomBandScreen(spark: SparkSession, dir: String,
                      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val name = s"stream_screen_${counter.incrementAndGet()}"
    // build the filter ONCE as a distributed aggregate, collect the single
    // binary value, and ship it into the stream job as a literal — the
    // build-once / probe-forever lifecycle of a production screen (the
    // driver sees one scalar, never the band rows). BloomFilterAggregate /
    // BloomFilterMightContain are the expressions behind Spark's own
    // runtime-filter injection (not SQL-registered), built here directly.
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("band_key"))),
        GraftBridge.expression(lit(expectedItems)),
        GraftBridge.expression(lit(numBits))).toAggregateExpression())
    val bloomBytes = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select(explode(bandSigs(col("text"))).as("band_key"))
      .agg(bloomAgg.as("bloom"))
      .head.getAs[Array[Byte]]("bloom")
    def mightContain(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      GraftBridge.column(BloomFilterMightContain(
        GraftBridge.expression(lit(bloomBytes)),
        GraftBridge.expression(xxhash64(v))))
    val q = Tables.readStreamTable(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("bands", bandSigs(col("text")))
      .select(col("doc_id"),
        exists(col("bands"), b => mightContain(b)).as("suspect"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("doc_id"))
  }
}
