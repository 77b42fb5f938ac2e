package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by executor-side batch decode.
  *
  * The decode step is a REAL pure-JVM PPM decoder ([[PpmCodec]] — header
  * parse, raster extraction, pixel statistics, perceptual hash); the media
  * FILES are synthesized, because the container ships none
  * ([[PpmCodec.encodeFixture]], deterministic and oracle-mirrored, so every
  * decoded pixel statistic is hash-checked end to end). The Spark shape is
  * the one a 100 TB media pipeline needs:
  *  - payloads ride `BinaryType` columns;
  *  - decode runs per-partition over a typed `Dataset` (`mapPartitions`),
  *    the Scala analog of `mapInPandas` batches — one decoder instance per
  *    partition, never per row;
  *  - features come back as a flat typed record, ready for downstream
  *    relational/similarity operators, and ONLY those compact features ever
  *    reach an exchange — raster bytes live and die inside the seam.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Binary ingestion: the documents table with a payload column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .transform(Tables.fanout)   // decode is CPU-bound: fan out the single-file scan
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** 48-bit fold of the leading 12 md5 hex digits — JVM twin of
    * PortableHash.h48 (same value for the same bytes). */
  private def h48Bytes(payload: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString.substring(0, 12)
    hex.foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
  }

  /** Everything q52/q53/q67/q133/q136 read from one decode pass: header
    * facts (REAL parse), per-channel byte sums, frame-0 row-luminance
    * profile (feeds the perceptual hash and the embedding), per-frame
    * luminance totals (feeds frame sampling). Compact by construction —
    * O(height + frames) longs per document, never raster bytes. */
  case class MediaDecoded(doc_id: Long, byte_len: Long, magic: String,
                          width: Long, height: Long, n_frames: Long,
                          sum_r: Long, sum_g: Long, sum_b: Long,
                          phash: Long,
                          row_lums: Array[Long], frame_lums: Array[Long])

  /** The executor-side decode seam: synthesize the fixture media stream for
    * each document (no media files ship in this container), then REALLY
    * decode it — P6 header parse, raster walk, pixel statistics — one
    * decoder pass per partition. Animation frame count rides the payload
    * itself (parsed, not assumed); the md5-derived count matches the
    * oracle's closed form. */
  def decodeMedia(spark: SparkSession, dir: String): Dataset[MediaDecoded] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .transform(Tables.fanout)   // decode is CPU-bound: fan out the single-file scan
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val nFrames = (1L + graft.functions.H48.hash(
            text.getBytes("UTF-8")) % 30).toInt
          val payload = PpmCodec.encodeFixture(text, nFrames)   // FIXTURE
          val frames = PpmCodec.decode(payload)                 // REAL decode
          val head = frames.head
          var sr = 0L; var sg = 0L; var sb = 0L
          frames.foreach { fr =>
            val (r, g, b) = PpmCodec.channelSums(fr)
            sr += r; sg += g; sb += b
          }
          MediaDecoded(docId, payload.length.toLong, "P6",
            head.width.toLong, head.height.toLong, frames.length.toLong,
            sr, sg, sb,
            PpmCodec.phashOf(head),
            PpmCodec.rowLums(head),
            frames.map(fr => PpmCodec.rowLums(fr).sum).toArray)
        }
      }
  }

  /** The frame-0 decode seam for the consumers that read only the first
    * frame (perceptual hash, embedding): synthesize and REALLY decode just
    * that frame — the "sample before decode" discipline a real video
    * pipeline uses (never decode 30 frames to fingerprint one). Emits the
    * compact (doc_id, phash, row_lums) record. */
  private[graft] def decodeFrame0(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .transform(Tables.fanout)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val head = PpmCodec.decode(PpmCodec.encodeFixture(text, 1)).head
          (docId, PpmCodec.phashOf(head), PpmCodec.rowLums(head),
            head.height.toLong)
        }
      }
      .toDF("doc_id", "phash", "row_lums", "height")
  }

  /** q52: decoded media features — REAL header facts (magic, dimensions,
    * frame count all come from the parse) plus exact per-channel means over
    * every frame's raster. The oracle recomputes the pixel sums from the
    * same md5-derived bytes, so a decoder bug anywhere (header scan, raster
    * offset math, channel interleave) breaks the hash. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.pround
    val px = col("width") * col("height") * col("n_frames")
    decodeMedia(spark, dir).toDF()
      .select(col("doc_id"), col("byte_len"), col("magic"),
        col("width"), col("height"), col("n_frames"),
        pround(col("sum_r") / px.cast("double"), 4).as("mean_r"),
        pround(col("sum_g") / px.cast("double"), 4).as("mean_g"),
        pround(col("sum_b") / px.cast("double"), 4).as("mean_b"))
      .orderBy(col("doc_id"))
  }

  /** q53: frame sampling — expand each decoded animation into its frame
    * rows, keep every k-th frame (deterministic stride sampling; the Spark
    * shape of video frame extraction: generator + narrow projection, no
    * shuffle until the consumer aggregates). The per-frame statistic is the
    * REAL mean pixel luminance of that frame's raster. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.pround
    val stride = 5
    decodeMedia(spark, dir).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("frame_lums")))
      .withColumnRenamed("pos", "frame_idx")
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        pround(col("col") /
          (col("width") * col("height") * lit(1000L)).cast("double"), 4)
          .as("lum_mean"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** q157: audio decode + feature extraction — the audio leg of the
    * multimodal tier ([[WavCodec]], the [[PpmCodec]] discipline applied to
    * RIFF/WAVE): synthesize each document's fixture clip (mono PCM16 with
    * a LIST chunk the parser must skip), REALLY decode it — container
    * walk, fmt validation, PCM extraction — and emit exact-integer sample
    * statistics (squared energy, peak amplitude, zero crossings) plus the
    * parsed header facts. The oracle recomputes every sample from the
    * mirrored md5 fixture, so a decoder bug anywhere (chunk walk,
    * little-endian int16 signing, alignment pad) breaks the hash.
    *
    * Scale shape: the decode seam is per-partition (`mapPartitions`); PCM
    * bytes never leave it — only fixed-width statistics reach the
    * presentation sort, the single exchange (PlanAudit pins it).
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val h = graft.functions.H48.hash(text.getBytes("UTF-8"))
          val nb = WavCodec.fixtureBlocksOf(h)
          val ch = WavCodec.fixtureChannelsOf(h)             // ~25% stereo
          val payload = WavCodec.encodeFixture(text, nb, ch) // FIXTURE
          val clip = WavCodec.decode(payload)                // REAL decode
          val st = WavCodec.stats(clip)
          // n_samples counts FRAMES (samples per channel) — that is what
          // duration is made of; energy_ch0 is the interleaving canary
          val frames = clip.samples.length.toLong / clip.channels
          (docId, payload.length.toLong, clip.channels.toLong,
            clip.sampleRate.toLong, frames,
            frames * 1000L / clip.sampleRate,
            st.energy, st.peak, st.zeroCrossings, st.energyCh0)
        }
      }
      .toDF("doc_id", "byte_len", "channels", "sample_rate", "n_samples",
        "duration_ms", "energy", "peak", "zero_crossings", "energy_ch0")
      .orderBy(col("doc_id"))
  }

  /** q51: pure-expression metadata extraction over the binary column —
    * the plan-level (codegen) path for cheap metadata, no decode needed.
    */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        substring(md5(col("payload")), 1, 8).as("magic"))
      .orderBy(col("doc_id"))

  val ChunkSize = 64

  /** q90: chunk-level binary dedup — split every media payload into
    * fixed-size chunks, content-hash each chunk, and report the chunks that
    * occur more than once across the corpus (count, distinct carriers,
    * lowest-id keeper). This is the storage-dedup primitive (CAS blocks /
    * video segment dedup); on real media the splitter would be
    * content-defined (rolling-hash boundaries), which is the same explode →
    * hash → aggregate shape.
    *
    * Scale: generator + narrow projection per payload, then ONE hash
    * aggregate keyed by chunk hash — uniform by construction, map-side
    * partials, no skew. The payload itself never shuffles (only 12-char
    * hash prefixes and counts do).
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    chunkDedupOf(mediaTable(spark, dir)
      .select(col("doc_id"), col("payload").cast("string").as("text")))

  /** Core of q90 over any `(doc_id, text)` frame — exposed so specs can
    * drive the empty-payload edge case directly. */
  def chunkDedupOf(d: DataFrame): DataFrame = {
    val nChunks = ceil(length(col("text")) / lit(ChunkSize.toDouble)).cast("int")
    // Guard the generator: sequence(0, -1) counts DOWN in Spark (default
    // step -1), so an empty payload would emit phantom [0, -1] chunk rows
    // where DuckDB's generate_series emits none.
    val chunkIdx = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    val chunks = d
      .select(col("doc_id"), col("text"), explode(chunkIdx).as("ci"))
      .select(col("doc_id"), col("ci"),
        substring_index_chunk(col("text"), col("ci")))
    chunks
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
           count_distinct(col("doc_id")).as("n_docs"),
           min(col("doc_id")).as("keeper_doc_id"))
      .filter(col("n_copies") > 1)
      .select(substring(col("chunk_md5"), 1, 12).as("md5_12"),
        col("n_copies"), col("n_docs"), col("keeper_doc_id"))
      .orderBy(col("md5_12"))
  }

  /** md5 of the ci-th fixed-size chunk of `text` (1-based substring math
    * identical to the oracle's). */
  private def substring_index_chunk(text: org.apache.spark.sql.Column,
                                    ci: org.apache.spark.sql.Column) =
    md5(text.substr(ci * ChunkSize + 1, lit(ChunkSize)).cast("binary")).as("chunk_md5")

  // ---- q133: banded-hamming perceptual near-dup over decoded pixels ----

  val MediaBands = 4         // 4 × 12-bit bands over the 48-bit phash
  val MediaBandBits = 12
  val MediaMaxHamming = 3    // < MediaBands ⇒ banding is pigeonhole-complete
  /** Hot band-bucket cap (q41's skew lever at the distinct-value level).
    * Session-overridable via `graft.media.maxBucket` — ONE resolution point
    * shared with the oracle builder (the resolvedLshConf pattern), so a
    * conf'd comparison run never silently diverges; DedupSpec forces the
    * uncapped path with it to prove banding completeness against brute
    * force. NOTE the cap is ACTIVE at the oracle SFs here (unlike q41):
    * every fixture frame is a full 16 rows, but a document shorter than 16
    * characters leaves its tail slices EMPTY, and empty slices hash to the
    * same md5 digests in every such document — identical pixel rows, hence
    * identical hash rows, so short-document fingerprints pile onto shared
    * band values — the oracle carries the same bdf filter, so the capped
    * semantics are what hash-matches. */
  val MediaMaxBucket = 32

  private[graft] def resolvedMediaCap(spark: SparkSession): Int =
    graft.GraftConf.int(spark, "graft.media.maxBucket", MediaMaxBucket)

  /** Per-document 48-bit perceptual hash of the decoded first frame:
    * [[PpmCodec.phashOf]]'s row-luminance-profile quantization, computed
    * inside the decode seam — real pixel math over the parsed raster, laid
    * out so [[mediaNearPairsOf]]'s contiguous 12-bit band extraction reads
    * interleaved row groups (see phashOf's scaladoc). */
  private[graft] def mediaPhash(spark: SparkSession, dir: String): DataFrame =
    decodeFrame0(spark, dir).select(col("doc_id"), col("phash"))

  /** q133: multimodal banded-hamming near-dup — the media twin of q37's
    * SimHash tier, completing the multimodal dedup ladder (q90/q124 are
    * hash-EXACT chunk dedup; this catches payloads whose decoded pixels
    * differ in a few rows). Pipeline: decode seam → REAL per-row pixel
    * luminance profile of the parsed first frame → quantized 48-bit phash
    * ([[PpmCodec.phashOf]], [[MediaBands]] interleaved bands) → banded
    * candidate join at the DISTINCT-fingerprint level (q37's collapse
    * seam: identical rasters share one value, so band buckets are
    * quadratic only in distinct collisions) with q41's hot-bucket cap →
    * exact-Hamming verify ≤ [[MediaMaxHamming]] → membership joins expand
    * value pairs back to document pairs (plus the Hamming-0 pairs via the
    * direct fingerprint self-join).
    *
    * Completeness: Hamming ≤ 3 over 4 bands shares ≥1 band by pigeonhole,
    * so banding loses nothing below the cut (DedupSpec proves the pair set
    * equals driver brute-force Hamming when the bucket cap is inactive).
    * The cap is part of the oracle-checked semantics: a bucket with more
    * than [[MediaMaxBucket]] distinct fingerprints drops whole, bounding
    * candidates linearly; band width grows as log2(n) at real scale (the
    * q41 lever, same reasoning).
    *
    * Scale shape: raster bytes never shuffle — they live inside the decode
    * seam; only 48-bit fingerprints reach the banding exchange, at
    * distinct-value granularity; the expansion joins move (value, doc_id)
    * memberships. All pixel sums are exact integers, so the DuckDB oracle
    * hash-matches the full pipeline including the decoded statistics (the
    * q52 discipline).
    */
  def mediaNearDup(spark: SparkSession, dir: String): DataFrame =
    mediaNearPairsOf(mediaPhash(spark, dir).localCheckpoint())
      .orderBy(col("doc_a"), col("doc_b"))

  /** q133's pair stage over a checkpointed (doc_id, phash) frame — exposed
    * so q136's grouping consumes the same candidate machinery. */
  private[graft] def mediaNearPairsOf(s: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = s.sparkSession
    val d = s.select(col("phash")).distinct()
    val banded = d.select(col("phash"),
        posexplode(array((0 until MediaBands).map(b =>
          shiftright(col("phash"), b * MediaBandBits)
            .bitwiseAND((1 << MediaBandBits) - 1)): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_val")
    // q41's cap at the distinct-value tier: the windowed count shares the
    // band exchange (no agg + re-join), and an over-cap bucket drops whole
    val wB = Window.partitionBy(col("band_idx"), col("band_val"))
    val kept = banded.withColumn("bdf", count(lit(1)).over(wB))
      .filter(col("bdf") <= resolvedMediaCap(spark))
    val vp = kept.as("x").join(kept.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.phash") < col("y.phash") &&
          bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= MediaMaxHamming)
      .select(col("x.phash").as("pa"), col("y.phash").as("pb"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).cast("long").as("hamming"))
      .dropDuplicates("pa", "pb")
    val cross = vp
      .join(s.as("a"), col("pa") === col("a.phash"))
      .join(s.as("b"), col("pb") === col("b.phash"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
              col("hamming"))
    val intra = s.as("a").join(s.as("b"),
        col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              lit(0L).as("hamming"))
    cross.union(intra)
  }

  /** q136: media duplicate GROUPS with keep-best — q117's quality-aware
    * cluster-dedup policy applied to the perceptual tier: q133's
    * banded-hamming pairs feed connected components
    * ([[graft.operators.TextOps.ccAdaptive]] — measured-size strategy
    * pick), and each transitive duplicate group keeps its LARGEST member
    * (`n_chars` desc — for media, the highest-resolution/least-truncated
    * copy is the keeper a real pipeline retains), ties to the lower id.
    * Every row carries its verdict so downstream filtering is a predicate.
    *
    * Scale shape: inherits q133's (payloads never shuffle; fingerprints at
    * distinct-value granularity) plus q62's CC machinery (driver union-find
    * below the measured 4M-edge gate, large-star/small-star above); the
    * quality join moves only (doc_id, n_chars).
    */
  def mediaDupGroups(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = mediaPhash(spark, dir).localCheckpoint()
    // checkpoint before counting: the count feeds ccAdaptive's strategy
    // pick and the pair set flows on (the q126 double-execution rule)
    val pairs = mediaNearPairsOf(s)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val nEdges = pairs.count()
    val groups = graft.operators.TextOps.ccAdaptive(
        s.select(col("doc_id")), pairs, nEdges)
      .select(col("doc_id"), col("label").as("group_id"))
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val byGroup = Window.partitionBy(col("group_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    groups.join(d, "doc_id")
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy(col("group_id"))))
      .withColumn("keep", row_number().over(byGroup) === 1)
      .select(col("doc_id"), col("group_id"), col("group_size"),
        col("n_chars"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val EmbedDim = 8

  /** Mid-scale luminance constant the embedding components center on: the
    * expected row sum of a uniform-random 16-px row (16·127.5·1000). */
  val RowLumMid = 2040000L

  /** q67: media → embedding → kNN, the end-to-end multimodal retrieval
    * shape (extract a feature vector from each decoded payload, then
    * search it). The embedding is REAL pixel math: the first frame's
    * row-luminance profile, nearest-neighbor–resampled to [[EmbedDim]]
    * components (the fixed-size resize every visual embedding starts
    * with), centered and scaled to ~[-1, 1] by [[RowLumMid]]. The pipeline
    * is the production one: per-payload extraction inside the decode seam,
    * norms precomputed, bounded query set broadcast against the corpus,
    * per-partition top-k. All sums are exact integers so the DuckDB oracle
    * hash-matches the whole pipeline including the extracted vectors.
    */
  def mediaEmbedKnn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.PortableHash.pround
    import graft.functions.DotProduct
    val d = decodeFrame0(spark, dir)
    val vec = array((0 until EmbedDim).map { j =>
      // nearest-neighbor resample: component j reads source row ⌊j·H/8⌋
      val src = floor(lit(j) * col("height") / lit(EmbedDim)).cast("int")
      (element_at(col("row_lums"), src + 1) - lit(RowLumMid)).cast("double") /
        lit(RowLumMid.toDouble)
    }: _*)
    val vecs = d.select(col("doc_id"), vec.as("v"))
      .withColumn("norm", sqrt(DotProduct(col("v"), col("v"))))
    val q = vecs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val joined = vecs.join(broadcast(q), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        pround(DotProduct(col("v"), col("qv")) / (col("norm") * col("qn")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }
}
