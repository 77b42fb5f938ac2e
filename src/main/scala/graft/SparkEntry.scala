package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, EventOps, Relational, SimilarityOps, Temporal, TextOps}
import graft.pipeline.Letter
import graft.functions.PortableHash
import graft.streaming.EventsStream
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): each entry is a named
  * DataFrame program over the test tables in `dir`; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare. Column names and
  * row order are deterministic on both sides (explicit aliases + ORDER BY with
  * unique tie-breaks); double aggregates are rounded because cross-partition
  * summation order is nondeterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full engagement-letter pipeline (validate → enrich → format → render).
    */
  def entry(spark: SparkSession): DataFrame =
    Letter.letters(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (Relational.pricingSummary _),
    "q02_filter_project"     -> (Relational.filterProject _),
    "q03_enrich_orders"      -> (Relational.enrichOrders _),
    "q109_bucketed_join"     -> (Relational.bucketedJoin _),
    "q04_semi_join_active"   -> (Relational.semiJoinActive _),
    "q05_anti_join_inactive" -> (Relational.antiJoinInactive _),
    "q06_geo_expand"         -> (Relational.geoExpand _),
    "q07_first_order"        -> (Relational.firstOrderPerCustomer _),
    "q08_revenue_by_brand"   -> (Relational.revenueByBrand _),
    "q14_supplier_running"   -> (Relational.supplierRunning _),
    "q15_top_orders"         -> (Relational.topOrders _),
    "q16_segment_setops"     -> (Relational.segmentSetOps _),
    "q17_rollup_pricing"     -> (Relational.rollupPricing _),
    "q18_distinct_counts"    -> (Relational.distinctCounts _),
    "q19_approx_distinct"    -> (Relational.approxDistinct _),
    "q79_kmv_distinct"       -> (Relational.kmvDistinct _),
    "q09_format_percent"     -> (Letter.percentFormatting _),
    "q10_format_currency"    -> (Letter.currencyFormatting _),
    "q11_filename_ops"       -> (Letter.filenameOps _),
    "q12_validation_summary" -> (Letter.validationSummary _),
    "q13_letter_pipeline"    -> (Letter.letters _),
    "q24_asof_join"          -> (Temporal.asofJoin _),
    "q25_range_join"         -> (Temporal.rangeJoin _),
    "q26_cube_pricing"       -> (Relational.cubePricing _),
    "q64_grouping_sets"      -> (Relational.groupingSetsPricing _),
    "q65_array_ops"          -> (Relational.arrayOps _),
    "q66_map_ops"            -> (EventOps.mapOps _),
    "q27_percentiles"        -> (Relational.percentiles _),
    "q69_approx_percentiles" -> (Relational.approxPercentiles _),
    "q28_json_roundtrip"     -> (Relational.jsonRoundtrip _),
    "q29_explode_geo"        -> (Relational.explodeGeo _),
    "q47_salted_agg"         -> (EventOps.saltedAgg _),
    "q57_salted_join"        -> (EventOps.saltedJoin _),
    "q43_date_parts"         -> (Relational.datePartsRollup _),
    "q44_math_functions"     -> (Relational.mathFunctions _),
    "q45_null_functions"     -> (Relational.nullFunctions _),
    "q46_pivot_events"       -> (Relational.pivotEvents _),
    "q70_unpivot_events"     -> (Relational.unpivotEvents _),
    "q72_date_spine"         -> (Relational.dateSpine _),
    "q73_share_of_total"     -> (Relational.shareOfTotal _),
    "q74_above_seg_avg"      -> (Relational.aboveSegmentAverage _),
    "q75_string_agg"         -> (Relational.stringAgg _),
    "q76_histogram"          -> (Relational.histogram _),
    "q77_moving_avg"         -> (Relational.movingAverage _),
    "q78_value_windows"      -> (Relational.valueWindows _),
    "q20_tumbling_counts"    -> (EventOps.tumblingCounts _),
    "q21_sessionize"         -> (EventOps.sessionize _),
    "q71_session_window"     -> (EventOps.sessionWindowAgg _),
    "q22_json_extract"       -> (EventOps.jsonExtract _),
    "q23_latest_per_key"     -> (EventOps.latestPerUserType _),
    "q30_quality_score"      -> (TextOps.qualityScore _),
    "q31_lang_id"            -> (TextOps.langId _),
    "q32_token_count"        -> (TextOps.tokenCount _),
    "q33_fingerprint"        -> (TextOps.fingerprint _),
    "q34_dedup_exact"        -> (TextOps.dedupExact _),
    "q35_ngram_jaccard"      -> (TextOps.ngramJaccardPairs _),
    "q36_minhash_lsh"        -> (TextOps.minhashLshPairs _),
    "q37_simhash_pairs"      -> (TextOps.simhashPairs _),
    "q38_dedup_corpus"       -> (TextOps.dedupCorpus _),
    "q111_incremental_dedup" -> (TextOps.incrementalDedup _),
    "q112_stream_admission"  -> (graft.streaming.DocsStream.streamingAdmission _),
    "q113_source_cap"        -> (TextOps.sourceCap _),
    "q114_sequence_pack"     -> (TextOps.sequencePack _),
    "q115_temperature_mix"   -> (TextOps.temperatureMix _),
    "q116_kmeans_step"       -> (SimilarityOps.kmeansStep _),
    "q117_quality_dedup"     -> (TextOps.qualityDedup _),
    "q118_kmeans_train"      -> (SimilarityOps.kmeansTrain _),
    "q119_stream_left_join"  -> (EventsStream.streamStreamLeftJoin _),
    "q120_rate_anomalies"    -> (Analytics.rateAnomalies _),
    "q121_countmin_audit"    -> (Analytics.countMinAudit _),
    "q122_hist_quantiles"    -> (Relational.histogramQuantiles _),
    "q123_stream_session_window" -> (EventsStream.streamingSessionWindow _),
    "q124_cdc_dedup"         -> (TextOps.cdcChunkDedup _),
    "q125_pq_recall"         -> (SimilarityOps.pqRecall _),
    "q126_semantic_dedup"    -> (SimilarityOps.semanticDedup _),
    "q127_bpe_pairs"         -> (TextOps.bpePairCounts _),
    "q128_dsir_select"       -> (TextOps.dsirSelect _),
    "q129_substr_dedup"      -> (TextOps.exactSubstrSpans _),
    "q130_sketch_rollup"     -> (Analytics.sketchRollup _),
    "q131_stream_kmv"        -> (EventsStream.streamingKmvDistinct _),
    "q132_stream_kmv_update" -> (EventsStream.streamingKmvUpdate _),
    "q133_media_neardup"     -> (Multimodal.mediaNearDup _),
    "q134_bpe_train"         -> (TextOps.bpeTrain _),
    "q135_bpe_encode"        -> (TextOps.bpeEncode _),
    "q136_media_dup_groups"  -> (Multimodal.mediaDupGroups _),
    "q137_source_overlap"    -> (Analytics.sourceOverlapKmv _),
    "q138_pagerank"          -> (Analytics.pageRank _),
    "q139_lexical_retrieval" -> (TextOps.lexicalRetrieval _),
    "q140_holt_forecast"     -> (Analytics.holtForecast _),
    "q141_table_profile"     -> (Analytics.tableProfile _),
    "q142_hybrid_retrieval"  -> (SimilarityOps.hybridRetrieval _),
    "q143_neardup_decontaminate" -> (TextOps.neardupDecontaminate _),
    "q144_ivfpq_ann"         -> (SimilarityOps.ivfPqAnn _),
    "q145_stream_topk"       -> (EventsStream.streamingTopK _),
    "q146_embedding_drift"   -> (SimilarityOps.embeddingDrift _),
    "q147_quality_classifier" -> (TextOps.qualityClassifier _),
    "q148_unicode_normalize" -> (TextOps.unicodeNormalize _),
    "q149_domain_filter" -> (TextOps.domainFilter _),
    "q150_cluster_split" -> (TextOps.clusterSafeSplit _),
    "q151_boilerplate_lines" -> (TextOps.boilerplateRemoval _),
    "q152_index_maintenance" -> (SimilarityOps.indexMaintenance _),
    "q153_classifier_train"  -> (TextOps.classifierTrain _),
    "q154_snapshot_diff"     -> (TextOps.snapshotDiff _),
    "q155_html_extract"      -> (TextOps.htmlMainContent _),
    "q156_incremental_reprocess" -> (TextOps.incrementalReprocess _),
    "q157_audio_features"    -> (Multimodal.audioFeatures _),
    "q158_hot_shingle_index" -> (TextOps.hotShingleIndex _),
    "q159_incremental_neardup" -> (TextOps.incrementalNearDedup _),
    "q160_url_dedup"         -> (TextOps.urlDedup _),
    "q161_docx_template"     -> (Letter.templateInventory _),
    "q162_stream_neardedup"  -> (graft.streaming.DocsStream.streamingIncrementalNearDedup _),
    "q163_docx_roundtrip"    -> (Letter.docxRoundTrip _),
    "q39_embedding_dedup"    -> (SimilarityOps.embeddingDedup _),
    "q40_cosine_topk"        -> (SimilarityOps.cosineTopK _),
    "q41_lsh_neardup"        -> (SimilarityOps.lshNearDupPairs _),
    "q42_ann_bucket"         -> (SimilarityOps.annBucketSearch _),
    "q55_ivf_ann"            -> (SimilarityOps.ivfAnn _),
    "q48_sliding_counts"     -> (EventOps.slidingCounts _),
    "q49_window_breadth"     -> (Relational.windowBreadth _),
    "q54_string_breadth"     -> (Relational.stringBreadth _),
    "q50_stream_tumbling"    -> (EventsStream.streamingTumbling _),
    "q108_stream_append"     -> (EventsStream.streamingTumblingAppend _),
    "q80_stream_sliding"     -> (EventsStream.streamingSliding _),
    "q110_stream_sliding_append" -> (EventsStream.streamingSlidingAppend _),
    "q56_stream_enrich"      -> (EventsStream.streamStaticEnrich _),
    "q58_stream_join"        -> (EventsStream.streamStreamJoin _),
    "q59_scrub_pii"          -> (TextOps.scrubPii _),
    "q60_repetition_stats"   -> (TextOps.repetitionStats _),
    "q61_corpus_mix"         -> (TextOps.corpusMix _),
    "q62_dedup_clusters"     -> (TextOps.dedupClusters _),
    "q68_holdout_split"      -> (TextOps.holdoutSplit _),
    "q63_label_centroids"    -> (SimilarityOps.labelCentroids _),
    "q51_media_metadata"     -> (Multimodal.mediaMetadata _),
    "q52_media_features"     -> (Multimodal.mediaFeatures _),
    "q53_frame_sample"       -> (Multimodal.frameSample _),
    "q67_media_embed_knn"    -> (Multimodal.mediaEmbedKnn _),
    "q81_stream_sessions"    -> (EventsStream.streamingSessionize _),
    "q82_stat_moments"       -> (Analytics.statMoments _),
    "q83_ntile_deciles"      -> (Analytics.ntileDeciles _),
    "q84_funnel"             -> (Analytics.funnel _),
    "q85_cohort_retention"   -> (Analytics.cohortRetention _),
    "q86_order_streaks"      -> (Analytics.orderStreaks _),
    "q87_tfidf_terms"        -> (TextOps.tfidfTerms _),
    "q88_vocab_growth"       -> (TextOps.vocabGrowth _),
    "q89_collocations"       -> (TextOps.collocations _),
    "q90_chunk_dedup"        -> (Multimodal.chunkDedup _),
    "q91_quantized_recall"   -> (SimilarityOps.quantizedRecall _),
    "q92_stratified_sample"  -> (TextOps.stratifiedSample _),
    "q93_skew_profile"       -> (Analytics.skewProfile _),
    "q94_peak_hour"          -> (Analytics.peakHour _),
    "q95_lm_quality"         -> (TextOps.lmQuality _),
    "q96_centroid_sim"       -> (SimilarityOps.centroidSimilarity _),
    "q97_reconcile"          -> (Analytics.activityReconcile _),
    "q98_multiset_ops"       -> (Analytics.multisetOps _),
    "q99_xpath_extract"      -> (graft.sources.ParcelLookup.xpathExtract _),
    "q100_csv_parse"         -> (Relational.csvParse _),
    "q101_corpus_pipeline"   -> (TextOps.corpusPipeline _),
    "q102_minhash_capped"    -> (TextOps.minhashCapped _),
    "q103_uniform_sample"    -> (TextOps.uniformSampleK _),
    "q104_decontaminate"     -> (TextOps.decontaminate _),
    "q105_passage_dedup"     -> (TextOps.passageDedup _),
    "q106_scd2_dimension"    -> (Relational.scd2Dimension _),
    "q107_fuzzy_match"       -> (Relational.fuzzyMatch _),
  )

  // ---- DuckDB fragments mirroring graft.functions.Formatters exactly ----

  /** The letter-pipeline request plane (Letter.requests) as a DuckDB CTE. */
  private val ReqCte: String =
    """WITH requests AS (
      |  SELECT o_orderkey AS request_id,
      |         o_custkey AS cust_id,
      |         strftime(o_orderdate, '%Y-%m-%d') AS report_date,
      |         CASE WHEN o_orderkey % 17 = 0 THEN 'not-a-number'
      |              ELSE CAST(CAST(floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)) AS VARCHAR) END AS fee,
      |         CAST((o_orderkey % 5) * 20 AS VARCHAR) AS due_signing,
      |         CAST((CASE WHEN o_orderkey % 13 = 0 THEN 101 ELSE 100 END) - (o_orderkey % 5) * 20 AS VARCHAR) AS due_completion,
      |         'Parcel ' || CAST(o_orderkey % 1000 AS VARCHAR) AS property_under_appraisal
      |  FROM orders)""".stripMargin

  /** `_format_percent` (truncating; DuckDB double→int cast rounds, so trunc). */
  private def pctSql(x: String): String =
    s"CASE WHEN try_cast($x AS DOUBLE) IS NOT NULL THEN " +
    s"CAST(CAST(trunc(try_cast($x AS DOUBLE)) AS BIGINT) AS VARCHAR) || '%' ELSE '' END"

  /** `_format_currency` — same decomposition as Formatters.formatCurrency. */
  private def curSql(x: String): String = {
    val d = s"try_cast($x AS DOUBLE)"
    val r = s"(floor(($d) * 1e2 + 0.5) / 1e2)"
    val ip = s"CAST(trunc($r) AS BIGINT)"
    val cents = s"CAST(floor(abs($r - trunc($r)) * 100 + 0.5) AS BIGINT)"
    s"CASE WHEN $d IS NULL THEN '' " +
    s"WHEN $d = trunc($d) THEN '$$' || format('{:,}', $ip) " +
    s"ELSE '$$' || format('{:,}', $ip) || '.' || lpad(CAST($cents AS VARCHAR), 2, '0') END"
  }

  /** `_format_date` ('Month DD, YYYY', today-fallback). */
  private def dateSql(x: String): String =
    s"strftime(coalesce(try_cast($x AS DATE), current_date), '%B %d, %Y')"

  private val ValidPred: String =
    """try_cast(fee AS DOUBLE) IS NOT NULL AND try_cast(fee AS DOUBLE) > 0
      |  AND try_cast(due_signing AS DOUBLE) IS NOT NULL AND try_cast(due_signing AS DOUBLE) >= 0
      |  AND try_cast(due_completion AS DOUBLE) IS NOT NULL AND try_cast(due_completion AS DOUBLE) >= 0
      |  AND try_cast(due_signing AS DOUBLE) + try_cast(due_completion AS DOUBLE) = 100.0""".stripMargin

  // ---- text-operator fragments (mirror graft.operators.TextOps) ----

  private def sqlList(xs: Seq[String]): String = xs.mkString("['", "', '", "']")
  private val StopEnSqlList = sqlList(Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"))
  private val StopEsSqlList = sqlList(Seq("el", "la", "de", "y", "en", "que", "los", "un", "por", "con"))
  private val StopDeSqlList = sqlList(Seq("der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "im"))

  /** Distinct (doc_id, shingle-hash) rows — TextOps.shingleRows in DuckDB. */
  private val ShingleCtes: String =
    s"""WITH tok AS (SELECT doc_id, ${PortableHash.tokensSql("text")} AS w FROM documents),
       |shl AS (SELECT doc_id, ${PortableHash.shinglesSql("w")} AS shs FROM tok),
       |shr AS (SELECT DISTINCT doc_id, ${PortableHash.h48Sql("s")} % ${PortableHash.M31} AS shash
       |        FROM (SELECT doc_id, unnest(shs) AS s FROM shl) u)""".stripMargin

  /** MinHash signature → band rows (shared prefix of q36/q38/q111). */
  private val MinhashBandsCtes: String =
    s"""$ShingleCtes
       |, hsl AS (SELECT doc_id, list(DISTINCT shash) AS hs FROM shr GROUP BY doc_id),
       |sig AS (SELECT doc_id, hs,
       |  [list_min([${PortableHash.permutedSql("j", "h")} for h in hs]) for j in generate_series(0, 63)] AS sg
       |FROM hsl),
       |bands AS (SELECT doc_id, bi,
       |  array_to_string([CAST(sg[bi * 4 + k + 1] AS VARCHAR) for k in generate_series(0, 3)], ':') AS band_sig
       |FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bi) g)""".stripMargin

  /** MinHash signature → bands → verified candidate pairs (TextOps
    * minhashLshPairs) as DuckDB CTEs, shared by q36/q38. */
  private val MinhashCtes: String =
    s"""$MinhashBandsCtes,
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.bi = y.bi AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
       |pairs AS (SELECT doc_a, doc_b,
       |  CAST(len(list_filter(ha.hs, h -> list_contains(hb.hs, h))) AS BIGINT) AS n_inter,
       |  CAST(len(ha.hs) AS BIGINT) + CAST(len(hb.hs) AS BIGINT) AS sz_sum
       |FROM cand JOIN hsl ha ON doc_a = ha.doc_id JOIN hsl hb ON doc_b = hb.doc_id)""".stripMargin

  /** q36/q38's pair CTEs rendered for the df cap the engine RUN actually
    * used (TextOps.dfCapUsed, recorded at plan-build time; ambient conf
    * when the query never ran — the q137/q152 discipline). Cap 0 is the
    * uncapped baseline; otherwise the q102 capped chain at that threshold,
    * with CTE names matching the uncapped chain so the q36/q38 SELECTs are
    * form-independent. */
  private def minhashPairsCtesForRun: String = {
    val cap = operators.TextOps.dfCapUsed.getOrElse(
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(operators.TextOps.resolvedDfCap)
        .getOrElse(operators.TextOps.DefaultDfCap))
    if (cap <= 0) MinhashCtes
    else s"""$ShingleCtes
       |, hot AS (SELECT shash FROM shr GROUP BY shash HAVING count(*) > $cap),
       |shc AS (SELECT doc_id, shash FROM shr
       |        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.shash = shr.shash)),
       |hsl AS (SELECT doc_id, list(DISTINCT shash) AS hs FROM shc GROUP BY doc_id),
       |sig AS (SELECT doc_id, hs,
       |  [list_min([${PortableHash.permutedSql("j", "h")} for h in hs]) for j in generate_series(0, 63)] AS sg
       |FROM hsl),
       |bands AS (SELECT doc_id, bi,
       |  array_to_string([CAST(sg[bi * 4 + k + 1] AS VARCHAR) for k in generate_series(0, 3)], ':') AS band_sig
       |FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bi) g),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.bi = y.bi AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
       |pairs AS (SELECT doc_a, doc_b,
       |  CAST(len(list_filter(ha.hs, h -> list_contains(hb.hs, h))) AS BIGINT) AS n_inter,
       |  CAST(len(ha.hs) AS BIGINT) + CAST(len(hb.hs) AS BIGINT) AS sz_sum
       |FROM cand JOIN hsl ha ON doc_a = ha.doc_id JOIN hsl hb ON doc_b = hb.doc_id)""".stripMargin
  }

  /** SimHash fingerprint → bands → candidate pairs (TextOps.simhashPairs) as
    * a DuckDB CTE body (no WITH keyword so q62 can prefix WITH RECURSIVE);
    * shared by q37/q62. */
  private val SimhashCteBody: String =
    s"""th AS (SELECT doc_id,
       |  list_distinct(list_transform(${PortableHash.tokensSql("text")}, t -> ${PortableHash.h48Sql("t")})) AS ths
       |FROM documents),
       |sim AS (SELECT doc_id,
       |  CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END for h in ths]) >= 0
       |                      THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END
       |                 for i in generate_series(0, 47)]) AS BIGINT) AS simhash
       |FROM th),
       |banded AS (SELECT doc_id, simhash, bi, (simhash >> (bi * 12)) & 4095 AS band_val
       |           FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bi) g),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |                x.simhash AS sim_a, y.simhash AS sim_b
       |         FROM banded x JOIN banded y
       |           ON x.bi = y.bi AND x.band_val = y.band_val AND x.doc_id < y.doc_id)""".stripMargin

  /** q134/q135's shared BPE training chain (q118's unrolled-CTE pattern):
    * one (pairs → argmax → re-segment) block per merge round, carrying
    * `word` through so the encode oracle can read the final vocabulary;
    * the re-segmentation list_reduce is the string-accumulator fold twin
    * of the Spark `aggregate()`. */
  private def bpeChainSql: String = {
    val iters = (1 to operators.TextOps.BpeMerges).map { k =>
      val prev = s"w${k - 1}"
      s"""x$k AS (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM $prev),
         |p$k AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |        FROM x$k GROUP BY 1, 2),
         |m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |w$k AS (SELECT word, freq,
         |    string_split(substr(list_reduce(list_prepend('', syms),
         |      (acc, x) -> CASE WHEN ends_with(acc, chr(1) || m.l) AND x = m.r
         |        THEN substr(acc, 1, length(acc) - length(m.l) - 1) || chr(1) || m.l || m.r
         |        ELSE acc || chr(1) || x END), 2), chr(1)) AS syms
         |  FROM $prev, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""t AS (SELECT unnest(${PortableHash.tokensSql("lower(text)")}) AS word FROM documents),
       |wf AS (SELECT word, count(*) AS freq FROM t WHERE length(word) >= 1 GROUP BY word),
       |w0 AS (SELECT word, CAST(freq AS BIGINT) AS freq,
       |         list_append(string_split(word, ''), '</w>') AS syms FROM wf),
       |$iters""".stripMargin
  }

  /** q133/q136's shared media-fingerprint CTEs: stub feature vectors →
    * sign-LSH phash → distinct-value banding with the session-resolved
    * hot-bucket cap → verified value pairs (`vp`) → doc-pair expansions
    * (`cp` cross-value, `ip` hamming-0). */
  /** DuckDB twin of the PpmCodec fixture + decode: per-(doc, frame, row)
    * pixel-luminance sums recomputed from the md5-derived raster bytes
    * (PpmCodec.encodeFixture mirrored in SQL — each md5 digest's 16 bytes
    * recovered from its hex rendering, BT.601 integer weights by byte
    * position). `frame0Only` limits the frame expansion for the consumers
    * that read only the first frame (phash, embedding). */
  private def mediaRowLumCtes(frame0Only: Boolean): String = {
    def hx(c: String) =
      s"(ascii($c) - 48 - CASE WHEN ascii($c) >= 97 THEN 39 ELSE 0 END)"
    val fExpr =
      if (frame0Only) "0 AS f" else "unnest(generate_series(0, nf - 1)) AS f"
    s"""md AS (SELECT doc_id, text,
       |  CAST(16 AS BIGINT) AS h,
       |  GREATEST(CAST(1 AS BIGINT), CAST(ceil(length(text) / 16.0) AS BIGINT)) AS cl,
       |  1 + ${PortableHash.h48Sql("text")} % 30 AS nf FROM documents),
       |mfr AS (SELECT doc_id, text, h, cl, nf, $fExpr FROM md),
       |mrw AS (SELECT doc_id, text, h, cl, nf, f,
       |    unnest(generate_series(0, h - 1)) AS r FROM mfr),
       |msl AS (SELECT doc_id, h, nf, f, r, j,
       |    md5(substr(text, CAST(r * cl + 1 AS INT), CAST(cl AS INT)) ||
       |        ':' || f || ':' || r || ':' || j) AS hxs
       |  FROM mrw CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) gj),
       |mbt AS (SELECT doc_id, h, nf, f, r, j * 16 + o AS i,
       |    CAST(${hx("substr(hxs, 2*o+1, 1)")} * 16 + ${hx("substr(hxs, 2*o+2, 1)")} AS BIGINT) AS bv
       |  FROM msl CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS o) go),
       |mrl AS (SELECT doc_id, h, nf, f, r,
       |    CAST(SUM((CASE i % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) * bv) AS BIGINT) AS lum
       |  FROM mbt GROUP BY 1, 2, 3, 4, 5)""".stripMargin
  }

  /** The 48-bit row-profile phash CTE (PpmCodec.phashOf's twin): 3
    * threshold bits per frame-0 row, interleaved band layout
    * (r % 4)·12 + (r ∕ 4)·3 + k. Emits `ph(doc_id, phash)`. */
  private def mediaPhashCte: String = {
    import graft.multimodal.PpmCodec.{RowLumTauLo, RowLumTauMid, RowLumTauHi}
    def bit(tau: Long, k: Int) =
      s"CASE WHEN lum > $tau THEN CAST(1 AS BIGINT) << " +
      s"CAST((r % 4) * 12 + (r // 4) * 3 + $k AS INT) ELSE 0 END"
    s"""ph AS (SELECT doc_id, CAST(SUM(
       |    ${bit(RowLumTauLo, 0)}
       |  + ${bit(RowLumTauMid, 1)}
       |  + ${bit(RowLumTauHi, 2)}) AS BIGINT) AS phash
       |  FROM mrl WHERE f = 0 AND r < ${graft.multimodal.PpmCodec.PhashRows}
       |  GROUP BY doc_id)""".stripMargin
  }

  private def mediaPairsCteSql: String = {
    import graft.multimodal.Multimodal.{MediaBands, MediaBandBits, MediaMaxHamming}
    // session-resolved cap (the bandsCteSql pattern): the oracle twin must
    // track a conf'd run instead of silently comparing different semantics
    val mediaCap = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(graft.multimodal.Multimodal.resolvedMediaCap)
      .getOrElse(graft.multimodal.Multimodal.MediaMaxBucket)
    s"""${mediaRowLumCtes(frame0Only = true)},
       |$mediaPhashCte,
       |dv AS (SELECT DISTINCT phash FROM ph),
       |bands AS (SELECT phash, band_idx,
       |    CAST((phash >> (band_idx * $MediaBandBits)) & ${(1 << MediaBandBits) - 1} AS BIGINT) AS band_val
       |  FROM dv CROSS JOIN (SELECT unnest(generate_series(0, ${MediaBands - 1})) AS band_idx) g),
       |bsz AS (SELECT band_idx, band_val, count(*) AS bdf FROM bands GROUP BY 1, 2),
       |vp AS (SELECT DISTINCT x.phash AS pa, y.phash AS pb
       |  FROM bands x JOIN bands y
       |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.phash < y.phash
       |  JOIN bsz s ON s.band_idx = x.band_idx AND s.band_val = x.band_val
       |  WHERE s.bdf <= $mediaCap
       |    AND bit_count(xor(x.phash, y.phash)) <= $MediaMaxHamming),
       |cp AS (SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b,
       |    CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
       |  FROM vp JOIN ph a ON a.phash = vp.pa JOIN ph b ON b.phash = vp.pb),
       |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
       |  FROM ph a JOIN ph b ON a.phash = b.phash AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** The q134 merge-list projection over [[bpeChainSql]]'s m1..mN rows. */
  private def bpeMergesSql: String =
    (1 to operators.TextOps.BpeMerges).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, l AS left_sym, r AS right_sym, cnt AS pair_count FROM m$k")
      .mkString("\nUNION ALL ")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate ops (HLL) → driver
    * records a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q09_format_percent" ->
      s"""$ReqCte
         |SELECT request_id, fee,
         |  ${pctSql("fee")} AS fee_pct,
         |  ${pctSql("due_signing")} AS signing_pct
         |FROM requests ORDER BY request_id""".stripMargin,
    "q10_format_currency" ->
      s"""$ReqCte
         |SELECT request_id, fee, ${curSql("fee")} AS fee_usd
         |FROM requests ORDER BY request_id""".stripMargin,
    "q11_filename_ops" ->
      """SELECT c_custkey,
        |  'Engagement_Letter_' || translate(c_name, ' /', '__') || '.pdf' AS pdf_name,
        |  (string_split('reports/2024/' || c_name, '/'))[-1] AS base,
        |  regexp_extract('attachment; filename="' || c_name || '.pdf"', 'filename="?([^"]+)"?', 1) AS header_name,
        |  regexp_replace(c_name, '[^0-9.]', '', 'g') AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q12_validation_summary" ->
      s"""$ReqCte
         |SELECT channel, count(*) AS n FROM (
         |  SELECT CASE
         |    WHEN try_cast(fee AS DOUBLE) IS NULL THEN 'bad_fee'
         |    WHEN NOT (try_cast(fee AS DOUBLE) > 0) THEN 'nonpositive_fee'
         |    WHEN try_cast(due_signing AS DOUBLE) IS NULL OR try_cast(due_completion AS DOUBLE) IS NULL THEN 'bad_percent'
         |    WHEN try_cast(due_signing AS DOUBLE) < 0 OR try_cast(due_completion AS DOUBLE) < 0 THEN 'negative_percent'
         |    WHEN try_cast(due_signing AS DOUBLE) + try_cast(due_completion AS DOUBLE) <> 100.0 THEN 'sum_not_100'
         |    ELSE 'valid' END AS channel
         |  FROM requests) t
         |GROUP BY channel ORDER BY channel""".stripMargin,
    "q13_letter_pipeline" ->
      s"""$ReqCte,
         |valid AS (SELECT * FROM requests WHERE $ValidPred),
         |joined AS (SELECT v.*, c.c_name FROM valid v JOIN customer c ON v.cust_id = c.c_custkey),
         |fmt AS (SELECT request_id,
         |  ${dateSql("report_date")} AS letter_date,
         |  c_name AS client_name,
         |  ${curSql("fee")} AS fee_formatted,
         |  ${pctSql("due_signing")} AS due_signing_pct,
         |  ${pctSql("due_completion")} AS due_completion_pct,
         |  'Engagement_Letter_' || translate(c_name, ' /', '__') || '.pdf' AS pdf_filename
         |FROM joined)
         |SELECT *,
         |  'Date: ' || letter_date
         |  || chr(10) || 'Client: ' || client_name
         |  || chr(10) || 'Address: Segment ' || due_signing_pct
         |  || chr(10) || 'Property under appraisal: ' || pdf_filename
         |  || chr(10) || 'Parcel ID: ' || CAST(request_id AS VARCHAR)
         |  || chr(10) || 'Fee: ' || fee_formatted
         |  || chr(10) || 'Due at signing: ' || due_signing_pct
         |  || chr(10) || 'Due at completion: ' || due_completion_pct
         |  || chr(10) || 'Initials: __ __ __' || chr(10) || 'Signature: ' AS letter_text
         |FROM fmt ORDER BY request_id""".stripMargin,
    "q24_asof_join" ->
      """WITH ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |             FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        |  o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q25_range_join" ->
      """WITH ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |             FROM orders GROUP BY 1, 2),
        |reb AS (SELECT o_custkey, o_orderkey,
        |          TIMESTAMP '2024-01-01 00:00:00'
        |            + (o_orderkey % 28) * INTERVAL 1 DAY
        |            + (o_custkey % 24) * INTERVAL 1 HOUR AS o_ts
        |        FROM ord)
        |SELECT o_custkey, o_orderkey, o_ts,
        |  count(*) AS n_events_next_day, round(sum(value), 2) AS sum_value
        |FROM reb o JOIN events e
        |  ON o.o_custkey = e.user_id
        | AND e.ts >= o.o_ts AND e.ts < o.o_ts + INTERVAL 1 DAY
        |GROUP BY 1, 2, 3 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q26_cube_pricing" ->
      """SELECT l_returnflag, o_orderpriority,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, o_orderpriority) AS BIGINT) AS gid
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY CUBE(l_returnflag, o_orderpriority)
        |ORDER BY gid, l_returnflag, o_orderpriority""".stripMargin,
    "q64_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q65_array_ops" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |    list_sort(list(l_linenumber)) AS lines,
        |    list(CAST(trunc(l_quantity) AS BIGINT)) AS qtys
        |  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(lines) AS INT) AS n_lines,
        |  array_to_string(lines[1:3], ',') AS first3,
        |  CAST(len(list_distinct(qtys)) AS INT) AS n_distinct_qty,
        |  list_contains(lines, 7) AS has_line7,
        |  lines[-1] AS max_line
        |FROM g ORDER BY l_orderkey""".stripMargin,
    "q66_map_ops" ->
      """SELECT user_id,
        |  CAST(count(DISTINCT event_type) AS INT) AS n_types,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q27_percentiles" ->
      """SELECT l_returnflag,
        |  floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
        |  floor((quantile_cont(l_extendedprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90,
        |  floor((min(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS p_min,
        |  floor((max(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS p_max
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q28_json_roundtrip" ->
      """SELECT o_orderkey,
        |  (o_orderkey % 11 <> 0) AS ok,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS rt_status,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS rt_priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q29_explode_geo" ->
      """WITH grouped AS (
        |  SELECT n_regionkey, list(n_name ORDER BY n_name) AS nations
        |  FROM nation GROUP BY n_regionkey),
        |exploded AS (
        |  SELECT r_name AS region_name, unnest(nations) AS nation_name
        |  FROM grouped JOIN region ON n_regionkey = r_regionkey)
        |SELECT region_name,
        |  CAST(row_number() OVER (PARTITION BY region_name ORDER BY nation_name) - 1 AS BIGINT) AS pos,
        |  nation_name
        |FROM exploded ORDER BY region_name, pos""".stripMargin,
    "q47_salted_agg" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q58_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, buy_id""".stripMargin,
    "q120_rate_anomalies" ->
      s"""WITH h AS (SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |            count(*) AS n,
         |            epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr
         |          FROM events GROUP BY 1, 2, 4),
         |w AS (SELECT event_type, hour_start, n,
         |        count(n) OVER win AS m,
         |        CAST(sum(n) OVER win AS BIGINT) AS s1,
         |        CAST(sum(n * n) OVER win AS BIGINT) AS s2
         |      FROM h
         |      WINDOW win AS (PARTITION BY event_type ORDER BY hr
         |        RANGE BETWEEN ${Analytics.AnomalyHistory} PRECEDING AND 1 PRECEDING)),
         |v AS (SELECT event_type, hour_start, n,
         |        CAST(s1 AS DOUBLE) / m AS mean,
         |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / m)
         |          / (m - 1.0) AS var
         |      FROM w WHERE m >= ${Analytics.AnomalyMinHistory})
         |SELECT event_type, hour_start, n,
         |  ${PortableHash.proundSql("mean", 6)} AS trailing_mean,
         |  CASE WHEN var > 0 THEN ${PortableHash.proundSql("(n - mean) / sqrt(var)", 6)}
         |       END AS z,
         |  CASE WHEN var > 0
         |       THEN abs(${PortableHash.proundSql("(n - mean) / sqrt(var)", 6)}) > 3.0
         |       ELSE false END AS anomaly
         |FROM v ORDER BY event_type, hour_start""".stripMargin,
    "q121_countmin_audit" ->
      s"""WITH ev AS (SELECT user_id FROM events),
         |ds AS (SELECT unnest(generate_series(0, ${Analytics.CmDepth - 1})) AS d),
         |keyed AS (SELECT d,
         |    ${PortableHash.h48Sql(
               "'cm' || CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
         |      % ${Analytics.CmWidth} AS bucket
         |  FROM ev CROSS JOIN ds),
         |cells AS (SELECT d, bucket, count(*) AS cell FROM keyed GROUP BY 1, 2),
         |hh AS (SELECT user_id, exact_n,
         |         CAST(row_number() OVER (ORDER BY exact_n DESC, user_id) AS BIGINT)
         |           AS hh_rank
         |       FROM (SELECT user_id, count(*) AS exact_n FROM ev GROUP BY 1)),
         |probes AS (SELECT hh_rank, user_id, exact_n, d,
         |    ${PortableHash.h48Sql(
               "'cm' || CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
         |      % ${Analytics.CmWidth} AS bucket
         |  FROM hh CROSS JOIN ds WHERE hh_rank <= ${Analytics.CmTopK})
         |SELECT hh_rank, user_id, exact_n,
         |  CAST(min(cell) AS BIGINT) AS est,
         |  CAST(min(cell) - exact_n AS BIGINT) AS overestimate
         |FROM probes JOIN cells USING (d, bucket)
         |GROUP BY hh_rank, user_id, exact_n
         |ORDER BY hh_rank""".stripMargin,
    "q124_cdc_dedup" -> {
      val pw = graft.functions.CdcChunkHashes.PowMod.mkString("[", ", ", "]")
      val w = graft.functions.CdcChunkHashes.Window
      val dv = graft.functions.CdcChunkHashes.Divisor
      s"""WITH d AS (SELECT doc_id,
         |             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS s
         |           FROM documents),
         |c1 AS (SELECT doc_id, s, length(s) AS n,
         |         CASE WHEN length(s) = 0 THEN CAST([] AS BIGINT[])
         |              ELSE list_prepend(CAST(0 AS BIGINT), list_append(
         |                [CAST(i AS BIGINT) FOR i IN generate_series($w, length(s) - 1)
         |                   IF list_sum([CAST(ascii(s[i - j]) AS BIGINT) * ($pw)[j + 1]
         |                                FOR j IN generate_series(0, ${w - 1})])
         |                      % ${PortableHash.MFp} % $dv = 0],
         |                CAST(length(s) AS BIGINT))) END AS cp
         |       FROM d),
         |ch AS (SELECT doc_id, unnest(CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
         |         ELSE [${PortableHash.polyFingerprintSql(
                      "substr(s, CAST(cp[k] AS INTEGER) + 1, " +
                      "CAST(cp[k + 1] - cp[k] AS INTEGER))")}
         |               FOR k IN generate_series(1, len(cp) - 1)] END) AS h
         |       FROM c1),
         |cnt AS (SELECT h, count(*) AS c FROM ch GROUP BY h),
         |per AS (SELECT doc_id, count(*) AS n_chunks,
         |          CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |        FROM ch JOIN cnt USING (h) GROUP BY doc_id)
         |SELECT dd.doc_id, coalesce(n_chunks, 0) AS n_chunks,
         |  coalesce(n_shared, 0) AS n_shared,
         |  CASE WHEN coalesce(n_chunks, 0) > 0
         |       THEN ${PortableHash.proundSql(
                    "CAST(n_shared AS DOUBLE) / CAST(n_chunks AS DOUBLE)", 4)}
         |       END AS shared_ratio
         |FROM (SELECT doc_id FROM documents) dd LEFT JOIN per USING (doc_id)
         |ORDER BY dd.doc_id""".stripMargin
    },
    "q122_hist_quantiles" ->
      s"""WITH li AS (SELECT l_extendedprice AS x, l_orderkey, l_linenumber FROM lineitem),
         |ext AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM li),
         |b AS (SELECT least(${Relational.QuantileBuckets - 1}, CAST(floor((x - lo) /
         |        ((hi - lo) / ${Relational.QuantileBuckets}.0)) AS BIGINT)) AS bucket
         |      FROM li, ext),
         |hist AS (SELECT bucket, count(*) AS bn FROM b GROUP BY 1),
         |cum AS (SELECT bucket, CAST(sum(bn) OVER (ORDER BY bucket
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM hist),
         |ks AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS k
         |       FROM (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
         |                            CAST(0.99 AS DOUBLE)]) AS q), ext),
         |est AS (SELECT k.q, k.k, min(c.bucket) AS bucket
         |        FROM ks k JOIN cum c ON c.cum >= k.k GROUP BY k.q, k.k),
         |inb AS (SELECT e.q, e.bucket, e.k - (c.cum - h.bn) AS r
         |        FROM est e JOIN cum c ON e.bucket = c.bucket
         |                   JOIN hist h ON e.bucket = h.bucket),
         |bx AS (SELECT x, l_orderkey, l_linenumber,
         |         least(${Relational.QuantileBuckets - 1}, CAST(floor((x - lo) /
         |           ((hi - lo) / ${Relational.QuantileBuckets}.0)) AS BIGINT)) AS bucket
         |       FROM li, ext),
         |ranked AS (SELECT i.q, bx.x, i.r,
         |             CAST(row_number() OVER (PARTITION BY i.q
         |               ORDER BY bx.x, bx.l_orderkey, bx.l_linenumber) AS BIGINT) AS rn
         |           FROM bx JOIN inb i USING (bucket)),
         |ex AS (SELECT q, x AS exact_val FROM ranked WHERE rn = r)
         |SELECT e.q,
         |  ${PortableHash.proundSql(
             s"lo + e.bucket * ((hi - lo) / ${Relational.QuantileBuckets}.0)", 4)} AS est_p,
         |  ${PortableHash.proundSql("exact_val", 4)} AS exact_p,
         |  least(${Relational.QuantileBuckets - 1}, CAST(floor((exact_val - lo) /
         |    ((hi - lo) / ${Relational.QuantileBuckets}.0)) AS BIGINT)) = e.bucket
         |    AS within_bucket,
         |  n
         |FROM est e JOIN ex USING (q), ext ORDER BY e.q""".stripMargin,
    "q119_stream_left_join" ->
      """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT date_trunc('milliseconds',
        |         least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p)))
        |       - INTERVAL 1 HOUR AS w),
        |matched AS (
        |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id
        |  FROM c JOIN p ON c.user_id = p.user_id
        |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
        |unmatched AS (
        |  SELECT c.user_id, c.event_id AS click_id, CAST(NULL AS BIGINT) AS buy_id
        |  FROM c, wm
        |  WHERE c.ts + INTERVAL 30 MINUTE < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |                    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE))
        |SELECT user_id, click_id, buy_id FROM matched
        |UNION ALL SELECT user_id, click_id, buy_id FROM unmatched
        |ORDER BY click_id, buy_id NULLS FIRST""".stripMargin,
    "q57_salted_join" ->
      """SELECT event_id, user_id, event_type, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "q43_date_parts" ->
      """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue,
        |  count(DISTINCT month(o_orderdate)) AS n_months
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q44_math_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  round(ln(l_extendedprice + 1.0), 6) AS ln_price,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q7,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q7,
        |  l_orderkey % 97 AS mod97
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q45_null_functions" ->
      """SELECT c_custkey,
        |  coalesce(nullif(round(c_acctbal, 2), 0.0), -1.0) AS bal_or_default,
        |  greatest(round(c_acctbal, 2), 0.0) AS bal_floor0,
        |  least(round(c_acctbal, 2), 5000.0) AS bal_cap5k,
        |  (nullif(round(c_acctbal, 2), 0.0) IS NULL) AS was_zero
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q46_pivot_events" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q70_unpivot_events" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q72_date_spine" ->
      """WITH b AS (SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |daily AS (SELECT o_orderdate AS day, count(*) AS n,
        |                 round(sum(o_totalprice), 2) AS revenue
        |          FROM orders GROUP BY 1)
        |SELECT s.day, coalesce(d.n, 0) AS n_orders, coalesce(d.revenue, 0.0) AS revenue
        |FROM spine s LEFT JOIN daily d USING (day)
        |ORDER BY s.day""".stripMargin,
    "q73_share_of_total" ->
      """WITH g AS (SELECT l_returnflag, sum(l_extendedprice * (1.0 - l_discount)) AS rev
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, round(rev, 2) AS revenue,
        |  floor((rev / sum(rev) OVER ()) * 1e6 + 0.5) / 1e6 AS share
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q74_above_seg_avg" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |  floor(c_acctbal * 1e2 + 0.5) / 1e2 AS bal,
        |  floor(avg(c_acctbal) OVER (PARTITION BY c_mktsegment) * 1e2 + 0.5) / 1e2 AS seg_avg
        |FROM customer)
        |SELECT c_custkey, c_mktsegment, bal, seg_avg FROM t
        |WHERE bal > seg_avg ORDER BY c_custkey""".stripMargin,
    "q75_string_agg" ->
      """SELECT r_name AS region_name, count(*) AS n_nations,
        |  array_to_string(list_sort(list(n_name)), '|') AS nations_list
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region_name""".stripMargin,
    "q76_histogram" ->
      """WITH b AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer),
        |t AS (SELECT CAST(least(floor((c_acctbal - lo) / (hi - lo) * 10), 9) AS BIGINT) AS bucket
        |      FROM customer CROSS JOIN b)
        |SELECT bucket, count(*) AS n FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q77_moving_avg" ->
      """WITH b AS (SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |daily AS (SELECT o_orderdate AS day, count(*) AS n FROM orders GROUP BY 1),
        |series AS (SELECT s.day, coalesce(d.n, 0) AS n_orders,
        |                  CAST(epoch(CAST(s.day AS TIMESTAMP)) // 86400 AS BIGINT) AS epoch_day
        |           FROM spine s LEFT JOIN daily d USING (day))
        |SELECT day, n_orders,
        |  floor((avg(n_orders) OVER w) * 1e4 + 0.5) / 1e4 AS ma7,
        |  CAST(sum(n_orders) OVER w AS BIGINT) AS sum7
        |FROM series
        |WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q78_value_windows" ->
      """SELECT c_custkey, c_mktsegment,
        |  floor(c_acctbal * 1e2 + 0.5) / 1e2 AS bal,
        |  first_value(c_custkey) OVER w AS poorest_key,
        |  last_value(c_custkey) OVER w AS richest_key,
        |  nth_value(c_custkey, 2) OVER w AS second_key
        |FROM customer WHERE c_custkey <= 2000
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY floor(c_acctbal * 1e2 + 0.5) / 1e2, c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "q79_kmv_distinct" ->
      s"""WITH h AS (SELECT l_returnflag, l_partkey,
         |  ${PortableHash.h48Sql("CAST(l_partkey AS VARCHAR)")} AS hv FROM lineitem),
         |g AS (SELECT l_returnflag,
         |        list_sort(list_distinct(list(hv))) AS ks,
         |        count(DISTINCT l_partkey) AS exact_distinct
         |      FROM h GROUP BY 1)
         |SELECT l_returnflag,
         |  CASE WHEN len(ks) < 64 THEN CAST(len(ks) AS BIGINT)
         |       ELSE CAST((63 * 281474976710656) // ks[64] AS BIGINT) END AS kmv_est,
         |  exact_distinct
         |FROM g ORDER BY l_returnflag""".stripMargin,
    "q20_tumbling_counts" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q108_stream_append" ->
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTES AS w FROM events),
        |b AS (SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |        count(*) AS n, round(sum(value), 2) AS total_value
        |      FROM events GROUP BY 1, 2)
        |SELECT hour_start, event_type, n, total_value
        |FROM b CROSS JOIN wm
        |WHERE hour_start + INTERVAL 1 HOUR <= w
        |ORDER BY hour_start, event_type""".stripMargin,
    "q21_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q71_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "q123_stream_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |g AS (SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |        count(*) AS n_events
        |      FROM s GROUP BY user_id, sid),
        |wm AS (SELECT epoch_us(date_trunc('milliseconds', max(ts))) - 1800000000 AS w
        |       FROM events)
        |SELECT user_id, start_us, end_us, n_events FROM g, wm
        |WHERE end_us <= w
        |ORDER BY user_id, start_us""".stripMargin,
    "q22_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  count(CASE WHEN k IS NULL THEN 1 END) AS null_k
        |FROM (SELECT event_type, try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_latest_per_key" ->
      """SELECT user_id, event_type, ts AS last_ts, event_id AS last_event_id,
        |  floor((value) * 1e2 + 0.5) / 1e2 AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q30_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_m,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |  CAST(len(list_filter(w, x -> list_contains($StopEnSqlList, x))) AS BIGINT) AS n_stop
         |FROM t)
         |SELECT doc_id, n_tokens, n_chars_m, n_punct,
         |  floor(((n_stop * 1.0) / n_tokens) * 1e4 + 0.5) / 1e4 AS stopword_ratio,
         |  floor(((n_alpha * 1.0) / n_chars_m) * 1e4 + 0.5) / 1e4 AS alpha_ratio,
         |  floor(((n_punct * 1.0) / n_chars_m) * 1e4 + 0.5) / 1e4 AS punct_ratio,
         |  floor(((n_stop * 1.0) / n_tokens + ((n_alpha * 1.0) / n_chars_m) * 0.5 - ((n_punct * 1.0) / n_chars_m) * 2.0) * 1e4 + 0.5) / 1e4 AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,
    "q31_lang_id" ->
      s"""WITH t AS (SELECT doc_id, lang, ${PortableHash.tokensSql("lower(text)")} AS w FROM documents),
         |h AS (SELECT doc_id, lang AS labeled_lang,
         |  CAST(len(list_filter(w, x -> list_contains($StopEnSqlList, x))) AS BIGINT) AS hits_en,
         |  CAST(len(list_filter(w, x -> list_contains($StopEsSqlList, x))) AS BIGINT) AS hits_es,
         |  CAST(len(list_filter(w, x -> list_contains($StopDeSqlList, x))) AS BIGINT) AS hits_de
         |FROM t)
         |SELECT doc_id, labeled_lang, hits_en, hits_es, hits_de,
         |  CASE WHEN hits_en + hits_es + hits_de = 0 THEN 'und'
         |       WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
         |       WHEN hits_es >= hits_de THEN 'es' ELSE 'de' END AS predicted_lang
         |FROM h ORDER BY doc_id""".stripMargin,
    "q32_token_count" ->
      s"""WITH t AS (SELECT doc_id, text, ${PortableHash.tokensSql("text")} AS w FROM documents)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_ws_tokens,
         |  CAST(list_sum(list_transform(w, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_regex_pieces
         |FROM t ORDER BY doc_id""".stripMargin,
    "q33_fingerprint" ->
      s"""SELECT doc_id,
         |  ${PortableHash.polyFingerprintSql("regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')")} AS fp,
         |  substr(md5(text), 1, 16) AS md5_16
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_doc_id, count(*) AS n_copies,
        |  substr(content_md5, 1, 12) AS md5_12
        |FROM (SELECT doc_id, md5(text) AS content_md5 FROM documents) t
        |GROUP BY content_md5 ORDER BY keeper_doc_id""".stripMargin,
    "q35_ngram_jaccard" ->
      s"""$ShingleCtes
         |, sizes AS (SELECT doc_id, count(*) AS sz FROM shr GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |          FROM shr a JOIN shr b ON a.shash = b.shash AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, n_inter,
         |  sa.sz + sb.sz - n_inter AS n_union,
         |  floor(((n_inter * 1.0) / (sa.sz + sb.sz - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE n_inter * 3 >= sa.sz + sb.sz
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q36_minhash_lsh" ->
      s"""$minhashPairsCtesForRun
         |SELECT doc_a, doc_b, n_inter, sz_sum - n_inter AS n_union,
         |  floor(((n_inter * 1.0) / (sz_sum - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
         |FROM pairs
         |WHERE n_inter * 5 >= (sz_sum - n_inter) * 4
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q38_dedup_corpus" ->
      s"""$minhashPairsCtesForRun,
         |victims AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
         |            WHERE n_inter * 5 >= (sz_sum - n_inter) * 4)
         |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM victims v WHERE v.doc_id = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q111_incremental_dedup" ->
      s"""$MinhashBandsCtes,
         |xcand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
         |          FROM bands n JOIN bands c
         |            ON n.bi = c.bi AND n.band_sig = c.band_sig
         |           AND n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
         |xpairs AS (SELECT new_id, corpus_id,
         |  CAST(len(list_filter(hn.hs, h -> list_contains(hc.hs, h))) AS BIGINT) AS n_inter,
         |  CAST(len(hn.hs) AS BIGINT) + CAST(len(hc.hs) AS BIGINT) AS sz_sum
         |  FROM xcand JOIN hsl hn ON new_id = hn.doc_id JOIN hsl hc ON corpus_id = hc.doc_id),
         |near AS (SELECT new_id, min(corpus_id) AS near_match FROM xpairs
         |         WHERE n_inter * 5 >= (sz_sum - n_inter) * 4 GROUP BY new_id),
         |m5 AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
         |cm AS (SELECT content_md5, min(doc_id) AS exact_match FROM m5
         |       WHERE doc_id % 5 <> 0 GROUP BY content_md5),
         |ex AS (SELECT doc_id, exact_match FROM m5 LEFT JOIN cm USING (content_md5)
         |       WHERE doc_id % 5 = 0)
         |SELECT ex.doc_id,
         |  CASE WHEN ex.exact_match IS NOT NULL THEN 'exact'
         |       WHEN near.near_match IS NOT NULL THEN 'near'
         |       ELSE 'new' END AS verdict,
         |  coalesce(ex.exact_match, near.near_match) AS match_doc
         |FROM ex LEFT JOIN near ON ex.doc_id = near.new_id
         |ORDER BY ex.doc_id""".stripMargin,
    "q112_stream_admission" ->
      """WITH m5 AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
        |cm AS (SELECT content_md5, min(doc_id) AS exact_match FROM m5
        |       WHERE doc_id % 5 <> 0 GROUP BY content_md5)
        |SELECT doc_id,
        |  CASE WHEN exact_match IS NOT NULL THEN 'exact' ELSE 'new' END AS verdict,
        |  exact_match AS match_doc
        |FROM m5 LEFT JOIN cm USING (content_md5)
        |WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,
    "q113_source_cap" ->
      s"""WITH k AS (SELECT doc_id, source, n_chars,
         |  ${PortableHash.h48Sql("text || ':cap'")} AS pick_key
         |FROM documents),
         |r AS (SELECT *, CAST(row_number() OVER (
         |  PARTITION BY source ORDER BY pick_key, doc_id) AS BIGINT) AS src_rank FROM k)
         |SELECT source, src_rank, doc_id, n_chars FROM r
         |WHERE src_rank <= ${TextOps.SourceCapK}
         |ORDER BY source, src_rank""".stripMargin,
    "q114_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(${PortableHash.tokensSql("text")},
         |    x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS tok
         |FROM documents),
         |c AS (SELECT doc_id, tok,
         |  sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t),
         |a AS (SELECT doc_id, tok,
         |  CAST((cum - tok) // ${TextOps.PackBudget} AS BIGINT) AS shard,
         |  CAST(CASE WHEN tok > 0 THEN (cum - 1) // ${TextOps.PackBudget}
         |       ELSE (cum - tok) // ${TextOps.PackBudget} END AS BIGINT) AS end_shard
         |FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS shard_tokens,
         |  CAST(sum(CASE WHEN end_shard > shard THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "q115_temperature_mix" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |  CAST(sum(CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS sq_i
         |FROM c),
         |r AS (SELECT source, n_docs,
         |  ${PortableHash.proundSql(
             s"least(1.0, ${TextOps.MixTargetFrac} * CAST(n_total AS DOUBLE) * " +
             "(sqrt(CAST(n_docs AS DOUBLE)) / (CAST(sq_i AS DOUBLE) / 1e9)) / " +
             "CAST(n_docs AS DOUBLE))", 6)} AS rate
         |FROM c, t),
         |r2 AS (SELECT *, CAST(floor(rate * 1e6 + 0.5) AS BIGINT) AS thresh FROM r),
         |s AS (SELECT d.source, count(*) AS n_sampled
         |      FROM documents d JOIN r2 USING (source)
         |      WHERE ${PortableHash.h48Sql("d.text || ':mix'")} % 1000000 < thresh
         |      GROUP BY d.source)
         |SELECT source, n_docs, rate, coalesce(n_sampled, 0) AS n_sampled
         |FROM r2 LEFT JOIN s USING (source) ORDER BY source""".stripMargin,
    "q116_kmeans_step" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < ${SimilarityOps.IvfK}),
         |scored AS (SELECT vec_id, v, cent_id,
         |    ${SimilarityOps.dotSql("v", "v")} - 2.0 * ${SimilarityOps.dotSql("v", "cv")}
         |      + ${SimilarityOps.dotSql("cv", "cv")} AS dist2
         |  FROM e CROSS JOIN cents),
         |a AS (SELECT vec_id, v, cent_id AS cluster,
         |        CAST(floor(dist2 * 1e6 + 0.5) AS BIGINT) AS d2i
         |      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY dist2, cent_id) AS rn FROM scored)
         |      WHERE rn = 1),
         |newc AS (SELECT cluster, i - 1 AS pos,
         |           ${PortableHash.proundSql(
                       "CAST(CAST(sum(CAST(floor(v[i] * 1e9 + 0.5) AS BIGINT)) AS BIGINT) " +
                       "AS DOUBLE) / 1e9 / count(*)", 4)} AS nc
         |         FROM a CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
         |         GROUP BY 1, 2),
         |oldc AS (SELECT cent_id AS cluster, i - 1 AS pos,
         |           ${PortableHash.proundSql("cv[i]", 4)} AS oc
         |         FROM cents CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g),
         |sh AS (SELECT cluster, CAST(sum(di * di) AS BIGINT) AS s2i
         |       FROM (SELECT n.cluster, CAST(floor((nc - oc) * 1e4 + 0.5) AS BIGINT) AS di
         |             FROM newc n JOIN oldc o ON n.cluster = o.cluster AND n.pos = o.pos) t
         |       GROUP BY cluster),
         |sz AS (SELECT cluster, count(*) AS n_vecs, CAST(sum(d2i) AS BIGINT) AS ii
         |       FROM a GROUP BY cluster)
         |SELECT s.cluster, n_vecs, ii / 1e6 AS inertia,
         |  ${PortableHash.proundSql("sqrt(s2i / 1e8)", 6)} AS centroid_shift
         |FROM sz s JOIN sh USING (cluster) ORDER BY s.cluster""".stripMargin,
    "q118_kmeans_train" -> SimilarityOps.kmeansTrainSql,
    "q37_simhash_pairs" ->
      s"""WITH $SimhashCteBody
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q62_dedup_clusters" ->
      s"""WITH RECURSIVE $SimhashCteBody,
         |p2 AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM p2
         |          UNION ALL SELECT doc_b, doc_a FROM p2),
         |reach(n, l) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.l FROM reach r JOIN edges e ON r.n = e.a),
         |lab AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, sz.cluster_size
         |FROM lab l JOIN sz USING (cluster_id) ORDER BY l.doc_id""".stripMargin,
    "q152_index_maintenance" -> {
      val kmeans = SimilarityOps.kmeansCteBodySqlOf("vec_id % 5 <> 0")
      val driftCtes = SimilarityOps.embeddingDriftCtesOf(
        "CASE WHEN vec_id % 5 = 0 THEN 'cand' ELSE 'ref' END", "d_")
      val ki = SimilarityOps.KmeansIters
      def dist2(v: String, cv: String) =
        s"${SimilarityOps.dotSql(v, v)} - 2.0 * ${SimilarityOps.dotSql(v, cv)} + ${SimilarityOps.dotSql(cv, cv)}"
      val psi6 = PortableHash.proundSql("psi_raw", 6)
      // mirror the proof form the query EXECUTION actually used (recorded
      // at plan-build time — the q137 overlapAuditUsed discipline): the
      // rebuild-equality CTEs and the n_mismatch column exist only when
      // graft.ann.verifyRebuild was on for the run being checked
      val proof = SimilarityOps.rebuildProofUsed.getOrElse(
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .exists(SimilarityOps.rebuildProofOn))
      s"""$MinhashBandsCtes,
         |xcand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
         |          FROM bands n JOIN bands c
         |            ON n.bi = c.bi AND n.band_sig = c.band_sig
         |           AND n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0),
         |xpairs AS (SELECT new_id, corpus_id,
         |  CAST(len(list_filter(hn.hs, h -> list_contains(hc.hs, h))) AS BIGINT) AS n_inter,
         |  CAST(len(hn.hs) AS BIGINT) + CAST(len(hc.hs) AS BIGINT) AS sz_sum
         |  FROM xcand JOIN hsl hn ON new_id = hn.doc_id JOIN hsl hc ON corpus_id = hc.doc_id),
         |near AS (SELECT new_id, min(corpus_id) AS near_match FROM xpairs
         |         WHERE n_inter * 5 >= (sz_sum - n_inter) * 4 GROUP BY new_id),
         |m5 AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
         |cm AS (SELECT content_md5, min(doc_id) AS exact_match FROM m5
         |       WHERE doc_id % 5 <> 0 GROUP BY content_md5),
         |ex AS (SELECT doc_id, exact_match FROM m5 LEFT JOIN cm USING (content_md5)
         |       WHERE doc_id % 5 = 0),
         |adm AS (SELECT ex.doc_id AS vec_id FROM ex
         |        LEFT JOIN near ON ex.doc_id = near.new_id
         |        WHERE ex.exact_match IS NULL AND near.near_match IS NULL),
         |$kmeans,
         |eall AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |enew AS (SELECT e2.vec_id, e2.v FROM eall e2 JOIN adm USING (vec_id)
         |         WHERE e2.vec_id % 5 = 0),
         |asgi AS (SELECT vec_id, cluster FROM (
         |  SELECT e2.vec_id, c.cluster,
         |    row_number() OVER (PARTITION BY e2.vec_id
         |      ORDER BY ${dist2("e2.v", "c.cv")}, c.cluster) AS rn
         |  FROM enew e2 CROSS JOIN c$ki c) WHERE rn = 1),
         |${if (proof)
             s"""asga AS (SELECT vec_id, cluster FROM (
         |  SELECT e2.vec_id, c.cluster,
         |    row_number() OVER (PARTITION BY e2.vec_id
         |      ORDER BY ${dist2("e2.v", "c.cv")}, c.cluster) AS rn
         |  FROM eall e2 CROSS JOIN c$ki c) WHERE rn = 1),
         |asgr AS (SELECT a.vec_id, a.cluster FROM asga a JOIN adm USING (vec_id)),
         |mism AS (SELECT CAST(count(*) AS BIGINT) AS n_mismatch
         |         FROM asgi i FULL JOIN asgr r USING (vec_id)
         |         WHERE i.cluster IS DISTINCT FROM r.cluster),""" else ""}
         |asge AS (SELECT vec_id, cluster FROM (
         |  SELECT e2.vec_id, c.cluster,
         |    row_number() OVER (PARTITION BY e2.vec_id
         |      ORDER BY ${dist2("e2.v", "c.cv")}, c.cluster) AS rn
         |  FROM e e2 CROSS JOIN c$ki c) WHERE rn = 1),
         |nex AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_existing FROM asge GROUP BY 1),
         |nnw AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_new FROM asgi GROUP BY 1),
         |$driftCtes,
         |ndd AS (SELECT CAST(sum(CASE WHEN $psi6 >= ${SimilarityOps.DriftPsiThreshold}
         |                             THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted_dims
         |        FROM d_ps)
         |SELECT c.cluster,
         |  coalesce(nex.n_existing, 0) AS n_existing,
         |  coalesce(nnw.n_new, 0) AS n_new,
         |  ${if (proof) "mism.n_mismatch, " else ""}ndd.n_drifted_dims,
         |  ndd.n_drifted_dims >= ${SimilarityOps.RetrainMinDriftedDims} AS retrain,
         |  CASE WHEN ndd.n_drifted_dims >= ${SimilarityOps.RetrainMinDriftedDims} THEN 'retrain'
         |       ELSE 'assign_incremental' END AS action
         |FROM c$ki c LEFT JOIN nex USING (cluster) LEFT JOIN nnw USING (cluster)
         |${if (proof) "CROSS JOIN mism " else ""}CROSS JOIN ndd
         |ORDER BY c.cluster""".stripMargin
    },
    "q153_classifier_train" -> TextOps.classifierTrainSql,
    "q154_snapshot_diff" -> TextOps.snapshotDiffSql,
    "q155_html_extract" -> TextOps.htmlMainContentSql,
    "q156_incremental_reprocess" -> TextOps.incrementalReprocessSql,
    "q159_incremental_neardup" -> TextOps.incrementalNearDedupSql,
    // q162 = q159 as a stream: same diff, same verdicts, same oracle
    "q162_stream_neardedup" -> TextOps.incrementalNearDedupSql,
    "q160_url_dedup" -> TextOps.urlDedupSql,
    // q163: every line recovered from the PARSED binary letter container
    // must equal the line computed directly from the source tables (q13's
    // fmt chain) — the S6 render → buildDocx → zip-parse → run-merge
    // round-trip as an oracle row. The initials/signature literals pin
    // docxtpl's absent-key "" render (SURVEY §1.3's unsupplied keys).
    "q163_docx_roundtrip" ->
      s"""$ReqCte,
         |valid AS (SELECT * FROM requests WHERE $ValidPred),
         |joined AS (SELECT v.*, c.c_name FROM valid v JOIN customer c ON v.cust_id = c.c_custkey),
         |fmt AS (SELECT request_id,
         |  ${dateSql("report_date")} AS letter_date,
         |  c_name AS client_name,
         |  ${curSql("fee")} AS fee_formatted,
         |  ${pctSql("due_signing")} AS due_signing_pct,
         |  ${pctSql("due_completion")} AS due_completion_pct,
         |  'Engagement_Letter_' || translate(c_name, ' /', '__') || '.pdf' AS pdf_filename
         |FROM joined)
         |SELECT request_id, CAST(10 AS BIGINT) AS n_paragraphs,
         |  'Date: ' || letter_date AS date_line,
         |  'Client: ' || client_name AS client_line,
         |  'Address: Segment ' || due_signing_pct AS address_line,
         |  'Property under appraisal: ' || pdf_filename AS property_line,
         |  'Parcel ID: ' || CAST(request_id AS VARCHAR) AS parcel_line,
         |  'Fee: ' || fee_formatted AS fee_line,
         |  'Due at signing: ' || due_signing_pct AS signing_line,
         |  'Due at completion: ' || due_completion_pct AS completion_line,
         |  'Initials:   ' AS initials_line,
         |  'Signature: ' AS signature_line
         |FROM fmt ORDER BY request_id""".stripMargin,
    // q161: the inventory CTE mirrors the DOCUMENTED template synthesis
    // layout (Letter.TemplateParagraphRuns — the engine side derives it by
    // actually parsing the built OOXML container); the render checks reuse
    // q13's fmt chain verbatim.
    "q161_docx_template" ->
      s"""$ReqCte,
         |valid AS (SELECT * FROM requests WHERE $ValidPred),
         |joined AS (SELECT v.*, c.c_name FROM valid v JOIN customer c ON v.cust_id = c.c_custkey),
         |fmt AS (SELECT request_id,
         |  ${dateSql("report_date")} AS letter_date,
         |  c_name AS client_name,
         |  ${curSql("fee")} AS fee_formatted,
         |  ${pctSql("due_signing")} AS due_signing_pct,
         |  ${pctSql("due_completion")} AS due_completion_pct,
         |  'Engagement_Letter_' || translate(c_name, ' /', '__') || '.pdf' AS pdf_filename
         |FROM joined),
         |vals AS (
         |  SELECT 'date' AS placeholder, letter_date AS v FROM fmt
         |  UNION ALL SELECT 'name', client_name FROM fmt
         |  UNION ALL SELECT 'address', 'Segment ' || due_signing_pct FROM fmt
         |  UNION ALL SELECT 'fee', fee_formatted FROM fmt
         |  UNION ALL SELECT 'due_signing', due_signing_pct FROM fmt
         |  UNION ALL SELECT 'due_completion', due_completion_pct FROM fmt
         |  UNION ALL SELECT 'property_under_appraisal', pdf_filename FROM fmt
         |  UNION ALL SELECT 'parcel_id', CAST(request_id AS VARCHAR) FROM fmt),
         |counts AS (SELECT placeholder,
         |    count(CASE WHEN v <> '' THEN 1 END) AS n FROM vals GROUP BY 1),
         |firstreq AS (SELECT * FROM fmt ORDER BY request_id LIMIT 1),
         |samples AS (
         |  SELECT 'date' AS placeholder, letter_date AS s FROM firstreq
         |  UNION ALL SELECT 'name', client_name FROM firstreq
         |  UNION ALL SELECT 'address', 'Segment ' || due_signing_pct FROM firstreq
         |  UNION ALL SELECT 'fee', fee_formatted FROM firstreq
         |  UNION ALL SELECT 'due_signing', due_signing_pct FROM firstreq
         |  UNION ALL SELECT 'due_completion', due_completion_pct FROM firstreq
         |  UNION ALL SELECT 'property_under_appraisal', pdf_filename FROM firstreq
         |  UNION ALL SELECT 'parcel_id', CAST(request_id AS VARCHAR) FROM firstreq),
         |inv AS (SELECT * FROM (VALUES
         |  (1, 'date', 0, TRUE, TRUE),
         |  (2, 'name', 1, FALSE, TRUE),
         |  (3, 'address', 2, FALSE, TRUE),
         |  (4, 'property_under_appraisal', 3, TRUE, TRUE),
         |  (5, 'parcel_id', 4, TRUE, TRUE),
         |  (6, 'fee', 5, FALSE, TRUE),
         |  (7, 'due_signing', 6, FALSE, TRUE),
         |  (8, 'due_completion', 7, FALSE, TRUE),
         |  (9, 'initial_1', 8, FALSE, FALSE),
         |  (10, 'initial_2', 8, TRUE, FALSE),
         |  (11, 'initial_3', 8, FALSE, FALSE),
         |  (12, 'customer_signature_name', 9, FALSE, FALSE)
         |) t(ord, placeholder, paragraph_idx, split_across_runs, supplied))
         |SELECT CAST(inv.ord AS BIGINT) AS ord, inv.placeholder,
         |  CAST(inv.paragraph_idx AS BIGINT) AS paragraph_idx,
         |  inv.split_across_runs, inv.supplied,
         |  coalesce(counts.n, 0) AS n_rendered_nonblank,
         |  coalesce(samples.s, '') AS sample_value
         |FROM inv LEFT JOIN counts USING (placeholder)
         |LEFT JOIN samples USING (placeholder)
         |ORDER BY ord""".stripMargin,
    "q157_audio_features" -> {
      def hv(c: String) =
        s"(ascii($c) - 48 - CASE WHEN ascii($c) >= 97 THEN 39 ELSE 0 END)"
      // byte 2o   = hex chars 4o+1..4o+2, byte 2o+1 = chars 4o+3..4o+4;
      // little-endian signed int16
      val v = s"(${hv("substr(h, 4*o+1, 1)")} * 16 + ${hv("substr(h, 4*o+2, 1)")}" +
        s" + 256 * (${hv("substr(h, 4*o+3, 1)")} * 16 + ${hv("substr(h, 4*o+4, 1)")}))"
      s"""WITH src AS (SELECT doc_id, text,
         |  32 + ${PortableHash.h48Sql("text")} % 97 AS nb,
         |  CASE WHEN ${PortableHash.h48Sql("text")} % 4 = 0 THEN 2 ELSE 1 END AS ch
         |FROM documents),
         |bl AS (SELECT doc_id, text, nb, ch,
         |       unnest(generate_series(0, nb - 1)) AS k FROM src),
         |hx AS (SELECT doc_id, nb, ch, k, md5(text || ':wav:' || k) AS h FROM bl),
         |sm AS (SELECT doc_id, nb, ch, k * 8 + o AS i,
         |    CASE WHEN $v >= 32768 THEN $v - 65536 ELSE $v END AS s
         |  FROM hx CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS o) go),
         |lg AS (SELECT doc_id, nb, ch, i, s,
         |       lag(s) OVER (PARTITION BY doc_id, i % ch ORDER BY i) AS ps FROM sm),
         |st AS (SELECT doc_id, CAST(max(nb) AS BIGINT) AS nb,
         |    CAST(max(ch) AS BIGINT) AS ch,
         |    CAST(count(*) AS BIGINT) AS n_tot,
         |    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
         |    CAST(max(abs(s)) AS BIGINT) AS peak,
         |    CAST(SUM(CASE WHEN ps IS NOT NULL AND
         |      ((ps < 0 AND s >= 0) OR (ps >= 0 AND s < 0)) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS zero_crossings,
         |    CAST(SUM(CASE WHEN i % ch = 0 THEN CAST(s AS BIGINT) * s ELSE 0 END)
         |      AS BIGINT) AS energy_ch0
         |  FROM lg GROUP BY doc_id)
         |SELECT doc_id, CAST(56 + 16 * nb AS BIGINT) AS byte_len,
         |  ch AS channels, CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(n_tot // ch AS BIGINT) AS n_samples,
         |  CAST((n_tot // ch) * 1000 // 8000 AS BIGINT) AS duration_ms,
         |  energy, peak, zero_crossings, energy_ch0
         |FROM st ORDER BY doc_id""".stripMargin
    },
    "q158_hot_shingle_index" ->
      s"""$ShingleCtes
         |SELECT shash, CAST(count(*) AS BIGINT) AS df
         |FROM shr GROUP BY shash
         |HAVING count(*) > ${operators.TextOps.HotIndexMinDf}
         |ORDER BY shash""".stripMargin,
    "q150_cluster_split" ->
      s"""WITH RECURSIVE $SimhashCteBody,
         |p2 AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM p2
         |          UNION ALL SELECT doc_b, doc_a FROM p2),
         |reach(n, l) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.l FROM reach r JOIN edges e ON r.n = e.a),
         |lab AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n),
         |rb AS (SELECT doc_id AS cluster_id,
         |  CASE WHEN ${PortableHash.h48Sql("text")} % 100 < 80 THEN 'train'
         |       WHEN ${PortableHash.h48Sql("text")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT d.lang, r.split, count(*) AS n_docs,
         |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
         |  count(DISTINCT l.cluster_id) AS n_clusters
         |FROM lab l JOIN documents d USING (doc_id) JOIN rb r USING (cluster_id)
         |GROUP BY d.lang, r.split ORDER BY d.lang, r.split""".stripMargin,
    "q117_quality_dedup" ->
      s"""WITH RECURSIVE $SimhashCteBody,
         |p2 AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM p2
         |          UNION ALL SELECT doc_b, doc_a FROM p2),
         |reach(n, l) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.l FROM reach r JOIN edges e ON r.n = e.a),
         |lab AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1),
         |qt AS (SELECT doc_id, text, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |qm AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_m,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |  CAST(len(list_filter(w, x -> list_contains($StopEnSqlList, x))) AS BIGINT) AS n_stop
         |FROM qt),
         |qs AS (SELECT doc_id,
         |  floor(((n_stop * 1.0) / n_tokens + ((n_alpha * 1.0) / n_chars_m) * 0.5
         |        - ((n_punct * 1.0) / n_chars_m) * 2.0) * 1e4 + 0.5) / 1e4 AS quality
         |FROM qm)
         |SELECT l.doc_id, l.cluster_id, sz.cluster_size, qs.quality,
         |  (row_number() OVER (PARTITION BY l.cluster_id
         |     ORDER BY qs.quality DESC, l.doc_id) = 1) AS keep
         |FROM lab l JOIN sz USING (cluster_id) JOIN qs USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin,
    "q59_scrub_pii" ->
      s"""WITH notes AS (
         |  SELECT c_custkey,
         |    'Reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
         |    || '@mail.example or call +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |    || '; profile https://ex.example/u/' || CAST(c_custkey AS VARCHAR) || ' soon.' AS note
         |  FROM customer)
         |SELECT c_custkey, note,
         |  CAST(len(regexp_extract_all(note, '${TextOps.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(note, '${TextOps.UrlRe}')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(note, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(note,
         |    '${TextOps.PhoneRe}', '[PHONE]', 'g'),
         |    '${TextOps.UrlRe}', '[URL]', 'g'),
         |    '${TextOps.EmailRe}', '[EMAIL]', 'g') AS scrubbed
         |FROM notes ORDER BY c_custkey""".stripMargin,
    "q60_repetition_stats" ->
      s"""WITH tok AS (SELECT doc_id, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |gr AS (SELECT doc_id, unnest(${PortableHash.shinglesSql("w", 2)}) AS gram FROM tok),
         |cnt AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, count(*) AS n_distinct,
         |              CAST(max(c) AS BIGINT) AS top_count
         |       FROM cnt GROUP BY 1)
         |SELECT doc_id, n_bigrams, n_distinct, top_count,
         |  floor((top_count * 1.0 / n_bigrams) * 1e6 + 0.5) / 1e6 AS top_share,
         |  top_count * 5 >= n_bigrams AS repetitive
         |FROM st ORDER BY doc_id""".stripMargin,
    "q61_corpus_mix" ->
      s"""WITH t AS (SELECT doc_id, lang, text, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |m AS (SELECT doc_id, lang,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_m,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |  CAST(len(list_filter(w, x -> list_contains($StopEnSqlList, x))) AS BIGINT) AS n_stop
         |FROM t),
         |s AS (SELECT doc_id, lang,
         |  floor(((n_stop * 1.0) / n_tokens + ((n_alpha * 1.0) / n_chars_m) * 0.5
         |        - ((n_punct * 1.0) / n_chars_m) * 2.0) * 1e4 + 0.5) / 1e4 AS quality
         |FROM m),
         |r AS (SELECT lang, doc_id, quality,
         |  CAST(row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
         |FROM s)
         |SELECT lang, rank, doc_id, quality FROM r WHERE rank <= 30
         |ORDER BY lang, rank""".stripMargin,
    "q68_holdout_split" ->
      s"""WITH b AS (SELECT lang, n_chars,
         |  CASE WHEN ${PortableHash.h48Sql("text")} % 100 < 80 THEN 'train'
         |       WHEN ${PortableHash.h48Sql("text")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents)
         |SELECT lang, split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q63_label_centroids" ->
      s"""SELECT label, CAST(i - 1 AS BIGINT) AS dim_idx,
         |  ${PortableHash.proundSql(
             "CAST(CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) " +
             "AS BIGINT) AS DOUBLE) / 1e9 / count(*)", 4)} AS centroid,
         |  count(*) AS n_vecs
         |FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q40_cosine_topk" ->
      s"""${SimilarityOps.vectorsCteSql},
         |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM vecs WHERE vec_id < 10),
         |joined AS (SELECT query_id, vec_id AS neighbor_id,
         |    floor((${SimilarityOps.dotSql("v", "qv")} / (norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine
         |  FROM vecs CROSS JOIN q WHERE vec_id <> query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM joined)
         |SELECT query_id, neighbor_id, cosine, rank FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q41_lsh_neardup" ->
      s"""${SimilarityOps.vectorsCteSql},
         |${SimilarityOps.bandsCteSql}
         |SELECT vec_a, vec_b, n_bands,
         |  floor((${SimilarityOps.dotSql("va.v", "vb.v")} / (va.norm * vb.norm)) * 1e6 + 0.5) / 1e6 AS cosine
         |FROM cand JOIN vecs va ON va.vec_id = vec_a JOIN vecs vb ON vb.vec_id = vec_b
         |WHERE floor((${SimilarityOps.dotSql("va.v", "vb.v")} / (va.norm * vb.norm)) * 1e6 + 0.5) / 1e6 >= ${SimilarityOps.NearDupThreshold}
         |ORDER BY vec_a, vec_b""".stripMargin,
    "q39_embedding_dedup" ->
      s"""${SimilarityOps.vectorsCteSql},
         |${SimilarityOps.bandsCteSql},
         |pairs AS (SELECT vec_a, vec_b
         |  FROM cand JOIN vecs va ON va.vec_id = vec_a JOIN vecs vb ON vb.vec_id = vec_b
         |  WHERE floor((${SimilarityOps.dotSql("va.v", "vb.v")} / (va.norm * vb.norm)) * 1e6 + 0.5) / 1e6 >= ${SimilarityOps.NearDupThreshold}),
         |victims AS (SELECT DISTINCT vec_b AS doc_id FROM pairs)
         |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM victims v WHERE v.doc_id = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q55_ivf_ann" ->
      s"""${SimilarityOps.vectorsCteSql},
         |cents AS (SELECT vec_id AS cent_id, v AS cv, norm AS cn FROM vecs WHERE vec_id < ${SimilarityOps.IvfK}),
         |scored AS (SELECT vec_id, v, norm, cent_id,
         |    ${SimilarityOps.dotSql("v", "cv")} / (norm * cn) AS ccos
         |  FROM vecs CROSS JOIN cents),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crn
         |           FROM scored),
         |assigned AS (SELECT vec_id, v, norm, cent_id AS cell FROM ranked WHERE crn = 1),
         |probes AS (SELECT vec_id AS query_id, v AS qv, norm AS qn, cent_id AS cell
         |           FROM ranked WHERE vec_id < 10 AND crn <= ${SimilarityOps.IvfProbes}),
         |joined AS (SELECT query_id, a.vec_id AS neighbor_id, a.cell,
         |    floor((${SimilarityOps.dotSql("a.v", "qv")} / (a.norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine
         |  FROM assigned a JOIN probes p ON a.cell = p.cell WHERE a.vec_id <> p.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM joined)
         |SELECT query_id, neighbor_id, cell, cosine, rank FROM r
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q56_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q42_ann_bucket" ->
      s"""${SimilarityOps.vectorsCteSql},
         |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn, xor(bucket, f) AS bucket
         |      FROM vecs CROSS JOIN (SELECT unnest(${(0L +: (0 until SimilarityOps.Planes).map(p => 1L << p)).mkString("[", ", ", "]")}) AS f) p
         |      WHERE vec_id < 10),
         |joined AS (SELECT query_id, e.vec_id AS neighbor_id, e.bucket,
         |    floor((${SimilarityOps.dotSql("e.v", "qv")} / (e.norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine
         |  FROM vecs e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM joined)
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM r
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q49_window_breadth" ->
      """SELECT c_mktsegment, c_custkey,
        |  floor((c_acctbal) * 1e2 + 0.5) / 1e2 AS bal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pct_rank,
        |  floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 AS cume,
        |  lead(c_custkey, 1, -1) OVER w AS next_custkey
        |FROM customer WHERE c_custkey <= 2000
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY floor((c_acctbal) * 1e2 + 0.5) / 1e2, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q54_string_breadth" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS lev_to_first,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |  reverse(c_name) AS rev_name,
        |  substr(c_name, 1, 8) AS prefix8,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  split_part(c_name, '#', 2) AS num_part,
        |  repeat('*', CAST(c_custkey % 5 AS INT) + 1) AS stars
        |FROM customer WHERE c_custkey <= 1000
        |ORDER BY c_custkey""".stripMargin,
    "q48_sliding_counts" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - k * 900000000) AS win_start,
        |  event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) g
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q80_stream_sliding" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - k * 900000000) AS win_start,
        |  event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) g
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q110_stream_sliding_append" ->
      """WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTES AS w FROM events),
        |b AS (SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - k * 900000000) AS win_start,
        |        event_type, count(*) AS n
        |      FROM events CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) g
        |      GROUP BY 1, 2)
        |SELECT win_start, event_type, n
        |FROM b CROSS JOIN wm
        |WHERE win_start + INTERVAL 1 HOUR <= w
        |ORDER BY win_start, event_type""".stripMargin,
    "q53_frame_sample" ->
      s"""WITH ${mediaRowLumCtes(frame0Only = false)},
         |fl AS (SELECT doc_id, h, f, CAST(SUM(lum) AS BIGINT) AS flum
         |       FROM mrl GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
         |  ${PortableHash.proundSql("flum / CAST(16 * h * 1000 AS DOUBLE)", 4)} AS lum_mean
         |FROM fl WHERE f % 5 = 0
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "q67_media_embed_knn" -> {
      val dim = Multimodal.EmbedDim
      val mid = Multimodal.RowLumMid
      val dot = (a: String, b: String) =>
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"[($a)[i] * ($b)[i] for i in generate_series(1, $dim)]), (acc, x) -> acc + x)"
      s"""WITH ${mediaRowLumCtes(frame0Only = true)},
         |rls AS (SELECT doc_id, h, list(lum ORDER BY r) AS rl
         |        FROM mrl WHERE f = 0 GROUP BY 1, 2),
         |ev AS (SELECT doc_id,
         |  [CAST(rl[CAST(floor(j * h / $dim.0) AS INT) + 1] - $mid AS DOUBLE) / $mid.0
         |   for j in generate_series(0, ${dim - 1})] AS v
         |FROM rls),
         |vecs AS (SELECT doc_id, v, sqrt(${dot("v", "v")}) AS norm FROM ev),
         |q AS (SELECT doc_id AS query_id, v AS qv, norm AS qn FROM vecs WHERE doc_id < 10),
         |joined AS (SELECT query_id, e.doc_id AS neighbor_id,
         |    floor((${dot("e.v", "qv")} / (e.norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine
         |  FROM vecs e CROSS JOIN q WHERE e.doc_id <> query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         |      FROM joined)
         |SELECT query_id, neighbor_id, cosine, rank FROM r
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },
    "q50_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q51_media_metadata" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  substr(md5(text), 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q52_media_features" ->
      s"""WITH ${mediaRowLumCtes(frame0Only = false)},
         |mcs AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN i % 3 = 0 THEN bv ELSE 0 END) AS BIGINT) AS sum_r,
         |    CAST(SUM(CASE WHEN i % 3 = 1 THEN bv ELSE 0 END) AS BIGINT) AS sum_g,
         |    CAST(SUM(CASE WHEN i % 3 = 2 THEN bv ELSE 0 END) AS BIGINT) AS sum_b
         |  FROM mbt GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST(m.nf * (11 + length(CAST(m.h AS VARCHAR)) + m.h * 48) AS BIGINT) AS byte_len,
         |  'P6' AS magic,
         |  CAST(16 AS BIGINT) AS width,
         |  m.h AS height,
         |  CAST(m.nf AS BIGINT) AS n_frames,
         |  ${PortableHash.proundSql("c.sum_r / CAST(16 * m.h * m.nf AS DOUBLE)", 4)} AS mean_r,
         |  ${PortableHash.proundSql("c.sum_g / CAST(16 * m.h * m.nf AS DOUBLE)", 4)} AS mean_g,
         |  ${PortableHash.proundSql("c.sum_b / CAST(16 * m.h * m.nf AS DOUBLE)", 4)} AS mean_b
         |FROM md m JOIN mcs c USING (doc_id) ORDER BY m.doc_id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  floor((l_extendedprice*(1.0-l_discount)) * 1e2 + 0.5) / 1e2 AS net_price
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_enrich_orders" ->
      """SELECT o_orderkey, c_name, c_mktsegment, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    // q109 is q03 through the bucketed layout — same rows, same oracle shape
    // (inner join ≡ the reference's left-join + NOT NULL found-filter)
    "q109_bucketed_join" ->
      """SELECT o_orderkey, c_name, c_mktsegment, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q04_semi_join_active" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join_inactive" ->
      """SELECT c_custkey, c_name, floor((c_acctbal) * 1e2 + 0.5) / 1e2 AS c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-04-01')
        |ORDER BY c_custkey""".stripMargin,
    "q06_geo_expand" ->
      """SELECT r_name AS region_name, n_name AS nation_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY region_name, nation_name""".stripMargin,
    "q07_first_order" ->
      """SELECT o_custkey, first_orderkey, first_orderdate FROM (
        |  SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q08_revenue_by_brand" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        |  count(*) AS n_items,
        |  count(DISTINCT s_suppkey) AS n_suppliers
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q14_supplier_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  floor((sum(l_quantity) OVER w) * 1e2 + 0.5) / 1e2 AS running_qty,
        |  floor((lag(l_quantity, 1, 0.0) OVER w) * 1e2 + 0.5) / 1e2 AS prev_qty
        |FROM lineitem
        |WHERE l_suppkey < 50
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q15_top_orders" ->
      """SELECT o_orderkey, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS o_totalprice
        |FROM orders
        |ORDER BY floor((o_totalprice) * 1e2 + 0.5) / 1e2 DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q16_segment_setops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich) a
        |UNION ALL
        |SELECT 'building_only' AS tag, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich) b
        |ORDER BY tag, c_custkey""".stripMargin,
    "q17_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q18_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q19/q69 are sketch-valued, so the oracle checks the audit form: exact
    // aggregates recomputed by DuckDB plus a literal-TRUE bound bit that the
    // Spark side must have earned (estimate within 5%/1% of exact).
    "q19_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q69_approx_percentiles" ->
      """SELECT l_returnflag,
        |  floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
        |  floor((quantile_cont(l_extendedprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90,
        |  TRUE AS within_1pct,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q81_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |sess AS (SELECT user_id, sid, count(*) AS n_events,
        |                min(ts_us) AS start_us, max(ts_us) AS end_us
        |         FROM s GROUP BY user_id, sid)
        |SELECT user_id, start_us, end_us, n_events
        |FROM (SELECT *, max(sid) OVER (PARTITION BY user_id) AS mx FROM sess) t
        |WHERE sid < mx
        |ORDER BY user_id, start_us""".stripMargin,
    "q82_stat_moments" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept_price_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q83_ntile_deciles" ->
      """WITH t AS (SELECT c_custkey, c_mktsegment,
        |             floor(c_acctbal * 1e2 + 0.5) / 1e2 AS bal FROM customer),
        |d AS (SELECT *, CAST(ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY bal, c_custkey) AS BIGINT) AS decile FROM t)
        |SELECT c_mktsegment, decile, count(*) AS n,
        |  min(bal) AS lo_bal, max(bal) AS hi_bal, round(avg(bal), 4) AS avg_bal
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q84_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS t_click FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        |      WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS t_buy FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT n_users, n_viewed, n_clicked_after_view, n_purchased_after_click,
        |  floor((n_viewed * 1.0 / n_users) * 1e6 + 0.5) / 1e6 AS view_rate,
        |  floor((n_clicked_after_view * 1.0 / n_viewed) * 1e6 + 0.5) / 1e6 AS click_through,
        |  floor((n_purchased_after_click * 1.0 / n_clicked_after_view) * 1e6 + 0.5) / 1e6 AS purchase_through
        |FROM (SELECT count(DISTINCT user_id) AS n_users FROM events) a,
        |     (SELECT count(*) AS n_viewed FROM v) b,
        |     (SELECT count(*) AS n_clicked_after_view FROM c) c2,
        |     (SELECT count(*) AS n_purchased_after_click FROM p) d""".stripMargin,
    "q85_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |co AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1)
        |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
        |  CAST(datediff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN co ON a.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q86_order_streaks" ->
      """WITH mo AS (SELECT DISTINCT o_custkey,
        |              CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mo_idx FROM orders),
        |i AS (SELECT o_custkey, mo_idx,
        |        mo_idx - row_number() OVER (PARTITION BY o_custkey ORDER BY mo_idx) AS grp FROM mo),
        |st AS (SELECT o_custkey, grp, count(*) AS streak_len FROM i GROUP BY 1, 2)
        |SELECT o_custkey, count(*) AS n_streaks,
        |  CAST(sum(streak_len) AS BIGINT) AS n_active_months,
        |  CAST(max(streak_len) AS BIGINT) AS max_streak
        |FROM st GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    "q87_tfidf_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${PortableHash.tokensSql("lower(text)")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
         |        CAST(row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df, tf.term) AS BIGINT) AS rank
         |      FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, rank, term, tf, df,
         |  floor((tf * ln((n_docs * 1.0) / df)) * 1e4 + 0.5) / 1e4 AS tfidf
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q88_vocab_growth" ->
      s"""WITH tok AS (SELECT lang, unnest(${PortableHash.tokensSql("lower(text)")}) AS term FROM documents),
         |tc AS (SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
         |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |      FROM tc GROUP BY 1)
         |SELECT lang, n_tokens, n_types, n_hapax,
         |  floor((n_types * 1.0 / n_tokens) * 1e6 + 0.5) / 1e6 AS type_token_ratio,
         |  floor((n_hapax * 1.0 / n_types) * 1e6 + 0.5) / 1e6 AS hapax_share
         |FROM g ORDER BY lang""".stripMargin,
    "q89_collocations" ->
      s"""WITH t AS (SELECT lang, ${PortableHash.tokensSql("lower(text)")} AS w FROM documents),
         |uni AS (SELECT lang, term, count(*) AS c
         |        FROM (SELECT lang, unnest(w) AS term FROM t) u GROUP BY 1, 2),
         |ba AS (SELECT lang, bg, count(*) AS c_xy
         |       FROM (SELECT lang, unnest(${PortableHash.shinglesSql("w", 2)}) AS bg FROM t) u GROUP BY 1, 2),
         |tot AS (SELECT u.lang, n_uni, n_bi FROM
         |          (SELECT lang, CAST(sum(c) AS BIGINT) AS n_uni FROM uni GROUP BY 1) u
         |          JOIN (SELECT lang, CAST(sum(c_xy) AS BIGINT) AS n_bi FROM ba GROUP BY 1) b ON u.lang = b.lang),
         |r AS (SELECT ba.lang, ba.bg, ba.c_xy, ux.c AS c_x, uy.c AS c_y, tot.n_uni, tot.n_bi,
         |        CAST(row_number() OVER (PARTITION BY ba.lang ORDER BY ba.c_xy DESC, ba.bg) AS BIGINT) AS rank
         |      FROM ba
         |      JOIN uni ux ON ba.lang = ux.lang AND split_part(ba.bg, ' ', 1) = ux.term
         |      JOIN uni uy ON ba.lang = uy.lang AND split_part(ba.bg, ' ', 2) = uy.term
         |      JOIN tot ON ba.lang = tot.lang
         |      WHERE ba.c_xy >= 3)
         |SELECT lang, rank, bg AS bigram, c_xy, c_x, c_y,
         |  floor(ln((c_xy * 1.0 * n_uni * n_uni) / (n_bi * 1.0 * c_x * c_y)) * 1e4 + 0.5) / 1e4 AS pmi
         |FROM r WHERE rank <= 15 ORDER BY lang, rank""".stripMargin,
    "q127_bpe_pairs" ->
      s"""WITH t AS (SELECT unnest(${PortableHash.tokensSql("lower(text)")}) AS word FROM documents),
         |wf AS (SELECT word, count(*) AS freq FROM t WHERE length(word) >= 1 GROUP BY word),
         |ix AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS i FROM wf),
         |sym AS (SELECT freq, substring(word, i, 1) AS left_sym,
         |          CASE WHEN i = length(word) THEN '</w>'
         |               ELSE substring(word, i + 1, 1) END AS right_sym
         |        FROM ix),
         |pc AS (SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
         |       FROM sym GROUP BY 1, 2),
         |rk AS (SELECT *, CAST(row_number() OVER
         |         (ORDER BY pair_count DESC, left_sym, right_sym) AS BIGINT) AS rank
         |       FROM pc)
         |SELECT rank, left_sym, right_sym, pair_count
         |FROM rk WHERE rank <= ${TextOps.BpeTopK} ORDER BY rank""".stripMargin,
    "q128_dsir_select" ->
      s"""WITH tok AS (SELECT doc_id, lang, ${PortableHash.h48Sql("t")} % ${TextOps.DsirBuckets} AS b
         |             FROM (SELECT doc_id, lang, unnest(${PortableHash.tokensSql("lower(text)")}) AS t
         |                   FROM documents) u
         |             WHERE length(t) >= 1),
         |rawc AS (SELECT b, count(*) AS cr FROM tok GROUP BY b),
         |tgtc AS (SELECT b, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY b),
         |tot AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM rawc) AS nr,
         |               (SELECT CAST(sum(ct) AS BIGINT) FROM tgtc) AS nt),
         |model AS (SELECT b, CAST(floor(
         |    (ln(CAST(coalesce(ct, 0) AS DOUBLE) + 1.0)
         |     - ln(CAST(nt AS DOUBLE) + ${TextOps.DsirBuckets}.0)
         |     - ln(CAST(cr AS DOUBLE) + 1.0)
         |     + ln(CAST(nr AS DOUBLE) + ${TextOps.DsirBuckets}.0)) * 1e6 + 0.5) AS BIGINT) AS term
         |  FROM rawc LEFT JOIN tgtc USING (b) CROSS JOIN tot),
         |lw AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS li
         |       FROM tok JOIN model USING (b) GROUP BY doc_id),
         |gm AS (SELECT doc_id, lang, CAST(floor(
         |    -ln(-ln((CAST(${PortableHash.h48Sql("text || ':dsir'")} % 1000000 AS DOUBLE) + 0.5) / 1e6))
         |    * 1e6 + 0.5) AS BIGINT) AS gq
         |  FROM documents),
         |sc AS (SELECT l.doc_id, g.lang, li, gq, li + gq AS gkey
         |       FROM lw l JOIN gm g USING (doc_id)),
         |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY gkey DESC, doc_id) AS BIGINT) AS rank
         |       FROM sc)
         |SELECT rank, doc_id, lang,
         |  ${PortableHash.proundSql("CAST(li AS DOUBLE) / 1e6", 6)} AS log_ratio,
         |  ${PortableHash.proundSql("CAST(gq AS DOUBLE) / 1e6", 6)} AS gumbel,
         |  ${PortableHash.proundSql("CAST(gkey AS DOUBLE) / 1e6", 6)} AS gumbel_key
         |FROM rk WHERE rank <= ${TextOps.DsirK} ORDER BY rank""".stripMargin,
    "q129_substr_dedup" ->
      s"""WITH sh0 AS (SELECT doc_id,
         |    ${PortableHash.shinglesSql(PortableHash.tokensSql("lower(text)"), TextOps.SubstrWindow)} AS sh
         |  FROM documents),
         |occ0 AS (SELECT doc_id, sh, unnest(generate_series(1, len(sh))) AS i FROM sh0),
         |occ AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ${PortableHash.h48Sql("sh[i]")} AS whash
         |        FROM occ0),
         |own AS (SELECT whash, min(doc_id * 1048576 + pos) AS okey, count(*) AS n_occ
         |        FROM occ GROUP BY whash),
         |m AS (SELECT o.doc_id, o.pos
         |      FROM occ o JOIN own w USING (whash)
         |      WHERE w.n_occ >= 2 AND o.doc_id * 1048576 + o.pos <> w.okey),
         |g AS (SELECT doc_id, pos,
         |        CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), -1048576)
         |               + ${TextOps.SubstrWindow} THEN 1 ELSE 0 END AS brk
         |      FROM m),
         |i AS (SELECT doc_id, pos,
         |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
         |      FROM g)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + ${TextOps.SubstrWindow - 1} AS BIGINT) AS span_end,
         |  count(*) AS n_windows,
         |  CAST(max(pos) + ${TextOps.SubstrWindow - 1} - min(pos) + 1 AS BIGINT) AS n_tokens
         |FROM i GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,
    "q131_stream_kmv" -> {
      val k = graft.functions.KmvSketch.K
      val numer = (k - 1).toLong * graft.functions.KmvSketch.Domain
      s"""WITH h AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |            user_id, ${PortableHash.h48Sql("CAST(user_id AS VARCHAR)")} AS uh
         |          FROM events),
         |g AS (SELECT day, list_sort(list_distinct(list(uh))) AS ks,
         |        count(DISTINCT user_id) AS exact_distinct
         |      FROM h GROUP BY 1)
         |SELECT day,
         |  CASE WHEN len(ks) < $k THEN CAST(len(ks) AS BIGINT)
         |       ELSE CAST($numer // ks[$k] AS BIGINT) END AS kmv_users,
         |  exact_distinct
         |FROM g ORDER BY day""".stripMargin
    },
    "q132_stream_kmv_update" -> {
      // q131's estimator CTE without the exact-audit column: the update-mode
      // upserted target's final contents equal the batch per-day estimate
      val k = graft.functions.KmvSketch.K
      val numer = (k - 1).toLong * graft.functions.KmvSketch.Domain
      s"""WITH h AS (SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         |            ${PortableHash.h48Sql("CAST(user_id AS VARCHAR)")} AS uh
         |          FROM events),
         |g AS (SELECT day, list_sort(list_distinct(list(uh))) AS ks FROM h GROUP BY 1)
         |SELECT day,
         |  CASE WHEN len(ks) < $k THEN CAST(len(ks) AS BIGINT)
         |       ELSE CAST($numer // ks[$k] AS BIGINT) END AS kmv_users
         |FROM g ORDER BY day""".stripMargin
    },
    "q134_bpe_train" -> {
      s"""WITH $bpeChainSql
         |${bpeMergesSql}
         |ORDER BY rank""".stripMargin
    },
    "q135_bpe_encode" -> {
      val fin = s"w${TextOps.BpeMerges}"
      val tokN = "coalesce(w.w_tokens, octet_length(encode(d.word)))"
      s"""WITH $bpeChainSql,
         |wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS w_tokens FROM $fin),
         |aug AS (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 3 THEN text || ' w' || doc_id || 'x'
         |       ELSE text END AS enc_text FROM documents),
         |dt AS (SELECT doc_id, CAST(length(enc_text) AS BIGINT) AS n_chars_enc,
         |       unnest(${PortableHash.tokensSql("lower(enc_text)")}) AS word
         |       FROM aug),
         |dv AS (SELECT doc_id, n_chars_enc, word FROM dt WHERE length(word) >= 1)
         |SELECT d.doc_id, count(*) AS n_words,
         |  CAST(sum($tokN) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN w.w_tokens IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  ${PortableHash.proundSql(s"max(d.n_chars_enc) * 1.0 / sum($tokN)", 4)} AS chars_per_token
         |FROM dv d LEFT JOIN wt w USING (word)
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    "q133_media_neardup" -> {
      s"""WITH $mediaPairsCteSql
         |SELECT doc_a, doc_b, hamming FROM cp
         |UNION ALL SELECT doc_a, doc_b, hamming FROM ip
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q136_media_dup_groups" -> {
      // q133's pair CTEs + q62's recursive-CTE connected components +
      // q117's keep-best window (quality = n_chars desc, ties lower id)
      s"""WITH RECURSIVE $mediaPairsCteSql,
         |prs AS (SELECT doc_a, doc_b FROM cp UNION SELECT doc_a, doc_b FROM ip),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(n, l) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.l FROM reach r JOIN edges e ON r.n = e.a),
         |lab AS (SELECT n AS doc_id, min(l) AS group_id FROM reach GROUP BY n),
         |sz AS (SELECT group_id, count(*) AS group_size FROM lab GROUP BY 1)
         |SELECT d.doc_id, l.group_id, CAST(sz.group_size AS BIGINT) AS group_size,
         |  d.n_chars,
         |  (row_number() OVER (PARTITION BY l.group_id
         |     ORDER BY d.n_chars DESC, d.doc_id) = 1) AS keep
         |FROM documents d JOIN lab l USING (doc_id) JOIN sz USING (group_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    "q137_source_overlap" -> {
      val k = graft.functions.KmvSketch.K
      val numer = (k - 1).toLong * graft.functions.KmvSketch.Domain
      // mirror the form the query EXECUTION actually used (recorded at
      // plan-build time), not the ambient session's conf at render time —
      // rendering in a JVM/session whose conf differs from the one that
      // produced the parquet must not flip the oracle's schema
      val audit = Analytics.overlapAuditUsed.getOrElse(
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .exists(Analytics.overlapAuditOn))
      val shared =
        s"""WITH tw AS (SELECT source, ${PortableHash.tokensSql("lower(text)")} AS w FROM documents),
           |t AS (SELECT source, unnest(${PortableHash.shinglesSql("w")}) AS s3 FROM tw),
           |h AS (SELECT source, ${PortableHash.h48Sql("s3")} AS uh FROM t),
           |d AS (SELECT DISTINCT source, uh FROM h),
           |sk AS (SELECT source, list_sort(list_distinct(list(uh)))[1:$k] AS ks FROM d GROUP BY source),
           |pr AS (SELECT a.source AS source_a, b.source AS source_b, a.ks AS ka, b.ks AS kb
           |       FROM sk a JOIN sk b ON a.source < b.source),
           |m AS (SELECT source_a, source_b, ka, kb,
           |        list_sort(list_distinct(list_concat(ka, kb))) AS mg FROM pr),
           |e AS (SELECT source_a, source_b,
           |        CAST(LEAST(len(mg), $k) AS BIGINT) AS keff,
           |        CAST(len(list_filter(mg[1:$k],
           |          v -> list_contains(ka, v) AND list_contains(kb, v))) AS BIGINT) AS k_overlap,
           |        CASE WHEN len(mg) < $k THEN CAST(len(mg) AS BIGINT)
           |             ELSE CAST($numer // mg[$k] AS BIGINT) END AS est_union
           |      FROM m)""".stripMargin
      if (!audit)
        s"""$shared
           |SELECT e.source_a, e.source_b, e.k_overlap, e.est_union,
           |  CAST((e.k_overlap * e.est_union) // e.keff AS BIGINT) AS est_intersection,
           |  ${PortableHash.proundSql("e.k_overlap * 1.0 / e.keff", 6)} AS jaccard_est
           |FROM e ORDER BY e.source_a, e.source_b""".stripMargin
      else
        s"""$shared,
           |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY source),
           |xi AS (SELECT a.source AS source_a, b.source AS source_b,
           |         CAST(count(*) AS BIGINT) AS xinter
           |       FROM d a JOIN d b ON a.uh = b.uh AND a.source < b.source GROUP BY 1, 2)
           |SELECT e.source_a, e.source_b, e.k_overlap, e.est_union,
           |  CAST((e.k_overlap * e.est_union) // e.keff AS BIGINT) AS est_intersection,
           |  CAST(za.n + zb.n - coalesce(xi.xinter, 0) AS BIGINT) AS exact_union,
           |  CAST(coalesce(xi.xinter, 0) AS BIGINT) AS exact_intersection,
           |  ${PortableHash.proundSql("e.k_overlap * 1.0 / e.keff", 6)} AS jaccard_est,
           |  ${PortableHash.proundSql(
               "coalesce(xi.xinter, 0) * 1.0 / (za.n + zb.n - coalesce(xi.xinter, 0))", 6)} AS jaccard_exact
           |FROM e
           |JOIN sz za ON za.source = e.source_a
           |JOIN sz zb ON zb.source = e.source_b
           |LEFT JOIN xi ON xi.source_a = e.source_a AND xi.source_b = e.source_b
           |ORDER BY e.source_a, e.source_b""".stripMargin
    },
    "q138_pagerank" -> Analytics.pageRankSql,
    "q139_lexical_retrieval" -> TextOps.lexicalRetrievalSql,
    "q140_holt_forecast" -> Analytics.holtForecastSql,
    "q141_table_profile" -> Analytics.tableProfileSql,
    "q142_hybrid_retrieval" -> SimilarityOps.hybridRetrievalSql,
    "q144_ivfpq_ann" -> SimilarityOps.ivfPqAnnSql,
    "q146_embedding_drift" -> SimilarityOps.embeddingDriftSql,
    "q147_quality_classifier" -> TextOps.qualityClassifierSql,
    "q148_unicode_normalize" -> TextOps.unicodeNormalizeSql,
    "q149_domain_filter" -> TextOps.domainFilterSql,
    "q151_boilerplate_lines" -> TextOps.boilerplateRemovalSql,
    "q145_stream_topk" ->
      s"""SELECT event_type, rank, event_id, user_id, value FROM (
         |  SELECT event_type, event_id, user_id, value,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY value DESC, event_id) AS BIGINT) AS rank
         |  FROM events)
         |WHERE rank <= ${graft.streaming.EventsStream.TopkK}
         |ORDER BY event_type, rank""".stripMargin,
    "q130_sketch_rollup" -> {
      val k = graft.functions.KmvSketch.K
      val numer = (k - 1).toLong * graft.functions.KmvSketch.Domain
      val r = Analytics.RollupDays
      s"""WITH e AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         |            user_id, ${PortableHash.h48Sql("CAST(user_id AS VARCHAR)")} AS uh
         |          FROM events),
         |d AS (SELECT DISTINCT day, uh FROM e),
         |b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM d),
         |sk AS (SELECT day, uh FROM
         |        (SELECT day, uh, row_number() OVER (PARTITION BY day ORDER BY uh) AS rn FROM d)
         |       WHERE rn <= $k),
         |ex AS (SELECT DISTINCT day + i AS win_end, uh
         |       FROM sk CROSS JOIN (SELECT unnest(generate_series(0, ${r - 1})) AS i) g, b
         |       WHERE day + i >= dmin + ${r - 1} AND day + i <= dmax),
         |k2 AS (SELECT win_end, count(*) AS nk, max(uh) AS kth FROM
         |        (SELECT win_end, uh, row_number() OVER (PARTITION BY win_end ORDER BY uh) AS rn FROM ex)
         |       WHERE rn <= $k GROUP BY win_end),
         |es AS (SELECT win_end,
         |         CAST(CASE WHEN nk < $k THEN nk ELSE ${numer} // kth END AS BIGINT) AS est_distinct
         |       FROM k2),
         |ud AS (SELECT DISTINCT day + i AS win_end, user_id
         |       FROM (SELECT DISTINCT day, user_id FROM e) u
         |       CROSS JOIN (SELECT unnest(generate_series(0, ${r - 1})) AS i) g, b
         |       WHERE day + i >= dmin + ${r - 1} AND day + i <= dmax),
         |xc AS (SELECT win_end, CAST(count(*) AS BIGINT) AS exact_distinct FROM ud GROUP BY win_end)
         |SELECT es.win_end, strftime(DATE '1970-01-01' + CAST(es.win_end AS INT), '%Y-%m-%d') AS window_date,
         |  est_distinct, exact_distinct,
         |  ${PortableHash.proundSql("abs(est_distinct - exact_distinct) * 100.0 / exact_distinct", 2)} AS err_pct
         |FROM es JOIN xc USING (win_end) ORDER BY es.win_end""".stripMargin
    },
    "q90_chunk_dedup" ->
      """WITH ch AS (SELECT doc_id, text,
        |              unnest(generate_series(0, CAST(ceil(length(text) / 64.0) AS INT) - 1)) AS ci
        |            FROM documents),
        |h AS (SELECT doc_id, md5(substr(text, ci * 64 + 1, 64)) AS m FROM ch),
        |g AS (SELECT m, count(*) AS n_copies, count(DISTINCT doc_id) AS n_docs,
        |             min(doc_id) AS keeper_doc_id
        |      FROM h GROUP BY m)
        |SELECT substr(m, 1, 12) AS md5_12, n_copies, n_docs, keeper_doc_id
        |FROM g WHERE n_copies > 1 ORDER BY md5_12""".stripMargin,
    "q91_quantized_recall" ->
      s"""${SimilarityOps.vectorsCteSql},
         |qz AS (SELECT vec_id, v, norm,
         |         [CAST(floor(v[i] / norm * ${SimilarityOps.QuantScale} + 0.5) AS BIGINT)
         |          for i in generate_series(1, ${SimilarityOps.Dim})] AS qv
         |       FROM vecs),
         |q AS (SELECT vec_id AS query_id, v AS fqv, norm AS qn, qv AS qqv FROM qz WHERE vec_id < 10),
         |j AS (SELECT query_id, e.vec_id AS neighbor_id,
         |        floor((${SimilarityOps.dotSql("e.v", "fqv")} / (e.norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          [e.qv[i] * qqv[i] for i in generate_series(1, ${SimilarityOps.Dim})]), (a, b) -> a + b) AS qdot
         |      FROM qz e CROSS JOIN q WHERE e.vec_id <> query_id),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS frank,
         |        row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS qrank
         |      FROM j),
         |ov AS (SELECT a.query_id, count(*) AS cnt
         |       FROM (SELECT query_id, neighbor_id FROM r WHERE frank <= ${SimilarityOps.RecallK}) a
         |       JOIN (SELECT query_id, neighbor_id FROM r WHERE qrank <= ${SimilarityOps.RecallK}) b
         |         USING (query_id, neighbor_id)
         |       GROUP BY 1)
         |SELECT q.query_id, coalesce(cnt, CAST(0 AS BIGINT)) AS n_overlap,
         |  floor((coalesce(cnt, CAST(0 AS BIGINT)) * 1.0 / ${SimilarityOps.RecallK}) * 1e2 + 0.5) / 1e2 AS recall
         |FROM q LEFT JOIN ov ON q.query_id = ov.query_id ORDER BY q.query_id""".stripMargin,
    "q125_pq_recall" ->
      s"""${SimilarityOps.vectorsCteSql},
         |qz AS (SELECT vec_id, v, norm,
         |         [CAST(floor(v[i] / norm * ${SimilarityOps.QuantScale} + 0.5) AS BIGINT)
         |          for i in generate_series(1, ${SimilarityOps.Dim})] AS qv
         |       FROM vecs),
         |tr AS (SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
         |       FROM (SELECT vec_id, qv FROM qz WHERE vec_id % ${SimilarityOps.PqTrainMod} = 0
         |             ORDER BY vec_id LIMIT ${SimilarityOps.PqCodes})),
         |ms AS (SELECT unnest(generate_series(0, ${SimilarityOps.PqM - 1})) AS m),
         |cb AS (SELECT m, cid, qv[m*${SimilarityOps.PqL}+1 : m*${SimilarityOps.PqL}+${SimilarityOps.PqL}] AS c
         |       FROM tr CROSS JOIN ms),
         |enc AS (SELECT vec_id, m, cid FROM (
         |    SELECT z.vec_id, cb.m, cb.cid,
         |      row_number() OVER (PARTITION BY z.vec_id, cb.m ORDER BY
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          [(z.qv[cb.m*${SimilarityOps.PqL}+i] - cb.c[i]) * (z.qv[cb.m*${SimilarityOps.PqL}+i] - cb.c[i])
         |           for i in generate_series(1, ${SimilarityOps.PqL})]), (a, b) -> a + b),
         |        cb.cid) AS rn
         |    FROM qz z CROSS JOIN cb) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS fqv, norm AS qn, qv AS qqv FROM qz WHERE vec_id < 10),
         |ad AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |         CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           [q.qqv[e.m*${SimilarityOps.PqL}+i] * cb.c[i] for i in generate_series(1, ${SimilarityOps.PqL})]),
         |           (a, b) -> a + b)) AS BIGINT) AS pqdot
         |       FROM enc e JOIN cb ON e.m = cb.m AND e.cid = cb.cid CROSS JOIN q
         |       WHERE e.vec_id <> q.query_id GROUP BY 1, 2),
         |co AS (SELECT query_id, e.vec_id AS neighbor_id,
         |         floor((${SimilarityOps.dotSql("e.v", "fqv")} / (e.norm * qn)) * 1e6 + 0.5) / 1e6 AS cosine
         |       FROM qz e CROSS JOIN q WHERE e.vec_id <> query_id),
         |r AS (SELECT co.query_id, co.neighbor_id,
         |        row_number() OVER (PARTITION BY co.query_id ORDER BY co.cosine DESC, co.neighbor_id) AS frank,
         |        row_number() OVER (PARTITION BY co.query_id ORDER BY ad.pqdot DESC, co.neighbor_id) AS qrank
         |      FROM co JOIN ad ON co.query_id = ad.query_id AND co.neighbor_id = ad.neighbor_id),
         |ov AS (SELECT query_id, count(*) AS cnt FROM r
         |       WHERE frank <= ${SimilarityOps.RecallK} AND qrank <= ${SimilarityOps.RecallK}
         |       GROUP BY 1)
         |SELECT q.query_id, coalesce(cnt, CAST(0 AS BIGINT)) AS n_overlap,
         |  floor((coalesce(cnt, CAST(0 AS BIGINT)) * 1.0 / ${SimilarityOps.RecallK}) * 1e2 + 0.5) / 1e2 AS recall
         |FROM q LEFT JOIN ov ON q.query_id = ov.query_id ORDER BY q.query_id""".stripMargin,
    "q126_semantic_dedup" -> SimilarityOps.semanticDedupSql,
    "q92_stratified_sample" ->
      s"""WITH b AS (SELECT lang, n_chars,
         |  ${PortableHash.h48Sql("text || ':sample'")} % 100 AS bucket,
         |  CASE lang WHEN 'en' THEN 10 WHEN 'es' THEN 25 WHEN 'de' THEN 50
         |            WHEN 'fr' THEN 40 WHEN 'zh' THEN 20 ELSE 15 END AS rate
         |FROM documents)
         |SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN bucket < rate THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
         |  CAST(max(rate) AS BIGINT) AS target_pct,
         |  floor((sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) * 100.0 / count(*)) * 1e4 + 0.5) / 1e4 AS actual_pct
         |FROM b GROUP BY lang ORDER BY lang""".stripMargin,
    "q93_skew_profile" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
        |t AS (SELECT *, CAST(sum(n_orders) OVER () AS BIGINT) AS total,
        |        CAST(row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT) AS rank,
        |        CAST(sum(n_orders) OVER (ORDER BY n_orders DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        |      FROM c)
        |SELECT rank, o_custkey, n_orders,
        |  floor((n_orders * 1.0 / total) * 1e6 + 0.5) / 1e6 AS share,
        |  floor((cum_n * 1.0 / total) * 1e6 + 0.5) / 1e6 AS cum_share
        |FROM t WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q94_peak_hour" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour_start, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT *, n * 1000000 -
        |        (CAST(datediff('day', DATE '2024-01-01', CAST(hour_start AS DATE)) AS BIGINT) * 24
        |         + hour(hour_start)) AS score
        |      FROM h)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
        |  max_by(hour_start, score) AS peak_hour,
        |  CAST(max_by(n, score) AS BIGINT) AS peak_n
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q95_lm_quality" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${PortableHash.tokensSql("lower(text)")}) AS term FROM documents),
         |tc AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM tc),
         |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |        sum(CAST(floor((ln(n_total * 1.0) - ln(c * 1.0)) * 1e6 + 0.5) AS BIGINT)) AS snll
         |      FROM tok JOIN tc USING (term) CROSS JOIN n
         |      GROUP BY doc_id),
         |s2 AS (SELECT doc_id, n_tokens,
         |        floor((snll * 1.0 / n_tokens / 1e6) * 1e4 + 0.5) / 1e4 AS avg_nll
         |       FROM s)
         |SELECT doc_id, n_tokens, avg_nll,
         |  floor(exp(avg_nll) * 1e2 + 0.5) / 1e2 AS ppl_proxy,
         |  avg_nll > 7.0 AS high_perplexity
         |FROM s2 ORDER BY doc_id""".stripMargin,
    "q96_centroid_sim" ->
      """WITH cents AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 16777216.0 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
        |    count(*) AS cnt
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        |  GROUP BY 1, 2),
        |norms AS (SELECT label,
        |    CAST(sum(CAST(sq AS DECIMAL(18,0)) * CAST(sq AS DECIMAL(18,0))) AS DOUBLE) AS n2i,
        |    max(cnt) AS cnt
        |  FROM cents GROUP BY 1),
        |pairs AS (SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(sum(CAST(a.sq AS DECIMAL(18,0)) * CAST(b.sq AS DECIMAL(18,0))) AS DOUBLE) AS doti
        |  FROM cents a JOIN cents b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  floor((doti / (sqrt(na.n2i) * sqrt(nb.n2i))) * 1e6 + 0.5) / 1e6 AS cosine,
        |  floor(sqrt(na.n2i / (na.cnt * 16777216.0 * na.cnt * 16777216.0)
        |           + nb.n2i / (nb.cnt * 16777216.0 * nb.cnt * 16777216.0)
        |           - doti * 2.0 / (na.cnt * 16777216.0 * nb.cnt * 16777216.0)) * 1e4 + 0.5) / 1e4 AS euclid
        |FROM pairs
        |JOIN norms na ON label_a = na.label
        |JOIN norms nb ON label_b = nb.label
        |ORDER BY label_a, label_b""".stripMargin,
    "q97_reconcile" ->
      """WITH o AS (SELECT o_custkey AS key, count(*) AS n_orders FROM orders GROUP BY 1),
        |e AS (SELECT user_id AS key, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT coalesce(o.key, e.key) AS key,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_events, 0) AS n_events,
        |  CASE WHEN n_orders IS NOT NULL AND n_events IS NOT NULL THEN 'both'
        |       WHEN n_orders IS NOT NULL THEN 'orders_only'
        |       ELSE 'events_only' END AS status
        |FROM o FULL OUTER JOIN e ON o.key = e.key
        |ORDER BY key""".stripMargin,
    "q98_multiset_ops" ->
      """WITH r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
        |a AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
        |i AS (SELECT * FROM r INTERSECT ALL SELECT * FROM a),
        |x AS (SELECT * FROM r EXCEPT ALL SELECT * FROM a)
        |SELECT 'except_all' AS tag, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys FROM x
        |UNION ALL
        |SELECT 'intersect_all' AS tag, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys FROM i
        |ORDER BY tag""".stripMargin,
    "q99_xpath_extract" ->
      """SELECT c_custkey,
        |  'P-' || CAST((c_custkey * 7) % 100000 AS VARCHAR) AS parcel_id,
        |  c_name AS owner,
        |  (c_custkey % 50) + 1 AS acreage,
        |  CAST(3 AS BIGINT) AS n_fields
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q100_csv_parse" ->
      """WITH w AS (SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 13 = 0 THEN 'not-a-number'
        |       ELSE CAST(CAST(floor(c_acctbal * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)) AS VARCHAR) END AS bal_str
        |FROM customer)
        |SELECT c_custkey,
        |  c_name AS parsed_name,
        |  try_cast(bal_str AS DOUBLE) AS parsed_bal,
        |  try_cast(bal_str AS DOUBLE) IS NOT NULL AS bal_ok
        |FROM w ORDER BY c_custkey""".stripMargin,
    "q101_corpus_pipeline" ->
      s"""$MinhashCtes,
         |nearv AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
         |          WHERE n_inter * 5 >= (sz_sum - n_inter) * 4),
         |qt AS (SELECT doc_id, lang, n_chars, text,
         |         ${PortableHash.tokensSql("text")} AS w,
         |         CASE WHEN ${PortableHash.h48Sql("text")} % 100 < 80 THEN 'train'
         |              WHEN ${PortableHash.h48Sql("text")} % 100 < 90 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM documents),
         |qm AS (SELECT doc_id, lang, n_chars, split,
         |         CAST(len(w) AS BIGINT) AS n_tokens,
         |         CAST(length(text) AS BIGINT) AS n_chars_m,
         |         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
         |         CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         |         CAST(len(list_filter(w, x -> list_contains($StopEnSqlList, x))) AS BIGINT) AS n_stop
         |       FROM qt),
         |qs AS (SELECT doc_id, lang, n_chars, split,
         |         floor(((n_stop * 1.0) / n_tokens + ((n_alpha * 1.0) / n_chars_m) * 0.5
         |               - ((n_punct * 1.0) / n_chars_m) * 2.0) * 1e4 + 0.5) / 1e4 AS quality
         |       FROM qm),
         |ev AS (SELECT d.doc_id FROM documents d JOIN
         |         (SELECT md5(text) AS m, min(doc_id) AS keeper, count(*) AS n
         |          FROM documents GROUP BY 1) g
         |         ON md5(d.text) = g.m
         |       WHERE g.n > 1 AND d.doc_id <> g.keeper),
         |surv AS (SELECT * FROM qs
         |         WHERE quality > 0.0
         |           AND NOT EXISTS (SELECT 1 FROM ev WHERE ev.doc_id = qs.doc_id)
         |           AND NOT EXISTS (SELECT 1 FROM nearv WHERE nearv.doc_id = qs.doc_id))
         |SELECT lang, split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  floor((CAST(sum(CAST(floor(quality * 1e4 + 0.5) AS BIGINT)) AS BIGINT) * 1.0
         |         / count(*) / 10000.0) * 1e6 + 0.5) / 1e6 AS avg_quality
         |FROM surv GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q102_minhash_capped" ->
      s"""$ShingleCtes
         |, hot AS (SELECT shash FROM shr GROUP BY shash HAVING count(*) > ${TextOps.MaxShingleDf}),
         |shc AS (SELECT doc_id, shash FROM shr
         |        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.shash = shr.shash)),
         |hslc AS (SELECT doc_id, list(DISTINCT shash) AS hs FROM shc GROUP BY doc_id),
         |sigc AS (SELECT doc_id, hs,
         |  [list_min([${PortableHash.permutedSql("j", "h")} for h in hs]) for j in generate_series(0, 63)] AS sg
         |FROM hslc),
         |bandsc AS (SELECT doc_id, bi,
         |  array_to_string([CAST(sg[bi * 4 + k + 1] AS VARCHAR) for k in generate_series(0, 3)], ':') AS band_sig
         |FROM sigc CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bi) g),
         |candc AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM bandsc x JOIN bandsc y
         |            ON x.bi = y.bi AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
         |pairsc AS (SELECT doc_a, doc_b,
         |  CAST(len(list_filter(ha.hs, h -> list_contains(hb.hs, h))) AS BIGINT) AS n_inter,
         |  CAST(len(ha.hs) AS BIGINT) + CAST(len(hb.hs) AS BIGINT) AS sz_sum
         |FROM candc JOIN hslc ha ON doc_a = ha.doc_id JOIN hslc hb ON doc_b = hb.doc_id)
         |SELECT doc_a, doc_b, n_inter, sz_sum - n_inter AS n_union,
         |  floor(((n_inter * 1.0) / (sz_sum - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
         |FROM pairsc
         |WHERE n_inter * 5 >= (sz_sum - n_inter) * 4
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q103_uniform_sample" ->
      s"""WITH k AS (SELECT doc_id, lang, n_chars,
         |  ${PortableHash.h48Sql("text || ':pick'")} AS pick_key
         |FROM documents),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY pick_key, doc_id) AS BIGINT) AS rank FROM k)
         |SELECT rank, doc_id, lang, n_chars FROM r
         |WHERE rank <= ${TextOps.UniformSampleK}
         |ORDER BY rank""".stripMargin,
    "q104_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, source, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |g8 AS (SELECT DISTINCT doc_id, source, ${PortableHash.h48Sql("s")} % ${PortableHash.M31} AS ghash
         |       FROM (SELECT doc_id, source, unnest(${PortableHash.shinglesSql("w", 8)}) AS s FROM tok) u),
         |bench AS (SELECT DISTINCT ghash FROM g8 WHERE source = 'src0'),
         |corpus AS (SELECT doc_id, ghash FROM g8 WHERE source <> 'src0'),
         |sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM corpus GROUP BY doc_id),
         |shared AS (SELECT doc_id, count(*) AS n_shared
         |           FROM corpus JOIN bench USING (ghash) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_ngrams, 0) AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
         |  coalesce(sh.n_shared, 0) > 0 AS contaminated
         |FROM documents d
         |LEFT JOIN sizes s ON d.doc_id = s.doc_id
         |LEFT JOIN shared sh ON d.doc_id = sh.doc_id
         |WHERE d.source <> 'src0'
         |ORDER BY d.doc_id""".stripMargin,
    "q143_neardup_decontaminate" ->
      s"""$MinhashBandsCtes,
         |src AS (SELECT doc_id, source FROM documents),
         |xc AS (SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id
         |       FROM bands c JOIN bands e ON c.bi = e.bi AND c.band_sig = e.band_sig
         |       JOIN src sc ON sc.doc_id = c.doc_id AND sc.source <> 'src0'
         |       JOIN src se ON se.doc_id = e.doc_id AND se.source = 'src0'),
         |xp AS (SELECT xc.doc_id, xc.eval_id,
         |  CAST(len(list_filter(hc.hs, h -> list_contains(he.hs, h))) AS BIGINT) AS n_inter,
         |  CAST(len(hc.hs) AS BIGINT) AS sz_c, CAST(len(he.hs) AS BIGINT) AS sz_e
         |  FROM xc JOIN hsl hc ON xc.doc_id = hc.doc_id JOIN hsl he ON xc.eval_id = he.doc_id),
         |v AS (SELECT * FROM xp WHERE n_inter * 2 >= sz_c + sz_e - n_inter)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |  min(eval_id) AS eval_match, max(n_inter) AS top_inter
         |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q105_passage_dedup" ->
      s"""WITH tok AS (SELECT doc_id, ${PortableHash.tokensSql("text")} AS w FROM documents),
         |pas AS (SELECT doc_id, i - 1 AS pidx,
         |  array_to_string(w[(i-1)*${TextOps.PassageLen}+1 : i*${TextOps.PassageLen}], ' ') AS passage
         |  FROM (SELECT doc_id, w,
         |          unnest(generate_series(1, CAST(ceil(len(w) / ${TextOps.PassageLen}.0) AS BIGINT))) AS i
         |        FROM tok) t),
         |ph AS (SELECT doc_id, pidx, ${PortableHash.h48Sql("passage")} % ${PortableHash.M31} AS phash FROM pas),
         |own AS (SELECT phash, min(doc_id * 4294967296 + pidx) AS owner FROM ph GROUP BY phash)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_passages,
         |  CAST(sum(CASE WHEN doc_id * 4294967296 + pidx = owner THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  floor((sum(CASE WHEN doc_id * 4294967296 + pidx = owner THEN 1 ELSE 0 END) * 1.0 / count(*)) * 1e4 + 0.5) / 1e4 AS kept_ratio
         |FROM ph JOIN own USING (phash)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q106_scd2_dimension" ->
      """WITH ded AS (SELECT o_custkey, o_orderdate,
        |              arg_max(o_orderpriority, o_orderkey) AS prio
        |            FROM orders GROUP BY o_custkey, o_orderdate),
        |chg AS (SELECT *, lag(prio) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev
        |        FROM ded)
        |SELECT o_custkey, prio,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS version,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) IS NULL AS is_current
        |FROM chg WHERE prev IS NULL OR prev <> prio
        |ORDER BY o_custkey, version""".stripMargin,
    "q107_fuzzy_match" ->
      """SELECT x.c_custkey AS cust_a, y.c_custkey AS cust_b,
        |  x.c_nationkey AS nationkey, x.c_mktsegment AS mktsegment,
        |  CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS edit_dist
        |FROM customer x JOIN customer y
        |  ON x.c_nationkey = y.c_nationkey AND x.c_mktsegment = y.c_mktsegment
        | AND x.c_custkey < y.c_custkey
        |WHERE levenshtein(x.c_name, y.c_name) <= 2
        |ORDER BY cust_a, cust_b""".stripMargin,
  )
}
