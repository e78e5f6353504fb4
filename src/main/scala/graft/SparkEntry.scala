package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the extension
  * surface: dedup, similarity search, text analysis, streaming) gets one
  * entry in [[queries]]; SQL-expressible ones also get a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL column names and deterministic values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_selective_agg"  -> (Relational.q2SelectiveAgg _),
    "q3_join_topk"      -> (Relational.q3JoinTopk _),
    "q4_semi_join"      -> (Relational.q4SemiJoin _),
    "q5_anti_join"      -> (Relational.q5AntiJoin _),
    "q6_multi_join"     -> (Relational.q6MultiJoin _),
    "q7_broadcast_join" -> (Relational.q7BroadcastJoin _),
    "q8_window_rank"    -> (Relational.q8WindowRank _),
    "q9_window_running" -> (Relational.q9WindowRunning _),
    "q10_topk"          -> (Relational.q10TopK _),
    "q11_setops"        -> (Relational.q11SetOps _),
    "q12_rollup"        -> (Relational.q12Rollup _),
    "q13_cube"          -> (Relational.q13Cube _),
    "q14_distinct_agg"  -> (Relational.q14DistinctAgg _),
    "q15_scalar"        -> (Relational.q15Scalar _),
    "q16_date_parts"    -> (Relational.q16DateParts _),
    "q17_json"          -> (Relational.q17Json _),
    "q18_asof"          -> (Relational.q18AsOf _),
    "q19_event_window"  -> (Relational.q19EventWindow _),
    "q20_approx_distinct" -> (Relational.q20ApproxDistinct _),
    "q21_arrays"        -> (Relational.q21Arrays _),
    "q23_stats"         -> (Relational.q23Stats _),
    "q24_pivot"         -> (Relational2.q24Pivot _),
    "q25_correlated"    -> (Relational2.q25Correlated _),
    "q26_posexplode"    -> (Relational2.q26PosExplode _),
    "q27_maps"          -> (Relational2.q27Maps _),
    "q28_regex"         -> (Relational2.q28Regex _),
    "q29_window_battery" -> (Relational2.q29WindowBattery _),
    "q30_range_join"    -> (Relational2.q30RangeJoin _),
    "mr_wc"             -> (MrQueries.mrWc _),
    "mr_indexer"        -> (MrQueries.mrIndexer _),
    "mr_doc_tokens"     -> (MrQueries.mrDocTokens _),
    "mr_metadata"       -> (MrQueries.mrMetadata _),
    "mr_compat_wc"      -> (MrQueries.mrCompatWc _),
    "mr_compat_indexer" -> (MrQueries.mrCompatIndexer _),
    "ta_quality"        -> (TextAnalysis.taQuality _),
    "ta_token_count"    -> (TextAnalysis.taTokenCount _),
    "ta_lang_id"        -> (TextAnalysis.taLangId _),
    "ta_fingerprint"    -> (TextAnalysis.taFingerprint _),
    "ta_chunk_fp"       -> (TextAnalysis.taChunkFp _),
    "dedup_exact"       -> (Dedup.dedupExact _),
    "dedup_ngram"       -> (Dedup.dedupNgram _),
    "dedup_minhash"     -> (Dedup.dedupMinhash _),
    "dedup_simhash"     -> (Dedup.dedupSimhash _),
    "dedup_embedding"   -> (Dedup.dedupEmbedding _),
    "dedup_cc"          -> (Dedup.dedupCc _),
    "ta_tfidf"          -> (CorpusOps.taTfidf _),
    "ta_bigrams"        -> (CorpusOps.taBigrams _),
    "sample_stratified" -> (CorpusOps.sampleStratified _),
    "sim_topk"          -> (Similarity.simTopk _),
    "sim_lsh_topk"      -> (Similarity.simLshTopk _),
    "sim_ivf_topk"      -> (Similarity.simIvfTopk _),
    "stream_sliding"    -> (graft.streaming.EventStreams.qStreamSliding _),
    "stream_session"    -> (graft.streaming.EventStreams.qStreamSession _),
    "stream_user_stats" -> (graft.streaming.EventStreams.qStreamUserStats _),
    "stream_join"       -> (graft.streaming.EventStreams.qStreamJoin _),
    "stream_dedup"      -> (graft.streaming.EventStreams.qStreamDedup _),
    "mm_features"       -> (graft.multimodal.Media.mmFeatures _),
    "sql_direct"        -> (SqlSurface.qSqlDirect _),
    "q22_grouping_sets" -> (SqlSurface.qGroupingSets _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1AggSql,
    "q2_selective_agg"  -> Relational.q2SelectiveAggSql,
    "q3_join_topk"      -> Relational.q3JoinTopkSql,
    "q4_semi_join"      -> Relational.q4SemiJoinSql,
    "q5_anti_join"      -> Relational.q5AntiJoinSql,
    "q6_multi_join"     -> Relational.q6MultiJoinSql,
    "q7_broadcast_join" -> Relational.q7BroadcastJoinSql,
    "q8_window_rank"    -> Relational.q8WindowRankSql,
    "q9_window_running" -> Relational.q9WindowRunningSql,
    "q10_topk"          -> Relational.q10TopKSql,
    "q11_setops"        -> Relational.q11SetOpsSql,
    "q12_rollup"        -> Relational.q12RollupSql,
    "q13_cube"          -> Relational.q13CubeSql,
    "q14_distinct_agg"  -> Relational.q14DistinctAggSql,
    "q15_scalar"        -> Relational.q15ScalarSql,
    "q16_date_parts"    -> Relational.q16DatePartsSql,
    "q17_json"          -> Relational.q17JsonSql,
    "q18_asof"          -> Relational.q18AsOfSql,
    "q19_event_window"  -> Relational.q19EventWindowSql,
    "q20_approx_distinct" -> Relational.q20ApproxDistinctSql,
    "q21_arrays"        -> Relational.q21ArraysSql,
    "q23_stats"         -> Relational.q23StatsSql,
    "q24_pivot"         -> Relational2.q24PivotSql,
    "q25_correlated"    -> Relational2.q25CorrelatedSql,
    "q26_posexplode"    -> Relational2.q26PosExplodeSql,
    "q27_maps"          -> Relational2.q27MapsSql,
    "q28_regex"         -> Relational2.q28RegexSql,
    "q29_window_battery" -> Relational2.q29WindowBatterySql,
    "q30_range_join"    -> Relational2.q30RangeJoinSql,
    "mr_wc"             -> MrQueries.mrWcSql,
    "mr_indexer"        -> MrQueries.mrIndexerSql,
    "mr_doc_tokens"     -> MrQueries.mrDocTokensSql,
    "mr_metadata"       -> MrQueries.mrMetadataSql,
    "mr_compat_wc"      -> MrQueries.mrCompatWcSql,
    "mr_compat_indexer" -> MrQueries.mrCompatIndexerSql,
    "ta_quality"        -> TextAnalysis.taQualitySql,
    "ta_token_count"    -> TextAnalysis.taTokenCountSql,
    "ta_lang_id"        -> TextAnalysis.taLangIdSql,
    "ta_fingerprint"    -> TextAnalysis.taFingerprintSql,
    "dedup_exact"       -> Dedup.dedupExactSql,
    "dedup_ngram"       -> Dedup.dedupNgramSql,
    "dedup_minhash"     -> Dedup.dedupMinhashSql,
    "dedup_simhash"     -> Dedup.dedupSimhashSql,
    "dedup_embedding"   -> Dedup.dedupEmbeddingSql,
    "dedup_cc"          -> Dedup.dedupCcSql,
    "ta_tfidf"          -> CorpusOps.taTfidfSql,
    "ta_bigrams"        -> CorpusOps.taBigramsSql,
    "sample_stratified" -> CorpusOps.sampleStratifiedSql,
    "sim_topk"          -> Similarity.simTopkSql,
    "sim_lsh_topk"      -> Similarity.simLshTopkSql,
    "sim_ivf_topk"      -> Similarity.simIvfTopkSql,
    "stream_sliding"    -> graft.streaming.EventStreams.qStreamSlidingSql,
    "stream_session"    -> graft.streaming.EventStreams.qStreamSessionSql,
    "stream_user_stats" -> graft.streaming.EventStreams.qStreamUserStatsSql,
    "stream_join"       -> graft.streaming.EventStreams.qStreamJoinSql,
    "stream_dedup"      -> graft.streaming.EventStreams.qStreamDedupSql,
    "mm_features"       -> graft.multimodal.Media.mmFeaturesSql,
    "sql_direct"        -> SqlSurface.sqlDirect,
    "q22_grouping_sets" -> SqlSurface.sqlGroupingSets
  )

  /** Headline subset used by Bench (keep it representative, not exhaustive). */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q2_selective_agg", "q3_join_topk", "q6_multi_join",
    "q7_broadcast_join", "q9_window_running", "q14_distinct_agg", "q18_asof",
    "mr_wc", "dedup_exact", "dedup_minhash", "dedup_cc", "ta_tfidf",
    "sim_lsh_topk", "stream_session")
}
