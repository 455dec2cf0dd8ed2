package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Core, Dedup, Events, Multimodal, Pipeline, Profile, Relational, Relational2, Relational3, Sim, Skew, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY.md §2;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the driver's t2
  * correctness gate. Column names and value types are aligned on both sides
  * (aggregates computed in exact DECIMAL then cast to DOUBLE) so the
  * driver's sorted-column value hash matches bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2b parity queries (the reference's own workloads, Spark-native)
    "wc_shell" -> (Core.wordCountTr _),
    "wc_python" -> (Core.wordCountWs _),
    "grep" -> ((s, d) => Core.grep(s, d, "spark")),
    "pipe_cat" -> (Core.pipeCatCount _),
    // §2c relational catalogue
    "q1_pricing" -> (Relational.q1PricingSummary _),
    "q_filter_project" -> (Relational.qFilterProject _),
    "q_join_nation_revenue" -> (Relational.qJoinNationRevenue _),
    "q3_shipping" -> (Relational.q3Shipping _),
    "q_join_left" -> (Relational.qJoinLeft _),
    "q_join_semi" -> (Relational.qJoinSemi _),
    "q_join_anti" -> (Relational.qJoinAnti _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_topk_customers" -> (Relational.qTopKCustomers _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_window_lag" -> (Relational.qWindowLag _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_union" -> (Relational.qUnion _),
    "q_intersect" -> (Relational.qIntersect _),
    "q_except" -> (Relational.qExcept _),
    "q_string_funcs" -> (Relational.qStringFuncs _),
    "q_date_funcs" -> (Relational.qDateFuncs _),
    "q_math_funcs" -> (Relational.qMathFuncs _),
    "q_json_events" -> (Relational.qJsonEvents _),
    "q_count_distinct" -> (Relational.qCountDistinct _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_grouping_sets" -> (Relational2.qGroupingSets _),
    "q_exists_subquery" -> (Relational2.qExistsSubquery _),
    "q_scalar_subquery" -> (Relational2.qScalarSubquery _),
    "q_range_join" -> (Relational2.qRangeJoin _),
    "q_pivot" -> (Relational2.qPivot _),
    "q_median" -> (Relational2.qMedian _),
    "q_salted_agg" -> (Skew.qSaltedAgg _),
    "q_salted_join" -> (Skew.qSaltedJoin _),
    "q_except_all" -> (Relational3.qExceptAll _),
    "q_intersect_all" -> (Relational3.qIntersectAll _),
    "q_window_battery" -> (Relational3.qWindowBattery _),
    "q_event_sliding" -> (Relational3.qEventSliding _),
    "q_histogram" -> (Relational3.qHistogram _),
    "q_join_full" -> (graft.ops.Relational4.qJoinFull _),
    "q_null_funcs" -> (graft.ops.Relational4.qNullFuncs _),
    "q_quantiles" -> (graft.ops.Relational4.qQuantiles _),
    "q_event_resample" -> (graft.ops.Relational4.qEventResample _),
    "q_explode_tokens" -> (graft.ops.Relational5.qExplodeTokens _),
    "q_unpivot" -> (graft.ops.Relational5.qUnpivot _),
    "q_array_funcs" -> (graft.ops.Relational5.qArrayFuncs _),
    "q_sample_hash" -> (graft.ops.Relational5.qSampleHash _),
    "q_approx_quantiles" -> (graft.ops.Relational5.qApproxQuantiles _),
    "q_window_range" -> (graft.ops.Relational5.qWindowRange _),
    "q_stream_tumbling" -> (graft.streaming.Streaming.qStreamTumbling _),
    "q_stream_sessions" -> (graft.streaming.Streaming.qStreamSessions _),
    "q_stream_sliding" -> (graft.streaming.Streaming.qStreamSliding _),
    "q_stream_join" -> (graft.streaming.Streaming.qStreamJoin _),
    "q_stream_left_join" -> (graft.streaming.Streaming.qStreamLeftJoin _),
    "q_stream_full_join" -> (graft.streaming.Streaming.qStreamFullJoin _),
    "q_stream_session_window" -> (graft.streaming.Streaming.qStreamSessionWindow _),
    "q_stream_dedup" -> (graft.streaming.Streaming.qStreamDedup _),
    "q_stream_upsert" -> (graft.streaming.Streaming.qStreamUpsert _),
    "q_stream_static_join" -> (graft.streaming.Streaming.qStreamStaticJoin _),
    "q_stream_first_touch" -> (graft.streaming.StateV2.qStreamFirstTouch _),
    "q_stream_first_touch_boot" ->
      (graft.streaming.StateV2.qStreamFirstTouchBoot _),
    "q_stream_sessions_v2" -> (graft.streaming.StateV2.qStreamSessionsV2 _),
    "q_event_zscore" -> (graft.ops.Robust.qEventZscore _),
    "q_winsorize" -> (graft.ops.Robust.qWinsorize _),
    "q_feature_binning" -> (graft.ops.Robust.qFeatureBinning _),
    "q_join_hinted" -> (graft.ops.Relational7.qJoinHinted _),
    "q_stats_agg" -> (graft.ops.Relational6.qStatsAgg _),
    "q_string_funcs2" -> (graft.ops.Relational6.qStringFuncs2 _),
    "q_date_funcs2" -> (graft.ops.Relational6.qDateFuncs2 _),
    "q_count_if" -> (graft.ops.Relational6.qCountIf _),
    "q_map_hof" -> (graft.ops.Relational6.qMapHof _),
    "q_explode_outer" -> (graft.ops.Relational6.qExplodeOuter _),
    "q_union_by_name" -> (graft.ops.Relational6.qUnionByName _),
    "q_try_funcs" -> (graft.ops.Relational6.qTryFuncs _),
    "q_sink_roundtrip" -> (graft.sources.Sources.qSinkRoundtrip _),
    "q_bucketed_join" -> (graft.sources.Sources.qBucketedJoin _),
    "q_zorder_scan" -> (graft.sources.Sources.qZOrderScan _),
    "q_session_window" -> (graft.ops.Relational7.qSessionWindow _),
    "q_sql_entry" -> (graft.ops.Relational7.qSqlEntry _),
    "q_lateral_topn" -> (graft.ops.Relational7.qLateralTopN _),
    "q_bitwise" -> (graft.ops.Relational7.qBitwise _),
    "q_interval_arith" -> (graft.ops.Relational7.qIntervalArith _),
    "q_variant_json" -> (graft.ops.Relational7.qVariantJson _),
    "q_collect_list" -> (graft.ops.Relational7.qCollectList _),
    "q_partition_pruning" -> (graft.ops.Relational7.qPartitionPruning _),
    "q_topk_typed" -> (graft.ops.Typed.qTopKTyped _),
    "q_graph_pagerank" -> (graft.ops.Graph.qGraphPagerank _),
    "q_cogroup" -> (graft.ops.Typed.qCogroup _),
    // text analysis (documents)
    "q_text_stats" -> (Text.qTextStats _),
    "q_lang_id" -> (Text.qLangId _),
    "q_quality" -> (Text.qQuality _),
    "q_token_count" -> (Text.qTokenCount _),
    "q_fingerprint" -> (Text.qFingerprint _),
    "q_ngram_top" -> (Text.qNgramTop _),
    "q_heavy_hitters" -> (graft.ops.HeavyHitters.qHeavyHitters _),
    "q_tfidf_top" -> (Text.qTfidfTop _),
    "q_pmi_bigrams" -> (graft.ops.Text2.qPmiBigrams _),
    "q_bpe_merges" -> (graft.ops.Bpe.qBpeMerges _),
    "q_bpe_apply" -> (graft.ops.Bpe.qBpeApply _),
    "q_sample_stratified" -> (Text.qSampleStratified _),
    "q_fingerprint_rolling" -> (Text.qFingerprintRolling _),
    "q_mm_frames" -> (Multimodal.qMmFrames _),
    "q_text_redact" -> (Text.qTextRedact _),
    "q_text_chunk" -> (Text.qTextChunk _),
    "q_contamination" -> (Text.qContamination _),
    "q_text_repetition" -> (Text.qTextRepetition _),
    "q_bm25" -> (graft.ops.Search.qBm25Search _),
    "q_hybrid_search" -> (graft.ops.Search.qHybridSearch _),
    "q_hybrid_search_ivf" -> (graft.ops.Search.qHybridSearchIvf _),
    "q_sample_weighted" -> (graft.ops.Search.qSampleWeighted _),
    "q_decontaminate" -> (graft.ops.Search.qDecontaminate _),
    "q_quality_budget" -> (graft.ops.Search.qQualityBudget _),
    // dedup
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_minhash" -> (Dedup.qDedupMinhash _),
    "q_dedup_jaccard" -> (Dedup.qDedupJaccard _),
    "q_dedup_jaccard_capped" -> (Dedup.qDedupJaccardCapped _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_dedup_embed" -> (Dedup.qDedupEmbed _),
    "q_dedup_resolve" -> (Dedup.qDedupResolve _),
    "q_dedup_verify" -> (Dedup.qDedupVerify _),
    "q_dedup_keep_best" -> (Dedup.qDedupKeepBest _),
    "q_dedup_quality" -> (Dedup.qDedupQuality _),
    "q_dedup_incremental" -> (Pipeline.qDedupIncremental _),
    "q_dedup_substr" -> (graft.ops.Search.qDedupSubstr _),
    // training-pipeline composites
    "q_pack_sequences" -> (Pipeline.qPackSequences _),
    "q_split_train" -> (Pipeline.qSplitTrain _),
    "q_merge_upsert" -> (Pipeline.qMergeUpsert _),
    "q_corpus_diff" -> (Pipeline.qCorpusDiff _),
    "q_mix_sources" -> (Pipeline.qMixSources _),
    "q_bloom_join" -> (Pipeline.qBloomJoin _),
    "q_profile" -> (Profile.qProfile _),
    "q_constraints" -> (Profile.qConstraints _),
    "q_sketch_union" -> (Profile.qSketchUnion _),
    // similarity search (embeddings)
    "q_sim_topk" -> (Sim.qSimTopK _),
    "q_sim_topk_native" -> (Sim.qSimTopKNative _),
    "q_sim_lsh" -> (Sim.qSimLsh _),
    "q_sim_ivf" -> (Sim.qSimIvf _),
    "q_sim_ivf_pruned" -> (Sim.qSimIvfPruned _),
    "q_sim_ivf_kmeans" -> (Sim.qSimIvfKmeans _),
    "q_sim_label_coherence" -> (Sim.qSimLabelCoherence _),
    "q_sim_batch_topk" -> (graft.ops.Sim2.qSimBatchTopK _),
    "q_sim_batch_ivf" -> (graft.ops.Sim2.qSimBatchIvf _),
    "q_sim_batch_ivf_salted" -> (graft.ops.Sim2.qSimBatchIvfSalted _),
    "q_sim_quantize" -> (graft.ops.Sim2.qSimQuantize _),
    "q_random_projection" -> (graft.ops.Embed.qRandomProjection _),
    "q_dedup_semantic" -> (graft.ops.Embed.qDedupSemantic _),
    "q_unigram_lm" -> (graft.ops.Text2.qUnigramLm _),
    "q_negative_sample" -> (graft.ops.Embed.qNegativeSample _),
    "q_corpus_curate" -> (graft.ops.Curate.qCorpusCurate _),
    "q_fuzzy_join" -> (graft.ops.Fuzzy.qFuzzyJoin _),
    "q_fuzzy_join_capped" -> (graft.ops.Fuzzy.qFuzzyJoinCapped _),
    // event-time (events)
    "q_event_tumbling" -> (Events.qEventTumbling _),
    "q_event_sessions" -> (Events.qEventSessions _),
    "q_event_asof" -> (Events.qEventAsof _),
    "q_event_funnel" -> (graft.ops.Events2.qEventFunnel _),
    "q_event_retention" -> (graft.ops.Events2.qEventRetention _),
    "q_time_to_convert" -> (graft.ops.Events2.qTimeToConvert _),
    "q_window_time_range" -> (graft.ops.Events2.qWindowTimeRange _),
    "q_event_asof_plan" -> (Events.qEventAsofPlan _),
    "q_map_funcs" -> (Events.qMapFuncs _),
    // multimodal plumbing
    "q_mm_meta" -> (Multimodal.qMmMeta _),
    "q_mm_features" -> (Multimodal.qMmFeatures _),
    "q_mm_resize" -> (Multimodal.qMmResize _),
    "q_mm_audio" -> (Multimodal.qMmAudio _),
    "q_mm_audio_resample" -> (Multimodal.qMmAudioResample _),
  )

  /** DuckDB-runnable ANSI SQL twin for each query (driver t2 gate).
    * Omitted keys (sketches, pipes with no SQL equivalent) get the
    * driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "wc_shell" ->
      """SELECT w AS word, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[\[\] \t\n]')) AS w
        |      FROM documents)
        |GROUP BY w ORDER BY word""".stripMargin,
    "wc_python" ->
      """SELECT w AS word, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
        |      FROM documents)
        |WHERE w <> '' GROUP BY w ORDER BY word""".stripMargin,
    "grep" ->
      """SELECT doc_id, text FROM documents
        |WHERE lower(text) LIKE '%spark%' ORDER BY text, doc_id""".stripMargin,
    "pipe_cat" ->
      """SELECT l_returnflag AS flag, COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // sum_disc_price/sum_charge cast DECIMAL->VARCHAR->DOUBLE: DuckDB's
    // direct decimal-to-double cast double-rounds (hugeint -> double,
    // THEN /10^scale) once the scaled integer passes 2^53 — one ulp off
    // at 10x data (found by the scaled gate); the string parse is
    // correctly rounded, matching Spark's BigDecimal.doubleValue.
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'MACHINERY'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, order_date
        |ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_topk_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type_pfx,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  l_orderkey % 7 AS key_mod,
        |  l_quantity * l_quantity AS qty_sq
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "q_json_events" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  ) ++ Text.oracles ++ graft.ops.Text2.oracles ++ graft.ops.Bpe.oracles ++
    Dedup.oracles ++ Pipeline.oracles ++
    Profile.oracles ++ Sim.oracles ++ graft.ops.Sim2.oracles ++
    Events.oracles ++ graft.ops.Events2.oracles ++
    Multimodal.oracles ++ Relational2.oracles ++ Relational3.oracles ++
    graft.ops.Relational4.oracles ++ graft.ops.Relational5.oracles ++
    graft.ops.Relational6.oracles ++ graft.ops.Relational7.oracles ++
    graft.ops.Typed.oracles ++ graft.ops.Graph.oracles ++
    graft.ops.HeavyHitters.oracles ++
    graft.sources.Sources.oracles ++
    graft.streaming.Streaming.oracles ++
    graft.streaming.StateV2.oracles ++ Skew.oracles ++
    graft.ops.Robust.oracles ++ graft.ops.Embed.oracles ++
    graft.ops.Curate.oracles ++ graft.ops.Fuzzy.oracles ++
    graft.ops.Search.oracles
}
