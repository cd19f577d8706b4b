package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §6
  * (verification). Every implemented operator appears in `queries`;
  * SQL-expressible ones also appear in `oracleSql` with IDENTICAL
  * column names and ORDER BY so the DuckDB compare hash-matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3TopRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q2_filter_pushdown" -> (Relational.q2FilterPushdown _),
    "q3_top_revenue"     -> (Relational.q3TopRevenue _),
    "q4_region_sales"    -> (Relational.q4RegionSales _),
    "q5_window_rank"     -> (Relational.q5WindowRank _),
    "q6_distinct_parts"  -> (Relational.q6DistinctParts _),
    "q7_topk_orders"     -> (Relational.q7TopkOrders _),
    "q8_semi_join"       -> (Relational.q8SemiJoin _),
    "q9_anti_join"       -> (Relational.q9AntiJoin _),
    "q10_union_accounts" -> (Relational.q10UnionAccounts _),
    "q11_rollup"         -> (Relational.q11Rollup _),
    "q12_case_agg"       -> (Relational.q12CaseAgg _),
    "q13_scalar_subquery" -> (Relational.q13ScalarSubquery _),
    "q14_sessionize"     -> (Sessionize.q14Sessionize _),
    "q15_pivot_events"   -> (Relational.q15PivotEvents _),
    "st1_window_agg"     -> (Sessionize.st1WindowAgg _),
    "t1_token_stats"     -> (TextAnalysis.t1TokenStats _),
    "t2_quality_score"   -> (TextAnalysis.t2QualityScore _),
    "t3_lang_id"         -> (TextAnalysis.t3LangId _),
    "t4_fingerprint"     -> (TextAnalysis.t4Fingerprint _),
    "d1_exact_dedup"     -> (Dedup.d1ExactDedup _),
    "d2_ngram_jaccard"   -> (Dedup.d2NgramJaccard _),
    "d3_minhash_lsh"     -> (Dedup.d3MinhashLsh _),
    "d8_containment"     -> (Dedup.d8Containment _),
    "t11_zipf"           -> (TextAnalysis.t11Zipf _),
    "s5_radius_search"   -> (Similarity.s5RadiusSearch _),
    "d4_simhash"         -> (Dedup.d4Simhash _),
    "d5_embedding_dedup" -> (Similarity.d5EmbeddingDedup _),
    "d10_semdedup"       -> (Similarity.d10SemDedup _),
    "s1_knn_brute"       -> (Similarity.s1KnnBrute _),
    "s2_ann_ivf"         -> ((s: SparkSession, d: String) => Similarity.s2AnnIvf(s, d)),
    // the deterministic IVF configuration: probing every cluster makes
    // the index path exact, so the same brute-force SQL oracles it
    "s2_ann_full"        -> ((s: SparkSession, d: String) =>
      Similarity.s2AnnIvf(s, d, Similarity.IvfClusters)),
    // bound-pruned probing is EXACT (triangle inequality on the
    // sphere), so brute force oracles it too
    "s8_adaptive_ann"    -> (Similarity.s8AdaptiveAnn _),
    "s9_knn_graph"       -> ((s: SparkSession, d: String) => Similarity.s9KnnGraph(s, d)),
    "m1_als_recommend"   -> (graft.ml.Recommender.m1AlsRecommend _),
    "m2_sentiment"       -> (graft.ml.Sentiment.m2Sentiment _),
    "m3_similar_items"   -> (graft.ml.Recommender.m3SimilarItems _),
    "m4_sentiment_rollup" -> (graft.ml.Sentiment.m4SentimentBySource _),
    "mm1_binary_meta"    -> (graft.multimodal.Multimodal.mm1BinaryMeta _),
    "mm2_frame_sample"   -> (graft.multimodal.Multimodal.mm2FrameSample _),
    "q16_asof_join"      -> (Advanced.q16AsofJoin _),
    "q16_asof_exec"      -> (Advanced.q16AsofJoinExec _),
    "q17_range_join"     -> (Advanced.q17RangeJoin _),
    "q18_json_extract"   -> (Advanced.q18JsonExtract _),
    "q19_cube"           -> (Advanced.q19Cube _),
    "q20_percentile"     -> (Advanced.q20Percentile _),
    "q21_approx_distinct" -> (Advanced.q21ApproxDistinct _),
    "q22_moving_avg"     -> (Advanced.q22MovingAvg _),
    "q23_top_per_group"  -> (Advanced.q23TopPerGroup _),
    "q24_approx_percentile" -> (Advanced.q24ApproxPercentile _),
    "q25_string_ops"     -> (Advanced.q25StringOps _),
    "mm3_cdc_chunks"     -> (graft.multimodal.Multimodal.mm3CdcChunks _),
    "p1_clean_corpus"    -> (Dedup.p1CleanCorpus _),
    "i1_csv_ingest"      -> (Ingest.i1CsvIngest _),
    "i2_json_ingest"     -> (Ingest.i2JsonIngest _),
    "d6_dup_groups"      -> (Dedup.d6DupGroups _),
    "t5_repetition"      -> (TextAnalysis.t5Repetition _),
    "p2_sample_mix"      -> (Sampling.p2SampleMix _),
    "q26_corr_subquery"  -> (Advanced.q26CorrSubquery _),
    "q27_set_ops"        -> (Advanced.q27SetOps _),
    "q28_unpivot"        -> (Advanced.q28Unpivot _),
    "q29_funnel"         -> (Advanced.q29Funnel _),
    "mm4_phash"          -> (graft.multimodal.Multimodal.mm4Phash _),
    "mm5_phash_pairs"    -> (graft.multimodal.Multimodal.mm5PhashPairs _),
    "i3_orc_ingest"      -> (Ingest.i3OrcIngest _),
    "q30_ewma"           -> (Advanced.q30Ewma _),
    "q31_string_agg"     -> (Advanced.q31StringAgg _),
    "q32_date_parts"     -> (Advanced.q32DateParts _),
    "q33_vector_stats"   -> (Similarity.q33VectorStats _),
    "q34_upsert"         -> (Relational.q34Upsert _),
    "q35_sql"            -> (Relational.q35Sql _),
    "q57_blame_supplier" -> (Relational.q57BlameSupplier _),
    "t6_heavy_hitters"   -> (TextAnalysis.t6HeavyHitters _),
    "t7_bigram_freq"     -> (TextAnalysis.t7BigramFreq _),
    "t8_pii_scrub"       -> (TextAnalysis.t8PiiScrub _),
    "p3_decontaminate"   -> (Dedup.p3Decontaminate _),
    "p19_contamination"  -> (Dedup.p19ContaminationReport _),
    "p4_chunk_docs"      -> (TextAnalysis.p4ChunkDocs _),
    "q36_grouping_sets"  -> (Analytics.q36GroupingSets _),
    "q38_window_suite"   -> (Analytics.q38WindowSuite _),
    "q39_range_frame"    -> (Analytics.q39RangeFrame _),
    "q40_regexp_extract" -> (Analytics.q40RegexpExtract _),
    "q42_cohort_retention" -> (Analytics.q42CohortRetention _),
    "p5_pack_sequences"  -> (TextAnalysis.p5PackSequences _),
    "q37_stats_suite"    -> (Analytics.q37StatsSuite _),
    "q41_ship_delay"     -> (Analytics.q41ShipDelay _),
    "t9_surprisal"       -> (TextAnalysis.t9Surprisal _),
    "m5_unseen_recs"     -> (graft.ml.Recommender.m5UnseenRecs _),
    "q43_cooccur"        -> (Analytics.q43Cooccur _),
    "q44_gap_fill"       -> (Analytics.q44GapFill _),
    "p6_mix_allocate"    -> (Sampling.p6MixAllocate _),
    "s4_pq_ann"          -> (Similarity.s4PqAnn _),
    "q45_histogram"      -> (Analytics.q45Histogram _),
    "q46_attribution"    -> (Analytics.q46Attribution _),
    "t10_keywords"       -> (TextAnalysis.t10Keywords _),
    "d7_substring_spans" -> (Dedup.d7SubstringSpans _),
    "p7_cut_spans"       -> (Dedup.p7CutSpans _),
    "p7_cut_keep_first"  -> (Dedup.p7CutKeepFirst _),
    "m6_cold_start"      -> (graft.ml.Recommender.m6ColdStart _),
    "q48_yoy_growth"     -> (Analytics.q48YoyGrowth _),
    "q47_share_of_total" -> (Analytics.q47ShareOfTotal _),
    "st2_sliding_window" -> (Sessionize.st2SlidingWindow _),
    "i4_partitioned_ingest" -> (Ingest.i4PartitionedIngest _),
    "q49_rfm"            -> (Analytics.q49Rfm _),
    "m7_rec_metrics"     -> (graft.ml.Recommender.m7RecMetrics _),
    "q50_assoc_rules"    -> (Analytics.q50AssocRules _),
    "q51_user_growth"    -> (Analytics.q51UserGrowth _),
    "q52_outlier_days"   -> (Analytics.q52OutlierDays _),
    "t12_bigram_surprisal" -> (TextAnalysis.t12BigramSurprisal _),
    "t13_tfidf_cosine"   -> (TextAnalysis.t13TfidfCosine _),
    "q55_seasonal"       -> (Analytics.q55Seasonal _),
    "q56_transitions"    -> (Analytics.q56Transitions _),
    "q58_rolling_actives" -> (Analytics.q58RollingActives _),
    "q59_concurrency"    -> (Analytics.q59Concurrency _),
    "p8_canonicalize"    -> (Dedup.p8Canonicalize _),
    "i5_xml_ingest"      -> (Ingest.i5XmlIngest _),
    "p9_curriculum"      -> (Sampling.p9Curriculum _),
    "p10_near_dedup"     -> (Dedup.p10NearDedup _),
    "p10_exact_dedup"    -> (Dedup.p10ExactDedup _),
    "m8_implicit_recs"   -> (graft.ml.Recommender.m8ImplicitRecs _),
    "m9_kmeans"          -> (graft.ml.Clustering.m9Kmeans _),
    "m10_item_cosine"    -> (graft.ml.Recommender.m10ItemCosine _),
    "q53_pagerank"       -> (Graph.q53Pagerank _),
    // round 15: the forced-distributed twin — the oracle re-hashes the
    // distributed fixed-point kernel each round (the registry q53
    // takes the driver-local path at every test SF)
    "q53_pagerank_dist"  -> (Graph.q53PagerankDist _),
    "q54_triangles"      -> (Graph.q54Triangles _),
    "m11_dimsum"         -> ((s: SparkSession, d: String) =>
      graft.ml.Recommender.m11Dimsum(s, d)),
    "s6_mips"            -> (Similarity.s6Mips _),
    "s7_knn_join"        -> (Similarity.s7KnnJoin _),
    "z1_zorder"          -> (Layout.z1ZorderStats _),
    "q60_acf"            -> (Analytics.q60Acf _),
    "q61_window_funnel"  -> (Advanced.q61WindowFunnel _),
    "q61_funnel_fold"    -> (Advanced.q61FunnelFold _),
    "q62_link_predict"   -> (Graph.q62LinkPredict _),
    "q62_link_lsh"       -> (Graph.q62LinkLsh _),
    "p11_repeat_epochs"  -> (Sampling.p11RepeatEpochs _),
    "i6_binary_ingest"   -> (Ingest.i6BinaryIngest _),
    "d9_bloom_decontaminate" -> (Dedup.d9BloomDecontaminate _),
    "d11_incremental_dedup" -> (Dedup.d11IncrementalDedup _),
    "q63_holt_forecast"  -> (Analytics.q63HoltForecast _),
    "q64_cusum"          -> (Analytics.q64Cusum _),
    "q65_ab_test"        -> (Analytics.q65AbTest _),
    "q65_cuped"          -> (Analytics.q65Cuped _),
    "q66_kcore"          -> ((s: SparkSession, d: String) => Graph.q66Kcore(s, d)),
    "q67_clustering_coef" -> (Graph.q67ClusteringCoef _),
    "q76_core_numbers"   -> ((s: SparkSession, d: String) => Graph.q76CoreNumbers(s, d)),
    "q77_ppr"            -> (Graph.q77Ppr _),
    "q79_core_hindex"    -> ((s: SparkSession, d: String) => Graph.q79CoreHindex(s, d)),
    "q80_weighted_pagerank" -> (Graph.q80WeightedPagerank _),
    "q81_label_prop"     -> ((s: SparkSession, d: String) => Graph.q81LabelProp(s, d)),
    "q82_harmonic"       -> ((s: SparkSession, d: String) => Graph.q82Harmonic(s, d)),
    "q84_lpa_semisync"   -> ((s: SparkSession, d: String) => Graph.q84LpaSemisync(s, d)),
    "t14_code_detect"    -> (TextAnalysis.t14CodeDetect _),
    "q83_top_paths"      -> (Sessionize.q83TopPaths _),
    "q78_seed_reach"     -> ((s: SparkSession, d: String) => Graph.q78SeedReach(s, d)),
    "q85_sssp"           -> ((s: SparkSession, d: String) => Graph.q85Sssp(s, d)),
    "q86_betweenness"    -> ((s: SparkSession, d: String) => Graph.q86Betweenness(s, d)),
    "q87_seq_rules"      -> ((s: SparkSession, d: String) => Analytics.q87SeqRules(s, d)),
    "q88_diameter"       -> ((s: SparkSession, d: String) => Graph.q88Diameter(s, d)),
    "q89_assortativity"  -> (Graph.q89Assortativity _),
    "q90_markov_attrib"  -> ((s: SparkSession, d: String) =>
      Analytics.q90MarkovAttribution(s, d)),
    "s10_mmr"            -> (Similarity.s10Mmr _),
    "t16_novelty"        -> (TextAnalysis.t16Novelty _),
    "q91_conversion_lag" -> (Analytics.q91ConversionLag _),
    "m13_slate_diversity" -> (graft.ml.Recommender.m13SlateDiversity _),
    "m14_gram"           -> (graft.ml.Pca.m14Gram _),
    "m15_pca"            -> (graft.ml.Pca.m15PcaLong _),
    "m16_linear_probe"   -> (graft.ml.LinearProbe.m16LinearProbe _),
    "m17_confusion"      -> (graft.ml.LinearProbe.m17Confusion _),
    "m18_cv_probe"       -> (graft.ml.LinearProbe.m18CvProbe _),
    "m19_class_stats"    -> (graft.ml.LinearProbe.m19ClassStats _),
    "q104_spectral_cut"  -> (SpectralCut.q104SpectralCut _),
    "z3_bloom_skip"      -> (Layout.z3BloomSkip _),
    "p15_temperature_mix" -> (Sampling.p15TemperatureMix _),
    "i7_schema_evolution" -> (Ingest.i7SchemaEvolution _),
    "i8_corrupt_ingest"  -> (Ingest.i8CorruptIngest _),
    "t17_heavy_change"   -> (TextAnalysis.t17HeavyChange _),
    "s11_filtered_ann"   -> (Similarity.s11FilteredAnn _),
    "s14_jl_projection"  -> (Similarity.s14JlProjection _),
    "s12_rrf"            -> (Similarity.s12Rrf _),
    "s13_hybrid_ann"     -> ((s: SparkSession, d: String) => Similarity.s13HybridAnn(s, d)),
    // scanning every cluster of the label slice makes the hybrid index
    // path exact, so s11's filtered brute-force SQL oracles it
    "s13_hybrid_full"    -> ((s: SparkSession, d: String) =>
      Similarity.s13HybridAnn(s, d, Similarity.IvfClusters)),
    "q92_reliability"    -> (Analytics.q92Reliability _),
    "q96_shapley"        -> (Analytics.q96Shapley _),
    "q96_shapley_sampled" -> ((s: SparkSession, d: String) =>
      Analytics.q96ShapleySampled(s, d)),
    "q93_trend_slope"    -> (Analytics.q93TrendSlope _),
    "q94_robustness"     -> (Graph.q94Robustness _),
    "q95_degree_dist"    -> (Graph.q95DegreeDist _),
    "q97_anf"            -> (Graph.q97Anf _),
    "q98_ktruss"         -> ((s: SparkSession, d: String) => Graph.q98Ktruss(s, d)),
    "q98_truss_thinned"  -> ((s: SparkSession, d: String) => Graph.q98TrussThinned(s, d)),
    "q99_hits"           -> (Graph.q99Hits _),
    "q100_modularity"    -> (Graph.q100Modularity _),
    "q101_louvain"       -> (Graph.q101Louvain _),
    "q102_louvain_coarse" -> (Graph.q102LouvainCoarse _),
    "q103_conductance"   -> (Graph.q103Conductance _),
    "s15_graph_ann"      -> ((s: SparkSession, d: String) => Similarity.s15GraphAnn(s, d)),
    "t18_cross_surprisal" -> (TextAnalysis.t18CrossSurprisal _),
    "t19_nb_langid"      -> (TextAnalysis.t19NbLangId _),
    "t20_bm25"           -> (TextAnalysis.t20Bm25 _),
    "t21_ks_drift"       -> (TextAnalysis.t21KsDrift _),
    "p16_source_cap"     -> (Sampling.p16SourceCap _),
    "p17_temperature_tau4" -> (Sampling.p17TemperatureTau4 _),
    "p17_temperature_pow" -> (Sampling.p17TemperaturePow _),
    "p18_curate"         -> (Sampling.p18Curate _),
    // rows-only: the semantic stage rides d10's seeded k-means fit;
    // composition invariants spec-pinned (Round12Spec)
    "p20_curate"         -> (Sampling.p20CurateSemantic _),
    "p21_curate_incremental" -> (Sampling.p21CurateIncremental _),
    "q68_spend_deciles"  -> (Analytics.q68SpendConcentration _),
    "p12_stratified_sample" -> (Sampling.p12StratifiedSample _),
    "p13_weighted_sample" -> (Sampling.p13WeightedSample _),
    "p14_keep_best"      -> (Dedup.p14KeepBest _),
    "t15_heavy_sketch"   -> (TextAnalysis.t15HeavySketch _),
    "z2_zonemap_prune"   -> ((s: SparkSession, d: String) => Layout.z2ZonemapPrune(s, d)),
    "z4_hilbert"         -> (Layout.z4HilbertStats _),
    "q69_holt_winters"   -> (Analytics.q69HoltWinters _),
    "q70_triangle_sample" -> ((s: SparkSession, d: String) => Graph.q70TriangleSample(s, d)),
    "q71_lcc_sample"     -> ((s: SparkSession, d: String) => Graph.q71LccSample(s, d)),
    "q72_hll_rollup"     -> (Analytics.q72HllRollup _),
    "m12_ndcg"           -> (graft.ml.Recommender.m12Ndcg _),
    "q73_part_families"  -> (Graph.q73PartFamilies _),
    "q74_profile"        -> (Analytics.q74Profile _),
    "q75_profile_sketch" -> (Analytics.q75ProfileSketch _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 2) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND l_extendedprice > 90000.0
         ORDER BY l_orderkey, l_linenumber""",
    "q3_top_revenue" ->
      """SELECT c_custkey, c_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q4_region_sales" ->
      """SELECT r_name, n_name,
         round(sum(o_totalprice), 2) AS total_sales, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q5_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(rank() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rnk
           FROM customer) t
         WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""",
    "q6_distinct_parts" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q7_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "q8_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    "q9_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         ORDER BY c_custkey""",
    "q10_union_accounts" ->
      """SELECT kind, count(*) AS n, round(sum(bal), 2) AS total_bal,
         round(avg(bal), 2) AS avg_bal
         FROM (SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
               UNION ALL
               SELECT 'supplier' AS kind, s_acctbal AS bal FROM supplier) u
         GROUP BY 1 ORDER BY 1""",
    "q11_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q12_case_agg" ->
      """SELECT l_returnflag,
         round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2)
           AS hi_disc_price,
         CAST(sum(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
         round(max(l_extendedprice), 2) AS max_price,
         round(min(l_extendedprice), 2) AS min_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q13_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
         ORDER BY o_orderkey""",
    "q14_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
         flagged AS (
           SELECT user_id, event_id, ms, value,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sessions AS (
           SELECT user_id, ms, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
           min(ms) AS start_ms, max(ms) AS end_ms,
           round(sum(value), 2) AS total_value
         FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""",
    "q15_pivot_events" ->
      """SELECT user_id,
         CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
         CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
         CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
         CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "st1_window_agg" ->
      """SELECT epoch_ms(ts) // 3600000 AS hour_bucket, event_type,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q49_rfm" ->
      """WITH per AS (
           SELECT o_custkey, max(o_orderdate) AS last_dt,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
           FROM orders GROUP BY 1),
         mx AS (SELECT max(o_orderdate) AS corpus_max FROM orders),
         rfm AS (
           SELECT o_custkey, frequency, monetary,
             CAST(date_diff('day', last_dt, corpus_max) AS INTEGER) AS recency_days
           FROM per, mx)
         SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS VARCHAR)
             || '-' ||
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS VARCHAR)
             || '-' ||
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS VARCHAR)
             AS rfm_segment
         FROM rfm ORDER BY o_custkey""",
    "i4_partitioned_ingest" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
         FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
         ORDER BY c_custkey""",
    "st2_sliding_window" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms, event_type, value FROM events),
         w AS (
           SELECT ((ms // 900000) - k) * 900000 AS win_start_ms,
             event_type, value
           FROM e, unnest(generate_series(0, 3)) AS g(k))
         SELECT win_start_ms, event_type, count(*) AS n,
           round(sum(value), 2) AS total_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    "t1_token_stats" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
         CAST(len(regexp_extract_all(text, '\w+')) AS INTEGER) AS n_regex_tokens
         FROM documents ORDER BY doc_id""",
    "t2_quality_score" ->
      """WITH base AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS awl,
             CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS swr,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS pr
           FROM documents)
         SELECT doc_id, n_tokens, round(awl, 4) AS avg_word_len,
           round(swr, 4) AS stopword_ratio, round(pr, 4) AS punct_ratio,
           floor(least(greatest((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
             + greatest(1.0 - abs(swr - 0.08) * 2.0, 0.0)
             + greatest(1.0 - pr * 4.0, 0.0)) / 3.0, 0.0), 1.0) * 10000) / 10000.0 AS quality
         FROM base ORDER BY doc_id""",
    "t3_lang_id" ->
      """WITH toks AS (
           SELECT doc_id, lang AS labeled_lang, text,
             string_split(lower(text), ' ') AS w FROM documents),
         sc AS (
           SELECT doc_id, labeled_lang, text,
             len(list_filter(w, x -> x IN ('the','and','of','to','is','with','that'))) AS s_en,
             len(list_filter(w, x -> x IN ('le','la','les','et','de','un','est'))) AS s_fr,
             len(list_filter(w, x -> x IN ('el','la','los','las','y','de','que'))) AS s_es,
             len(list_filter(w, x -> x IN ('der','die','das','und','ist','mit','ein'))) AS s_de,
             len(list_filter(w, x -> x IN ('的','是','了','在','和','有','不'))) AS s_zh,
             length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM toks)
         SELECT doc_id, labeled_lang,
           CASE WHEN cjk * 5 > length(text) THEN 'zh'
                WHEN s_en >= greatest(s_fr, s_es, s_de, s_zh) AND s_en > 0 THEN 'en'
                WHEN s_fr >= greatest(s_es, s_de, s_zh) AND s_fr > 0 THEN 'fr'
                WHEN s_es >= greatest(s_de, s_zh) AND s_es > 0 THEN 'es'
                WHEN s_de >= s_zh AND s_de > 0 THEN 'de'
                WHEN s_zh > 0 THEN 'zh'
                ELSE 'und' END AS pred_lang
         FROM sc ORDER BY doc_id""",
    "t4_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "d1_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "d2_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both), 4) AS jaccard
         FROM inter
         JOIN sizes sa ON id_a = sa.doc_id
         JOIN sizes sb ON id_b = sb.doc_id
         WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5
         ORDER BY 1, 2""",
    "t11_zipf" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         freq AS (
           SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY 1),
         top AS (SELECT token, n FROM freq ORDER BY n DESC, token LIMIT 1000),
         ranked AS (
           SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
           FROM top)
         SELECT CAST(count(*) AS BIGINT) AS n_points,
           floor(covar_pop(log10(rank), log10(n)) / var_pop(log10(rank))
             * 10000) / 10000.0 AS zipf_slope,
           floor(corr(log10(rank), log10(n)) * 10000) / 10000.0 AS zipf_corr
         FROM ranked""",
    "d8_containment" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_both AS BIGINT) AS n_both,
           floor(CAST(n_both AS DOUBLE) / sa.n_sh * 10000) / 10000.0 AS containment
         FROM inter JOIN sizes sa ON id_a = sa.doc_id
         WHERE n_both * 10 >= sa.n_sh * 8
         ORDER BY 1, 2""",
    "d5_embedding_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         floor(list_sum(list_transform(list_zip(a.embedding, b.embedding),
             z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           * 10000) / 10000.0 AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
             z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.5
         ORDER BY 1, 2""",
    "s5_radius_search" ->
      """SELECT q.vec_id AS q_id, x.vec_id AS neighbor_id,
         floor(list_sum(list_transform(list_zip(q.embedding, x.embedding),
             z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(q.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
            * sqrt(list_sum(list_transform(x.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))
           * 10000) / 10000.0 AS cosine
         FROM embeddings q JOIN embeddings x ON q.vec_id < 5 AND x.vec_id <> q.vec_id
         WHERE list_sum(list_transform(list_zip(q.embedding, x.embedding),
             z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(q.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
            * sqrt(list_sum(list_transform(x.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))) >= 0.25
         ORDER BY 1, 2""",
    "s1_knn_brute" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             floor(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000) / 10000.0 AS cos
           FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
         ranked AS (
           SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk, neighbor_id, cos
           FROM scored)
         SELECT q_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= 3
         ORDER BY q_id, rnk""",
    "s8_adaptive_ann" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             floor(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000) / 10000.0 AS cos
           FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
         ranked AS (
           SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk, neighbor_id, cos
           FROM scored)
         SELECT q_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= 3
         ORDER BY q_id, rnk""",
    "s2_ann_full" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             floor(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000) / 10000.0 AS cos
           FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
         ranked AS (
           SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk, neighbor_id, cos
           FROM scored)
         SELECT q_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= 3
         ORDER BY q_id, rnk""",
    "mm1_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         md5(text) AS digest
         FROM documents ORDER BY doc_id""",
    "q16_asof_join" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS c_event_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ms, c.ms AS c_ms, c.c_event_id
         FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms
         ORDER BY p.event_id""",
    "q16_asof_exec" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
           WHERE event_type = 'purchase'),
         c AS (
           SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS c_event_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, p.ms, c.ms AS c_ms, c.c_event_id
         FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms
         ORDER BY p.event_id""",
    "q17_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events)
         SELECT a.user_id, count(*) AS n_pairs
         FROM e a JOIN e b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(a.ms - b.ms) <= 300000
         GROUP BY 1 ORDER BY 1""",
    "q18_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_decile,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q19_cube" ->
      """SELECT r_name, c_mktsegment, count(*) AS n_cust,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE(r_name, c_mktsegment)
         ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    "q20_percentile" ->
      """SELECT event_type,
         floor(quantile_cont(value, 0.25) * 10000) / 10000.0 AS p25,
         floor(quantile_cont(value, 0.5) * 10000) / 10000.0 AS p50,
         floor(quantile_cont(value, 0.9) * 10000) / 10000.0 AS p90
         FROM events GROUP BY 1 ORDER BY 1""",
    "q22_moving_avg" ->
      """WITH q AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms,
             CAST(floor(value * 10000) AS BIGINT) AS vq
           FROM events)
         SELECT user_id, event_id,
           (sum(vq) OVER w // count(*) OVER w) / 10000.0 AS mov_avg
         FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q23_top_per_group" ->
      """WITH rev AS (
           SELECT l_partkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY 1),
         ranked AS (
           SELECT p_brand, p_partkey, revenue,
             CAST(row_number() OVER (PARTITION BY p_brand
               ORDER BY revenue DESC, p_partkey) AS INTEGER) AS rnk
           FROM rev JOIN part ON l_partkey = p_partkey)
         SELECT p_brand, rnk, p_partkey, revenue FROM ranked WHERE rnk <= 2
         ORDER BY p_brand, rnk""",
    "q25_string_ops" ->
      """SELECT p_partkey,
         upper(substring(p_name, 1, 8)) AS name8,
         CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS brand_dist,
         CAST(length(p_name) AS INTEGER) AS name_len,
         concat_ws('/', p_brand, p_type) AS brand_type
         FROM part
         WHERE p_name LIKE '%blue%' OR p_name LIKE '%red%'
         ORDER BY p_partkey""",
    "p1_clean_corpus" ->
      """WITH base AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS swr,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS pr
           FROM documents),
         scored AS (
           SELECT doc_id, n_tokens,
             floor(least(greatest((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
               + greatest(1.0 - abs(swr - 0.08) * 2.0, 0.0)
               + greatest(1.0 - pr * 4.0, 0.0)) / 3.0, 0.0), 1.0) * 10000) / 10000.0 AS quality
           FROM base),
         fps AS (
           SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM documents),
         dup_losers AS (
           SELECT f.doc_id FROM fps f
           JOIN (SELECT fp, min(doc_id) AS keep_id FROM fps GROUP BY 1) g ON f.fp = g.fp
           WHERE f.doc_id != g.keep_id),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         near_losers AS (
           SELECT DISTINCT id_b AS doc_id FROM inter
           JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
           WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5)
         SELECT doc_id, n_tokens, quality FROM scored
         WHERE quality >= 0.5
           AND doc_id NOT IN (SELECT doc_id FROM dup_losers)
           AND doc_id NOT IN (SELECT doc_id FROM near_losers)
         ORDER BY doc_id""",
    "i1_csv_ingest" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
         ORDER BY n_nationkey""",
    "i2_json_ingest" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
         ORDER BY s_suppkey""",
    "i8_corrupt_ingest" ->
      s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
         WHERE s_suppkey % ${operators.Ingest.CorruptMod} <> 0
         ORDER BY s_suppkey""",
    "d6_dup_groups" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
           WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM prs
           UNION ALL SELECT id_b, id_a FROM prs),
         reach(doc_id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id)
         SELECT doc_id, min(r) AS group_id FROM reach
         GROUP BY 1 ORDER BY 1""",
    // d6's exact component labels + the p10 keep rule — hash-checks the
    // transversal logic end to end (p10 itself stays rows-only: its
    // pair set is d3's seeded LSH banding)
    "p10_exact_dedup" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
           WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM prs
           UNION ALL SELECT id_b, id_a FROM prs),
         reach(doc_id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
         labels AS (
           SELECT doc_id, min(r) AS group_id FROM reach GROUP BY 1),
         drops AS (SELECT doc_id FROM labels WHERE doc_id <> group_id)
         SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
         ORDER BY d.doc_id""",
    "t5_repetition" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bi AS (
           SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
             len(list_distinct(w)) AS n_distinct,
             unnest(list_filter(list_transform(w, (x, i) ->
               CASE WHEN i + 1 <= len(w) THEN x || ' ' || w[i+1] END),
               g -> g IS NOT NULL)) AS bigram
           FROM toks),
         counts AS (
           SELECT doc_id, n_tokens, n_distinct, bigram, count(*) AS c
           FROM bi GROUP BY 1, 2, 3, 4),
         agg AS (
           SELECT doc_id, n_tokens, n_distinct, max(c) AS top_n, sum(c) AS n_bi
           FROM counts GROUP BY 1, 2, 3)
         SELECT doc_id, n_tokens,
           floor(CAST(top_n AS DOUBLE) / CAST(n_bi AS DOUBLE) * 10000) / 10000.0 AS rep2,
           floor(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 10000) / 10000.0 AS distinct_ratio
         FROM agg ORDER BY doc_id""",
    "q26_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         WHERE o_totalprice > 1.5 * (
           SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "q27_set_ops" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
         ORDER BY o_custkey""",
    "q28_unpivot" ->
      """SELECT l_returnflag, measure, round(sum(value), 2) AS total
         FROM (
           SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_discount', l_discount FROM lineitem) u
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q29_funnel" ->
      // rank-based greedy subsequence, NOT a list_reduce fold: DuckDB
      // 1.0.0's list_reduce mis-folds under some morsel schedules
      // (measured: types [purchase,error,purchase,error] -> stage 1
      // with threads=1, an impossible answer; multithreaded runs flip
      // between 75704 and 75705 stage-0 sessions on identical input).
      // min-rank chains are pure window+join relational algebra and
      // rerun-stable (12/12 mixed-thread runs).
      """WITH e AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         flagged AS (
           SELECT user_id, event_id, ms, event_type,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sessions AS (
           SELECT user_id, event_id, ms, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged),
         ranked AS (
           SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY ms, event_id) AS rn
           FROM sessions),
         v AS (SELECT user_id, session_id, min(rn) AS rv FROM ranked
               WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT r.user_id, r.session_id, min(r.rn) AS rc
               FROM ranked r JOIN v ON r.user_id = v.user_id AND r.session_id = v.session_id
               WHERE r.event_type = 'click' AND r.rn > v.rv GROUP BY 1, 2),
         p AS (SELECT r.user_id, r.session_id, min(r.rn) AS rp
               FROM ranked r JOIN c ON r.user_id = c.user_id AND r.session_id = c.session_id
               WHERE r.event_type = 'purchase' AND r.rn > c.rc GROUP BY 1, 2),
         allsess AS (SELECT DISTINCT user_id, session_id FROM ranked),
         staged AS (
           SELECT CASE WHEN p.rp IS NOT NULL THEN 3
                       WHEN c.rc IS NOT NULL THEN 2
                       WHEN v.rv IS NOT NULL THEN 1
                       ELSE 0 END AS funnel_stage
           FROM allsess a
           LEFT JOIN v ON a.user_id = v.user_id AND a.session_id = v.session_id
           LEFT JOIN c ON a.user_id = c.user_id AND a.session_id = c.session_id
           LEFT JOIN p ON a.user_id = p.user_id AND a.session_id = p.session_id)
         SELECT CAST(funnel_stage AS INTEGER) AS funnel_stage,
           count(*) AS n_sessions
         FROM staged GROUP BY 1 ORDER BY 1""",
    "i3_orc_ingest" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
         ORDER BY s_suppkey""",
    "q30_ewma" ->
      """WITH seq AS (
           SELECT user_id,
             list_transform(
               list_sort(list({'ms': epoch_ms(ts), 'eid': event_id, 'v': value})),
               r -> r.v) AS vals
           FROM events GROUP BY 1),
         recent AS (
           SELECT user_id, CAST(len(vals) AS INTEGER) AS n_events,
             vals[greatest(len(vals) - 255, 1):len(vals)] AS tail_vals
           FROM seq)
         SELECT user_id, n_events,
           floor(list_reduce(tail_vals, (acc, x) -> 0.25e0 * x + 0.75e0 * acc)
             * 10000) / 10000.0 AS ewma
         FROM recent ORDER BY user_id""",
    "q31_string_agg" ->
      """SELECT r_name,
         list_aggregate(list_sort(list(n_name)), 'string_agg', ',') AS nations,
         count(*) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q32_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    "q33_vector_stats" ->
      """WITH e AS (
           SELECT label,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM embeddings)
         SELECT label, count(*) AS n_vectors,
           (sum(CAST(floor(nrm * 1000000) AS BIGINT)) // count(*)) // 100
             / 10000.0 AS avg_norm,
           floor(min(nrm) * 10000) / 10000.0 AS min_norm,
           floor(max(nrm) * 10000) / 10000.0 AS max_norm
         FROM e GROUP BY 1 ORDER BY 1""",
    "q34_upsert" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
           FROM orders WHERE o_orderkey % 7 <> 0),
         delta AS (
           SELECT o_orderkey, o_custkey AS d_custkey,
             o_totalprice + 1000.0 AS d_totalprice, 'U' AS d_status
           FROM orders WHERE o_orderkey % 5 = 0)
         SELECT COALESCE(base.o_orderkey, delta.o_orderkey) AS o_orderkey,
           COALESCE(d_custkey, base.o_custkey) AS o_custkey,
           COALESCE(d_totalprice, base.o_totalprice) AS o_totalprice,
           COALESCE(d_status, base.o_orderstatus) AS o_orderstatus
         FROM base FULL OUTER JOIN delta
           ON base.o_orderkey = delta.o_orderkey
         ORDER BY o_orderkey""",
    "q57_blame_supplier" ->
      """WITH late AS (
           SELECT l_orderkey, l_suppkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE date_diff('day', o_orderdate, l_shipdate) > 60),
         sole AS (
           SELECT late.l_orderkey, late.l_suppkey FROM late
           WHERE EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_orderkey = late.l_orderkey
                           AND l2.l_suppkey <> late.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM late l3
                             WHERE l3.l_orderkey = late.l_orderkey
                               AND l3.l_suppkey <> late.l_suppkey))
         SELECT s_name, count(*) AS numwait
         FROM sole JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""",
    "q35_sql" ->
      """SELECT n_name,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name
         ORDER BY n_name""",
    "t6_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         nonempty AS (SELECT token FROM tok WHERE token <> '')
         SELECT token, count(*) AS n FROM nonempty
         GROUP BY 1
         HAVING count(*) * 1000 >= (SELECT count(*) FROM nonempty) * 33
         ORDER BY token""",
    "t8_pii_scrub" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
         CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INTEGER) AS n_phones,
         CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
         md5(regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_fp
         FROM documents ORDER BY doc_id""",
    "p3_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 7 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2]
                           || ' ' || string_split(text, ' ')[i+3]
                           || ' ' || string_split(text, ' ')[i+4]
                           || ' ' || string_split(text, ' ')[i+5]
                           || ' ' || string_split(text, ' ')[i+6]
                           || ' ' || string_split(text, ' ')[i+7] END),
             g -> g IS NOT NULL))) AS sh8
           FROM documents),
         bench AS (SELECT DISTINCT sh8 FROM sh WHERE doc_id % 7 = 0)
         SELECT s.doc_id, count(*) AS n_hits
         FROM sh s JOIN bench b ON s.sh8 = b.sh8
         WHERE s.doc_id % 7 <> 0
         GROUP BY 1 ORDER BY 1""",
    "d9_bloom_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 7 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2]
                           || ' ' || string_split(text, ' ')[i+3]
                           || ' ' || string_split(text, ' ')[i+4]
                           || ' ' || string_split(text, ' ')[i+5]
                           || ' ' || string_split(text, ' ')[i+6]
                           || ' ' || string_split(text, ' ')[i+7] END),
             g -> g IS NOT NULL))) AS sh8
           FROM documents),
         bench AS (SELECT DISTINCT sh8 FROM sh WHERE doc_id % 7 = 0)
         SELECT s.doc_id, count(*) AS n_hits
         FROM sh s JOIN bench b ON s.sh8 = b.sh8
         WHERE s.doc_id % 7 <> 0
         GROUP BY 1 ORDER BY 1""",
    "p4_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         c AS (
           SELECT doc_id, w,
             unnest(range(0, (len(w) + 31) // 32)) AS chunk_id
           FROM t)
         SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(w[chunk_id*32+1 : least((chunk_id+1)*32, len(w))]) AS INTEGER) AS n_tok_chunk,
           md5(array_to_string(w[chunk_id*32+1 : least((chunk_id+1)*32, len(w))], ' ')) AS chunk_fp
         FROM c ORDER BY doc_id, chunk_id""",
    "t7_bigram_freq" ->
      """WITH toks AS (
           SELECT string_split(text, ' ') AS t FROM documents),
         bg AS (
           SELECT z[1] || ' ' || z[2] AS bigram
           FROM toks, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS u(z)
           WHERE len(t) >= 2)
         SELECT bigram, count(*) AS n FROM bg
         GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""",
    "q36_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q38_window_suite" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",
    "q39_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS INTEGER) AS o_day,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
         FROM orders ORDER BY o_orderkey""",
    "q40_regexp_extract" ->
      """SELECT CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS INTEGER) AS prio_level,
         regexp_extract(o_orderpriority, '([A-Z]+)$', 1) AS prio_word,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q42_cohort_retention" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
         c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1)
         SELECT c.cohort_wk, e.wk - c.cohort_wk AS wk_offset,
           count(DISTINCT e.user_id) AS n_users
         FROM e JOIN c ON e.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "p5_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         c AS (
           SELECT doc_id, n_tok,
             -- sum() over BIGINT widens to HUGEINT; pin back to BIGINT
             CAST(sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tok
               AS tok_start
           FROM t)
         SELECT doc_id, n_tok, tok_start, tok_start // 512 AS seq_id
         FROM c ORDER BY doc_id""",
    "q37_stats_suite" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         round(avg(l_quantity), 4) AS avg_qty,
         round(stddev_samp(l_extendedprice), 2) AS sd_price,
         round(var_samp(l_quantity), 4) AS var_qty,
         round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q41_ship_delay" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(month(o_orderdate) AS INTEGER) AS o_month,
         count(*) AS n_items,
         floor(avg(date_diff('day', o_orderdate, l_shipdate)) * 10000) / 10000.0
           AS avg_lag_days,
         floor(avg(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
           THEN 1.0 ELSE 0.0 END) * 10000) / 10000.0 AS slow_ratio
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "t9_surprisal" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
         c AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
         s AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v FROM c)
         SELECT tk.doc_id, count(*) AS n_tokens,
           floor(avg(-log2((c.c + 1) / CAST(s.n_total + s.v AS DOUBLE))) * 10000)
             / 10000.0 AS surprisal
         FROM tk JOIN c USING (token), s
         GROUP BY tk.doc_id ORDER BY tk.doc_id""",
    "q43_cooccur" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
         FROM pp a JOIN pp b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",
    "q44_gap_fill" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
         daily AS (
           SELECT user_id, day, count(*) AS n FROM e GROUP BY 1, 2),
         spine AS (
           SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
           FROM daily GROUP BY user_id)
         SELECT s.user_id, s.day,
           coalesce(d.n, 0) AS n_events,
           CAST(sum(coalesce(d.n, 0)) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_events,
           CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS is_gap
         FROM spine s
         LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
         ORDER BY s.user_id, s.day""",
    "p6_mix_allocate" ->
      """WITH lt AS (
           SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t_tok FROM lt),
         q AS (
           SELECT lang, n_tok,
             (1000000 * n_tok) // t_tok AS base,
             (1000000 * n_tok) % t_tok AS rem
           FROM lt, t),
         x AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS extra FROM q),
         r AS (
           SELECT lang, n_tok, base,
             row_number() OVER (ORDER BY rem DESC, lang) AS rnk
           FROM q)
         SELECT lang, n_tok,
           CAST(base + CASE WHEN rnk <= x.extra THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_tokens
         FROM r, x ORDER BY lang""",
    "q45_histogram" ->
      """WITH c AS (
           SELECT CAST(least(floor(l_extendedprice / 5000.0), 19) AS INTEGER)
             AS bucket, count(*) AS n_items
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(n_items) AS BIGINT) AS t FROM c)
         SELECT bucket, bucket * 5000.0 AS lo, n_items,
           floor(n_items * 1000000 / t.t) / 1000000.0 AS share
         FROM c, t ORDER BY bucket""",
    "q46_attribution" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
         r AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id)
               AS rn_first,
             row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC)
               AS rn_last
           FROM e)
         SELECT user_id,
           max(CASE WHEN rn_first = 1 THEN event_type END) AS first_touch,
           max(CASE WHEN rn_last = 1 THEN event_type END) AS last_touch,
           count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchases
         FROM r GROUP BY user_id ORDER BY user_id""",
    "t10_keywords" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token <> '' GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         sc AS (
           SELECT tf.doc_id, tf.token,
             floor(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / df.df) * 10000)
               / 10000.0 AS score
           FROM tf JOIN df USING (token), nd),
         r AS (
           SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, token) AS kw_rank
           FROM sc)
         SELECT doc_id, kw_rank, token, score
         FROM r WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""",
    "d7_substring_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+15], ' ') AS sh
           FROM tok, unnest(generate_series(1, len(t) - 15)) AS g(i)
           WHERE len(t) >= 16),
         rep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) >= 2),
         sp AS (SELECT s.doc_id, s.pos AS a, s.pos + 15 AS b
                FROM sh s JOIN rep USING (sh)),
         gs AS (
           SELECT doc_id, a, b,
             CASE WHEN a > coalesce(max(b) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
             THEN 1 ELSE 0 END AS brk
           FROM sp),
         gg AS (
           SELECT doc_id, a, b,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
           FROM gs)
         SELECT doc_id, CAST(min(a) AS BIGINT) AS span_start,
           CAST(max(b) AS BIGINT) AS span_end,
           CAST(max(b) - min(a) + 1 AS BIGINT) AS span_len
         FROM gg GROUP BY doc_id, grp ORDER BY doc_id, span_start""",
    "p7_cut_spans" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+15], ' ') AS sh
           FROM tok, unnest(generate_series(1, len(t) - 15)) AS g(i)
           WHERE len(t) >= 16),
         rep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) >= 2),
         sp AS (SELECT s.doc_id, s.pos AS a, s.pos + 15 AS b
                FROM sh s JOIN rep USING (sh)),
         gs AS (
           SELECT doc_id, a, b,
             CASE WHEN a > coalesce(max(b) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
             THEN 1 ELSE 0 END AS brk
           FROM sp),
         gg AS (
           SELECT doc_id, a, b,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
           FROM gs),
         spans AS (
           SELECT doc_id, min(a) AS s0, max(b) AS s1 FROM gg GROUP BY doc_id, grp),
         pos AS (
           SELECT doc_id, i - 1 AS p, t[i] AS tk
           FROM tok, unnest(generate_series(1, len(t))) AS g(i)),
         keep AS (
           SELECT pos.doc_id, pos.p, pos.tk
           FROM pos LEFT JOIN spans
             ON pos.doc_id = spans.doc_id AND pos.p BETWEEN spans.s0 AND spans.s1
           WHERE spans.doc_id IS NULL)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(tk, ' ' ORDER BY p)) AS kept_fp
         FROM keep GROUP BY doc_id ORDER BY doc_id""",
    "p7_cut_keep_first" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+15], ' ') AS sh
           FROM tok, unnest(generate_series(1, len(t) - 15)) AS g(i)
           WHERE len(t) >= 16),
         sp0 AS (
           SELECT doc_id, pos,
             row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rk,
             count(*) OVER (PARTITION BY sh) AS c
           FROM sh),
         sp AS (SELECT doc_id, pos AS a, pos + 15 AS b
                FROM sp0 WHERE c >= 2 AND rk >= 2),
         gs AS (
           SELECT doc_id, a, b,
             CASE WHEN a > coalesce(max(b) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
             THEN 1 ELSE 0 END AS brk
           FROM sp),
         gg AS (
           SELECT doc_id, a, b,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
           FROM gs),
         spans AS (
           SELECT doc_id, min(a) AS s0, max(b) AS s1 FROM gg GROUP BY doc_id, grp),
         pos AS (
           SELECT doc_id, i - 1 AS p, t[i] AS tk
           FROM tok, unnest(generate_series(1, len(t))) AS g(i)),
         keep AS (
           SELECT pos.doc_id, pos.p, pos.tk
           FROM pos LEFT JOIN spans
             ON pos.doc_id = spans.doc_id AND pos.p BETWEEN spans.s0 AND spans.s1
           WHERE spans.doc_id IS NULL)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(tk, ' ' ORDER BY p)) AS kept_fp
         FROM keep GROUP BY doc_id ORDER BY doc_id""",
    "m10_item_cosine" ->
      """WITH r AS (
           SELECT o_custkey AS usr, l_partkey AS item,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1, 2),
         n2 AS (SELECT item, sum(q * q) AS n2 FROM r GROUP BY 1),
         p AS (
           SELECT a.item AS ia, b.item AS ib,
             CAST(sum(a.q * b.q) AS BIGINT) AS dot
           FROM r a JOIN r b ON a.usr = b.usr AND a.item < b.item
           GROUP BY 1, 2),
         both_dir AS (
           SELECT ia AS item, ib AS nbr, dot FROM p
           UNION ALL
           SELECT ib AS item, ia AS nbr, dot FROM p),
         scored AS (
           SELECT bd.item, bd.nbr,
             floor(dot / (sqrt(CAST(na.n2 AS DOUBLE)) *
               sqrt(CAST(nb.n2 AS DOUBLE))) * 10000) / 10000.0 AS cosine
           FROM both_dir bd
           JOIN n2 na ON bd.item = na.item
           JOIN n2 nb ON bd.nbr = nb.item),
         ranked AS (
           SELECT item, nbr, cosine,
             CAST(row_number() OVER (PARTITION BY item
               ORDER BY cosine DESC, nbr) AS INTEGER) AS rnk
           FROM scored)
         SELECT item, nbr, cosine, rnk FROM ranked
         WHERE rnk <= 5 ORDER BY item, rnk""",
    "m6_cold_start" ->
      """WITH cold AS (
           SELECT c_custkey FROM customer
           WHERE c_custkey NOT IN (
             SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) >= 3)),
         slate AS (
           SELECT l_partkey AS p_partkey,
             round(sum(l_quantity), 2) AS total_qty
           FROM lineitem GROUP BY 1
           ORDER BY total_qty DESC, p_partkey LIMIT 5),
         r AS (
           SELECT p_partkey, total_qty,
             CAST(row_number() OVER (ORDER BY total_qty DESC, p_partkey)
               AS INTEGER) AS rnk
           FROM slate)
         SELECT cold.c_custkey, r.rnk, r.p_partkey, r.total_qty
         FROM cold, r ORDER BY c_custkey, rnk""",
    "q48_yoy_growth" ->
      """WITH rev AS (
           SELECT n.n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             round(sum(o.o_totalprice), 2) AS revenue
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2)
         SELECT n_name, o_year, revenue,
           CASE WHEN lag(revenue) OVER w IS NOT NULL
             THEN floor(revenue / lag(revenue) OVER w * 10000) / 10000.0
           END AS yoy_ratio
         FROM rev
         WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
         ORDER BY n_name, o_year""",
    "q47_share_of_total" ->
      """WITH rev AS (
           SELECT r.r_name, n.n_name, round(sum(o.o_totalprice), 2) AS revenue
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, n_name, revenue,
           CAST(rank() OVER (PARTITION BY r_name
             ORDER BY revenue DESC, n_name) AS INTEGER) AS region_rank,
           floor(revenue / sum(revenue) OVER (PARTITION BY r_name)
             * 10000) / 10000.0 AS region_share,
           floor(revenue / sum(revenue) OVER ()
             * 10000) / 10000.0 AS world_share
         FROM rev
         ORDER BY r_name, n_name""",
    "q50_assoc_rules" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pairs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 3),
         items AS (SELECT l_partkey AS p, count(*) AS n_p FROM pp GROUP BY 1),
         tot AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM pp),
         directed AS (
           SELECT pa AS ante, pb AS cons, n_ab FROM pairs
           UNION ALL SELECT pb, pa, n_ab FROM pairs)
         SELECT ante, cons, n_ab,
           floor(CAST(n_ab AS DOUBLE) / ia.n_p * 10000) / 10000.0 AS confidence,
           floor(CAST(n_baskets AS DOUBLE) * n_ab / (ia.n_p * ic.n_p)
             * 10000) / 10000.0 AS lift
         FROM directed
         JOIN items ia ON directed.ante = ia.p
         JOIN items ic ON directed.cons = ic.p, tot
         ORDER BY lift DESC, confidence DESC, ante, cons LIMIT 25""",
    "q51_user_growth" ->
      """WITH fs AS (
           SELECT user_id, min(epoch_ms(ts) // 3600000) AS first_hr
           FROM events GROUP BY 1),
         hourly AS (
           SELECT first_hr AS hr, count(*) AS new_users FROM fs GROUP BY 1)
         SELECT hr, new_users,
           CAST(sum(new_users) OVER (ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
         FROM hourly ORDER BY hr""",
    "q52_outlier_days" ->
      """WITH daily AS (
           SELECT user_id, epoch_ms(ts) // 86400000 AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT user_id, day, n,
             sum(n) OVER w AS s1, sum(n * n) OVER w AS s2,
             count(*) OVER w AS n_days
           FROM daily WINDOW w AS (PARTITION BY user_id)),
         zz AS (
           SELECT user_id, day, n,
             floor(CAST(n * n_days - s1 AS DOUBLE)
               / (CAST(n_days AS DOUBLE)
                  * sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
                         / CAST(n_days * (n_days - 1) AS DOUBLE)))
               * 10000) / 10000.0 AS z
           FROM st
           WHERE n_days >= 3 AND n_days * s2 - s1 * s1 > 0)
         SELECT user_id, day, n, z FROM zz
         WHERE z >= 2.0
         ORDER BY user_id, day""",
    "t12_bigram_surprisal" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bg AS (
           SELECT doc_id, z[1] || ' ' || z[2] AS bigram, z[1] AS w1
           FROM toks, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS u(z)
           WHERE len(t) >= 2),
         cbg AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
         ctx AS (SELECT w1, count(*) AS cw FROM bg GROUP BY 1),
         vv AS (SELECT count(DISTINCT token) AS v FROM
           (SELECT unnest(t) AS token FROM toks))
         SELECT bg.doc_id, count(*) AS n_bigrams,
           floor(avg(-log2((cbg.cb + 1) / CAST(ctx.cw + vv.v AS DOUBLE)))
             * 10000) / 10000.0 AS bi_surprisal
         FROM bg JOIN cbg USING (bigram) JOIN ctx USING (w1), vv
         GROUP BY bg.doc_id ORDER BY bg.doc_id""",
    "q58_rolling_actives" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
           FROM events),
         x AS (
           SELECT DISTINCT user_id, day + off AS d
           FROM ud CROSS JOIN (SELECT unnest(range(7)) AS off)),
         b AS (SELECT max(day) AS hi FROM ud)
         SELECT d, count(*) AS wau FROM x, b
         WHERE d <= hi GROUP BY 1 ORDER BY 1""",
    "q59_concurrency" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         flagged AS (
           SELECT user_id, event_id, ms,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sess AS (
           SELECT user_id, ms,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         iv AS (
           SELECT user_id, session_id, min(ms) AS start_ms, max(ms) AS end_ms
           FROM sess GROUP BY 1, 2),
         ep AS (
           SELECT ms, CAST(sum(st) AS BIGINT) AS n_start,
             CAST(sum(en) AS BIGINT) AS n_end
           FROM (
             SELECT start_ms AS ms, 1 AS st, 0 AS en FROM iv
             UNION ALL
             SELECT end_ms AS ms, 0 AS st, 1 AS en FROM iv)
           GROUP BY 1),
         swept AS (
           SELECT ms, n_start, n_end,
             sum(n_start - n_end) OVER (ORDER BY ms) AS net
           FROM ep)
         SELECT ms // 86400000 AS day,
           CAST(max(net + n_end) AS BIGINT) AS peak_concurrency,
           CAST(sum(n_start) AS BIGINT) AS n_sessions_started
         FROM swept GROUP BY 1 ORDER BY 1""",
    "q56_transitions" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
         tr AS (
           SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ms, event_id) AS dst
           FROM e),
         cnt AS (
           SELECT src, dst, count(*) AS n FROM tr
           WHERE dst IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT src, sum(n) AS n_src FROM cnt GROUP BY 1)
         SELECT src, dst, n,
           floor(n / CAST(n_src AS DOUBLE) * 10000) / 10000.0 AS p
         FROM cnt JOIN tot USING (src) ORDER BY src, dst""",
    "q55_seasonal" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS revenue
           FROM orders GROUP BY 1),
         tr AS (
           SELECT day, revenue,
             count(*) OVER w AS n_win,
             floor(avg(revenue) OVER w * 10000) / 10000.0 AS trend
           FROM daily
           WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         det AS (
           SELECT day, revenue, trend, revenue - trend AS detr,
             CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
           FROM tr WHERE n_win = 7),
         seas AS (
           SELECT dow, floor(avg(detr) * 10000) / 10000.0 AS seasonal
           FROM det GROUP BY 1)
         SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS day,
           revenue, trend, seasonal,
           floor((detr - seasonal) * 10000) / 10000.0 AS residual
         FROM det JOIN seas USING (dow) ORDER BY day""",
    "t13_tfidf_cosine" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token <> '' GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         w AS (
           SELECT tf.doc_id, tf.token,
             CAST(floor(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / df.df)
               * 1000) AS BIGINT) AS wq
           FROM tf JOIN df USING (token), nd
           WHERE df.df * 10 <= nd.n_docs),
         w2 AS (SELECT * FROM w WHERE wq > 0),
         norms AS (SELECT doc_id, sum(wq * wq) AS n2 FROM w2 GROUP BY 1),
         pr AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sum(a.wq * b.wq) AS dot
           FROM w2 a JOIN w2 b USING (token)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         sc AS (
           SELECT doc_a, doc_b,
             floor(pr.dot / (sqrt(CAST(na.n2 AS DOUBLE)) *
               sqrt(CAST(nb.n2 AS DOUBLE))) * 10000) / 10000.0 AS cosine
           FROM pr JOIN norms na ON pr.doc_a = na.doc_id
                   JOIN norms nb ON pr.doc_b = nb.doc_id)
         SELECT doc_a, doc_b, cosine FROM sc
         WHERE cosine >= 0.30 ORDER BY doc_a, doc_b""",
    "p8_canonicalize" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
           WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM prs
           UNION ALL SELECT id_b, id_a FROM prs),
         reach(doc_id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
         groups AS (
           SELECT doc_id, min(r) AS group_id FROM reach GROUP BY 1),
         ranked AS (
           SELECT g.group_id, g.doc_id, CAST(length(d.text) AS BIGINT) AS len,
             row_number() OVER (PARTITION BY g.group_id
               ORDER BY length(d.text) DESC, g.doc_id) AS rn,
             count(*) OVER (PARTITION BY g.group_id) AS n_members
           FROM groups g JOIN documents d ON g.doc_id = d.doc_id)
         SELECT group_id, n_members, doc_id AS rep_doc_id, len AS rep_len
         FROM ranked WHERE rn = 1 ORDER BY group_id""",
    "i5_xml_ingest" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",
    "q53_pagerank" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         prs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT pa AS src, pb AS dst FROM prs
               UNION ALL SELECT pb, pa FROM prs),
         d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM d),
         it1 AS (SELECT e.dst AS node, sum(r0.rank // d.deg) AS c
                 FROM e JOIN r0 ON e.src = r0.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r1 AS (SELECT r0.node,
                  CAST(150000 + (85 * COALESCE(it1.c, 0)) // 100 AS BIGINT) AS rank
                FROM r0 LEFT JOIN it1 USING (node)),
         it2 AS (SELECT e.dst AS node, sum(r1.rank // d.deg) AS c
                 FROM e JOIN r1 ON e.src = r1.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r2 AS (SELECT r1.node,
                  CAST(150000 + (85 * COALESCE(it2.c, 0)) // 100 AS BIGINT) AS rank
                FROM r1 LEFT JOIN it2 USING (node)),
         it3 AS (SELECT e.dst AS node, sum(r2.rank // d.deg) AS c
                 FROM e JOIN r2 ON e.src = r2.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r3 AS (SELECT r2.node,
                  CAST(150000 + (85 * COALESCE(it3.c, 0)) // 100 AS BIGINT) AS rank
                FROM r2 LEFT JOIN it3 USING (node)),
         it4 AS (SELECT e.dst AS node, sum(r3.rank // d.deg) AS c
                 FROM e JOIN r3 ON e.src = r3.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r4 AS (SELECT r3.node,
                  CAST(150000 + (85 * COALESCE(it4.c, 0)) // 100 AS BIGINT) AS rank
                FROM r3 LEFT JOIN it4 USING (node)),
         it5 AS (SELECT e.dst AS node, sum(r4.rank // d.deg) AS c
                 FROM e JOIN r4 ON e.src = r4.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r5 AS (SELECT r4.node,
                  CAST(150000 + (85 * COALESCE(it5.c, 0)) // 100 AS BIGINT) AS rank
                FROM r4 LEFT JOIN it5 USING (node))
         SELECT node AS l_partkey, rank AS pr_rank FROM r5
         ORDER BY pr_rank DESC, l_partkey LIMIT 50""",
    // the forced-distributed twin computes the same function — same
    // oracle replay (kept as a literal: the check harness reads this
    // map entry-for-entry)
    "q53_pagerank_dist" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         prs AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS (SELECT pa AS src, pb AS dst FROM prs
               UNION ALL SELECT pb, pa FROM prs),
         d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM d),
         it1 AS (SELECT e.dst AS node, sum(r0.rank // d.deg) AS c
                 FROM e JOIN r0 ON e.src = r0.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r1 AS (SELECT r0.node,
                  CAST(150000 + (85 * COALESCE(it1.c, 0)) // 100 AS BIGINT) AS rank
                FROM r0 LEFT JOIN it1 USING (node)),
         it2 AS (SELECT e.dst AS node, sum(r1.rank // d.deg) AS c
                 FROM e JOIN r1 ON e.src = r1.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r2 AS (SELECT r1.node,
                  CAST(150000 + (85 * COALESCE(it2.c, 0)) // 100 AS BIGINT) AS rank
                FROM r1 LEFT JOIN it2 USING (node)),
         it3 AS (SELECT e.dst AS node, sum(r2.rank // d.deg) AS c
                 FROM e JOIN r2 ON e.src = r2.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r3 AS (SELECT r2.node,
                  CAST(150000 + (85 * COALESCE(it3.c, 0)) // 100 AS BIGINT) AS rank
                FROM r2 LEFT JOIN it3 USING (node)),
         it4 AS (SELECT e.dst AS node, sum(r3.rank // d.deg) AS c
                 FROM e JOIN r3 ON e.src = r3.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r4 AS (SELECT r3.node,
                  CAST(150000 + (85 * COALESCE(it4.c, 0)) // 100 AS BIGINT) AS rank
                FROM r3 LEFT JOIN it4 USING (node)),
         it5 AS (SELECT e.dst AS node, sum(r4.rank // d.deg) AS c
                 FROM e JOIN r4 ON e.src = r4.node JOIN d ON e.src = d.src
                 GROUP BY 1),
         r5 AS (SELECT r4.node,
                  CAST(150000 + (85 * COALESCE(it5.c, 0)) // 100 AS BIGINT) AS rank
                FROM r4 LEFT JOIN it5 USING (node))
         SELECT node AS l_partkey, rank AS pr_rank FROM r5
         ORDER BY pr_rank DESC, l_partkey LIMIT 50""",
    "q54_triangles" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         d AS (SELECT n, count(*) AS deg FROM
           (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e) GROUP BY 1),
         tri AS (
           SELECT count(*) AS n_triangles
           FROM e ab JOIN e bc ON ab.pb = bc.pa
           WHERE EXISTS (SELECT 1 FROM e ac
                         WHERE ac.pa = ab.pa AND ac.pb = bc.pb)),
         st AS (SELECT count(*) AS n_nodes,
                  CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges FROM d),
         ne AS (SELECT count(*) AS n_edges FROM e)
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges = 0 THEN 0.0
                ELSE floor(3 * n_triangles / CAST(n_wedges AS DOUBLE) * 10000)
                  / 10000.0 END AS clustering
         FROM st, ne, tri""",
    "i6_binary_ingest" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         md5(text) AS digest
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "p11_repeat_epochs" ->
      """WITH w AS (
           SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 500 ELSE 1000 END AS w
           FROM documents),
         c AS (
           SELECT doc_id, lang,
             (w // 1000) + (CASE WHEN (doc_id * 7919) % 1000 < w % 1000 THEN 1 ELSE 0 END) AS n_copies
           FROM w)
         SELECT doc_id, lang, CAST(UNNEST(range(n_copies)) AS BIGINT) AS epoch
         FROM c WHERE n_copies > 0
         ORDER BY doc_id, epoch""",
    "q65_ab_test" ->
      """WITH pu AS (
           SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
                  THEN 1 ELSE 0 END AS converted
           FROM events GROUP BY 1),
         arms AS (
           SELECT user_id % 2 AS arm, count(*) AS n_users,
             sum(converted) AS n_conv
           FROM pu GROUP BY 1),
         w AS (
           SELECT a.n_users AS n_a, CAST(a.n_conv AS BIGINT) AS conv_a,
                  b.n_users AS n_b, CAST(b.n_conv AS BIGINT) AS conv_b
           FROM (SELECT * FROM arms WHERE arm = 0) a,
                (SELECT * FROM arms WHERE arm = 1) b)
         SELECT n_a, conv_a,
           floor(CAST(conv_a AS DOUBLE) / n_a * 10000) / 10000.0 AS rate_a,
           n_b, conv_b,
           floor(CAST(conv_b AS DOUBLE) / n_b * 10000) / 10000.0 AS rate_b,
           floor((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
             * 10000) / 10000.0 AS abs_lift,
           CASE WHEN conv_a = 0 THEN 0.0
                ELSE floor((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
             / (CAST(conv_a AS DOUBLE) / n_a) * 10000) / 10000.0 END AS rel_lift,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0.0
                ELSE floor((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b)) * 10000) / 10000.0 END AS z_stat
         FROM w""",
    "q64_cusum" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         m AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS mu FROM daily),
         c AS (
           SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS day, cents,
             sum(cents - mu) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cusum
           FROM daily, m)
         SELECT day, CAST(cents AS BIGINT) AS cents,
           CAST(s_cusum AS BIGINT) AS s_cusum,
           CAST(abs(s_cusum) AS BIGINT) AS abs_s
         FROM c ORDER BY abs_s DESC, day LIMIT 10""",
    "q63_holt_forecast" ->
      """WITH RECURSIVE idx AS (
           SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS day, y,
                  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
           FROM (SELECT CAST(o_orderdate AS DATE) AS d,
                   sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
                 FROM orders GROUP BY 1)),
         r(i, l, b, day, y, fc) AS (
           SELECT 2,
             (SELECT y FROM idx WHERE i = 1) * 1000,
             ((SELECT y FROM idx WHERE i = 2) - (SELECT y FROM idx WHERE i = 1)) * 1000,
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           UNION ALL
           SELECT idx.i,
             (200 * idx.y * 1000 + 800 * (r.l + r.b)) // 1000,
             (100 * ((200 * idx.y * 1000 + 800 * (r.l + r.b)) // 1000 - r.l)
               + 900 * r.b) // 1000,
             idx.day, idx.y, (r.l + r.b) // 1000
           FROM r JOIN idx ON idx.i = r.i + 1)
         SELECT day, y AS y_cents, fc AS fc_cents FROM r WHERE i >= 3
         ORDER BY day""",
    "q62_link_predict" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT pa AS w, pb AS n FROM e
                 UNION ALL SELECT pb AS w, pa AS n FROM e),
         cm AS (
           SELECT x.n AS a, y.n AS b, count(*) AS common
           FROM sym x JOIN sym y ON x.w = y.w AND x.n < y.n
           GROUP BY 1, 2),
         d AS (SELECT n, count(*) AS deg FROM sym GROUP BY 1),
         nonedge AS (
           SELECT cm.a, cm.b, cm.common FROM cm
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = cm.a AND e.pb = cm.b))
         SELECT a, b, common,
           floor(common * 10000 / (da.deg + db.deg - common)) / 10000.0 AS jaccard
         FROM nonedge
         JOIN d da ON da.n = a
         JOIN d db ON db.n = b
         ORDER BY jaccard DESC, a, b LIMIT 50""",
    "p9_curriculum" ->
      """WITH base AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS swr,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS pr
           FROM documents),
         q AS (
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             floor(least(greatest((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
               + greatest(1.0 - abs(swr - 0.08) * 2.0, 0.0)
               + greatest(1.0 - pr * 4.0, 0.0)) / 3.0, 0.0), 1.0) * 10000)
               / 10000.0 AS quality
           FROM base)
         SELECT doc_id, n_tokens, quality,
           CAST(ntile(4) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS phase
         FROM q ORDER BY doc_id""",
    "s6_mips" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             floor(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               * 10000) / 10000.0 AS ip
           FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
         ranked AS (
           SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY ip DESC, neighbor_id) AS INTEGER) AS rnk, neighbor_id, ip
           FROM scored)
         SELECT q_id, rnk, neighbor_id, ip FROM ranked WHERE rnk <= 3
         ORDER BY q_id, rnk""",
    "q61_window_funnel" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
         v AS (SELECT user_id, ms AS v_ms FROM e WHERE event_type = 'view'),
         c AS (SELECT user_id, ms AS c_ms FROM e WHERE event_type = 'click'),
         p AS (SELECT user_id, ms AS p_ms FROM e WHERE event_type = 'purchase'),
         vc AS (
           SELECT v.user_id, v_ms, c_ms FROM v JOIN c USING (user_id)
           WHERE c_ms > v_ms AND c_ms <= v_ms + 21600000),
         l1 AS (SELECT DISTINCT user_id FROM v),
         l2 AS (SELECT DISTINCT user_id FROM vc),
         l3 AS (
           SELECT DISTINCT vc.user_id FROM vc JOIN p USING (user_id)
           WHERE p_ms > c_ms AND p_ms <= v_ms + 21600000),
         lv AS (
           SELECT u.user_id,
             (CASE WHEN l1.user_id IS NULL THEN 0 ELSE 1 END
            + CASE WHEN l2.user_id IS NULL THEN 0 ELSE 1 END
            + CASE WHEN l3.user_id IS NULL THEN 0 ELSE 1 END) AS funnel_level
           FROM (SELECT DISTINCT user_id FROM e) u
           LEFT JOIN l1 USING (user_id)
           LEFT JOIN l2 USING (user_id)
           LEFT JOIN l3 USING (user_id))
         SELECT funnel_level, count(*) AS n_users FROM lv
         GROUP BY 1 ORDER BY 1""",
    // the state-machine fold computes the IDENTICAL deepest-level
    // partition, so it shares the join ladder's SQL verbatim — one
    // oracle, two physical strategies (the point of the pair)
    "q61_funnel_fold" ->
      """WITH e AS (
           SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
         v AS (SELECT user_id, ms AS v_ms FROM e WHERE event_type = 'view'),
         c AS (SELECT user_id, ms AS c_ms FROM e WHERE event_type = 'click'),
         p AS (SELECT user_id, ms AS p_ms FROM e WHERE event_type = 'purchase'),
         vc AS (
           SELECT v.user_id, v_ms, c_ms FROM v JOIN c USING (user_id)
           WHERE c_ms > v_ms AND c_ms <= v_ms + 21600000),
         l1 AS (SELECT DISTINCT user_id FROM v),
         l2 AS (SELECT DISTINCT user_id FROM vc),
         l3 AS (
           SELECT DISTINCT vc.user_id FROM vc JOIN p USING (user_id)
           WHERE p_ms > c_ms AND p_ms <= v_ms + 21600000),
         lv AS (
           SELECT u.user_id,
             (CASE WHEN l1.user_id IS NULL THEN 0 ELSE 1 END
            + CASE WHEN l2.user_id IS NULL THEN 0 ELSE 1 END
            + CASE WHEN l3.user_id IS NULL THEN 0 ELSE 1 END) AS funnel_level
           FROM (SELECT DISTINCT user_id FROM e) u
           LEFT JOIN l1 USING (user_id)
           LEFT JOIN l2 USING (user_id)
           LEFT JOIN l3 USING (user_id))
         SELECT funnel_level, count(*) AS n_users FROM lv
         GROUP BY 1 ORDER BY 1""",
    "s7_knn_join" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
             floor(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 10000) / 10000.0 AS cos
           FROM embeddings q JOIN embeddings c ON q.vec_id < 500 AND c.vec_id != q.vec_id),
         ranked AS (
           SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk, neighbor_id, cos
           FROM scored)
         SELECT q_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= 3
         ORDER BY q_id, rnk""",
    "z1_zorder" ->
      """WITH b0 AS (
           SELECT l_partkey, l_suppkey,
             l_partkey & 2097151 AS a, l_suppkey & 2097151 AS b
           FROM lineitem),
         b1 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 16)) & 281470681808895 AS a,
           (b | (b << 16)) & 281470681808895 AS b FROM b0),
         b2 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 8)) & 71777214294589695 AS a,
           (b | (b << 8)) & 71777214294589695 AS b FROM b1),
         b3 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 4)) & 1085102592571150095 AS a,
           (b | (b << 4)) & 1085102592571150095 AS b FROM b2),
         b4 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 2)) & 3689348814741910323 AS a,
           (b | (b << 2)) & 3689348814741910323 AS b FROM b3),
         b5 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 1)) & 6148914691236517205 AS a,
           (b | (b << 1)) & 6148914691236517205 AS b FROM b4)
         SELECT (a | (b << 1)) >> 12 AS zbucket, count(*) AS n,
           min(l_partkey) AS min_part, max(l_partkey) AS max_part,
           min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
         FROM b5 GROUP BY 1 ORDER BY 1""",
    "q60_acf" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
         m AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS mu FROM daily),
         d AS (
           SELECT day, CAST(cents - mu AS DECIMAL(19,0)) AS d
           FROM daily, m),
         lagged AS (
           SELECT d,
             lead(d, 1) OVER w AS d1, lead(d, 2) OVER w AS d2,
             lead(d, 3) OVER w AS d3, lead(d, 4) OVER w AS d4,
             lead(d, 5) OVER w AS d5, lead(d, 6) OVER w AS d6,
             lead(d, 7) OVER w AS d7
           FROM d WINDOW w AS (ORDER BY day)),
         agg AS (
           SELECT sum(d * d) AS den,
             sum(d * d1) AS num1, sum(d * d2) AS num2, sum(d * d3) AS num3,
             sum(d * d4) AS num4, sum(d * d5) AS num5, sum(d * d6) AS num6,
             sum(d * d7) AS num7
           FROM lagged)
         SELECT CAST(u.lag AS INTEGER) AS lag,
           floor(CAST(u.num AS DOUBLE) / CAST(den AS DOUBLE) * 10000) / 10000.0 AS acf
         FROM agg, UNNEST([{'lag': 1, 'num': num1}, {'lag': 2, 'num': num2},
           {'lag': 3, 'num': num3}, {'lag': 4, 'num': num4},
           {'lag': 5, 'num': num5}, {'lag': 6, 'num': num6},
           {'lag': 7, 'num': num7}]) AS t(u)
         ORDER BY lag""",
    // unrolled fixed-round peel (DuckDB's recursive CTE can't shrink
    // its working set in place) — generated, k=3 over KcoreRounds
    "q66_kcore" -> operators.Graph.kcoreOracleSql(),
    "q98_ktruss" -> operators.Graph.ktrussOracleSql(),
    "q99_hits" -> operators.Graph.hitsOracleSql(),
    // q76's own unrolled-peel oracle (coreNumbersOracleSql, 374
    // MATERIALIZED CTEs) verifies the same values but balloons the
    // comparator process's allocator so badly that LATER queries in
    // the same process OOM (measured: q77/q80 die after a full-suite
    // check reaches q76; every query passes in isolation). The h-index
    // oracle proves the identical fixed point in 48 CTEs — peel and
    // h-index are two algorithms for ONE table (the spec pins q76 ==
    // q79 on Spark, and coreNumbersOracleSql remains in Graph.scala,
    // validated standalone at all three SFs).
    "q76_core_numbers" -> operators.Graph.coreHindexOracleSql(),
    "q77_ppr" -> operators.Graph.pprOracleSql(),
    "q79_core_hindex" -> operators.Graph.coreHindexOracleSql(),
    "q80_weighted_pagerank" -> operators.Graph.weightedPagerankOracleSql(),
    "q81_label_prop" -> operators.Graph.labelPropOracleSql(),
    "q82_harmonic" -> operators.Graph.harmonicOracleSql(),
    "q84_lpa_semisync" -> operators.Graph.lpaSemiSyncOracleSql(),
    // q100 re-runs the q84 unroll (shared CTE body) + modularity algebra
    "q100_modularity" -> operators.Graph.modularityOracleSql(),
    // q101 extends the q84 coloring with the Louvain move rounds;
    // q102 adds the contraction + supergraph coloring + weighted moves
    "q101_louvain" -> operators.Graph.louvainOracleSql(),
    "q102_louvain_coarse" -> operators.Graph.louvainCoarseOracleSql(),
    // q103 shares the q101 chain (the labeling scored is verified)
    "q103_conductance" -> operators.Graph.conductanceOracleSql(),
    "t14_code_detect" -> operators.TextAnalysis.codeDetectOracleSql,
    "q83_top_paths" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         flagged AS (
           SELECT user_id, event_id, ms, event_type,
             CASE WHEN lag(ms) OVER w IS NULL
                    OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         sess AS (
           SELECT user_id, event_id, ms, event_type,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         cut AS (
           SELECT user_id, session_id, ms, event_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY ms, event_id) AS rn
           FROM sess),
         paths AS (
           SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ms, event_id) AS path
           FROM cut WHERE rn <= 5 GROUP BY 1, 2)
         SELECT path, count(*) AS n_sessions FROM paths
         GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 25""",
    "q78_seed_reach" -> operators.Graph.seedReachOracleSql(),
    "q85_sssp" -> operators.Graph.ssspOracleSql(),
    "q86_betweenness" -> operators.Graph.betweennessOracleSql(),
    "q88_diameter" -> operators.Graph.diameterOracleSql(),
    "q89_assortativity" -> operators.Graph.assortativityOracleSql(),
    "q90_markov_attrib" -> operators.Analytics.markovOracleSql(),
    "q96_shapley" -> operators.Analytics.shapleyOracleSql,
    "s10_mmr" -> operators.Similarity.mmrOracleSql(),
    "t16_novelty" -> operators.TextAnalysis.noveltyOracleSql,
    "q91_conversion_lag" -> operators.Analytics.conversionLagOracleSql,
    "z3_bloom_skip" -> operators.Layout.z3OracleSql(),
    // z4 replays the Hilbert xy->d loop as one CTE per bit level
    "z4_hilbert" -> operators.Layout.z4OracleSql(),
    "p15_temperature_mix" -> operators.Sampling.temperatureMixOracleSql,
    "p17_temperature_tau4" -> operators.Sampling.tau4OracleSql,
    "p18_curate" -> operators.Sampling.p18OracleSql,
    "i7_schema_evolution" ->
      """SELECT s_suppkey, s_name,
         CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal END AS s_acctbal
         FROM supplier ORDER BY s_suppkey""",
    "t17_heavy_change" -> operators.TextAnalysis.heavyChangeOracleSql,
    "s11_filtered_ann" -> operators.Similarity.filteredAnnOracleSql,
    "s14_jl_projection" -> operators.Similarity.jlOracleSql(),
    "m14_gram" -> graft.ml.Pca.gramOracleSql,
    "m19_class_stats" -> graft.ml.LinearProbe.classStatsOracleSql,
    "s13_hybrid_full" -> operators.Similarity.filteredAnnOracleSql,
    "s12_rrf" -> operators.Similarity.rrfOracleSql,
    "q92_reliability" -> operators.Analytics.reliabilityOracleSql,
    "q93_trend_slope" -> operators.Analytics.trendSlopeOracleSql,
    "q94_robustness" -> operators.Graph.robustnessOracleSql(),
    "q95_degree_dist" -> operators.Graph.degreeDistOracleSql,
    "t18_cross_surprisal" -> operators.TextAnalysis.crossSurprisalOracleSql,
    "t20_bm25" -> operators.TextAnalysis.bm25OracleSql,
    "t21_ks_drift" -> operators.TextAnalysis.ksDriftOracleSql,
    "q65_cuped" -> operators.Analytics.cupedOracleSql,
    "p19_contamination" -> operators.Dedup.contaminationReportOracleSql,
    "p16_source_cap" -> operators.Sampling.sourceCapOracleSql,
    "q87_seq_rules" ->
      """WITH cp AS (
           SELECT o.o_custkey AS c, l.l_partkey AS p, min(o.o_orderdate) AS d
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY 1, 2),
         pc AS (SELECT p, count(*) AS n_cust FROM cp GROUP BY 1),
         tot AS (SELECT count(DISTINCT c) AS n_all FROM cp),
         seq AS (
           SELECT a.p AS ante, b.p AS cons, count(*) AS n_seq
           FROM cp a JOIN cp b ON a.c = b.c AND a.d < b.d
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT ante, cons, n_seq,
           floor(CAST(n_seq AS DOUBLE) / pa.n_cust * 10000) / 10000.0
             AS confidence,
           floor(CAST(n_all AS DOUBLE) * n_seq / (pa.n_cust * pb.n_cust)
             * 10000) / 10000.0 AS slift
         FROM seq
         JOIN pc pa ON pa.p = seq.ante
         JOIN pc pb ON pb.p = seq.cons, tot
         ORDER BY n_seq DESC, confidence DESC, ante, cons LIMIT 25""",
    "q73_part_families" ->
      """WITH RECURSIVE pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         edges AS (SELECT pa AS src, pb AS dst FROM e
                   UNION ALL SELECT pb, pa FROM e),
         reach(n, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.n),
         lab AS (SELECT n AS l_partkey, min(r) AS family_id
                 FROM reach GROUP BY 1),
         sz AS (SELECT family_id, count(*) AS family_size
                FROM lab GROUP BY 1)
         SELECT l.l_partkey, l.family_id, s.family_size
         FROM lab l JOIN sz s USING (family_id)
         ORDER BY l_partkey""",
    "q67_clustering_coef" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (
           SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM pp a JOIN pp b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         t AS (
           SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
           FROM e ab JOIN e bc ON ab.pb = bc.pa
           WHERE EXISTS (SELECT 1 FROM e ac
                         WHERE ac.pa = ab.pa AND ac.pb = bc.pb)),
         tn AS (SELECT n, count(*) AS n_tri FROM
           (SELECT a AS n FROM t UNION ALL SELECT b FROM t
            UNION ALL SELECT c FROM t) GROUP BY 1),
         d AS (SELECT n, count(*) AS deg FROM
           (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e) GROUP BY 1)
         SELECT d.n AS l_partkey, d.deg AS deg,
           CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_tri,
           CASE WHEN d.deg < 2 THEN 0.0
                ELSE floor(COALESCE(tn.n_tri, 0) * 2 * 10000
                  / CAST(d.deg * (d.deg - 1) AS DOUBLE)) / 10000.0 END AS lcc
         FROM d LEFT JOIN tn ON tn.n = d.n
         ORDER BY l_partkey""",
    "q68_spend_deciles" ->
      """WITH sp AS (
           SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         rk AS (
           SELECT o_custkey, cents,
             CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS r,
             CAST(ntile(10) OVER (ORDER BY cents, o_custkey) AS BIGINT) AS decile
           FROM sp),
         tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS t,
             CAST(sum(CAST(r AS HUGEINT) * cents) AS HUGEINT) AS s
           FROM rk),
         dec AS (
           SELECT decile, count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS cents
           FROM rk GROUP BY 1),
         cum AS (
           SELECT decile, n_customers, cents,
             sum(cents) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
           FROM dec)
         SELECT decile, n_customers, cents,
           CAST((CAST(cents AS HUGEINT) * 10000) // t AS BIGINT) / 10000.0 AS share,
           CAST((CAST(cum_cents AS HUGEINT) * 10000) // t AS BIGINT) / 10000.0 AS cum_share,
           CAST(((2 * s - (n + 1) * t) * 10000) // (n * t) AS BIGINT) / 10000.0 AS gini
         FROM cum, tot ORDER BY decile""",
    "q69_holt_winters" ->
      """WITH RECURSIVE idx AS (
           SELECT CAST(d - DATE '1970-01-01' AS BIGINT) AS day, y,
                  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
           FROM (SELECT CAST(o_orderdate AS DATE) AS d,
                   sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
                 FROM orders GROUP BY 1)),
         c AS (SELECT
           (SELECT sum(y) FROM idx WHERE i BETWEEN 1 AND 7) // 7 AS m1,
           (SELECT sum(y) FROM idx WHERE i BETWEEN 8 AND 14) // 7 AS m2),
         r(i, l, b, seas, day, y, fc) AS (
           SELECT CAST(7 AS BIGINT), m1 * 1000, ((m2 - m1) * 1000) // 7,
             (SELECT list((y - m1) * 1000 ORDER BY i) FROM idx WHERE i <= 7),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM c
           UNION ALL
           SELECT idx.i,
             (300 * (idx.y * 1000 - r.seas[1]) + 700 * (r.l + r.b)) // 1000,
             (100 * (((300 * (idx.y * 1000 - r.seas[1])
               + 700 * (r.l + r.b)) // 1000) - r.l) + 900 * r.b) // 1000,
             r.seas[2:7] || [(200 * (idx.y * 1000
               - ((300 * (idx.y * 1000 - r.seas[1])
                   + 700 * (r.l + r.b)) // 1000))
               + 800 * r.seas[1]) // 1000],
             idx.day, idx.y, (r.l + r.b + r.seas[1]) // 1000
           FROM r JOIN idx ON idx.i = r.i + 1)
         SELECT day, y AS y_cents, fc AS fc_cents FROM r WHERE i >= 8
         ORDER BY day""",
    "q74_profile" ->
      """WITH c AS (
           SELECT 'o_orderkey' AS col_name,
             count(*) - count(o_orderkey) AS n_nulls,
             count(DISTINCT o_orderkey) AS n_distinct,
             CAST(min(o_orderkey) AS VARCHAR) AS min_v,
             CAST(max(o_orderkey) AS VARCHAR) AS max_v
           FROM orders
           UNION ALL
           SELECT 'o_custkey', count(*) - count(o_custkey),
             count(DISTINCT o_custkey),
             CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
             count(DISTINCT o_orderstatus),
             min(o_orderstatus), max(o_orderstatus)
           FROM orders
           UNION ALL
           SELECT 'o_totalprice', count(*) - count(o_totalprice),
             count(DISTINCT CAST(floor(o_totalprice * 100) AS BIGINT)),
             CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
             CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderdate', count(*) - count(o_orderdate),
             count(DISTINCT CAST(o_orderdate AS DATE)),
             CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR),
             CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
             count(DISTINCT o_orderpriority),
             min(o_orderpriority), max(o_orderpriority)
           FROM orders)
         SELECT col_name, n_nulls, n_distinct, min_v, max_v
         FROM c ORDER BY col_name""",
    "p12_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE (doc_id * 7919) %
           (CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 5 ELSE 10 END) = 0
         ORDER BY doc_id""",
    "p13_weighted_sample" -> operators.Sampling.p13OracleSql(),
    "p14_keep_best" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, unnest(list_distinct(list_filter(
             list_transform(string_split(text, ' '), (x, i) ->
               CASE WHEN i + 2 <= len(string_split(text, ' '))
                    THEN x || ' ' || string_split(text, ' ')[i+1]
                           || ' ' || string_split(text, ' ')[i+2] END),
             s -> s IS NOT NULL))) AS shingle
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_both
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
           WHERE CAST(n_both AS DOUBLE) / (sa.n_sh + sb.n_sh - n_both) >= 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM prs
           UNION ALL SELECT id_b, id_a FROM prs),
         reach(doc_id, r) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc_id),
         labels AS (
           SELECT doc_id, min(r) AS group_id FROM reach GROUP BY 1),
         q AS (
           SELECT doc_id,
             CAST(floor(least(greatest(
               (least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 32.0, 1.0)
                + greatest(1.0 - abs(
                    CAST(len(list_filter(string_split(text, ' '),
                      x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                      / greatest(len(string_split(text, ' ')), 1) - 0.08) * 2.0, 0.0)
                + greatest(1.0 -
                    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) * 4.0, 0.0)) / 3.0,
               0.0), 1.0) * 10000) AS BIGINT) AS qmicro
           FROM documents),
         g AS (
           SELECT d.doc_id, d.lang, d.n_chars,
                  coalesce(l.group_id, d.doc_id) AS grp, q.qmicro
           FROM documents d
           LEFT JOIN labels l ON l.doc_id = d.doc_id
           JOIN q ON q.doc_id = d.doc_id),
         k AS (
           SELECT grp, doc_id,
             row_number() OVER (PARTITION BY grp
               ORDER BY qmicro DESC, doc_id) AS rn FROM g)
         SELECT g.doc_id, g.grp AS group_id, g.lang, g.n_chars,
                g.qmicro AS quality_1e4
         FROM g JOIN k ON k.grp = g.grp AND k.doc_id = g.doc_id AND k.rn = 1
         ORDER BY g.doc_id""",
    "z2_zonemap_prune" ->
      """WITH b0 AS (
           SELECT l_partkey, l_suppkey,
             l_partkey & 2097151 AS a, l_suppkey & 2097151 AS b
           FROM lineitem),
         b1 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 16)) & 281470681808895 AS a,
           (b | (b << 16)) & 281470681808895 AS b FROM b0),
         b2 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 8)) & 71777214294589695 AS a,
           (b | (b << 8)) & 71777214294589695 AS b FROM b1),
         b3 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 4)) & 1085102592571150095 AS a,
           (b | (b << 4)) & 1085102592571150095 AS b FROM b2),
         b4 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 2)) & 3689348814741910323 AS a,
           (b | (b << 2)) & 3689348814741910323 AS b FROM b3),
         b5 AS (SELECT l_partkey, l_suppkey,
           (a | (a << 1)) & 6148914691236517205 AS a,
           (b | (b << 1)) & 6148914691236517205 AS b FROM b4),
         zm AS (
           SELECT (a | (b << 1)) >> 12 AS zbucket, count(*) AS n,
             min(l_partkey) AS min_part, max(l_partkey) AS max_part,
             min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
           FROM b5 GROUP BY 1),
         tot AS (SELECT count(*) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_rows FROM zm),
         cand AS (SELECT count(*) AS n_candidate_buckets,
           CAST(COALESCE(sum(n), 0) AS BIGINT) AS candidate_rows FROM zm
           WHERE max_part >= 1000 AND min_part <= 1500
             AND max_supp >= 50 AND min_supp <= 120),
         ex AS (SELECT count(*) AS exact_rows FROM lineitem
           WHERE l_partkey BETWEEN 1000 AND 1500
             AND l_suppkey BETWEEN 50 AND 120)
         SELECT n_buckets, n_rows, n_candidate_buckets, candidate_rows,
           exact_rows
         FROM tot, cand, ex""",
  )
}
