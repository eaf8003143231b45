package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] maps an operator (or operator family) from
  * SURVEY.md §2 / the training-data-pipeline surface onto the driver
  * testdata; entries present in [[oracleSql]] are hash-checked against
  * DuckDB, the rest get a rows-only check and their exact semantics are
  * asserted in ScalaTest.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core (SURVEY §2.1, §2.4-2.6, §2.8)
    "q01_agg" -> (RelationalOps.q01Agg _),
    "q02_scan_filter" -> (RelationalOps.q02ScanFilter _),
    "q03_join_agg" -> (RelationalOps.q03JoinAgg _),
    "q04_left_join" -> (RelationalOps.q04LeftJoin _),
    "q05_theta_join" -> (RelationalOps.q05ThetaJoin _),
    "q06_window_rank" -> (RelationalOps.q06WindowRank _),
    "q07_set_ops" -> (RelationalOps.q07SetOps _),
    "q08_pyramid_explode" -> (RelationalOps.q08PyramidExplode _),
    "q09_json" -> (RelationalOps.q09Json _),
    "q10_mjd" -> (RelationalOps.q10Mjd _),
    "q11_ivw" -> (RelationalOps.q11Ivw _),
    "q12_having" -> (RelationalOps.q12Having _),
    "q13_count_distinct" -> (RelationalOps.q13CountDistinct _),
    "q21_sessionize" -> (RelationalOps.q21Sessionize _),
    "q22_hourly_events" -> (RelationalOps.q22HourlyEvents _),
    // embeddings / similarity search (SURVEY §2.6 A4, §2.9 V1 + ANN)
    "q14_flatten" -> (VectorOps.q14Flatten _),
    "q15_l1_distance" -> (VectorOps.q15L1Distance _),
    "q16_cosine" -> (VectorOps.q16Cosine _),
    "q24_ann_topk" -> ((s: SparkSession, d: String) => VectorOps.q24AnnTopK(s, d)),
    "q25_ann_lsh" -> (VectorOps.q25AnnLsh _),
    "q26_embedding_neardup" -> (VectorOps.q26EmbeddingNearDup _),
    // text analysis / dedup
    "q17_dedup_exact" -> (TextOps.q17DedupExact _),
    "q18_jaccard" -> (TextOps.q18Jaccard _),
    "q19_textstats" -> (TextOps.q19TextStats _),
    "q20_langid" -> (TextOps.q20LangId _),
    "q23_minhash" -> (TextOps.q23MinHash _),
    "q27_simhash" -> (TextOps.q27SimHash _),
    "q28_fingerprint" -> (TextOps.q28Fingerprint _),
    // multimodal plumbing
    "q29_multimodal" -> (MultimodalOps.q29Multimodal _),
    "q32_frame_sample" -> (MultimodalOps.q32FrameSample _),
    // cube aggregation semantics (SURVEY §2.6)
    "q30_ivw_stack" -> (CubeOps.q30IvwStack _),
    "q31_band_complete" -> (CubeOps.q31BandComplete _),
    // grouping sets / sketches / csv (SURVEY §2.6 note, §2.1 S2)
    "q33_rollup" -> (RelationalOps.q33Rollup _),
    "q34_cube" -> (RelationalOps.q34Cube _),
    "q35_approx_distinct" -> (RelationalOps.q35ApproxDistinct _),
    "q36_csv_scan" -> (RelationalOps.q36CsvScan _),
    // spatial index + FITS pipeline (SURVEY §2.1 S3-S6, §2.4 I1/I6, §2.9)
    "q37_healpix" -> (AstroOps.q37Healpix _),
    "q38_fits_spectra" -> (AstroOps.q38FitsSpectra _),
    "q39_fits_image" -> (AstroOps.q39FitsImage _),
    "q111_dsv2_fits_spectra" -> (AstroOps.q111DsvFitsSpectra _),
    "q40_viz_flatten" -> (AstroOps.q40VizFlatten _),
    "q42_disc_cover" -> (AstroOps.q42DiscCover _),
    // structured streaming (windowed agg over the event stream)
    "q41_stream_windows" -> (graft.streaming.EventStream.q41StreamWindows _),
    // zip join, ranges, strings, unit-conversion math, regex tokens, IVF
    "q43_zip_join" -> (MiscOps.q43ZipJoin _),
    "q44_unique_ranges" -> (MiscOps.q44UniqueRanges _),
    "q45_string_ops" -> (MiscOps.q45StringOps _),
    "q46_photometry_math" -> (MiscOps.q46PhotometryMath _),
    "q47_regex_tokens" -> (MiscOps.q47RegexTokens _),
    "q48_ann_ivf" -> (MiscOps.q48AnnIvf _),
    "q49_char_ngram_jaccard" -> (TextOps.q49CharNgramJaccard _),
    "q50_float_compress" -> (AstroOps.q50FloatCompress _),
    // semantic dedup: cluster formation + survivor selection
    "q51_dedup_clusters" -> (TextOps.q51DedupClusters _),
    // training-data curation: quality funnel, size distribution, balancing
    "q52_quality_funnel" -> (TextOps.q52QualityFunnel _),
    "q53_token_percentiles" -> (TextOps.q53TokenPercentiles _),
    "q54_stratified_sample" -> (TextOps.q54StratifiedSample _),
    "q55_decontamination" -> (TextOps.q55Decontamination _),
    "q56_repetition" -> (TextOps.q56Repetition _),
    // round 3: clustering for data mixing, rarity scoring, retrieval,
    // mix accounting, embedding quantization
    "q57_kmeans_iter" -> (VectorOps.q57KmeansIter _),
    "q58_token_rarity" -> (TextOps.q58TokenRarity _),
    "q59_tfidf_topk" -> ((s: SparkSession, d: String) => TextOps.q59TfidfTopK(s, d)),
    "q60_domain_mix" -> (TextOps.q60DomainMix _),
    "q61_quantize_int8" -> (VectorOps.q61QuantizeInt8 _),
    // as-of join (custom operator Spark lacks; DuckDB ASOF twin) and
    // simhash Hamming-ball near-dup
    "q62_asof_join" -> (AsofOps.q62AsofJoin _),
    "q63_simhash_neardup" -> (AsofOps.q63SimhashNearDup _),
    // containment dedup + cross-source duplication analytics + chunking
    "q64_containment" -> (TextOps.q64Containment _),
    "q65_source_overlap" -> (TextOps.q65SourceOverlap _),
    "q66_chunking" -> (TextOps.q66Chunking _),
    // round-4 curation surface: bloom decontamination, vocab heavy
    // hitters, substring-level dup, sequence packing, prefix dedup,
    // ANN recall measurement
    "q67_bloom_decontaminate" -> (TextOps.q67BloomDecontaminate _),
    "q68_heavy_hitters" -> ((s: SparkSession, d: String) => TextOps.q68HeavyHitters(s, d)),
    "q69_substring_dup" -> (TextOps.q69SubstringDup _),
    "q70_seq_packing" -> ((s: SparkSession, d: String) => TextOps.q70SeqPacking(s, d)),
    "q71_prefix_dup" -> (TextOps.q71PrefixDup _),
    "q72_ann_recall" -> (VectorOps.q72AnnRecall _),
    "q73_survivor_select" -> (TextOps.q73SurvivorSelect _),
    "q74_semantic_decon" -> (VectorOps.q74SemanticDecon _),
    "q75_source_divergence" -> (TextOps.q75SourceDivergence _),
    "q76_audio_decode" -> (MultimodalOps.q76AudioDecode _),
    "q77_top_tokens_per_source" -> ((s: SparkSession, d: String) => TextOps.q77TopTokensPerSource(s, d)),
    "q78_length_deciles" -> (TextOps.q78LengthDeciles _),
    "q79_top_docs_native" -> ((s: SparkSession, d: String) => TextOps.q79TopDocsNative(s, d)),
    "q80_curation_pipeline" -> (TextOps.q80CurationPipeline _),
    "q81_interval_join" -> (CurationOps.q81IntervalJoin _),
    "q82_bigram_lift" -> ((s: SparkSession, d: String) => CurationOps.q82BigramLift(s, d)),
    "q83_bow_fingerprint" -> (CurationOps.q83BowFingerprint _),
    "q84_log2_quality" -> (CurationOps.q84Log2Quality _),
    "q85_bm25" -> ((s: SparkSession, d: String) => CurationOps.q85Bm25(s, d)),
    "q86_mixture_sample" -> (CurationOps.q86MixtureSample _),
    "q87_cdc_chunk" -> (CurationOps.q87CdcChunk _),
    "q88_cms_heavy_hitters" -> (CurationOps.q88CmsHeavyHitters _),
    "q89_group_sample" -> ((s: SparkSession, d: String) => CurationOps.q89GroupSample(s, d)),
    "q90_stream_interval_join" -> (graft.streaming.EventStream.q90StreamIntervalJoin _),
    // winnowing fingerprints, conversion funnel, trailing range windows,
    // skew-salted join
    "q91_winnowing" -> ((s: SparkSession, d: String) => MiningOps.q91Winnowing(s, d)),
    "q92_event_funnel" -> (MiningOps.q92EventFunnel _),
    "q93_trailing_activity" -> (MiningOps.q93TrailingActivity _),
    "q94_salted_join" -> (MiningOps.q94SaltedJoin _),
    "q95_prefix_filter_join" -> (MiningOps.q95PrefixFilterJoin _),
    "q96_video_frames" -> (MultimodalOps.q96VideoFrames _),
    // wide-table pivot, Markov transitions, retention cohorts, ordinal trim
    "q97_pivot_events" -> (MiningOps.q97PivotEvents _),
    "q98_session_transitions" -> (MiningOps.q98SessionTransitions _),
    "q99_retention_cohorts" -> (MiningOps.q99RetentionCohorts _),
    "q100_quality_trim" -> (MiningOps.q100QualityTrim _),
    // reshape + set ops + time-series resample
    "q101_unpivot_events" -> (MiningOps.q101UnpivotEvents _),
    "q102_audience_set_ops" -> (MiningOps.q102AudienceSetOps _),
    "q103_gap_fill" -> (MiningOps.q103GapFill _),
    // naive keyless range join, executed via the engine's rewrite rule
    "q104_range_join_native" -> (MiningOps.q104RangeJoinNative _),
    // session-path mining, integer z-score anomaly detection, corpus
    // novelty attribution, iterative graph centrality
    "q105_session_paths" -> (InsightOps.q105SessionPaths _),
    "q106_hourly_anomaly" -> (InsightOps.q106HourlyAnomaly _),
    "q107_shingle_novelty" -> (InsightOps.q107ShingleNovelty _),
    "q108_pagerank" -> (InsightOps.q108Pagerank _),
    // market-basket co-occurrence and gaps-and-islands streaks
    "q109_itemset_pairs" -> (InsightOps.q109ItemsetPairs _),
    "q110_activity_streaks" -> (InsightOps.q110ActivityStreaks _),
    // corpus hygiene: PII redaction, canonical-form dedup, df spectrum,
    // Zipf head coverage, exact-substring decontamination
    "q112_pii_redaction" -> (HygieneOps.q112PiiRedaction _),
    "q113_canonical_dedup" -> (HygieneOps.q113CanonicalDedup _),
    "q114_df_spectrum" -> (HygieneOps.q114DfSpectrum _),
    "q115_head_coverage" -> (HygieneOps.q115HeadCoverage _),
    "q116_substring_decon" -> (HygieneOps.q116SubstringDecon _),
    // rank() tie-keeping grouped top-k through the native operator
    "q117_top_docs_ranked" -> ((s, d) => TextOps.q117TopDocsRanked(s, d)),
    // contrastive-training sampling: deterministic negatives + hard
    // negatives just below the near-dup band
    "q118_negative_samples" -> (CurationOps.q118NegativeSamples _),
    "q119_hard_negatives" -> ((s, d) => VectorOps.q119HardNegatives(s, d)),
    "q120_top_docs_dense" -> ((s, d) => TextOps.q120TopDocsDense(s, d)),
    // symmetric proximity band + left-outer attribution through the
    // range-join rewrite
    "q121_proximity_join" -> (MiningOps.q121ProximityJoin _),
    "q122_left_range_join" -> (MiningOps.q122LeftRangeJoin _),
    // streaming near-dup dedup core, one-shot batch == cluster-min twin
    "q123_stream_dedup_core" -> (TextOps.q123StreamDedupCore _),
    // cross-batch transitive dedup: deterministic even/odd batch split,
    // oracle = exact two-phase streaming twin (survivor-stable reps)
    "q124_stream_dedup_multibatch" -> (TextOps.q124StreamDedupMultiBatch _),
    // IVF centroid training: two deterministic Lloyd steps gated;
    // fixpoint loop + recall laws in AnnSpec (trainIvfCentroids)
    "q125_ivf_train" -> ((s, d) => VectorOps.q125IvfTrain(s, d)),
    // product quantization: per-subspace Lloyd step + encode against
    // the updated codebooks; ADC search laws in AnnSpec
    "q126_pq_encode" -> ((s, d) => VectorOps.q126PqEncode(s, d)),
    // the ADC quantize→table→sum→rank search path, seed codebooks
    "q127_pq_adc" -> ((s, d) => VectorOps.q127PqAdc(s, d)),
    // dataset versioning: snapshot diff with a deterministic in-query
    // "release" (edits, removals, additions) the oracle replays
    "q128_corpus_diff" -> (HygieneOps.q128CorpusDiff _),
    // deterministic multi-epoch data ordering (engine-portable LCG)
    "q129_epoch_shuffle" -> (CurationOps.q129EpochShuffle _),
    // pre-release referential-integrity audit across docs⋈embeddings
    "q130_integrity" -> (HygieneOps.q130Integrity _),
    // leakage-safe split: near-dup clusters co-assign via their q51
    // representative, LCG-hashed into 90/5/5
    "q131_leakage_safe_split" -> (TextOps.q131LeakageSafeSplit _),
    // perplexity-proxy filter: corpus-trained bigram LM, integer-log2
    // surprise bits (the q84 exactness discipline)
    "q132_bigram_surprise" -> (CurationOps.q132BigramSurprise _),
    // compaction neutrality: the q124 flow with a store compaction
    // between the batches — identical twin, identical result
    "q133_compacted_stream_dedup" -> (TextOps.q133CompactedStreamDedup _),
    // incremental PQ encode-append (anti-join increment ≡ full encode)
    // + the quantization-drift retrain signal's integer math
    "q134_pq_incremental" -> (VectorOps.q134PqIncremental _),
    // ADC candidates → exact-L1 re-rank; oracle = brute-force top-5,
    // so the gate also states recall, not just mechanics
    "q135_pq_rerank" -> (VectorOps.q135PqRerank _),
    // C4-style segment-level corpus dedup with document reassembly
    "q136_segment_dedup" -> (HygieneOps.q136SegmentDedup _),
    // MinHash-LSH near-dup decontamination (the paraphrase-level
    // complement of the exact/Bloom/substring gates)
    "q137_neardup_decon" -> (HygieneOps.q137NearDupDecon _),
    // IVF bucket prune → ADC → exact re-rank, integer bucket math
    "q138_ivfpq_rerank" -> (VectorOps.q138IvfPqRerank _),
    // greedy per-source token-budget fill in the epoch-0 permutation;
    // the drawn set is pinned exactly (bit_xor of doc ids)
    "q139_token_budget_draw" -> (CurationOps.q139TokenBudgetDraw _),
    // 1/cluster-size milli-doc weights: effective corpus mass per
    // source under soft dedup (broadcast decoration, corpus unshuffled)
    "q140_soft_dedup_size" -> (TextOps.q140SoftDedupSize _),
    // per-benchmark-doc worst offender by distinct-shingle overlap,
    // through the native grouped top-k
    "q141_contamination_attribution" ->
      (HygieneOps.q141ContaminationAttribution _),
    // shift-resistant segment dedup: q136's first-occurrence law over
    // content-defined (CDC) chunk boundaries
    "q142_cdc_segment_dedup" -> (HygieneOps.q142CdcSegmentDedup _),
    // snapshot merge (upserts + deletes) gated THROUGH corpusDiff:
    // diff(old, merge(old, changes)) must reproduce q128's counts
    "q143_snapshot_merge" -> (HygieneOps.q143SnapshotMerge _),
    // watermark-bounded streaming dedup: state TTL'd past the
    // watermark, one survivor per (user, type, bucket) key
    "q144_stream_dedup_ttl" ->
      ((s, d) => graft.streaming.EventStream.q144StreamDedupTtl(s, d)),
    // char-level entropy proxy: integer-log2 surprise bits over the
    // per-doc character histogram (the garbled-text detector)
    "q145_char_entropy" -> (CurationOps.q145CharEntropy _),
    // exact distributed quantiles over the (source, tok_n) histogram —
    // rank window runs on the histogram, never the corpus
    "q146_token_quantiles" -> (SketchOps.q146TokenQuantiles _),
    // HyperLogLog cardinality sketch: portable two-LCG hash, 64
    // registers, integer-exact raw estimate next to the exact count
    "q147_hll_cardinality" -> (SketchOps.q147HllCardinality _),
    // sketch-union audience overlap via inclusion-exclusion — the
    // segments-don't-fit-a-broadcast form of the exact set ops
    "q148_hll_overlap" -> (SketchOps.q148HllOverlap _),
    // inverted (postings) index artifact: exact df, capped postings
    // with truncation accounting
    "q149_inverted_index" -> (IndexOps.q149InvertedIndex _),
    // entity-resolution fuzzy join with planted truth: vocabulary-only
    // levenshtein, unique-minimum resolution, ties refused as ambiguous
    "q150_fuzzy_er" -> (MatchOps.q150FuzzyEr _),
    // Z-order layout profile: native zorder_key expression, per-tile
    // min/max proving two-dimensional clustering under one sort
    "q151_zorder_layout" -> (IndexOps.q151ZorderLayout _),
    // integer-exact OLS regression aggregates (slope as an exact
    // fraction) — corpus drift lines from five longs per group
    "q152_ols_drift" -> (MatchOps.q152OlsDrift _),
    // Gini concentration of token frequencies as an exact fraction —
    // vocabulary concentration next to q115's Zipf head coverage
    "q153_token_gini" -> (MatchOps.q153TokenGini _),
    // Z-order layout round-trip: writeZOrdered + tile-cover boxProbe;
    // oracle is the direct predicate scan of the raw table
    "q154_zorder_probe" -> (IndexOps.q154ZorderProbe _),
    // HLL registers persisted per release shard, merged bucket-wise;
    // merge ≡ union exactly so the oracle is the single-pass estimate
    "q155_hll_persisted_union" -> (SketchOps.q155HllPersistedUnion _),
    // blocked fuzzy resolution on a large in-query vocabulary; oracle
    // resolves by plain cross-join levenshtein — blocked ≡ exhaustive
    "q156_fuzzy_er_blocked" -> (MatchOps.q156FuzzyErBlocked _),
    // cross-release incremental dedup through persisted OR-merged Bloom
    // sketches + exact verify; oracle is the plain exact semi-join
    "q157_bloom_incremental_dedup" -> (SketchOps.q157BloomIncrementalDedup _),
    // file-stats manifest data skipping: pruned read ≡ direct scan
    "q158_manifest_prune" -> (IndexOps.q158ManifestPrune _),
    // exact quantiles through persisted sum-merged histogram shards;
    // merge is exact so the oracle is q146's single-pass SQL
    "q159_quantiles_persisted" -> (SketchOps.q159QuantilesPersisted _),
    // per-key skew diagnostic: exact counts, ppm share, recommended
    // salt factor — the operator that sizes q94's nSalts
    "q160_skew_profile" -> (MiningOps.q160SkewProfile _),
    // q67's decontamination through the persisted, mergeable shingle
    // bloom with a codegen probe; oracle = the same exact containment
    "q161_bloom_decon_store" -> (SketchOps.q161BloomDeconStore _),
    // streaming histogram store: per-batch shards + manifest commits +
    // a genuine mid-stream fold; oracle = q146's single-pass SQL
    "q162_hist_stream_store" -> (SketchOps.q162HistStreamStore _),
    // release drift report computed from persisted artifacts ONLY;
    // oracle recomputes both branches from the raw corpus
    "q163_release_drift" -> (SketchOps.q163ReleaseDrift _),
    // out-of-vocabulary rate of a new release against the persisted
    // exact vocabulary artifact — the tokenizer-drift alarm
    "q164_oov_rate" -> (SketchOps.q164OovRate _),
    // streaming windowed distinct-user HLL: 64 longs of state per
    // group on an unbounded stream; oracle = integer HLL replay
    "q165_stream_hll_windows" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.EventStream.q165StreamHllWindows(s, d)),
    // heavy shingles through the persisted sum-merged Count-Min store:
    // no-false-negative prefilter + exact verify; oracle = exact HAVING
    "q166_cms_store_heavy" ->
      ((s: SparkSession, d: String) => SketchOps.q166CmsStoreHeavy(s, d)),
    // emerging heavy shingles: heavy in the new release, light in the
    // old — CMS candidates exact-verified on both sides
    "q167_cms_emerging" ->
      ((s: SparkSession, d: String) => SketchOps.q167CmsEmerging(s, d)),
    // quantiles over UNBOUNDED value domains through the persisted
    // log-bucket (HDR) histogram store: ≤ ~992 buckets per key forever,
    // relative error ≤ 1/16, exact integer bucket math on both engines
    "q168_log_quantiles_persisted" ->
      ((s: SparkSession, d: String) => SketchOps.q168LogQuantilesPersisted(s, d)),
    // per-source document cap (domain cap) in deterministic hash-draw
    // order through the bounded-heap top-k — kept SET pinned exactly
    "q169_source_cap" ->
      ((s: SparkSession, d: String) => CurationOps.q169SourceCap(s, d)),
    // streaming-maintained CMS store: per-batch d×w counter shards,
    // genuine mid-stream fold, sum-merge read ≡ union sketch; probe +
    // exact verify reproduces q166's answer
    "q170_cms_stream_store" ->
      ((s: SparkSession, d: String) => SketchOps.q170CmsStreamStore(s, d)),
    // small-cell suppression: k-anonymity release rule for published
    // corpus stats — under-k cells roll into a mass-conserving residual
    "q171_kanon_release" ->
      ((s: SparkSession, d: String) => HygieneOps.q171KAnonRelease(s, d)),
    // streaming-maintained log-bucket quantile store: third sum-monoid
    // rider on the generic shard core; byte-identical to q168's answer
    "q172_loghist_stream_store" ->
      ((s: SparkSession, d: String) => SketchOps.q172LogHistStreamStore(s, d)),
    // dense global ordinals WITHOUT a single-partition window: bucketed
    // offsets + partitioned per-bucket numbering ≡ global row_number
    "q173_dense_ordinals" ->
      ((s: SparkSession, d: String) => CurationOps.q173DenseOrdinals(s, d)),
    // small-file compaction (layout OPTIMIZE): fragment layout folded
    // to ⌈rows/target⌉ files; content-preserving by the direct-scan gate
    "q174_compact_files" ->
      ((s: SparkSession, d: String) => IndexOps.q174CompactFiles(s, d)),
    // end-to-end release pipeline: domain cap -> BOW dedup -> quality
    // gate -> budget draw, per-source funnel accounting in one flow
    "q175_release_pipeline" ->
      ((s: SparkSession, d: String) => CurationOps.q175ReleasePipeline(s, d)),
    // generic bloom semi-join: big-big join prefilter — map-only probe,
    // no false negatives, exact verify removes the FPs
    "q176_bloom_semi_join" ->
      ((s: SparkSession, d: String) => SketchOps.q176BloomSemiJoin(s, d)),
    // generic bloom anti-join: misses pass with no join at all, hits
    // are exact-verified — decontamination as a join operator
    "q177_bloom_anti_join" ->
      ((s: SparkSession, d: String) => SketchOps.q177BloomAntiJoin(s, d)),
    // streaming-maintained bloom store (OR-monoid rider): q157's
    // incremental dedup with history kept current by ingest itself
    "q178_bloom_stream_dedup" ->
      ((s: SparkSession, d: String) => SketchOps.q178BloomStreamDedup(s, d)),
    // corrupt-record quarantine at the parse boundary: flag, never
    // drop — conservation is part of the gated result
    "q179_json_quarantine" ->
      ((s: SparkSession, d: String) => HygieneOps.q179JsonQuarantine(s, d)),
    // global ntile from distributed ordinals — quantile assignment
    // with no empty-partition window; oracle is DuckDB's native ntile
    "q180_global_ntile" ->
      ((s: SparkSession, d: String) => CurationOps.q180GlobalNtile(s, d)),
    // CMS inner-product join-size estimate — the broadcast/salt advisor
    // input read from two 2 MB sketches instead of either corpus
    "q181_cms_join_size" ->
      ((s: SparkSession, d: String) => SketchOps.q181CmsJoinSize(s, d)),
    // incremental stats-manifest maintenance: delta files statted and
    // appended without rescanning the table; gate plants a stale-miss
    "q182_manifest_append" ->
      ((s: SparkSession, d: String) => IndexOps.q182ManifestAppend(s, d)),
    // multi-probe LSH: Hamming-1 probe ring recovers single-probe's
    // recall loss without multiplying index tables — one equi-join
    "q183_multiprobe_recall" ->
      ((s: SparkSession, d: String) => VectorOps.q183MultiProbeRecall(s, d)),
    // perceptual image dedup: integer-exact aHash over the REAL PNG
    // decode path, bit_xor fold pins every hash value cross-engine
    "q184_image_ahash" ->
      ((s: SparkSession, d: String) => MultimodalOps.q184ImageAHashDedup(s, d)),
    // perceptual near-dup pairs: pigeonhole-exact banded Hamming join,
    // oracle is the brute-force all-pairs scan with no banding
    "q185_image_neardup" ->
      ((s: SparkSession, d: String) => MultimodalOps.q185ImageNearDup(s, d)),
    // exact percentile tagging from the persisted histogram artifact —
    // map-only over the corpus, no corpus-wide window anywhere
    "q186_percentile_tag" ->
      ((s: SparkSession, d: String) => SketchOps.q186PercentileTag(s, d)),
    // pack boundary map: where every document lands in its packed
    // sequences — the cross-document attention-mask input
    "q187_pack_boundaries" ->
      ((s: SparkSession, d: String) => TextOps.q187PackBoundaries(s, d)),
    // perceptual image decontamination: corpus never shuffles — the
    // benchmark's band rows broadcast, verify only on band collisions
    "q188_image_decon" ->
      ((s: SparkSession, d: String) => MultimodalOps.q188ImageDecon(s, d)),
    // cross-release percentile drift: new docs tagged with their place
    // in the OLD release's persisted distribution, as-of matched
    "q189_percentile_drift" ->
      ((s: SparkSession, d: String) => SketchOps.q189PercentileDrift(s, d)),
    // join-plan advisor: CMS join size + both skew profiles + the
    // strategy CASE, all gated — advice proven engine-identical
    "q190_join_advisor" ->
      ((s: SparkSession, d: String) =>
        SketchOps.q190JoinAdvisor(s, d, broadcastRows = 1000L, saltCut = 2L)),
    // streaming first-seen registry: perceptual dedup history kept by
    // ingest; min-merge ≡ the one-shot batch survivor assignment
    "q191_image_registry_stream" ->
      ((s: SparkSession, d: String) => MultimodalOps.q191ImageRegistryStream(s, d)),
    // media integrity audit: decode-vs-metadata, flag never drop,
    // conservation in the gated row (q179 for binary payloads)
    "q192_media_audit" ->
      ((s: SparkSession, d: String) => MultimodalOps.q192MediaAudit(s, d)),
    // embedding centroid drift per label: integer-exact division-
    // cleared L1 between release centroids — the vector-side q189
    "q193_centroid_drift" ->
      ((s: SparkSession, d: String) => VectorOps.q193CentroidDrift(s, d)),
    // BPE round-0 pair stats: one corpus shuffle to the word-frequency
    // table, then vocabulary-sized pair counting (Heaps'-law cliff)
    "q194_bpe_pairs" ->
      ((s: SparkSession, d: String) => TokenizerOps.q194BpePairs(s, d)),
    // BPE merge training, 4 rounds: argmax + double-space greedy merge
    // per round, all on the vocabulary; one-row driver collect per round
    "q195_bpe_merges" ->
      ((s: SparkSession, d: String) => TokenizerOps.q195BpeMerges(s, d)),
    // phrase search: the match runs inside the row (array filter over
    // positions) — zero exchanges, no posexplode self-join
    "q196_phrase_search" ->
      ((s: SparkSession, d: String) => IndexOps.q196PhraseSearch(s, d)),
    // co-engagement triangles: adaptive p90 hot-bucket refusal
    // (accounted in-row), weight-thresholded edges, degree-oriented
    // wedge join — O(m^1.5), never deg² at a celebrity node
    "q197_triangles" ->
      ((s: SparkSession, d: String) => InsightOps.q197Triangles(s, d)),
    // Fellegi–Sunter linkage: multi-pass composite blocking equi-joins,
    // integer agreement weights, unique-max else refuse, every record
    // accounted (link/possible/nonlink/ambiguous/nocandidate)
    "q198_linkage_score" ->
      ((s: SparkSession, d: String) => MatchOps.q198LinkageScore(s, d)),
    // U-shaped multi-touch attribution: integer basis points summing to
    // exactly 10000 per conversion; key-local touch join; untouched
    // purchases accounted, never dropped
    "q199_attribution" ->
      ((s: SparkSession, d: String) => MiningOps.q199Attribution(s, d)),
    // snapshot lifecycle: staged-rename commits, metadata-only version
    // discovery, newest-last retention with the expiry accounted in-row
    "q200_snapshot_expiry" ->
      ((s: SparkSession, d: String) => IndexOps.q200SnapshotExpiry(s, d)),
    // Matryoshka prefix-dim retrieval: prefix shortlist + full re-rank,
    // recall dominance pinned; prefix column = 4x less data first pass
    "q201_matryoshka_recall" ->
      ((s: SparkSession, d: String) => VectorOps.q201MatryoshkaRecall(s, d)),
    // Spearman rank correlation per source, histogram-first ranks —
    // the corpus is never sorted; division-cleared integer fraction
    "q202_spearman" -> (MatchOps.q202Spearman _),
    // chi-square residual table lang x source: full zero-cell grid,
    // cleared (N n - ra cb)^2 per cell — cells-sized after one agg
    "q203_chi_square" -> (MatchOps.q203ChiSquare _),
    // skip-gram co-occurrence pairs, in-row window generation —
    // one exchange total, sized by the pair vocabulary
    "q204_skipgram_pairs" -> (TokenizerOps.q204SkipGrams _),
    // deterministic synchronous label propagation (min-label ties)
    // over the q197 co-engagement graph; k edge-list rounds
    "q205_label_prop" -> (InsightOps.q205LabelProp _),
    // minhash estimator audit: portable-LCG signatures, estimated vs
    // exact Jaccard per inverted-index candidate pair
    "q206_minhash_error" -> (SketchOps.q206MinhashError _),
    // exact connected components (hybrid union-find / star contraction)
    // on the co-engagement graph — the partition q205 refines
    "q207_graph_components" -> (InsightOps.q207Components _),
    // source-pair cosine over tf vectors, division-cleared; disjoint
    // vocabularies are absent rows (similarity exactly 0)
    "q208_source_similarity" -> (CurationOps.q208SourceSimilarity _),
    // salted skew join, result-identical to the plain join (oracle is
    // the unsalted SQL) — the operator q190's advisor recommends
    "q209_salted_join" -> (RelationalOps.q209SaltedJoin _),
    // streaming late-data accounting: two deterministic micro-batches,
    // the engine's own numRowsDroppedByWatermark in the gated row
    "q210_stream_late_data" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.EventStream.q210LateData(s, d)),
    // k-core by iterative peeling (converge-or-throw); oracle is the
    // peel loop unrolled to the round cap
    "q211_kcore" -> (InsightOps.q211KCore _),
    // stream-static broadcast enrichment before the windowed agg —
    // no join state, left-join + UNKNOWN fill accounts dimension misses
    "q212_stream_enrich" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.EventStream.q212StreamEnrich(s, d)),
    // SCD Type-2 validity intervals with run-length compression; one
    // user_id shuffle, both windows share a single sort
    "q213_scd2" -> (WarehouseOps.q213Scd2 _),
    // one-pass table profiler (nulls/distinct/min/max per column);
    // float min/max abstain rather than diverge on rendering
    "q214_table_profile" -> (WarehouseOps.q214TableProfile _),
    // exact MAD per source: histogram-first twice, broadcast medians,
    // the corpus is scanned twice and shuffled never
    "q215_mad" -> (SketchOps.q215Mad _),
    // integer-exact EWMA (alpha=1/2 as power-of-2 weights) at each
    // user's last active hour, over the hourly histogram
    "q216_ewma" -> (MiningOps.q216Ewma _),
    // golden-record survivorship: field-level modal vote per canonical
    // cluster, deterministic tie-break, disagreement accounted
    "q217_golden_record" -> (WarehouseOps.q217GoldenRecord _),
    // exact MRR@10 of the LSH index vs brute force, reciprocal ranks
    // scaled by lcm(1..10) so the gate is integer
    "q218_ann_mrr" -> (VectorOps.q218AnnMrr _),
    // dynamic-partition-overwrite backfill; untouched partitions are
    // verified by file listing, not trusted
    "q219_partition_overwrite" -> (WarehouseOps.q219PartitionOverwrite _),
    // l-diversity release check: homogeneous cells suppressed with
    // mass conserved — q171's rule on sensitive-value diversity
    "q220_ldiversity" -> (WarehouseOps.q220LDiversity _),
    // BPE encode at corpus scale: merges trained then applied once per
    // distinct word, token economics per source
    "q221_bpe_encode" ->
      ((s: SparkSession, d: String) => TokenizerOps.q221BpeEncode(s, d)),
    // integer CUSUM drift detection (prefix-sum identity, two shared
    // running windows); catches sustained drift q106's 2-sigma misses
    "q222_cusum" -> (InsightOps.q222Cusum _),
    // order-independent table checksum: xor + mod-sum folds of
    // md5-derived 60-bit row keys — migration verification in one pass
    "q224_table_checksum" -> (HygieneOps.q224TableChecksum _),
    // p99 winsorization with clipped-mass accounting, histogram-first
    "q227_winsorize" -> (SketchOps.q227Winsorize _),
    // burst debounce per (user, type): first-of-burst survivors,
    // conservation + id fold in the gated row
    "q229_debounce" -> (MiningOps.q229Debounce _),
    // DSIR-style importance selection: integer-log likelihood ratio of
    // target vs corpus unigram LMs, top-k most target-like docs
    "q223_dsir_select" ->
      ((s: SparkSession, d: String) => CurationOps.q223DsirSelect(s, d)),
    // Apriori-pruned frequent triples: prune docs to >= 10% items
    // BEFORE any combination is generated (downward closure)
    "q225_itemset_triples" ->
      ((s: SparkSession, d: String) => MiningOps.q225ItemsetTriples(s, d)),
    // exact stratified split: floor-quota per stratum by the epoch-0
    // permutation rank; membership pinned by xor fold
    "q228_stratified_split" -> (CurationOps.q228StratifiedSplit _),
    // Hamilton largest-remainder apportionment: parts sum to the
    // budget exactly, deterministic remainder tie-break
    "q226_apportion" -> (CurationOps.q226Apportion _),
    // native session_window streaming sessions == the relational gap
    // rule (merge semantics proven against the lag definition)
    "q230_stream_session_window" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.EventStream.q230StreamSessionWindow(s, d)),
    // int8-quantized retrieval recall vs float ground truth — the
    // quantized ranking is all-integer (q61 grid, raw int dot)
    "q231_int8_recall" -> (VectorOps.q231Int8Recall _),
    // token-balanced shard cuts via the q173 distributed prefix-sum
    // (no global single-task window, no sampling pass)
    "q232_shard_cut" -> (CurationOps.q232ShardCut _),
    // index-anchored two-phase phrase retrieval; oracle is the direct
    // scan — anchor prefilter proven lossless
    "q233_phrase_anchored" -> (IndexOps.q233PhraseRetrieveAnchored _),
    // language-ID confusion matrix — per-class eval table over the
    // q20 heuristic vs labels
    "q234_lang_confusion" -> (TextOps.q234LangConfusion _),
    // deterministic random walks (DeepWalk corpus generation) — LCG
    // steps over sorted neighbor lists, k joins, no convergence loop
    "q235_random_walks" -> (InsightOps.q235RandomWalks _),
    // seasonal hour-of-day median baseline, c > 2*med exceedance —
    // the robust complement of q106's global-mean z-test
    "q236_seasonal_residual" -> (InsightOps.q236SeasonalResidual _),
    // canonical star join, money as integer cents, plan-gated to
    // three broadcasts + one aggregate shuffle
    "q237_star_join" -> (RelationalOps.q237StarJoin _),
    // cumulative user growth from first-seen days — exact running
    // distinct without windowed distinct state
    "q238_cumulative_users" -> (InsightOps.q238CumulativeUsers _),
    // declarative data-contract audit: predicate + referential checks,
    // report-never-filter
    "q239_constraint_audit" -> (HygieneOps.q239ConstraintAudit _),
    // funnel view->click latency quantiles, histogram-first
    "q240_funnel_latency" -> (MiningOps.q240FunnelLatency _),
    // degree assortativity as a division-cleared exact fraction —
    // do hubs engage with hubs?
    "q241_assortativity" -> (InsightOps.q241Assortativity _),
    // modularity of the q205 communities as the exact fraction
    // sum(4m e_c - d_c^2) / 4m^2 — scores what q205 found
    "q242_modularity" -> (InsightOps.q242Modularity _),
    // summary-table rewrite: a custom optimizer rule serves the plain
    // fact aggregate from a registered rollup artifact; plan-required
    "q243_summary_rewrite" -> (IndexOps.q243SummaryRewrite _),
    // stream -> mergeable partial shards -> folded rollup -> optimizer
    // rewrite: ingest maintains the artifact, queries stay unchanged
    "q244_streaming_summary" -> (IndexOps.q244StreamingSummary _),
    // decode -> nearest 2x resize -> real-codec re-encode roundtrip;
    // resized pixel/lum accounting gate-exact from the fixture bytes
    "q245_image_resize" -> (MultimodalOps.q245ImageResize _),
    // exact A/B readout: the two-proportion z-test cleared of every
    // division, compared as two integers
    "q246_ab_test" -> (MiningOps.q246AbTest _),
    // right-to-be-forgotten propagation across tables, deletion
    // accounted with conservation + a hashed residue check
    "q247_forget_users" -> (HygieneOps.q247ForgetUsers _),
    // deterministic cross-table pseudonymization; referential
    // preservation proven in the token domain
    "q248_pseudonymize" -> (HygieneOps.q248Pseudonymize _),
    // exact contribution analysis: star revenue shares in ppm summing
    // to exactly 10^6 via Hamilton apportionment (q237 ∘ q226)
    "q249_revenue_share" -> (RelationalOps.q249RevenueShare _),
    // key-only-filtered rollup served by the summary rewrite: the
    // predicate is pushed onto the summary scan; plan-required
    "q250_summary_filtered" -> (IndexOps.q250SummaryFiltered _),
    // covering-summary selection among two registered rollups, with
    // min/max partial re-aggregation; plan-required
    "q251_summary_minmax" -> (IndexOps.q251SummaryMinMax _),
    // summary committed twice through the snapshot store, consumed by
    // a FRESH session resolving the newest version; plan-required
    "q252_summary_store" -> (IndexOps.q252SummaryStore _),
    // approx profiler: no-Expand plan gate + in-query HLL error bound
    // over every column; hashed output is the exact profile
    "q253_profile_approx" -> (WarehouseOps.q253ProfileApprox _),
    // algebraic AVG (Σsum/Σcnt) under a key filter, served by the
    // summary rewrite; plan-required
    "q254_summary_avg" -> (IndexOps.q254SummaryAvg _),
    // share-of-total window + integer ppm ABOVE the summary-served
    // rollup: the rewrite composes under parent operators
    "q255_summary_share" -> (IndexOps.q255SummaryShare _),
    // Gopher-style within-document duplicate-2-gram quality profile;
    // in-row gram array (no explode), one aggregate on source
    "q256_dup_ngram" -> (CurationOps.q256DupNgram _),
    // percentile_approx gated by its own rank-error contract against
    // the exact histogram; hashed output is the exact quantile table
    "q257_quantile_approx" -> (SketchOps.q257QuantileApprox _),
    // batch incremental summary maintenance: monoid delta fold into
    // the snapshot store, equivalence-gated vs a full rebuild
    "q258_summary_delta" -> (IndexOps.q258SummaryDeltaMerge _),
    // Theil-Sen robust daily-volume trend: in-row pairwise slope
    // median, integer floor-permille, cross-engine exact
    "q259_theil_sen" -> (InsightOps.q259TheilSen _),
    // star-join rewrite: partial-aggregation pushdown through the
    // orders ⋈ customer join from a persisted summary; plan-required
    "q260_summary_star" -> (IndexOps.q260SummaryStarJoin _),
    // ROLLUP lattice as a union of three rewritten aggregates — the
    // whole hierarchy from three summary reads; plan-required
    "q261_summary_rollup" -> (IndexOps.q261SummaryRollup _),
    // summary audit: recompute-and-diff, planted drift must be caught
    // (non-vacuity), accounting row oracle-derived from the lattice
    "q262_summary_audit" -> (IndexOps.q262SummaryAudit _),
    // two engine extensions in ONE plan: summary-served rollup under
    // the native TopKPerKey leaderboard; both plan-required
    "q263_summary_topk" -> (IndexOps.q263SummaryTopK _),
    // on-disk catalog: fresh registry + install(catalogDir) alone must
    // serve from the store; dead entries refuse cleanly; plan-required
    "q264_summary_catalog" -> (IndexOps.q264SummaryCatalog _),
    // COUNT(DISTINCT key) from summary rows (the q13 shape, persisted)
    "q265_summary_distinct" -> (IndexOps.q265SummaryDistinct _),
    // GROUP BY year/month over a day-keyed summary — coarsening of a
    // coarsening (the reference's id >> 2 multi-resolution lattice)
    "q266_summary_coarsen" -> (IndexOps.q266SummaryCoarsen _),
    // left-outer star pushdown (the SFR left-merge shape, persisted)
    "q267_summary_star_outer" -> (IndexOps.q267SummaryStarOuter _),
    // NATIVE rollup (Aggregate-over-Expand) served by the summary —
    // the real GROUP BY ROLLUP plan, not q261's manual composition
    "q268_summary_native_rollup" -> (IndexOps.q268SummaryNativeRollup _),
    // lattice derivation: coarser summary rolled up from the finer
    // artifact (zero fact access), then served by covering selection
    "q269_summary_derive" -> (IndexOps.q269SummaryDerive _),
    // catalog freshness: a cat=2 published AFTER the consumer installed
    // serves on its next query — drops deregister, adds serve; no restart
    "q270_summary_fresh" -> (IndexOps.q270SummaryFresh _),
    // size-aware artifact layout: a high-cardinality summary lands
    // multi-file (gated) and still plan-provably serves
    "q271_summary_multifile" -> (IndexOps.q271SummaryMultifile _),
    // multiple distinct aggregates in one query served through the
    // RewriteDistinctAggregates Expand shape; plan-required
    "q272_summary_multidistinct" -> (IndexOps.q272SummaryMultiDistinct _),
    // NULL-safe avg/count(col) from the cnt_<col> non-null-count
    // partial, gated on a fact with planted NULLs (values, not plans,
    // are what catch a Σcnt-derived average)
    "q273_summary_nullsafe" -> (IndexOps.q273SummaryNullsafe _),
    // mixed regular + multi-distinct aggregate served through
    // null-masked partial pass-throughs; plan-required
    "q274_summary_mixed_distinct" -> (IndexOps.q274SummaryMixedDistinct _),
    // conditional-dashboard pivot: FILTER (WHERE key-pred) aggregates
    // + CASE measures over keys + distinct-over-expression, one plan
    "q275_summary_pivot" -> (IndexOps.q275SummaryPivot _),
    // approx_count_distinct over a NON-key measure served from a
    // persisted hll_<p>_ register partial, bit-identical to the
    // direct sketch (gated); output is the exact uniques statement
    "q276_summary_hll_measure" -> (IndexOps.q276SummaryHllMeasure _),
    // aggregate over a UNION of registered facts (multi-epoch corpora):
    // each branch's summary substitutes independently, one uncovered
    // epoch refuses the whole rewrite; both proofs in-gate
    "q277_summary_union" -> (IndexOps.q277SummaryUnion _),
    // ROLLUP × uniques: approx_count_distinct over an hll register
    // partial served through the rewritten Expand, bit-identical to
    // the fact rollup sketch (gated); exact statement oracled
    "q278_summary_rollup_uniques" -> (IndexOps.q278SummaryRollupUniques _),
    // the composed shape: native ROLLUP over a UNION of epochs with a
    // sketch measure — both serving dimensions in one plan (gated
    // bit-identical); exact statement oracled
    "q279_summary_union_rollup" -> (IndexOps.q279SummaryUnionRollup _),
    // workload-driven advisor: adviseSummaries over the dashboard's
    // frames -> buildAdvice -> all three queries plan-provably serve;
    // unservable shapes named (all gated in-query)
    "q280_summary_advisor" -> (IndexOps.q280SummaryAdvisor _),
    // the distinct-family over a non-key measure served EXACTLY from a
    // persisted hist_<col> value-histogram partial (posexplode_outer +
    // null-masked companions); fact-scan-free by in-gate plan proof
    "q281_summary_hist_distinct" -> (IndexOps.q281SummaryHistDistinct _),
    // the dashboard header: multi-distinct (hist measure + key) beside
    // totals, served through the RewriteDistinctAggregates double
    // aggregation with an outer-aggregate audit
    "q282_summary_hist_multidistinct" ->
      (IndexOps.q282SummaryHistMultiDistinct _),
    // trainable quality classifier: distributed full-batch GD with
    // integer-cleared gradients and a rational sigmoid — the whole
    // training trajectory replayed long-for-long by the DuckDB oracle
    "q283_lr_quality" -> (CurationOps.q283LrQuality _),
    // the classifier's exact evaluation: cumulative PR cells per
    // probability bucket, integers end-to-end
    "q284_pr_curve" -> (CurationOps.q284PrCurve _),
    // TPC-H revenue sum(price*(1-discount)) served from an expression
    // partial, through a 2-dim (snowflake) star — plan-gated, refusal
    // gated first
    "q285_summary_expr_star" -> (IndexOps.q285SummaryExprStar _),
    // CDC-maintained summary: insert + DELETE batch retracts partials
    // (hist per-value, min/max re-derived), still serving fact-scan-free
    "q286_summary_cdc" -> (IndexOps.q286SummaryCdc _),
    // snapshot-diff change feed (Delta-CDF from plain parquet versions)
    // feeding applyCdc: version swap without an artifact rebuild
    "q287_snapshot_cdc" -> (WarehouseOps.q287SnapshotCdc _),
    // expression partials under native ROLLUP: the revenue pivot with
    // subtotals, Expand-path served, fact-scan-free by plan proof
    "q288_summary_expr_rollup" -> (IndexOps.q288SummaryExprRollup _),
    // exact distinct/percentiles of a computed measure via the
    // expression histogram — median revenue without keying its columns
    "q289_summary_expr_hist" -> (IndexOps.q289SummaryExprHist _),
    // GROUP BY year(date) over a UNION of epoch facts, served from
    // per-epoch day-keyed summaries — the multi-epoch dashboard shape
    "q290_summary_union_coarsen" -> (IndexOps.q290SummaryUnionCoarsen _),
    // hybrid union: the covered epoch serves its artifact, the
    // not-yet-summarized epoch partializes — values collected hybrid
    "q291_summary_hybrid_union" -> (IndexOps.q291SummaryHybridUnion _),
    // sketch hybrid: persisted registers + inline-aggregated registers
    // fold bit-identically to the direct sketch; exact uniques emitted
    "q292_summary_sketch_hybrid" -> (IndexOps.q292SummarySketchHybrid _),
    // the calendar pivot over a multi-epoch corpus: native
    // ROLLUP(year(date), status) over a union of epoch dirs, served
    // per grouping set from per-epoch artifacts; hybrid + divergent-
    // branch refusal gated in-query
    "q293_summary_union_calendar" ->
      (IndexOps.q293SummaryUnionCalendarRollup _),
    // exact distinct-family over a non-key measure under native
    // ROLLUP, from the hist_ partial (the grouping-sets uniques
    // matrix); plan-gated Expand-above-Generate
    "q294_summary_rollup_distinct" ->
      (IndexOps.q294SummaryRollupDistinct _),
    // the two-median dashboard row: two hist_ partials, per-measure
    // explosions joined on grouping values; plan-gated two Generates
    "q295_summary_two_hist" -> (IndexOps.q295SummaryTwoHist _),
    // the uniques pair: two count(DISTINCT measure)s + both medians in
    // one aggregate — the double aggregation split per measure and
    // joined back; plan-gated two Generates + Join
    "q296_summary_multi_distinct" ->
      (IndexOps.q296SummaryMultiDistinct _),
    // the grouping-sets uniques-pair matrix: q294 × q296 composed —
    // two count(DISTINCT)s + both medians under native ROLLUP, the
    // stacked Expands flattened and split per measure; plan-gated
    // Expand + two Generates + BroadcastHashJoin + refusal law
    "q297_summary_rollup_multi_distinct" ->
      (IndexOps.q297SummaryRollupMultiDistinct _),
    // uniques per dim attribute: two count(DISTINCT fact-measure)s +
    // glue through a star join — per-measure join trees, explosion
    // above each rebuilt join; plan-gated two Generates + broadcast
    "q298_summary_star_multi_distinct" ->
      (IndexOps.q298SummaryStarMultiDistinct _),
    // the multi-epoch per-segment two-median dashboard: two hist
    // measures through a star join over a UNION fact — per-measure
    // sides each union their per-branch artifact instances, one
    // explosion per side OVER the union; plan-gated two Generates +
    // broadcast + both-artifacts-serve + union refusal
    "q299_summary_union_star_two_median" ->
      (IndexOps.q299SummaryUnionStarTwoMedian _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ VectorOps.oracles ++ TextOps.oracles ++
      MultimodalOps.oracles ++ CubeOps.oracles ++ AstroOps.oracles ++
      graft.streaming.EventStream.oracles ++ MiscOps.oracles ++ AsofOps.oracles ++
      CurationOps.oracles ++ MiningOps.oracles ++ InsightOps.oracles ++
      HygieneOps.oracles ++ SketchOps.oracles ++ IndexOps.oracles ++
      MatchOps.oracles ++ TokenizerOps.oracles ++ WarehouseOps.oracles
}
