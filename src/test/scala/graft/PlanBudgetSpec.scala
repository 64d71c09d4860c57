package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression gate: every declared query's physical plan must stay
  * within its audited shuffle budget, and no query may silently regress
  * from a broadcast join to a sort-merge join. The budgets are the
  * current `graft.PlanAudit` numbers — a deliberate plan change updates
  * the table HERE, in the same commit, with the reasoning; an accidental
  * one fails this spec.
  */
class PlanBudgetSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** query → max ShuffleExchange nodes in the pre-execution plan. */
  private val shuffleBudget: Map[String, Int] = Map(
    "q01_pricing_summary" -> 3, "q02_load_stats" -> 2, "q03_order_flatten" -> 2,
    "q04_prefix_flatten" -> 2, "q05_safe_cast" -> 1, "q06_string_clamp" -> 1,
    "q07_etl_stamp" -> 1, "q08_column_intersect" -> 1, "q09_join_enrich" -> 2,
    "q10_semi_join" -> 1, "q11_anti_join" -> 3, "q12_merge_upsert" -> 3,
    "q13_retention" -> 2, "q14_incremental_failopen" -> 3,
    "q15_staging_summary" -> 3, "q16_quality_gate" -> 6, "q17_mart_daily" -> 3,
    "q18_window_rank" -> 2, "q19_hourly_events" -> 3, "q20_validation" -> 5,
    "q21_dedup_exact" -> 2, "q22_ngram_jaccard" -> 2, "q23_minhash_lsh" -> 2,
    "q24_simhash" -> 2, "q25_embed_neardup" -> 1, "q26_ann_topk" -> 2,
    // q28's 2nd shuffle is the deliberate compute-spreading repartition
    // before the scoring pass (same pattern as q50's probe-side one): the
    // documents scan is a single parquet split at test SF and the per-row
    // n-gram fold is compute-bound, so spreading it across cores is the
    // intended plan.
    // q27/q35's extra (4th/5th) shuffle is the deliberate recall gate:
    // a single-partition window totalling brute-force hits over the
    // bounded |queries|×k top-k frame (Similarity.withRecallGate).
    "q27_ann_lsh" -> 4, "q28_lang_id" -> 2, "q29_text_quality" -> 1,
    "q30_token_count" -> 1, "q31_fingerprint" -> 1, "q32_multimodal_meta" -> 1,
    "q33_media_features" -> 1, "q34_hmac_sign" -> 1, "q35_ann_ivf" -> 5,
    "q36_dedup_clusters" -> 1, "q37_train_split" -> 2, "q38_balanced_sample" -> 2,
    "q39_tfidf" -> 4, "q40_rollup" -> 2, "q41_asof_join" -> 2,
    // q44/q56/q79/q113: exact order statistics (Stats.orderStatsPermille)
    // replaced percentile_approx in r8 — each call is a banded two-phase
    // prefix sum (value-count agg, band-local cumsum window, per-band
    // totals agg + bounded offsets window, per-group n agg, rank-pick
    // agg). Shuffle COUNT rises but every post-(g,v) exchange moves
    // distinct-value-sized data, not rows — volume is what scales.
    "q42_sessionize" -> 2, "q43_bm25" -> 7, "q44_profile" -> 10,
    "q45_grouping_sets" -> 2, "q46_rolling_fp" -> 1, "q47_window_suite" -> 2,
    "q48_set_ops" -> 5, "q49_pivot" -> 3, "q50_fuzzy_match" -> 3,
    // q50's 3rd shuffle is the deliberate probe-side repartition that
    // spreads the levenshtein work (one parquet split otherwise).
    "q51_range_join" -> 2, "q52_skew_salted_join" -> 3, "q53_collect_set" -> 2,
    "q54_ngram_freq" -> 1, "q55_anomaly" -> 3,
    "q56_percentiles_by_group" -> 9, "q57_regex_extract" -> 2,
    "q58_zorder_key" -> 0, // orderBy+limit plans as TakeOrdered, no exchange
    "q59_snapshot_diff" -> 4, "q60_histogram" -> 2, "q61_json_parse" -> 3,
    "q62_bucketed_join" -> 2, // agg + output sort; the JOIN is exchange-free
    "q63_schema_evolution" -> 3, "q64_moving_window" -> 2,
    "q65_mode_per_group" -> 3,
    "q66_cube" -> 2, "q67_approx_distinct" -> 3,
    // q68: term-freq agg, corpus-total agg, per-doc agg, output sort, plus
    // the single-partition exchange under the one-row total.
    "q68_doc_logprob" -> 5,
    // q69: the MAD chain composes TWO orderStatsPermille passes whose
    // input (the deviation frame) is itself built from the first pass's
    // result — the audited count is the STATIC plan-tree total, where the
    // shared dev/byV subtrees repeat under each consumer; at runtime
    // ReuseExchange serves the canonical-identical aggregates from one
    // shuffle, and every exchange past the first moves distinct-value-
    // sized frames, not rows.
    "q69_mad_outlier" -> 42,
    "q70_containment" -> 2, "q71_funnel" -> 4,
    "q72_pii_scrub" -> 1, "q73_repetition" -> 3,
    // q74: per-source sketch agg, sketch-merge agg, exact-distinct agg
    // (expand), plus the single-partition exchange under the one-row
    // merge — the exact side exists only to audit the sketch.
    "q74_sketch_merge" -> 4,
    "q75_contamination" -> 3,
    // q76: two-phase prefix sum (local-cumsum window on grp, group-totals
    // agg + bounded offset window) + pack agg + output sort.
    "q76_seq_pack" -> 5,
    // q77: per-source weight agg, one-row total, ranking window on
    // source, output sort (+AQE-visible broadcast prep).
    "q77_mixture_sample" -> 5,
    "q78_changelog_compact" -> 2, "q79_quantile_sketch" -> 10,
    // q80: assignment agg (cached, counted once), per-dimension mean agg,
    // centroid re-collect agg, the two count aggs, and the full-outer
    // count join — every aggregate is keyed on the ≤(centroids×dims)
    // domain except the cached assignment itself.
    "q80_kmeans_refine" -> 6,
    // q81: the exact-membership distinct agg + the one-row audit agg; the
    // bloom build itself runs eagerly and its sketch inlines as a literal.
    "q81_bloom_prefilter" -> 2,
    // q82: one doc_id exchange feeds the window AND both per-doc aggs
    // (same-key partitioning reuse), plus the output sort.
    "q82_cdc_chunks" -> 2,
    // q83: the distinct-(user, week) agg, the first-seen agg (same-key,
    // join reuses its partitioning), the two-phase distinct count on the
    // (cohort, offset) key, and the output sort.
    "q83_cohort_retention" -> 5,
    // q84: token-mass agg feeding the broadcast weight table, then the
    // q77 mixture pipeline (weight agg, one-row total, source-ranking
    // window, output sort) — all but the window and sort operate on
    // |sources|-sized frames; the corpus scans twice by design (stats
    // pass, then sample pass).
    "q84_temperature_mixture" -> 8,
    // q85: gram-hash frequency agg, the doc_id window exchange (span
    // merge + both per-doc aggs and the stats join reuse that
    // partitioning), and the output sort; the duplicated-gram join
    // broadcasts its small side.
    "q85_substring_dedup" -> 3,
    // q86: gram-hash frequency agg, covered-position distinct, the
    // (doc,pos) anti-join exchange feeding the doc-keyed reassembly
    // agg (partitioning reuse), and the output sort; the dup-owner join
    // broadcasts.
    "q86_span_removal" -> 4,
    // q87: one bucket-keyed window exchange (the batch agg reuses its
    // partitioning) + the output sort.
    "q87_length_batching" -> 2,
    // q88: shared-gram pair agg, best-match window (same-key — batch_id
    // is a prefix of the agg key, still one exchange each), the final
    // stats join's exchange, and the output sort; the batch gram side
    // broadcasts into the postings join.
    "q88_delta_neardup" -> 4,
    // q89: the |keys|-sized count agg feeds the exact order-stats pass
    // (q44's banded shape over key counts), the one-row summary, and the
    // TakeOrdered top-10 — static tree count; all post-count exchanges
    // are |keys|-sized or smaller.
    "q89_skew_report" -> 14,
    // q90: the k-counter sketch merge and the one-row total each collapse
    // to a single-partition exchange (both carry ≤ k counters per task,
    // never the vocabulary); the candidate recount agg + the output sort.
    // The candidate and total joins broadcast.
    "q90_heavy_hitters" -> 4,
    // q91: the score-band window exchange, the band-totals agg + its
    // single-partition phase-2 window, and the output sort; the band-
    // offset join broadcasts.
    "q91_token_budget" -> 4,
    // q92: the shard-keyed window exchange + the output sort.
    "q92_epoch_shuffle" -> 2,
    // q93: top-k plans as TakeOrderedAndProject (no exchange); the
    // post-limit output sort re-orders ≤ k rows.
    "q93_priority_sample" -> 1,
    // q94: the bigram count agg, the unigram count agg planned once per
    // join side (x and y), and the two single-partition exchanges under
    // the one-row corpus totals (computed from array sizes — no
    // vocabulary re-agg); top-20 is TakeOrdered, the count joins
    // broadcast the vocab side.
    "q94_pmi_collocations" -> 5,
    // q95: the source-keyed ranking window exchange + the output sort.
    "q95_stratified_priority" -> 2,
    // q96: the k-bounded TopKByOrd agg (map-side heaps — the shuffle
    // carries ≤ k pairs per group per task, q18's window would sort the
    // fact table) + the output sort.
    "q96_topk_agg" -> 2,
    // q97 (flagship composite): q36's inverted-index pair core (gram agg
    // + pair agg), the survivor probe (broadcast), then the q91 budget
    // walk (band window, band-totals agg + tiny phase-2 window) and the
    // output sort.
    "q97_curation_pipeline" -> 6,
    // q98: the grouped sketch agg and the grouped totals agg (both keyed
    // on source), the (source, candidate)-keyed recount agg, and the
    // output sort; candidate and totals tables broadcast.
    "q98_heavy_hitters_by_source" -> 4,
    // q99: the token-mass agg for the broadcast weight join, the
    // source-keyed ranking window, and the output sort. The
    // |sources|-sized quota frame is CacheScope-cached (q80 precedent) —
    // without it the quota→total→count subtree (a corpus aggregation)
    // re-plans once per consumer branch (audited: 8 exchanges → 3).
    "q99_repeat_oversample" -> 3,
    // q100: two q17 partials (each: join + distinct-expand mart agg, one
    // batch's fact slice apiece — together they scan what q17 scans once)
    // + the mart-sized merge agg + the output sort.
    "q100_incremental_mart" -> 7,
    // q101: exact distinct is two exchanges ((w,user) partial-distinct,
    // then w); the sketch rider adds the 30-min bucket agg + the
    // union-merge re-agg (the covering-bucket fan-out is a Generate, the
    // windows-sized approx frame broadcasts into the join) + output sort.
    "q101_sliding_distinct" -> 5,
    // q102: one user_id exchange shared by the island window AND the
    // merged-interval/per-user aggs (HashPartitioning(user_id) satisfies
    // the (user_id, island) clustering) + the output sort.
    "q102_interval_coalesce" -> 2,
    // q103: the (type, day) daily agg, the per-type span agg feeding the
    // spine, the forward-fill window, and the output sort — all on
    // calendar-sized frames; both daily joins broadcast.
    "q103_gap_fill" -> 4,
    // q104: the user_id lag window, the (prev, next) count agg, the
    // per-prev probability window, and the output sort — everything after
    // the lag is |states|²-sized.
    "q104_markov_transitions" -> 4,
    // q105: the sufficient-statistics agg (partial map-side) + the output
    // sort; the fit math runs on the groups-sized frame.
    "q105_trend_ols" -> 2,
    // q106: ONE user_id exchange shared by the change-detection lag and
    // the version-numbering window (the filter between them preserves
    // sort and partitioning) + the output sort.
    "q106_scd2_dimension" -> 2,
    // q107: one exchange per island build (user_id / single-key); the
    // bucketized join BROADCASTS the storm-periods side, so the final
    // per-user agg (distinct included) reuses the islands' user_id
    // partitioning with no further exchange + the output sort.
    "q107_overlap_join" -> 3,
    // q108: the (doc, char) count agg (map-side-combined over the char
    // stream), the per-doc entropy agg (hash(doc,char) does NOT co-locate
    // a doc, so it re-shuffles the counts frame) + the output sort.
    "q108_char_entropy" -> 3,
    // q109: (lang, tok) frequency agg, the lang rank window, the OLS
    // stats agg on the ≤100-rows-per-lang frame + the output sort.
    "q109_zipf_slope" -> 4,
    // q110: the dim side is checkpoint-materialized (it IS a stored table
    // in deployment); the batch-keys distinct agg appears 3× in the
    // static plan (AQE exchange reuse dedupes at runtime), + the rebuild
    // window exchange + the output sort. All joins broadcast.
    "q110_scd2_incremental" -> 5,
    // q111: the fences percentile agg + the clipped re-agg (the
    // groups-sized fence frame broadcasts back onto the fact stream) +
    // the output sort.
    "q111_winsorize" -> 3,
    // q112: ONE map-side-combined power-sums agg + the output sort; the
    // moment math runs on the groups-sized frame.
    "q112_moments" -> 2,
    // q113: the (type, day) sketch agg, the per-type merge agg, the exact
    // percentile agg (the gate's truth side — absent in production, where
    // the stored daily sketches ARE the source) + the output sort; the
    // merged frame broadcasts into the join.
    "q113_kll_mergeable_quantiles" -> 11,
    // q114: 3 relationships × 5 count/distinct aggregations (child count,
    // broadcast-anti orphan count, parent count, distinct-child-key agg,
    // unref count) — 4 of the 5 are one-row SinglePartition exchanges;
    // the data-sized work is the three child-side scans.
    "q114_ri_audit" -> 15,
    // q115: the (type, band) cells agg; everything after (windows, final
    // agg) runs on the 15-row contingency frame in one more exchange.
    "q115_chi_square" -> 2,
    // q116: the wide metrics agg (distinct-expand inside) + the output
    // sort; the unpivot itself is an Expand, not a shuffle.
    "q116_unpivot" -> 3,
    // q117: ONE aggregation pass computes every column's statistics (the
    // 5-way countDistinct expand shuffles (grouping-set, value) partials,
    // then the single-row final agg) + the stack melt (no shuffle) + the
    // output sort on the 5-row frame.
    "q117_profile_any" -> 3,
    // q118: ONE user_id exchange shared by both as-of windows (the union
    // sides read the same cached scan), the per-user agg reusing that
    // partitioning would still need its own exchange post-filter + the
    // output sort.
    "q118_asof_nearest" -> 3,
    // q119: the probe-side compute spread (the q50 lesson: one dim-scan
    // split under a broadcast join scores all pairs serially — 23s → 1.7s
    // at sf0.1), the block equi-join (small side broadcasts; shuffles on
    // blk at scale) + the global top-100 sort.
    "q119_fuzzy_block_match" -> 3,
    // q120: the ONE data-sized exchange (the 1.2M-raw-pair support agg)
    // runs before the query's localCheckpoint; every exchange after it
    // operates on the 3.9k-row materialized graph, whose subtree the
    // static plan repeats per consuming branch (runtime exchange reuse
    // collapses the identical copies — measured 4.0s steady-state at
    // sf0.1). The count is bookkeeping of tiny frames, not data motion.
    "q120_triangle_stats" -> 38,
    // q121: the data-sized support-pair build and every per-iteration
    // rank frame materialize EAGERLY (localCheckpoint(true)) during
    // query construction, so the audited plan is only the final
    // rank⋈deg join over the two checkpointed node-sized frames (one
    // exchange each side). At real scale swap the localCheckpoints for
    // reliable checkpointing / parquet handoff (Graphs.pageRank doc).
    "q121_pagerank" -> 2,
    // q122: the two-phase banded prefix sum (per-value agg, band-local
    // cumsum window, band-totals agg + bounded offset window), the
    // one-row n_a/n_b agg and final max agg each collapsing to a
    // single-partition exchange; the offsets and counts frames
    // broadcast.
    "q122_ks_drift" -> 8,
    // q123: wedge generation over the checkpointed support graph —
    // degree agg, center-filtered adjacency join, the wedge self-join,
    // the anti-join against the edge set, the (x, y) pair agg, and the
    // output TakeOrdered; the checkpointed frames carry no stats so the
    // static plan repeats subtrees per branch (runtime exchange reuse
    // collapses them, the q120 pattern).
    "q123_adamic_adar" -> 14,
    // q124: ONE map-side-combined sufficient-statistics agg (single-
    // partition: the output is one row); the pair melt is an Expand on
    // that one-row frame.
    "q124_corr_matrix" -> 1,
    // q125: unigram agg, bigram agg, the one-row totals agg, the eval-
    // gram joins (train tables broadcast at this SF; at scale the
    // bigram join shuffles on the gram key), the per-doc score agg and
    // the output sort.
    "q125_bigram_backoff" -> 7,
    // q126: training runs driver-iteratively during query construction
    // (each merge = one vocabulary-keyed pair agg + one token agg over
    // the cached word-type table); the audited plan is only the 10-row
    // driver-built merge table's output sort.
    "q126_bpe_vocab" -> 1,
    // q127: the per-query ranking window exchange + the output sort (the
    // corpus side broadcasts into the documented exact cross join).
    "q127_hard_negatives" -> 2,
    // q128: band-local rank window, the bounded band-offsets agg + its
    // tiny phase-2 window, the bucket equi-join's exchange, and the
    // output TakeOrdered; the offsets and position frames broadcast.
    "q128_sorted_neighborhood" -> 6,
    // q129: the CacheScope'd assignment (scored once for its three
    // consumers — q80's precedent; 8 exchanges → 5), the cell
    // self-join's exchanges, the smaller-id dup agg, the attribution
    // join and the output sort.
    "q129_semantic_dedup" -> 5,
    // q130: training runs during construction (q126); the audited plan
    // is the per-source encode agg (map-side combined) + output sort.
    "q130_bpe_compression" -> 2,
    // q131: the per-doc bigram repetition agg (the quality metrics are
    // narrow per-row expressions), the doc_id join exchange, and the
    // output sort; the metrics side broadcasts.
    "q131_gopher_gate" -> 3,
    // q132: two side-vocab aggs, their full-outer merge join's
    // exchanges, and the two single-partition exchanges under the
    // one-row totals and final KL aggregates.
    "q132_kl_divergence" -> 6,
    // q133: the CacheScope'd distinct (source, token) frame (one
    // distinct agg for its three consumers — 8 exchanges → 4), the
    // token-keyed co-occurrence join, the pair agg, and the output
    // sort; the |sources|-sized size table broadcasts twice.
    "q133_source_overlap" -> 4,
    // q134: the exact-collapse name agg appears once per consuming
    // branch in the static plan (members join + rep derivation; runtime
    // exchange reuse collapses them), the member re-attach join's
    // exchange, the cluster-size agg, and the output sort; rep-level
    // clustering runs union-find during construction (the q36 path) and
    // the rep-cluster/size frames broadcast.
    "q134_entity_resolution" -> 6,
    // q135: the q28 compute-spreading repartition, the per-source agg,
    // and the output sort.
    "q135_label_agreement" -> 3,
    // q136: greedy selection runs driver-iteratively during construction
    // (one corpus pass + TakeOrdered argmax per center, the q126
    // lifecycle); the audited plan is the 8-row driver-built frame's
    // output sort.
    "q136_kcenter_coreset" -> 1,
    // q137: narrow per-row counting expressions + the output sort.
    "q137_readability" -> 1,
    // q138: blocked pair stream → one conditional-sum agg (one-row) +
    // the truth-key agg pair + the deliberate probe-side spread (the
    // q50/q119 narrow-scan repartition); the threshold fan-out explodes
    // the ONE aggregate row, never the pair stream.
    "q138_er_audit" -> 4,
    // q139: ONE value-keyed candidate self-join + distinct + per-config
    // agg over the multi-config band table (configs ride one explode),
    // plus the true-pair inverted-index join and the narrow-scan spread
    // — candidate frames are the quantity under audit, results one row
    // per config.
    "q139_lsh_recall_audit" -> 7,
    // q140: ONE |classes|-sized groupBy over the QI projection + the
    // one-row conditional-sum aggregate all k-thresholds explode from
    // (q138's shape) — the final single-partition exchange under that
    // one-row agg is the second shuffle.
    "q140_k_anonymity" -> 2,
    // q141: q139's audit plan verbatim (the chooser is a filter +
    // TakeOrdered over the |configs|-sized audit frame — no new
    // exchange).
    "q141_band_choice" -> 7,
    // q142: q138's audit shape over the typo-twin union (the union is
    // narrow — no extra exchange).
    "q142_noisy_er_audit" -> 4,
    // q143: blob assembly + mapPartitions probe are narrow; the only
    // exchange is the output sort.
    "q143_media_probe" -> 1,
    // q144: (QI,s)-pair agg + QI class agg + the one-row conditional-sum
    // aggregate's single-partition exchange (q140's shape with one extra
    // pair-sized hop for the exact distinct count).
    "q144_l_diversity" -> 3,
    // q146: exploded component agg (cached — three consumers with
    // different pruned columns would otherwise each re-scan the corpus),
    // per-vector agg, the shared label window exchange (ratio total +
    // rank ride ONE partitioning), output sort.
    "q146_label_outliers" -> 4,
    // q148: the q22 inverted-index pair machinery (postings agg +
    // candidate join) + the narrow-scan spread + two doc_id source
    // joins + the |sources|²-bounded cell agg + output sort; per-source
    // doc counts ride broadcasts.
    "q148_contamination_matrix" -> 9,
    // q147: (source, token) pair agg + |sources| agg + the one-row
    // totals agg's single-partition exchange + the bounded |sources|-row
    // waterfill window + output sort. Data-sized work is the first
    // aggregate only.
    "q147_mixture_waterfill" -> 6,
    // q145: pair agg (reused by the broadcast global-counts branch), the
    // sensitive-domain agg + its one-row total, the QI window (whose hash
    // partitioning the class agg then rides exchange-free), and the
    // one-row threshold aggregate — everything past the first aggregate
    // is pair-sized, the per-threshold report explodes from one row.
    "q145_t_closeness" -> 8,
    // q149: the q22 pair machinery runs EAGERLY inside localCheckpoint
    // (not in this audited plan); what remains is the compute-spread
    // repartition, the per-split agg over the cluster frame, the two
    // pair⋈assignment joins' exchanges, the one-row leak agg's
    // single-partition exchange, and the output sort. The cluster frame
    // is a driver parallelize at test SF (union-find path), so its
    // branches carry no pre-AQE stats.
    "q149_leakage_split" -> 8,
    // q150: the exploded-corpus (token) agg (cached — three consumers),
    // the band-local rank window's (train_n, pfx) exchange, the bounded
    // band-totals agg + its single-partition offsets window, and the
    // one-row conditional-sum aggregate; per-V rows explode from one row.
    "q150_oov_audit" -> 5,
    // q151: the q22 pair machinery (postings agg + candidate join +
    // narrow-scan spread), canonical-edge distinct, two attribute joins'
    // exchanges, the cell agg, and the bounded cells→parts→totals chain
    // + output sort — everything past the cell agg is |parts|²-sized.
    "q151_dup_modularity" -> 10,
    // q152: orderStatsPermille's banded chain over the CACHED token
    // frame (the (g,v) agg + band windows + bounded offsets/n aggs) +
    // the gate's per-source agg + output sort; the threshold frame is
    // an explicit broadcast, so the gate join adds no exchange of data.
    "q152_adaptive_gate" -> 10,
    // q153: the per-(vector,subspace) code agg, the (query,vector) ADC
    // agg + its rank window exchange (×2 — the top-k and audit branches
    // repeat the subtree statically; runtime exchange reuse dedupes),
    // the per-query corr agg, and the output sort. Sub-codebook and LUT
    // are explicit broadcasts.
    "q153_pq_ann" -> 8,
    // q154: the one-row sketch aggregate's single-partition exchange +
    // the exact probe-count agg (whose TakeOrdered top-20 and the
    // 20-row output sort add no exchange); estimation is probes × a
    // broadcast one-row grid.
    "q154_count_min" -> 2,
    // q155: the q22 pair machinery runs EAGERLY inside duplicateClusters'
    // guarded collect (not in this audited plan); what remains is the
    // per-cluster max_by agg's exchange + the output sort (the score
    // join rides broadcasts at test SF).
    "q155_quality_survivor" -> 2,
    // q156: q155's shape with a per-source aggregate instead of the
    // per-cluster argmax.
    "q156_dedup_impact" -> 2,
    // q157: the cached (doc, gram) frame feeds the first-seen gram agg
    // + the per-doc roll-up agg + output sort; the gram-keyed join
    // rides a broadcast at test SF (vocabulary-scale merge at 100 TB).
    "q157_ngram_novelty" -> 3,
    // q158: one per-lang aggregate + output sort.
    "q158_tokenizer_fertility" -> 2,
    // q159: orderStatsPermille's banded chain (q44's shape) over the
    // e4-quantized norm projection + output sort; ReuseExchange serves
    // the three byV subtrees from one scan at runtime.
    "q159_embedding_norm_profile" -> 9,
    // q160–q168 all carry the deliberate spreadIfNarrow repartition on the
    // doc_id projection (q28/q50's idiom): the codec work is compute-bound
    // and the documents scan is ONE parquet split at test SF — unspread,
    // q160 ran its whole encode+decode pass in a single task (7.4s at
    // sf0.1; the sort is the only other exchange).
    // q160: synthesize → decode are narrow maps; spread + output sort.
    "q160_pixel_stats" -> 2,
    // q161/q163: same shape — spread → synthesize → decode → sort.
    "q161_image_dhash" -> 2,
    "q163_audio_pcm_stats" -> 2,
    // q162: spread + the |distinct-hash|-sized group agg + output sort.
    "q162_perceptual_dups" -> 3,
    // q164/q166: spread + chunk-blocked self-join (broadcast at this SF)
    // + distinct + output sort — the hash frame itself is cached, so the
    // two join branches share one decode pass.
    "q164_image_neardup_pairs" -> 3,
    // q165: spread → synthesize → decode → fingerprint; output sort.
    "q165_audio_fingerprint" -> 2,
    "q166_audio_neardup_pairs" -> 3,
    // q167/q168: spread → synthesize → AVI walk → per-frame/per-clip
    // reduce (narrow); output sort.
    "q167_video_frame_sample" -> 2,
    "q168_video_motion" -> 2,
    // q169: q36's shape — the pair union executes inside
    // duplicateClusters' guarded collect before the audited label join;
    // the audited plan is broadcast-label-join + output sort.
    "q169_crossmodal_clusters" -> 1,
    // q170: the (k, query) grouped corr agg + output sort; the
    // query×corpus product and the k fan-out are broadcast joins.
    "q170_matryoshka_audit" -> 2,
    // q171: instance-stream distinct + doc-frequency agg (vocabulary
    // scale), gram-keyed join back, per-doc agg + output sort.
    "q171_boilerplate" -> 4,
    // q172: compute-spreading repartition, the distinct-agg partial on
    // (grp, key) — the exact_distinct audit baseline; the production
    // read is the HLL vector alone, whose partial is 256 ints per task —
    // the final per-group agg, and the output sort.
    "q172_hll_cardinality" -> 4,
    // q173: compute-spreading repartition + output sort; the chunking
    // itself is per-row array arithmetic, shuffle-free.
    "q173_rag_chunks" -> 2,
    // q174: per-dim codebook agg + its one-row fold, the per-query corr
    // agg, and the output sort; quantization and the pair product ride
    // broadcasts.
    "q174_sq8_audit" -> 4,
    // q175: the orderStatsPermille cutoff machinery over the doc_id
    // frame (banded two-phase prefix sums — the q56 family) + the
    // first-seen vocabulary agg + three checkpoint-count-sized roll-ups
    // and the output sort. Every exchange moves doc-count-, vocab- or
    // |checkpoints|-sized frames, never token instances.
    "q175_vocab_growth" -> 20,
    // q176: (grp, cat) count agg + per-grp roll-up + output sort; the
    // compute-spreading repartition makes the fourth.
    "q176_mixture_diversity" -> 4,
    // q177: cached chunk frame → fp distinct/frequency agg, per-doc
    // roll-up, and the output sort; the fp join back is broadcast at
    // test SF (fp-keyed merge at scale).
    "q177_chunk_dedup" -> 4,
    // q178: the banded rank machinery (value-count agg + band-local
    // cumsum + #bands offsets window — orderStatsPermille's shape, with
    // the byV exchange reused via the <=> band join) + the per-source
    // roll-up and the output sort; every post-(g,v) exchange moves
    // distinct-value-sized data.
    "q178_length_gini" -> 9,
    // q179: quality metrics ⋈ repetition stats (the doc-id join rides
    // the gram agg's exchange), one global fold, the rule-count stack
    // on a one-row frame, output sort.
    "q179_gate_ablation" -> 5,
    // q180: cached split-stamped chunk frame → train-fp distinct agg,
    // the per-split distinct-doc roll-up (one Expand pass), output sort;
    // the fp join back is broadcast at test SF (fp-keyed at scale).
    "q180_passage_leak" -> 4,
    // q181: compute-spreading repartition + ONE per-group register agg
    // whose exchange is AQE-reused across both self-join sides
    // (executed: 3 shuffles, 1 reused), broadcast nested-loop pair
    // product over the |groups|-row frame, output sort.
    "q181_hll_overlap" -> 5,
    // q182: compute-spreading repartition + ONE corpus-sized (grp,batch)
    // register agg; everything after operates on |groups×batches×256|
    // integer rows — the posexplode→running-max window re-key, the
    // re-aggregation to (grp,batch), and the output sort.
    "q182_hll_series" -> 5,
    // q183: ONE global two-grid aggregate (no shuffle beyond its single
    // partial→final exchange), one per-key exploded count agg + fold for
    // the exact baseline, broadcast of the one-row grid frame.
    "q183_cm_join_size" -> 3,
    // q184: the q22 inverted-index pair frame (cached exploded grams →
    // hash join → pair agg) + the ≤10-row decile roll-up and output sort.
    "q184_similarity_spectrum" -> 4,
    // q185: occurrence agg + the two-stage first-occurrence-per-key agg
    // over the cached key stream, the broadcast join of the two bounded
    // series frames, the per-group cumulative window, output sort.
    "q185_vocab_delta" -> 6,
    // q186: both ring placements are per-row array_min projections — the
    // ONLY shuffle is the one-row summary aggregate's partial→final.
    "q186_reshard_audit" -> 1,
    // q187: the ungrouped conditional-sum aggregate is the only
    // exchange; the melt + per-strategy roll-up ride its one-row,
    // one-partition output.
    "q187_ring_balance" -> 1,
    // q188: exact corpus ranks without a global sort — byV agg, the
    // (sig,band) local window, the bounded offsets agg + #bands window,
    // the per-sig totals, the (sig,v) rank join (both sides), final
    // per-id fusion agg; every one keyed, none single-partition.
    "q188_rrf_fusion" -> 8,
    // q189: 3 FD pairs × (two-phase countDistinct + one-row summary)
    // over one cached 4-column projection.
    "q189_fd_audit" -> 9,
    // q190: embargo-key distinct, the eval-side semi join, the two
    // one-row summary aggs — all keyed, off one cached projection.
    "q190_purged_split" -> 5,
    // q191: one per-entity aggregation; the countDistinct's standard
    // two-phase expand is the second exchange.
    "q191_pit_features" -> 2,
    // q192: the <=9-group digit aggregation + the constant-key window
    // over the 9-row joined frame (bounded by construction).
    "q192_benford" -> 2,
    // q193: the manifest costs what a count(*) costs — one keyed agg.
    "q193_partition_checksum" -> 1,
    // q194: distinct baskets, the basket-keyed self-join (both sides),
    // the pair and support aggregations — all off one cached frame;
    // support/n frames broadcast.
    "q194_assoc_rules" -> 5,
    // q195: one aggregation per manifest side; the diff join rides
    // their outputs.
    "q195_manifest_diff" -> 2,
    // q196: q195's shape verbatim — the per-field XORs are extra
    // aggregate expressions inside the SAME two manifest aggregations.
    "q196_manifest_field_diff" -> 2,
  )


  /** query → max FileSourceScan leaves in the EXECUTED plan (after AQE
    * replan + exchange/stage reuse; a reused exchange hides its subtree,
    * so a count of 1 here IS the "scans the input once" claim). The
    * round-9 order-stats bug — an optimizer interaction silently
    * de-canonicalizing a shared subtree and re-scanning the input 3–5× —
    * was found by manually reading executed plans; this gate makes that
    * class of regression mechanical. Budgets are the measured counts at
    * HEAD; 0 means the query's inputs are served entirely from
    * session-scope caches registered by earlier (alphabetical) queries —
    * the iteration order below is sorted, so the cache state at each
    * query's execution is deterministic.
    */
  private val scanBudget: Map[String, Int] = Map(
    "q01_pricing_summary" -> 1,
    "q02_load_stats" -> 1,
    "q03_order_flatten" -> 2,
    "q04_prefix_flatten" -> 2,
    "q05_safe_cast" -> 1,
    "q06_string_clamp" -> 1,
    "q07_etl_stamp" -> 1,
    "q08_column_intersect" -> 1,
    "q09_join_enrich" -> 5,
    "q100_incremental_mart" -> 4,
    "q101_sliding_distinct" -> 2,
    "q102_interval_coalesce" -> 1,
    "q103_gap_fill" -> 3,
    "q104_markov_transitions" -> 1,
    "q105_trend_ols" -> 1,
    "q106_scd2_dimension" -> 1,
    "q107_overlap_join" -> 0,
    "q108_char_entropy" -> 1,
    "q109_zipf_slope" -> 1,
    "q10_semi_join" -> 2,
    "q110_scd2_incremental" -> 2,
    "q111_winsorize" -> 2,
    "q112_moments" -> 1,
    "q113_kll_mergeable_quantiles" -> 2,
    "q114_ri_audit" -> 17,
    "q115_chi_square" -> 1,
    "q116_unpivot" -> 1,
    "q117_profile_any" -> 1,
    "q118_asof_nearest" -> 2,
    "q119_fuzzy_block_match" -> 2,
    "q11_anti_join" -> 2,
    "q120_triangle_stats" -> 0,
    "q121_pagerank" -> 0,
    "q122_ks_drift" -> 1,
    "q123_adamic_adar" -> 0,
    "q124_corr_matrix" -> 1,
    "q125_bigram_backoff" -> 3,
    "q126_bpe_vocab" -> 0,
    "q127_hard_negatives" -> 2,
    "q128_sorted_neighborhood" -> 2,
    "q129_semantic_dedup" -> 0,
    "q12_merge_upsert" -> 2,
    "q130_bpe_compression" -> 1,
    "q131_gopher_gate" -> 2,
    "q132_kl_divergence" -> 2,
    "q133_source_overlap" -> 0,
    "q134_entity_resolution" -> 4,
    "q135_label_agreement" -> 1,
    "q136_kcenter_coreset" -> 0,
    "q137_readability" -> 1,
    "q138_er_audit" -> 3,
    "q139_lsh_recall_audit" -> 0,
    "q13_retention" -> 1,
    "q140_k_anonymity" -> 1,
    "q141_band_choice" -> 0,
    "q142_noisy_er_audit" -> 6,
    "q143_media_probe" -> 1,
    "q144_l_diversity" -> 1,
    "q145_t_closeness" -> 2,
    "q146_label_outliers" -> 1,
    "q147_mixture_waterfill" -> 1,
    "q148_contamination_matrix" -> 2,
    "q149_leakage_split" -> 3,
    "q14_incremental_failopen" -> 1,
    "q150_oov_audit" -> 0,
    "q151_dup_modularity" -> 3,
    "q152_adaptive_gate" -> 0,
    "q153_pq_ann" -> 5,
    "q154_count_min" -> 0,
    "q155_quality_survivor" -> 2,
    "q156_dedup_impact" -> 2,
    "q157_ngram_novelty" -> 0,
    "q158_tokenizer_fertility" -> 1,
    "q159_embedding_norm_profile" -> 1,
    "q15_staging_summary" -> 1,
    "q160_pixel_stats" -> 1,
    "q161_image_dhash" -> 1,
    "q162_perceptual_dups" -> 1,
    "q163_audio_pcm_stats" -> 1,
    "q164_image_neardup_pairs" -> 1,
    "q165_audio_fingerprint" -> 1,
    "q166_audio_neardup_pairs" -> 1,
    "q167_video_frame_sample" -> 1,
    "q168_video_motion" -> 1,
    "q169_crossmodal_clusters" -> 1,
    // q170: corpus and query sides read embeddings under different
    // pushed filters — two scan leaves by design (q153's shape).
    "q170_matryoshka_audit" -> 2,
    "q171_boilerplate" -> 1,
    "q172_hll_cardinality" -> 1,
    "q173_rag_chunks" -> 1,
    // q174: the embeddings scan feeds the codebook (exploded projection),
    // the corpus side, and the pushed-filter query sample — three
    // distinct-projection leaves by design (q153/q170's shape).
    "q174_sq8_audit" -> 3,
    // q175: the cached token frame serves every consumer — executed scan
    // leaves read 0 (InMemoryTableScan); 1 is the uncached ceiling.
    "q175_vocab_growth" -> 1,
    "q176_mixture_diversity" -> 1,
    // q177: the cached chunk frame serves both consumers (q175's shape).
    "q177_chunk_dedup" -> 1,
    // q178: one scan — the byV exchange is AQE-reused across the cumsum
    // and offsets branches (the <=> discipline holding, reusedShuffles=1).
    "q178_length_gini" -> 1,
    "q179_gate_ablation" -> 1,
    "q180_passage_leak" -> 1,
    "q181_hll_overlap" -> 1,
    "q182_hll_series" -> 1,
    // q183: sketch pass + exact-baseline pass — the honest two scans of
    // a sketch-vs-truth audit (the naive two-DataFrame form cost 4).
    "q183_cm_join_size" -> 2,
    // q184: served entirely from the session-scoped exploded-gram cache
    // its own cooccurrence frame registers (q22's machinery).
    "q184_similarity_spectrum" -> 0,
    // q185: both aggregations read the operator's own cached key stream.
    "q185_vocab_delta" -> 0,
    "q186_reshard_audit" -> 1,
    "q187_ring_balance" -> 1,
    // q188/q189/q190: every branch reads the operator's own cached stream.
    "q188_rrf_fusion" -> 0,
    "q189_fd_audit" -> 0,
    "q190_purged_split" -> 0,
    "q191_pit_features" -> 1,
    "q192_benford" -> 1,
    "q193_partition_checksum" -> 1,
    "q194_assoc_rules" -> 0,
    // q195: each manifest side scans the input once.
    "q195_manifest_diff" -> 2,
    // q196: same two manifest-side scans (field XORs add hashes, not scans).
    "q196_manifest_field_diff" -> 2,
    "q16_quality_gate" -> 6,
    "q17_mart_daily" -> 2,
    "q18_window_rank" -> 1,
    "q19_hourly_events" -> 1,
    "q20_validation" -> 4,
    "q21_dedup_exact" -> 1,
    "q22_ngram_jaccard" -> 0,
    "q23_minhash_lsh" -> 0,
    "q24_simhash" -> 0,
    "q25_embed_neardup" -> 2,
    "q26_ann_topk" -> 2,
    "q27_ann_lsh" -> 4,
    "q28_lang_id" -> 1,
    "q29_text_quality" -> 1,
    "q30_token_count" -> 1,
    "q31_fingerprint" -> 1,
    "q32_multimodal_meta" -> 1,
    "q33_media_features" -> 1,
    "q34_hmac_sign" -> 1,
    "q35_ann_ivf" -> 5,
    "q36_dedup_clusters" -> 1,
    "q37_train_split" -> 1,
    "q38_balanced_sample" -> 1,
    "q39_tfidf" -> 1,
    "q40_rollup" -> 1,
    "q41_asof_join" -> 2,
    "q42_sessionize" -> 1,
    "q43_bm25" -> 1,
    "q44_profile" -> 2,
    "q45_grouping_sets" -> 1,
    "q46_rolling_fp" -> 1,
    "q47_window_suite" -> 1,
    "q48_set_ops" -> 2,
    "q49_pivot" -> 1,
    "q50_fuzzy_match" -> 2,
    "q51_range_join" -> 1,
    "q52_skew_salted_join" -> 2,
    "q53_collect_set" -> 1,
    "q54_ngram_freq" -> 1,
    "q55_anomaly" -> 2,
    "q56_percentiles_by_group" -> 1,
    "q57_regex_extract" -> 1,
    "q58_zorder_key" -> 1,
    "q59_snapshot_diff" -> 2,
    "q60_histogram" -> 1,
    "q61_json_parse" -> 1,
    "q62_bucketed_join" -> 2,
    "q63_schema_evolution" -> 2,
    "q64_moving_window" -> 1,
    "q65_mode_per_group" -> 1,
    "q66_cube" -> 1,
    "q67_approx_distinct" -> 1,
    "q68_doc_logprob" -> 2,
    "q69_mad_outlier" -> 3,
    "q70_containment" -> 0,
    "q71_funnel" -> 3,
    "q72_pii_scrub" -> 1,
    "q73_repetition" -> 1,
    "q74_sketch_merge" -> 2,
    "q75_contamination" -> 1,
    "q76_seq_pack" -> 2,
    "q77_mixture_sample" -> 3,
    "q78_changelog_compact" -> 1,
    "q79_quantile_sketch" -> 2,
    "q80_kmeans_refine" -> 1,
    "q81_bloom_prefilter" -> 2,
    "q82_cdc_chunks" -> 1,
    "q83_cohort_retention" -> 2,
    "q84_temperature_mixture" -> 4,
    "q85_substring_dedup" -> 1,
    "q86_span_removal" -> 2,
    "q87_length_batching" -> 1,
    "q88_delta_neardup" -> 1,
    "q89_skew_report" -> 1,
    "q90_heavy_hitters" -> 0,
    "q91_token_budget" -> 2,
    "q92_epoch_shuffle" -> 1,
    "q93_priority_sample" -> 1,
    "q94_pmi_collocations" -> 0,
    "q95_stratified_priority" -> 1,
    "q96_topk_agg" -> 1,
    "q97_curation_pipeline" -> 3,
    "q98_heavy_hitters_by_source" -> 0,
    "q99_repeat_oversample" -> 2,
  )

  /** Queries where a SortMergeJoin is the INTENDED strategy (both sides
    * scale with the data, no broadcast-able side exists).
    */
  private val smjAllowed = Set(
    "q12_merge_upsert",  // full-outer target⋈source on the PK: both sides big
    "q59_snapshot_diff", // full-outer between two same-scale snapshots
    "q195_manifest_diff", // full-outer between two manifests on the
                          // partition key: one-row-per-partition frames
                          // by construction, and full outer cannot
                          // broadcast — the intended shape at any scale
    "q196_manifest_field_diff", // q195's manifest-sized full-outer,
                                // with field attribution in the projection
    "q62_bucketed_join", // the POINT: co-located SMJ with no exchanges
    "q80_kmeans_refine", // full-outer n_init⋈n_refined: codebook-sized both
                         // sides (full outer cannot broadcast)
    "q88_delta_neardup", // batch grams ⋈ corpus gram postings: the postings
                         // side scales with the corpus and the batch-gram
                         // side with batch size × doc length — a hash-
                         // dispatch join on the gram key is the intended
                         // 100 TB shape (AQE still broadcasts small batches
                         // at runtime)
    "q120_triangle_stats", // graph self-joins (degree attach, wedge build,
                         // closing semi): every side is the edge set itself
                         // — keyed merge joins ARE the scale strategy, and
                         // the checkpointed edge frame carries no size
                         // stats pre-AQE; at runtime AQE broadcasts the
                         // support-filtered graph when it is small
    "q121_pagerank",     // rank⋈deg over two checkpointed node frames:
                         // both |V|-sized, no stats pre-AQE (AQE
                         // broadcasts at runtime when small)
    "q123_adamic_adar",  // wedge self-join + edge anti-join on the
                         // checkpointed support graph — the q120 shape
    "q129_semantic_dedup", // within-cell self-join + dup attribution: both
                         // sides are the assigned corpus itself (no
                         // broadcast-able side; AQE broadcasts small
                         // cells at runtime)
    "q139_lsh_recall_audit", // band-table self-joins: both sides are the
                         // corpus signature bands (no broadcast-able
                         // side; collisions are the audited quantity)
    "q141_band_choice",  // q139's plan verbatim under the chooser
    "q132_kl_divergence", // full-outer train⋈eval vocabulary merge: both
                         // sides scale with the vocabulary (full outer
                         // cannot broadcast) — the q12/q59 shape
    "q153_pq_ann",       // ADC-field ⋈ exact-field on (query, vector):
                         // both sides are |queries|×corpus frames (the
                         // distortion audit compares the two distance
                         // FIELDS) — no broadcast-able side at scale;
                         // AQE broadcasts small query sets at runtime
    "q149_leakage_split" // pair-stream ⋈ split-assignment probes: the
                         // pair side scales with near-dup density and the
                         // assignment side with the corpus — keyed merge
                         // joins are the 100 TB shape, and the
                         // checkpointed/parallelized sides carry no
                         // pre-AQE stats (AQE broadcasts small sides at
                         // runtime)
  )

  test("every declared query stays within its audited plan budget") {
    val audits = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> PlanAudit.audit(fn(spark, sfDir).queryExecution.executedPlan)
    }
    val missing = audits.collect {
      case (n, _) if !shuffleBudget.contains(n) => n }
    assert(missing.isEmpty,
      s"new queries without a plan budget (add to shuffleBudget): ${missing.mkString(", ")}")
    val stale = shuffleBudget.keySet -- audits.map(_._1)
    assert(stale.isEmpty,
      s"budget entries for removed/renamed queries (delete from shuffleBudget): ${stale.mkString(", ")}")
    val overBudget = audits.collect {
      case (n, a) if a.shuffles > shuffleBudget(n) =>
        s"$n: ${a.shuffles} shuffles > budget ${shuffleBudget(n)}" }
    assert(overBudget.isEmpty,
      s"shuffle-budget regressions:\n  ${overBudget.mkString("\n  ")}")
    val smjRegressions = audits.collect {
      case (n, a) if a.smj > 0 && !smjAllowed(n) =>
        s"$n: ${a.smj} SortMergeJoin(s)" }
    assert(smjRegressions.isEmpty,
      s"broadcast→sort-merge regressions:\n  ${smjRegressions.mkString("\n  ")}")
  }

  test("every declared query stays within its executed scan-leaf budget") {
    // Executes every query (sf0.001) through its own QueryExecution so
    // AQE finalizes and reuse resolves — the static plan cannot answer
    // "how many times did this input really get scanned".
    val audits = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> PlanAudit.executedAudit(fn(spark, sfDir))
    }
    val missing = audits.collect {
      case (n, _) if !scanBudget.contains(n) => n }
    assert(missing.isEmpty,
      s"new queries without a scan budget (add to scanBudget): ${missing.mkString(", ")}")
    val stale = scanBudget.keySet -- audits.map(_._1)
    assert(stale.isEmpty,
      s"scan-budget entries for removed/renamed queries: ${stale.mkString(", ")}")
    val over = audits.collect {
      case (n, a) if a.scans > scanBudget(n) =>
        s"$n: ${a.scans} executed scans > budget ${scanBudget(n)}" }
    assert(over.isEmpty,
      s"executed-scan regressions (a shared subtree stopped being reused?):\n  ${over.mkString("\n  ")}")
  }
}
