"""Regenerate PLANS.md: executed physical plans for the headline
queries at sf0.01, with the plan properties each query is designed
around.  Run: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructions_mr_spark import registry
from instructions_mr_spark.session import get_spark

NOTES = {
    "q1_pricing_summary": "Filter + projection pushed into the parquet scan "
    "(PushedFilters/ReadSchema); partial_sum before the exchange (map-side "
    "combine); whole-stage codegen (*(n) spans) end to end.",
    "join_broadcast": "Star join: all three dims BroadcastHashJoin — the fact "
    "table never shuffles before the aggregate.  nation/region are forced "
    "hints (bounded at every sf); supplier is hint-free and broadcasts from "
    "its measured size (r9 policy — the planner demotes it to a shuffle "
    "join once it outgrows the threshold).",
    "join_asof": "Union + last-ignorenulls window: ONE hash exchange on the "
    "key, no Python stage, right side semi-join-pruned to keys present on "
    "the left.",
    "dedup_minhash_lsh": "Signature table computed ONCE (parallelized "
    "repartition + localCheckpoint — a self-join otherwise duplicates the "
    "md5 subplan per band per side, 4x); candidates from a NARROW "
    "equi-join on band keys ((doc_id, band, key) rows, no arrays on the "
    "exchange — r7); distinct id pairs, then shingles join back by doc "
    "id so only candidates pay the exact-jaccard check.",
    "sim_search_topk": "Query vector broadcasts (1-row BroadcastNestedLoopJoin "
    "= the broadcast); TakeOrderedAndProject for top-k — no global sort.",
    "topk_per_group": "rank-limit pushdown: WindowGroupLimit keeps per-group "
    "heaps before the full window sort.",
    "join_range_banded": "Theta range join rewritten as an equi-join on "
    "banded keys + refine: BroadcastHashJoin instead of a nested loop.",
    "llm_echo_mapreduce": "Two Arrow-batched Python stages (the LLM fan-out), "
    "ZERO exchanges — stages chain narrowly; prompts assembled JVM-side.",
    "q8_market_share": "7-table join: every dimension BroadcastHashJoin; the "
    "only wide exchanges are the two fact-fact shuffles (lineitem-orders on "
    "orderkey, +customer on custkey) and the final year rollup.",
    "dedup_embedding_cosine": "Candidate generation is a self-join on "
    "(band, bucket) — exchange keyed by the LSH bucket, volume "
    "sum-of-bucket-sizes^2 not n^2 (8 bands x 8 sign bits = 256 buckets "
    "per band; widened from 4x4 in round 5, 8x faster at sf1); exact "
    "cosine runs only on survivors.",
    "dedup_minhash_lsh_salted": "Skew-guard twin of dedup_minhash_lsh: "
    "hot band keys detected by a narrow (band, key) aggregation, flagged "
    "rows broadcast-joined back and staged once (localCheckpoint); hot "
    "buckets triangle-replicate over (key, u, v) salt pairs so one "
    "bucket's m^2 work spreads across salt*(salt+1)/2 tasks; replication "
    "and pair rows are array-free (shingles join back at verify, r7).",
    "pack_greedy_sharded": "Next-fit packing with K-way shard fan-out: "
    "exchange on (source, shard) where shard = portable h32(doc_id) % 8, "
    "so a single giant source runs as 8 parallel Arrow folds; bin ids "
    "carry the shard prefix, no cross-shard coordination.",
    "corpus_dedup_survivors": "End-to-end dedup accounting: digest "
    "window (shuffles digest+id only, never text) + the LSH/CC subplan, "
    "one left join, one per-source aggregate.",
    "join_salted_skew": "Build side exploded 8x with a salt column, probe "
    "side salted by hash — the join exchange hashes on (key, salt) so a hot "
    "key fans over 8 reducers.",
    "funnel_by_segment": "Sessionization = one exchange on user_id; the "
    "funnel stage joins reuse the (user_id, sid) hash partitioning "
    "(no re-exchange until the tiny segment rollup); the customer dim joins "
    "hint-free (broadcast here by size estimate; shuffles at scale — r9).",
    "q9_product_profit": "5-way star: supplier/nation/part(LIKE-filtered) "
    "broadcast at this sf, so lineitem reaches the orders join without "
    "shuffling; only nation is a forced hint — supplier/part broadcast from "
    "size estimates and demote gracefully at scale (r9); "
    "StringContains(p_name,gear) is a PushedFilter on the part scan.",
    "q4_order_priority": "EXISTS decorrelated to LeftSemi BroadcastHashJoin "
    "with the non-equi lateness predicate as the join residual; the quarter "
    "filter on o_orderdate is a PushedFilter, lineitem reads 2 columns.",
    "q18_large_volume": "The HAVING-IN subquery is a LeftSemi against a "
    "grouped lineitem keyed on the same orderkey as the probe join — AQE "
    "broadcasts the tiny qualifying-order set at this sf; at 100 TB both "
    "sides align on the orderkey hash partitioning.",
    "q21_waiting_supplier": "Sole-late-supplier: count-over-window on the "
    "deduped late set (no self-join back, 2 lineitem scans total); all "
    "intermediates keyed on l_orderkey; the supplier dim joins hint-free "
    "(broadcast here by size estimate — r9).",
    "window_running_distinct": "Running COUNT(DISTINCT) via the "
    "first-occurrence-flag identity: two Window ops sharing the event_type "
    "hash partitioning — one exchange, no per-row set state.",
    "cohort_retention": "One wide exchange (per-user MIN); first_seen joins "
    "back to events hint-free (r9 — it is per-user, corpus-scaling; AQE "
    "broadcasts it only while measured small); distinct + rollup on the "
    "tiny (cohort, offset) key space.",
    "join_bucketed": "Co-located bucketed join: both scans report "
    "SelectedBucketsCount, the join has NO Exchange on either key — the "
    "write-once bucket shuffle is amortized across every query on the key.",
    "partition_pruned_scan": "event_type filter is a PartitionFilter on the "
    "scan (directory pruning), not a post-scan Filter: only 1 of 5 "
    "partition directories is read.",
    "ts_gap_fill": "Grid (sequence-explode) and type dims broadcast; the "
    "events fact shuffles once for its own aggregate and is scanned once.",
    "stream_funnel_sessions": "Sessionization + funnel in TWO window passes "
    "sharing one user_id exchange; the aggregate reuses the same hash "
    "partitioning (no re-exchange before groupBy(user_id, sid)).",
    "fk_orphan_audit": "Five anti joins in one plan: small parents "
    "broadcast (BroadcastHashJoin LeftAnti); the lineitem->orders leg is "
    "the only shuffled anti join; counts union driver-free.",
    "tf_idf_top_terms": "Two keyed shuffles total (per-doc tf, corpus df); "
    "the vocabulary-sized df table and the 1-row n_docs both broadcast "
    "back onto terms; per-doc top-3 via WindowGroupLimit.",
    "contamination_check": "Grams built IN-ROW (transform over start "
    "positions) then exploded — no token-array duplication; benchmark "
    "gram set broadcasts; the join is equi on the gram, never doc x doc.",
    "zorder_cluster_key": "Pure projection + one aggregate: the Morton "
    "key is integer bit math inside WholeStageCodegen, no Python, no "
    "extra scan.",
    "quality_repetition": "Word-level signals (dup-word frac, mean word "
    "len) are in-row array algebra on the scan; only the top-bigram mode "
    "explodes, into two aggregations that SHARE the doc_id hash "
    "partitioning; the join back to the in-row stats is keyed on doc_id.",
    "boilerplate_ngrams": "Per-doc distinct trigrams explode once; the "
    "global gram count and the tag-back join both key on the gram — "
    "sub-quadratic corpus self-comparison, no doc x doc pairs.",
    "graph_pagerank": "Power iteration: static degree-annotated edge "
    "table persisted once; each round is edge-to-rank keyed join + "
    "partial-aggregated groupBy(dst) + left join to nodes, ranks "
    "localCheckpoint()ed so the plan stays one round deep.",
    "pack_quantized": "Boundary-splitting packing is ONE window running "
    "sum per source — single exchange, full codegen, no Python.",
    "pack_greedy": "Next-fit packing: the capped-reset fold is "
    "FlatMapGroupsInPandas by design (window algebra cannot reset a "
    "running sum on overflow); one exchange on source, Arrow-batched.",
    "zscore_by_group": "Two unbounded window aggregates (avg, stddev) "
    "sharing ONE l_returnflag exchange; no join-back for the stats.",
    "outlier_iqr": "Exact per-group quantiles reduce to a tiny table "
    "that BroadcastHashJoins back onto the fact scan — the fact table "
    "never shuffles.",
    "sketch_hll_merge": "Mergeable HLL partials: per-(group, half) "
    "sketches partial-aggregate map-side; the union re-aggregates only "
    "sketch bytes — constant memory per group at any scale.",
    "dedup_paragraph": "Paragraph explode -> keeper election keyed on the "
    "paragraph (groupBy, argmin as integer min) -> join back -> one "
    "groupBy(doc_id) reassembly; no self-join and no corpus-wide window, "
    "and the election shuffle carries (para, doc_id*1024+idx) only.",
    "contamination_minhash": "Corpus-vs-benchmark LSH: the benchmark band "
    "table BROADCASTS (eval sets are tiny), so candidate generation is a "
    "map-side hash probe per corpus band row — the corpus never shuffles; "
    "only candidates pay the exact-Jaccard verify.",
    "mixture_resample": "One window exchange keyed on source (hash-rank "
    "election), n_min broadcast back as a 1-row scalar; the per-source "
    "aggregate reuses the window's source partitioning.",
    "sim_search_pq": "Encode+ADC scan is pure projection (codebook burned "
    "in as literals, per-row cost 8 LUT reads on a packed int64); "
    "TakeOrderedAndProject shortlist, exact re-rank only on rerank*k rows.",
    "stream_join_interval": "Equi-key (user_id) exchange carries the join; "
    "the 30-min range predicate is a join residual — the same plan "
    "Structured Streaming bounds state with under watermarks.",
    "semdedup_cells": "k-means cell blocking: centroid distances are "
    "Column-only argmax (codebook as literals, no Python); the pair join "
    "keys on the cell — candidate volume sum(cell^2), never n^2; exact "
    "cosine only on within-cell pairs.",
    "quality_unigram_logprob": "LM 'training' is ONE word-keyed "
    "aggregate; the vocab table broadcasts back onto the exploded words; "
    "DECIMAL-exact log-prob sums keyed on doc_id.",
    "dedup_span_coverage": "In-row gram build + explode; repeated grams "
    "elected by a gram-keyed aggregate + semi join; gaps-and-islands "
    "span union in two windows sharing one doc_id exchange.",
    "dedup_incremental": "Digest-only left join (bodies never shuffle): "
    "existing-corpus fingerprints deduped then probed by the incoming "
    "batch; per-source admission rates in one aggregate.",
    "quality_filter_gopher": "Pure in-row projection riding the scan — "
    "word count, mean word length, alpha-ratio all WholeStageCodegen; "
    "zero exchanges before the verdict column.",
    "dedup_containment": "Same in-row shingle algebra + adjacent-id "
    "blocking as dedup_ngram_jaccard; the asymmetric |AnB|/|A| division "
    "is the only difference — no new exchange.",
    "shuffle_epoch_order": "Deterministic reshuffle: portable-hash rank "
    "per (doc, epoch) is a projection; one range-partitioned sort per "
    "epoch emits the training order — no Python, no driver state.",
    "dsir_importance_weights": "One bigram explode feeds BOTH bucket "
    "counts (target count-filter + raw count) in a single groupBy(bkt); "
    "the 256-row log-ratio table broadcasts back onto the grams; "
    "DECIMAL-exact per-doc sums — feature table size is constant in "
    "corpus size.",
    "knn_join_batch": "Probe set BROADCASTS onto the corpus scan "
    "(BroadcastNestedLoopJoin); cosine is JVM-side zip_with/aggregate in "
    "the join projection; per-probe top-k is one window already keyed on "
    "probe_id — the corpus never shuffles for the join.",
    "collocation_pmi": "One bigram explode + ONE (w1,w2) aggregate does "
    "all corpus-sized work; marginals reaggregate from the pair table "
    "itself (localCheckpoint, no second corpus scan) and broadcast back "
    "with the 1-row total; PMI is per-row integer math.",
    "cluster_rep_best": "Cluster ids (never text) join doc metadata on "
    "doc_id; a single cluster_id window does both member count and the "
    "(n_chars DESC, doc_id) argmax election.",
    "text_script_profile": "Pure in-row regexp counting on the scan "
    "(Latin/Han/Cyrillic/digit), zero exchanges; the dominant-script "
    "CASE is per-row.",
    "snapshot_diff": "Both snapshot views reduce to (id, source, digest) "
    "at the scan; the full outer join shuffles digests and ids only, "
    "never bodies; per-source rollup is a tiny aggregate.",
    "token_budget_select": "Per-source token totals reaggregate to a "
    "quota table that BROADCASTS back; the selection is ONE window "
    "running sum per source (pack_quantized's single-exchange shape); "
    "quota math is exact integer DIV.",
    "quality_bigram_logprob": "One bigram explode + one (w1,w2) "
    "aggregate (eager-checkpointed once, three consumers); the score "
    "join carries no broadcast hint — AQE broadcasts the pair table "
    "while it fits, shuffle-joins when a web-scale one doesn't.",
    "vocab_coverage": "Corpus-sized work is one word-keyed aggregate; "
    "the ranked running sum runs over the language-sized vocab table; "
    "threshold cut is an exact-integer theta join against 3 rows.",
    "split_leakage_audit": "Cross-split near-dup audit: band-keyed "
    "candidate join over NARROW (doc_id, band, key) rows (no arrays on "
    "the exchange), distinct (test, train) id pairs, shingles join back "
    "by doc id for the integer-exact Jaccard verify (2|A∩B| >= |A∪B|).",
    "pack_concat_chunks": "Two-phase distributed prefix sum: order-range "
    "buckets from the top hash bits exchange in parallel for the "
    "per-bucket running sums; the only unpartitioned window is the "
    "64-row cumulative offset roll-up, broadcast back for the add.",
    "domain_stats_psl": "Public-suffix-list domains: bounded in-row "
    "candidate explode (last 1..3 labels) -> BroadcastHashJoin against "
    "the suffix table -> (doc, host)-keyed max election; the corpus "
    "never shuffles to resolve domains.",
    "join_fuzzy_blocked": "Entity-resolution fuzzy join: 3-char-prefix "
    "blocking equi-join so only block collisions pay the codegen'd "
    "levenshtein; deterministic (dist, name) argmin in one partkey "
    "window.",
    "url_dedup": "Canonicalization is a pure scan projection (regexp + "
    "in-row array ops); the group-by keys on the 60-bit URL digest, so "
    "the exchange carries (int64, int64) rows only.",
    "dedup_span_cut": "Gram election on the 60-bit digest key (int64 "
    "exchange); islands collect into per-doc range ARRAYS that join "
    "back by doc_id once; the cut + reassembly are a pure projection "
    "(exists() probe per island) — token text never leaves its scan "
    "row (r7: replaced the token posexplode + anti-join, 2x at sf2).",
    "quality_ensemble_keep": "Three quality signals joined on doc_id; "
    "rule gates are scan projections; the LM bottom-decile threshold "
    "is TakeOrderedAndProject(k) + a broadcast 1-row tuple compare — "
    "no global-order window anywhere.",
    "event_transition_matrix": "Lead window shares the user-keyed "
    "exchange every sessionization op uses; the (from, to) rollup and "
    "its share window run on the tiny transition table; p_e6 is one "
    "integer div on the aggregate.",
    "customer_rfm_segments": "Per-customer triple from ONE custkey "
    "group-by; the three NTILE windows sort the aggregate (one row "
    "per customer), not the orders stream — the SinglePartition "
    "exchange carries customers, and the 100 TB swap is approx-"
    "percentile cutoffs broadcast to a map-side score join.",
    "copurchase_pairs": "Distinct (order, part) staged ONCE "
    "(localCheckpoint — a raw self-join re-plans scan + distinct per "
    "side); pair generation joins on the shared orderkey, quadratic "
    "only in bounded basket size; the support rollup shuffles bare "
    "integer pairs.",
    "supplier_assortment_overlap": "Member table staged once, read by "
    "sizes + both self-join sides; the intersection joins on the "
    "ELEMENT key (sparse-dot-product identity — candidates only where "
    "sets share a part); sizes broadcast onto the pair rows.",
    "graph_triangle_count": "Edge set and oriented-edge table each "
    "staged once (three consumers each); degree-ordered orientation "
    "packs (degree, id) into one BIGINT so wedge join + closing "
    "semi-join shuffle integer pairs only — out-degree bounded by "
    "O(sqrt(m)) regardless of hubs (node-iterator++).",
    "t_closeness_audit": "Two corpus-sized group-bys (global buckets, "
    "class x bucket); the EMD grid is |classes| x m rows with "
    "broadcast joins, cumulative windows partitioned per class, and "
    "an all-integer numerator — one division at the end.",
    "join_key_skew_profile": "Per-key count is the only corpus-sized "
    "exchange; summary + exact p99 rank run over the key-count table; "
    "the p99 row and stats cross-join as broadcast singles.",
    "range_partition_bounds": "One global sort (NTILE over the unique "
    "composite) — the honest cost of exact bounds; the bucket rollup "
    "reuses the sort's range partitioning, no second exchange.",
    "ann_recall_at_k": "Fixed 16-probe set broadcasts; the scored table "
    "is 16n NARROW rows (embeddings projected away before any "
    "exchange), staged once for its three consumers (exact rank, IVF "
    "rank, candidate counts); recall lands as integer n_hits/k, no "
    "double final.",
    "ts_linear_interpolate": "One corpus-sized (type, hour) group-by "
    "with the string-pack argmax; the gap-bridging prev/next windows "
    "run over the broadcast-tiny GRID, and the lerp is one integer "
    "div — no double rounding anywhere.",
    "label_agreement_kappa": "One corpus-sized (label, pred) group-by "
    "to the |classes|^2 confusion matrix; margins + kappa algebra on "
    "that tiny table, single all-integer output row.",
    "graph_clustering_coeff": "Shares the staged edge/degree/oriented "
    "tables with graph_triangle_count; closed wedges keep their src "
    "vertex, explode to 3 integer rows per triangle, one (v)-keyed "
    "rollup — orientation still bounds out-degree O(sqrt(m)).",
    "fd_candidate_audit": "One countDistinct aggregate per candidate "
    "FD (shuffle = distinct (X, Y) pairs via two-phase expand), each "
    "collapsing to a 1-row verdict; the union is 4 tiny rows.",
    "pareto_revenue_share": "One custkey group-by is the only corpus "
    "exchange; NTILE sorts the per-customer aggregate; decile rollup "
    "and e6 shares run on 10 rows with the total broadcast.",
    "funnel_time_to_convert": "Two user-keyed exchanges (first-view "
    "aggregate, purchase join + re-aggregate); integer-microsecond "
    "latency stats, 8-row rollup.",
    "attribution_position_based": "ONE user-keyed exchange serves the "
    "running purchase counter and the journey windows; integer basis "
    "points sum to exactly 10000 per conversion; channel rollup tiny.",
    "sketch_quantile_merge": "One corpus group-by to the bounded bin "
    "histogram (partial aggregation IS the sketch merge); cumulative "
    "window + quantile reads on the histogram only; all-integer "
    "100*cum >= p*n rule, no interpolation.",
    "trend_slope_by_type": "One (type, hour) group-by; regression "
    "sums aggregate the tiny per-type hour grid, re-based hours keep "
    "integer products small; raw num/den emitted beside slope_e6.",
    "ann_recall_multiprobe": "Same staged 16n scored table shape as "
    "ann_recall_at_k; the candidate predicate is one popcount on "
    "packed bucket ints — 5 of 16 bucket-partitions probed.",
    "segment_bitmap_intersect": "One (type, word) group-by packs 32 "
    "users per BIGINT word; audience AND/OR is a word-keyed join + "
    "popcount — the fact table is never rejoined; oracle recomputes "
    "via DISTINCT joins (different algorithm, same counts).",
    "stream_quantile_bins": "Per (window, bin) additive state — the "
    "one quantile structure streaming can maintain incrementally; "
    "cumulative + read windows on histogram rows only.",
    "dedup_cluster_size_hist": "LSH/CC subplan feeds a cluster_id-"
    "keyed size rollup (narrow pairs) + a tiny size-domain histogram.",
    "features_point_in_time": "One customer-keyed exchange serves "
    "both EXCLUSIVE-frame windows (1 PRECEDING end kills target "
    "leakage); features land on fact rows without a join.",
    "session_path_topk": "Sessionize windows, step ranking, and the "
    "path rollup all share the single user-keyed exchange; path "
    "frequency table is |types|^3 max, top-10 is "
    "TakeOrderedAndProject.",
    "join_size_estimate": "Two per-key count aggregates + a "
    "histogram-sized join produce the prediction; the actual join is "
    "the verification leg — a planner runs only the histograms.",
    "negative_sampling_pairs": "Positives are one distinct projection "
    "of the fact join; candidates are in-row hash math (explode x2); "
    "the collision filter is a (cust, part)-keyed anti join.",
    "dedup_quality_bias": "corpus_dedup_survivors' digest window + "
    "LSH/CC subplan, re-keyed to the bounded length-bucket domain.",
    "window_ewma_dyadic": "Seven LAGs share one event_type-keyed "
    "window exchange over the tiny hour grid; dyadic weights make "
    "the smoother all-integer (raw num/den beside ewma_e6).",
    "skyline_price_size": "Sort-filter skyline: two windows on one "
    "price-ordered exchange (value-RANGE running max + equal-price "
    "partition max) replace the quadratic dominance scan; oracle IS "
    "the NOT EXISTS scan — two algorithms, one answer.",
    "percentile_exact_twophase": "Corpus aggregates onto its VALUE "
    "DOMAIN (one count per distinct cents); sort + cumulative run "
    "over distinct values, not rows — exact order statistics at "
    "scale.",
    "time_weighted_avg": "One series-keyed window exchange (LEAD) + "
    "the same keyed aggregate; cents x seconds BIGINT products, "
    "zero-duration ties drop out.",
    "ann_recall_truncated_dims": "One 16n narrow scored pass computes "
    "BOTH cosines (truncated dot is a slice of the same zip_with); "
    "two WindowGroupLimit rankings; embeddings never ride an "
    "exchange.",
    "abc_classification": "One partkey group-by (DECIMAL cents); "
    "cumulative ranking over the per-part aggregate with integer "
    "cross-multiply class bounds; 3-row rollup.",
    "cdc_chunk_stats": "Boundary detection is in-row array algebra "
    "on the scan (no explode); histogram groups on the small "
    "chunks-per-doc domain.",
    "experiment_assignment_srm": "One distinct-user aggregate, "
    "in-row hash assignment, stratum-keyed rollup — sticky "
    "assignment without rand().",
    "schema_merge_scan": "mergeSchema read reconciles the evolved "
    "column at file-footer level — one pass, no shuffle beyond the "
    "tiny rollup; oracle recomputes expectations from the source.",
    "incremental_agg_merge": "Both legs are keyed aggregates; the "
    "merge is a keyed outer join + elementwise add of partials — "
    "only aggregate rows move (the O(delta) MV-refresh shape).",
    "rolling_corr_terms": "Seven trailing-24 windows share ONE "
    "ordered pass over the hour grid; integer sufficient statistics "
    "— no float crosses engines.",
    "event_disorder_histogram": "Running max shares the per-type "
    "window exchange; histogram on a 6-value domain — the "
    "watermark-delay sizing statistic.",
    "rare_category_collapse": "One category group-by; collapse "
    "decision + re-rollup on the category-count table with the "
    "1-row total broadcast; integer cross-multiply threshold.",
    "seasonality_profile": "One (dow, hour) group-by; pure integer "
    "epoch arithmetic (calendar dow conventions differ across "
    "engines); peak window over the 168-row matrix.",
    "entity_resolution_clusters": "Blocked fuzzy equi-join generates "
    "the match graph; CC over 32-bit hashed node ids (label-"
    "invariant histogram; string-labeled oracle doubles as the "
    "collision check); cluster-sized rollups.",
    "metric_change_contribution": "One (segment, half) conditional "
    "aggregate with the 2-value bounds broadcast; integer cross-"
    "multiply half boundary; additivity certified by the window "
    "total.",
    "percentile_group_twophase": "Shuffle carries (group, value, "
    "count); per-group cumulative over distinct values — no "
    "per-group row sort.",
    "bloom_fpr_calibration": "Bit table <= m rows, broadcast; probes "
    "explode k in-row hashes and join it — measured FPR for one "
    "scan of each side.",
    "churn_label_table": "One user-keyed conditional aggregate; "
    "integer cross-multiply period boundary; PIT-safe label "
    "definition (features from H1 only, label from H2 only).",
    "set_sim_join_prefix": "Rarest-first prefix tokens key the "
    "candidate join (hot tokens never enter short prefixes); bare "
    "id-pair dedupe; word sets join back for ONE exact verify — "
    "zero false negatives, unlike LSH.",
    "graph_link_prediction": "Common-neighbor wedge join on bare "
    "integer pairs; existing-edge anti join; degrees broadcast onto "
    "scored candidates; jaccard via inclusion-exclusion, e6 units.",
    "experiment_uplift_report": "Distinct-user + distinct-converter "
    "aggregates, one user-keyed left join, 8-row rollup; raw integer "
    "numerators, uplift computed downstream.",
    "attribution_time_decay": "Same user-keyed journey skeleton as "
    "position-based; weight 2^(8-hour-gap) is in-row bit math — "
    "dyadic decay, zero float exponentials.",
    "ts_gap_report": "Distinct (type, hour) projection + grid "
    "anti-join; gaps-and-islands window on grid-sized data per "
    "series.",
    "sequence_pattern_support": "Sessionize + firsts share the "
    "user-keyed exchange; the pattern join is per-session over at "
    "most |types| rows each side; |types|^2 output.",
    "phrase_match_positions": "IN-list prunes the token stream to 3 "
    "terms inside the scan; both positional joins share the doc_id "
    "hash partitioning; output one row per matching doc.",
    "rank_fusion_borda": "Candidate pruning in the scan; two "
    "rankings as windows over the pruned set only; integer Borda — "
    "no float reciprocals.",
    "target_encoding_loo": "|types|-row encoding table broadcast "
    "back onto the fact scan; LOO subtraction is per-row arithmetic "
    "— zero fact shuffles.",
    "cusum_changepoint": "Hourly rollup is the only corpus-sized "
    "aggregate; prefix + argmax windows per-series on bucket-count "
    "rows; all-integer scaled CUSUM.",
    "benford_digit_audit": "Projection to one digit column, 9-group "
    "aggregate; expected shares are integer literals — no float "
    "log10 in the plan.",
    "degree_assortativity_terms": "Reuses staged co-purchase "
    "edges/degrees; two single-int-key joins; four moments in one "
    "map-side-combinable aggregate.",
    "mad_robust_outliers": "Two rounds of the value-domain "
    "percentile plan (distinct-value cumulative, no row sort); "
    "median table broadcasts onto the deviation pass.",
    "ks_split_drift": "One (type, value) aggregate carrying both "
    "sides' counts; per-series cumulative windows; integer "
    "cross-multiplied ECDF max.",
    "graph_bfs_hops": "Four static frontier-join + min-fold rounds "
    "on the same vertex-id exchange key; distance table bounded by "
    "|V|.",
    "zone_map_skip_audit": "Per-chunk min/max/count map-side "
    "aggregates per layout; the skip audit runs on chunk-count "
    "rows.",
    "gini_revenue_inequality": "One custkey group-by (corpus "
    "exchange); rank + moments run on the per-customer aggregate "
    "within 5 bounded segments; DECIMAL(38,0) sums.",
    "hhi_concentration": "Custkey group-by then a single map-side-"
    "combinable moment aggregate — no sort, no window.",
    "auc_mann_whitney": "Distinct-value aggregate carries both class "
    "counts; one cumulative window over distinct values; one final "
    "reduce.",
    "dau_wau_stickiness": "One DISTINCT (day,user) exchange; DAU and "
    "WAU both reduce from that distinct table, never raw events.",
    "recon_order_totals": "Detail rollup is map-side combinable and "
    "shuffles (orderkey, cents); header join co-partitionable on "
    "orderkey; audit reduces to |statuses| rows.",
    "graph_hits_unnormalized": "Staged edge table consumed by all "
    "four propagation rounds; each round one single-int-key join + "
    "map-side sum; TakeOrderedAndProject top-10.",
    "itemset3_support": "Staged per-order distinct; both self-joins "
    "co-partitioned on l_orderkey; support rollup shuffles bare "
    "integer triples.",
    "inventory_stockout_scan": "One l_partkey exchange feeds the "
    "running-sum window and the rollup; TakeOrderedAndProject "
    "top-10.",
    "kendall_tau_terms": "Pair join runs on the calendar-bounded "
    "(type, day) aggregate, never raw events; reduces to |types| "
    "rows.",
    "ordinal_pattern_counts": "Daily aggregate + per-series LEAD "
    "windows; histogram reduce is map-side combinable.",
    "bellman_ford_bounded": "Three static min-plus rounds, each one "
    "equi-join of the best-cost table against staged weighted edges "
    "on the same int key; cost table bounded by |V|.",
    "ngram_novelty_rate": "Gram digests (60-bit) computed in the "
    "scan stage; first-seen aggregate and join-back exchange bare "
    "BIGINTs; per-source rollup map-side combinable.",
    "decile_lift_table": "One global rank over (score, id); decile "
    "rollup and lift math run on 10 rows; swap to two-phase "
    "range-partitioned rank at 100 TB.",
    "winsorize_clip_stats": "One (type, value) count aggregate + "
    "cumulative window over distinct values; clip pass on the count "
    "table with the 5-row fence broadcast.",
    "acf_lag_terms": "Lag equi-joins run on the calendar-bounded "
    "(type, day) aggregate; moment rollup map-side combinable.",
    "chi2_lang_source_terms": "One (lang, source) aggregate staged; "
    "margins derive from it (no re-scan) and broadcast back onto "
    "the bounded cell table.",
    "brand_share_shift": "Part dim broadcast onto the fact scan; "
    "one map-side-combinable half-sum aggregate per bounded brand "
    "key; 1-row midpoint scalar broadcast.",
    "backlog_aging_buckets": "Status filter pushed to the scan; "
    "max-day scalar broadcast; one bounded-key aggregate.",
    "filter_waterfall_attrition": "Single scan, nested conditional "
    "aggregates (each doc once); stack unpivot on |sources| rows.",
    "stream_topk_types": "(window, type) counts with map-side "
    "partials; WindowGroupLimit prunes per-window rank to k before "
    "the sort.",
    "runs_test_counts": "Value-domain median on the daily aggregate "
    "(broadcast back); run transitions via one LAG window per "
    "series.",
    "interpurchase_gap_profile": "One custkey-partitioned LAG "
    "window; histogram + cumulative picks on DISTINCT (segment, "
    "gap) rows; segment dim broadcast.",
    "wow_revenue_delta": "Weekly aggregate map-side combinable; LAG "
    "over calendar-bounded weekly rows.",
    "shipment_latency_audit": "Fact-fact join on orderkey "
    "(co-partitionable/bucketable); map-side audit aggregate to 5 "
    "rows.",
    "hash_shard_balance": "Digest computed as a scan projection; "
    "32-key map-side count; 1-row total broadcast.",
    "attribution_linear": "Same plan family as "
    "attribution_position_based: one user-keyed exchange for "
    "counter + journey windows + converted-journey join.",
    "user_acquisition_curve": "One DISTINCT (day, user) exchange; "
    "first-seen derives by user; cumulative window on daily rows.",
    "discount_volume_curve": "Scan projection + one "
    "map-side-combinable aggregate over ~11 bounded keys.",
    "source_vocab_overlap": "Staged DISTINCT (source, digest); "
    "self-join keyed on the bare-BIGINT digest; sizes broadcast.",
    "dim_coverage_audit": "Three LEFT joins dim->DISTINCT fact keys "
    "each reduced to one row; single action, no driver loop.",
    "set_ops_bag_semantics": "intersectAll/exceptAll plan as "
    "count-aggregated joins on the key; one exchange each.",
    "cart_abandonment_daily": "One (day, user) aggregate with "
    "conditional MAX flags; daily rollup map-side combinable.",
    "priceband_segment_mix": "Customer and part broadcast; the only "
    "wide exchange is lineitem-orders on orderkey; share window on "
    "the bounded mix table.",
    "brand_return_rates": "Broadcast part join onto the scan; one "
    "25-key map-side aggregate.",
    "sentence_length_profile": "Sentence explode pipelined in the "
    "scan; (lang, length) counts are the one exchange; picks on "
    "distinct lengths.",
    "copurchase_lift": "Staged per-order distinct reused for pairs "
    "AND item counts; counts broadcast onto the bounded pair table.",
    "segment_migration_matrix": "One custkey aggregate + 1-row "
    "midpoint broadcast; both global ranks on the aggregate; 9-row "
    "matrix.",
    "user_activity_depth": "DISTINCT (user, day) exchange; per-user "
    "reduce on the same key; calendar-bounded histogram.",
    "basket_value_curve": "One orderkey aggregate (count+sum "
    "together, map-side combinable); bounded basket-size rollup.",
    "session_duration_profile": "One user-keyed exchange shared by "
    "the LAG flag, running session id, and per-session rollup; "
    "percentile picks on distinct durations.",
    "part_supplier_redundancy": "One partkey aggregate carrying "
    "distinct-supplier count and cents sum together; bounded "
    "histogram + 1-row total broadcast.",
    "moving_7d_revenue": "Daily aggregate then a per-series RANGE "
    "frame on the integer day index.",
    "weekend_lift": "Single scan, conditional aggregate per bounded "
    "series key; lift math on |types| rows.",
    "greedy_set_cover_sources": "Staged DISTINCT (source, bigram "
    "digest); each round one left-anti join vs the covered set + "
    "bounded argmax; 3 static rounds, no driver loop over data.",
    "budget_apportion_hamilton": "Source count aggregate + 1-row "
    "total broadcast; remainder rank on |sources| rows; allocations "
    "sum exactly.",
    "rolling_retention_7d": "Staged distinct (day, user); "
    "user-keyed self-join banded to 7 days (range-banded shape); "
    "map-side daily rollup.",
}


def main() -> None:
    registry.load_all()
    spark = get_spark("plans")
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — executed physical plans of the headline queries (sf0.01)",
        "",
        "Regenerate with `python tools/dump_plans.py`.  These are the plan",
        "properties the engine is designed around (see README 'Design for",
        "scale'); tests/test_plans.py asserts the load-bearing ones.",
        "",
    ]
    for name, note in NOTES.items():
        df = registry.QUERIES[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # keep the final (post-AQE) plan section only
        if "+- == Initial Plan ==" in plan:
            plan = plan.split("+- == Initial Plan ==")[0].rstrip()
        out += [f"## {name}", "", note, "", "```", plan, "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
