#!/usr/bin/env python3
"""sf10 invariant gate (dev tool): compares two graft.ScaleProbe records —
a reference run (sf0.1) and a scaled run (facts x100, corpus x20 via
tools/gen_sf.py --rep 100 --rep-corpus 20) — against per-key recurrence
rules DERIVED from the replication structure, not from re-running an
oracle. Replication is exact (every fact row repeats with only its
first-column key shifted; dims are untouched), so:

  - group-by-dimension aggregates keep their row count; SUM/COUNT columns
    scale by the replication factor; AVG / normalized columns are invariant
    (pagerank: weights scale uniformly -> same transition matrix);
  - per-fact-row outputs scale rows by the factor;
  - the nation-level graph topology is invariant (same 625 weighted pairs);
  - corpus replicas are EXACT near-duplicates: every doc gains rep-1 exact
    copies, so dedup must cluster each replica group (cluster_size >= 20)
    and idf is invariant (N and df both x20);
  - overflow canaries: any NaN/Inf min/max, or a negative bound on a
    declared nonneg column (a wrapped BIGINT sum), fails the key.

Quadratic-pair keys (minhash/simhash pair listings) have no closed-form
count under the band-bucket caps — they assert growth floors and record.

TIMING DISCIPLINE (r14 lesson — the invariants above are contention-proof,
the `secs` fields are NOT): a ScaleProbe run only produces trustworthy
wall-clocks when it is the ONLY Spark JVM on the box. The r14 record shows
what violating that costs: `join_multiway_star` read 169 s in a probe that
shared the box with a second batch, 13.3 s solo — a 12.7× inflation on
unchanged code. Rules: (1) never launch two ScaleProbe/Verify/Bench JVMs
concurrently; (2) check `/proc/loadavg` < ~2 before a timing run; (3) any
`secs` meant to be quoted as a scale result must come from a solo run —
re-measure suspicious outliers solo before optimizing against them
(tools/scaleprobe_r15_solo_sf10.json is the r15 solo re-measurement of the
r14 top wall-clocks).

Usage: python3 tools/check_sf10.py /tmp/scaleprobe_ref.json \
           /tmp/scaleprobe_sf10.json [--facts 100] [--corpus 20]
"""
import argparse
import json
import sys

F, C = 100, 20  # overwritten from args in main()

def rules():
    # rows: ("==",) same count | ("x", factor) exact scale |
    #       (">=", n) floor | ("record",) no assertion
    # cols: {col: ("x", factor, reltol) | ("==", reltol)} on min AND max
    # nonneg: columns whose min must stay >= 0 (overflow canary)
    return {
        "sql_tpch_q1": {"rows": ("==",), "cols": {
            "sum_qty": ("x", F, 1e-9), "sum_base_price": ("x", F, 1e-9),
            "sum_disc_price": ("x", F, 1e-9), "sum_charge": ("x", F, 1e-9),
            "avg_qty": ("==", 1e-9), "avg_price": ("==", 1e-9),
            "avg_disc": ("==", 1e-9), "count_order": ("x", F, 0)},
            "nonneg": ["sum_qty", "count_order"]},
        "agg_hash_group": {"rows": ("==",), "cols": {
            "sum_qty": ("x", F, 1e-9), "sum_base_price": ("x", F, 1e-9),
            "sum_disc_price": ("x", F, 1e-9), "avg_qty": ("==", 1e-9),
            "n": ("x", F, 0)}, "nonneg": ["n", "sum_qty"]},
        # interpolated percentiles of a replicated multiset can move one
        # inter-point gap at the boundary — tolerance, not exact
        "agg_percentile": {"rows": ("==",), "cols": {
            "p50_qty": ("==", 0.01), "p90_price": ("==", 0.01)}},
        "agg_salted_twophase": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_value": ("x", F, 1e-9)},
            "nonneg": ["n", "sum_value"]},
        # user ids repeat across replicas -> distinct users invariant; the
        # HLL sees the identical value set -> identical registers. n is the
        # raw per-type event count and scales with the facts
        "agg_approx_distinct": {"rows": ("==",), "cols": {
            "n_users_exact": ("==", 0), "n": ("x", F, 0)},
            "nonneg": ["n", "n_users_exact"]},
        "join_skew_salted": {"rows": ("x", F), "nonneg": ["o_orderkey"]},
        "join_range_binned": {"rows": ("x", F), "nonneg": ["n_ship"]},
        "join_bucketed": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "revenue": ("x", F, 1e-9)},
            "nonneg": ["n", "revenue"]},
        # replicas land at identical timestamps -> same session boundaries,
        # one output row per event
        "sessionize_batch": {"rows": ("x", F), "nonneg": ["session_seq"]},
        "event_funnel": {"rows": ("==",), "cols": {
            "v_ms": ("==", 0), "c_ms": ("==", 0), "p_ms": ("==", 0)}},
        "event_sequence_match": {"rows": ("==",),
            "nonneg": ["n_purchases", "n_converted"]},
        "interval_merge": {"rows": ("==",), "cols": {
            "span_start_ms": ("==", 0), "span_end_ms": ("==", 0),
            "n_events": ("x", F, 0)}, "nonneg": ["n_events"]},
        "merge_upsert": {"rows": ("x", F), "nonneg": ["o_totalprice"]},
        "window_median": {"rows": ("x", F), "cols": {
            "med_30d": ("==", 0.01)}},
        "graph_components": {"rows": ("==",), "cols": {
            "vid": ("==", 0), "comp": ("==", 0)}},
        # edge weights scale uniformly -> normalized transition matrix and
        # hence the stationary ranks are invariant
        "graph_pagerank": {"rows": ("==",), "cols": {"rank": ("==", 1e-6)}},
        # basket co-occurrence graph with an ABSOLUTE support>=2 filter:
        # exact x100 replication multiplies every pair's support by 100, so
        # the threshold stops filtering and the edge set explodes by design
        # (3573 -> ~1.2M edges at x100). No closed-form counts — the gate
        # asserts the run COMPLETES with sane bounds (the wedge join must
        # survive the 335x edge blowup without degenerating), which is the
        # scale stress this key is in the set for
        "graph_triangles": {"rows": ("==",),
            "nonneg": ["n_nodes", "n_edges", "n_triangles"]},
        "dedup_exact": {"rows": ("==",), "cols": {
            "n_copies": ("x", C, 0)}, "nonneg": ["n_copies"]},
        "dedup_survivor": {"rows": ("x", C)},
        "dedup_minhash_md5": {"rows": (">=", 100000),
            "nonneg": ["n_match"]},
        "dedup_simhash_md5": {"rows": (">=", 100000), "nonneg": ["hamming"]},
        "dedup_ngram_jaccard": {"rows": (">=", 1000)},
        # every replica group is fully connected (exact copies share all
        # their surviving shingles) -> max cluster size >= rep-corpus
        "dedup_clusters": {"rows": (">=", 1000), "colmax": {
            "cluster_size": (">=", C)}},
        "corpus_build": {"rows": (">=", 1)},
        # N and df both scale by C -> idf and hence tfidf invariant
        "text_tfidf": {"rows": ("x", C), "cols": {
            "tfidf": ("==", 1e-9), "rn": ("==", 0)}},
        "emb_knn_graph": {"rows": ("x", C), "colmax": {
            "cos_sim": (">=", 0.999999)}},
        # the probe vector gained C-1 exact copies -> the whole top-10 is
        # cosine 1.0
        "sim_ann_persisted": {"rows": ("==",), "colmin": {
            "cos_sim": (">=", 0.999999)}},
        "pack_sequences": {"rows": (">=", 1), "nonneg": ["n_tokens"]},
        # ---- batch 2 (round 13): graph family, seeded dedup spellings,
        # rank/sketch aggs as overflow canaries ----
        # the nation-graph edge filter is `w % 7 = 0`; gcd(100,7)=1 so the
        # x100-scaled weights satisfy it iff the originals did -> the edge
        # SET (and every unweighted graph output) is invariant
        "graph_bfs_hops": {"rows": ("==",), "cols": {
            "vid": ("==", 0), "hops": ("==", 0)}},
        "graph_clustering_coeff": {"rows": ("==",), "cols": {
            "vid": ("==", 0), "deg": ("==", 0), "triangles": ("==", 0),
            "coeff": ("==", 1e-9)}},
        "graph_link_predict": {"rows": ("==",), "cols": {
            "cn": ("==", 0), "jaccard": ("==", 1e-9)}},
        "graph_assortativity": {"rows": ("==",), "cols": {
            "n": ("==", 0), "assortativity": ("==", 1e-6)}},
        # sssp weights are (w div 7) % 10 + 1 — NOT scale-invariant by
        # design, so distances legitimately change; topology (row set) holds
        "graph_sssp_weighted": {"rows": ("==",), "cols": {
            "vid": ("==", 0)}, "nonneg": ["dist"]},
        # tie-averaged ranks transform affinely under exact replication
        # (r -> 100r - 49.5), and Spearman is Pearson on ranks -> invariant
        "agg_spearman": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "spearman": ("==", 1e-6)},
            "nonneg": ["n"]},
        # revenue SHARES are invariant under uniform x100 -> same A/B/C
        # (and CV-based X/Y/Z) class per part
        "agg_abc_class": {"rows": ("==",), "cols": {
            "n_parts": ("==", 0), "revenue_cents": ("x", F, 0)},
            "nonneg": ["n_parts", "revenue_cents"]},
        "agg_abc_xyz": {"rows": ("==",), "cols": {"n_parts": ("==", 0)},
            "nonneg": ["n_parts"]},
        # pair counts scale x100; support/confidence/lift are count RATIOS
        # -> invariant, so the ranked listing is stable
        "agg_market_basket": {"rows": ("==",), "cols": {
            "c_ab": ("x", F, 0), "support": ("==", 1e-6),
            "confidence": ("==", 1e-6), "lift": ("==", 1e-6)},
            "nonneg": ["c_ab"]},
        # seeded production spellings under band-bucket cap pressure at x20
        # replica density: replica-pair floors only (buckets shared by >= 4
        # originals legitimately cross MaxBandBucket and drop)
        "dedup_simhash": {"rows": (">=", 100000), "nonneg": ["hamming"]},
        "dedup_minhash": {"rows": (">=", 100000)},
        "dedup_substring": {"rows": ("x", C),
            "nonneg": ["n_spans", "n_dup_spans"]},
        # every replica pair shares all sign bits and has cosine 1.0 >= 0.4
        # -> at least C(20,2) x 2000 = 380k pairs regardless of how the
        # adaptive width splits the original near-dup pairs
        "dedup_embedding": {"rows": (">=", 380000)},
        "dedup_embedding_clusters": {"rows": ("x", C), "colmax": {
            "cluster_size": (">=", C)}},
        "text_bigram_lm_score": {"rows": (">=", 10),
            "nonneg": ["n_docs"]},
        # KMV sketches the DISTINCT user set, which is invariant (user ids
        # repeat across replicas) -> exact and estimated intersections equal
        "agg_kmv_intersect": {"rows": ("==",), "cols": {
            "exact_inter": ("==", 0), "kmv_inter": ("==", 0)},
            "nonneg": ["exact_inter", "kmv_inter"]},
        "profile_stats": {"rows": ("==",), "cols": {
            "n_null": ("x", F, 0)}, "nonneg": ["n_null", "n_distinct"]},
        "agg_weighted_percentile": {"rows": ("==",), "cols": {
            "wmedian_price": ("==", 0.01), "totw": ("x", F, 1e-9)},
            "nonneg": ["totw"]},
        # fixed-size per-stratum sample: the count contract survives scale
        "sample_stratified": {"rows": ("==",), "nonneg": ["rn"]},
        "agg_approx_quantile": {"rows": ("==",), "cols": {
            "n": ("x", F, 0)}, "nonneg": ["n"]},
        # ---- batch 3 (round 13): the remaining low-cardinality-stratum
        # windows, rewritten to two-phase / broadcast-stats shapes ----
        "window_percent_rank": {"rows": ("x", F), "colmax": {
            "pct_rank": (">=", 0.999999), "cume": (">=", 0.999999)}},
        # the %7 orderkey filter interacts with the replication key shift
        # (residues rotate), so the count is ~x100, not exact
        "window_cume_dist": {"rows": (">=", 1000000), "colmax": {
            "cd": (">=", 0.999999)}},
        # mu is invariant; stddev_samp's (n-1) denominator shifts by
        # ~1/(100n) under replication, which can flip a 4dp-rounded z on a
        # boundary — floor, not exact x100
        "agg_zscore_outliers": {"rows": (">=", 100000)},
        # ---- batch 4 (round 13): ETL/CDC/as-of/top-k breadth ----
        "audit_fk": {"rows": ("==",)},
        "cdc_apply_changelog": {"rows": ("==",)},
        "cdc_emit_changes": {"rows": ("x", F)},
        "scd2_history": {"rows": ("x", F)},
        # per-group top-k: groups (custkeys) are invariant and already held
        # >= k orders each, so the listing size is stable
        "topk_per_group": {"rows": ("==",)},
        "join_asof": {"rows": ("x", F)},
        "event_markov": {"rows": ("==",)},
        "event_rfm": {"rows": ("==",)},
        "resample_zerofill": {"rows": ("==",)},
        "corpus_epoch_shuffle": {"rows": ("x", C)},
        "corpus_shard_balance": {"rows": ("==",)},
        "agg_quantile_exact": {"rows": ("==",)},
        # id-adjacency islands: the replication key shift breaks adjacency
        # at replica boundaries, so the count is ~x100 minus edge effects
        "window_gap_islands": {"rows": (">=", 1000000)},
        "event_path_analysis": {"rows": ("==",)},
        "dq_expectations": {"rows": ("==",), "cols": {
            "checked": ("x", F, 0), "violations": ("x", F, 0)},
            "nonneg": ["checked", "violations"]},
        # ---- batch 5 (round 13): resample/window/text/emb/corpus breadth
        "resample_ohlc": {"rows": ("==",)},
        "resample_seasonal_decompose": {"rows": ("==",)},
        "resample_locf": {"rows": ("==",)},
        "window_ewma": {"rows": ("x", F)},
        # frame-boundary rows don't replicate exactly — floors
        "window_rolling_quantile": {"rows": (">=", 10000000)},
        "window_rolling_corr": {"rows": (">=", 500000)},
        "window_streak": {"rows": ("==",)},
        "text_langid": {"rows": ("x", C)},
        "text_quality": {"rows": ("x", C)},
        "text_readability": {"rows": ("x", C)},
        "text_novelty": {"rows": ("x", C)},
        "emb_kmeans": {"rows": ("x", C)},
        "emb_product_quantize": {"rows": ("x", C)},
        "corpus_filter_sweep": {"rows": ("==",)},
        "corpus_curriculum": {"rows": ("x", C)},
        "event_churn_hazard": {"rows": ("==",)},
        # ---- batch 6 (round 14): the stats/ML agg family. Derivations:
        # replication repeats every fact row with only its id shifted, so
        # distinct-entity sets (users, custkeys, days, value domains) are
        # INVARIANT, raw-row counts scale xF, count-share-based statistics
        # (entropy, JSD, PSI, MI, AUC, KM survival, Lorenz shares) are
        # invariant, and (n-1)-corrected moments move by O(1/n) — pinned at
        # 1e-2/1e-3. Test statistics that scale with n (F, chi2, t, U, H)
        # are pinned only where the scaling is exact (chi2 xF, F xF with
        # a small df-correction tolerance); t/U/H/z are recorded, not
        # asserted, because their sqrt(n)-ish growth has no closed form
        # under the df shifts. ----
        "agg_anova": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "f_stat": ("x", F, 0.02)},
            "nonneg": ["n", "f_stat"]},
        "agg_auc_roc": {"rows": ("==",), "cols": {
            "n_pos": ("x", F, 0), "n_neg": ("x", F, 0),
            "auc": ("==", 1e-6)}},
        "agg_autocorr": {"rows": ("==",)},
        "agg_block_maxima": {"rows": ("==",), "cols": {
            "n_blocks": ("==", 0), "gumbel_mu_usd": ("==", 1e-6),
            "return_level_100_usd": ("==", 1e-6)}},
        # per-replicate Poisson draws hash the SHIFTED ids, so each
        # replicate resamples a different multiset — the CI recenters
        # within its own width; n_boot is the structural contract
        "agg_bootstrap_ci": {"rows": ("==",), "cols": {
            "n_boot": ("==", 0)}},
        "agg_changepoint_binary": {"rows": ("==",), "cols": {
            "n_days": ("==", 0), "change_epoch_day": ("==", 0)}},
        "agg_chi_square": {"rows": ("==",), "cols": {
            "n_cells": ("==", 0), "chi2": ("x", F, 1e-6)},
            "nonneg": ["chi2"]},
        "agg_cohort_ltv": {"rows": ("==",), "cols": {
            "rev": ("x", F, 1e-9), "cum_rev": ("x", F, 1e-9)},
            "nonneg": ["rev", "cum_rev"]},
        "agg_count_min": {"rows": ("==",), "cols": {
            "n_exact": ("x", F, 0), "est": ("x", F, 0),
            "overcount": ("x", F, 0)}, "nonneg": ["overcount"]},
        "agg_cov_matrix": {"rows": ("==",), "cols": {
            "corr": ("==", 1e-3), "cov": ("==", 1e-2)}},
        "agg_cuped": {"rows": ("==",), "cols": {
            "n": ("==", 0), "theta": ("==", 1e-6),
            "var_reduction": ("==", 1e-6)}},
        "agg_gain_chart": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "cum_gain": ("==", 1e-6),
            "lift": ("==", 1e-6)}},
        "agg_group_entropy": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "n_types": ("==", 0),
            "entropy": ("==", 1e-6)}},
        "agg_heavy_hitters": {"rows": ("==",), "cols": {
            "exact_count": ("x", F, 0)}},
        "agg_histogram": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "total": ("x", F, 1e-9)},
            "nonneg": ["n", "total"]},
        "agg_histogram_quantile": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "median_bin": ("==", 0),
            "median_lo": ("==", 1e-6)}},
        "agg_hll_partial_merge": {"rows": ("==",), "cols": {
            "n_days": ("==", 0), "n_users_exact": ("==", 0)}},
        "agg_hurst_exponent": {"rows": ("==",), "cols": {
            "hurst": ("==", 1e-6)}},
        "agg_jackknife": {"rows": ("==",), "cols": {
            "n_groups": ("==", 0), "mean_usd": ("==", 1e-6),
            "jackknife_se_usd": ("==", 1e-6)}},
        "agg_js_divergence": {"rows": ("==",), "cols": {
            "n_types": ("==", 0), "jsd": ("==", 1e-6)}},
        "agg_kruskal_wallis": {"rows": ("==",), "cols": {
            "n": ("x", F, 0)}},
        "agg_ks_test": {"rows": ("==",), "cols": {
            "ks_d": ("==", 1e-6), "n_a": ("x", F, 0),
            "n_b": ("x", F, 0)}},
        "agg_log_histogram": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "lo": ("==", 1e-9), "hi": ("==", 1e-9)}},
        "agg_lorenz": {"rows": ("==",), "cols": {
            "n_cust": ("==", 0), "rev_share": ("==", 1e-6),
            "cum_share": ("==", 1e-6)}},
        "agg_mad_robust": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "med": ("==", 0.01), "mad": ("==", 0.01)}},
        "agg_mann_kendall": {"rows": ("==",), "cols": {
            "n_days": ("==", 0), "s_stat": ("==", 0), "z": ("==", 1e-3)}},
        "agg_mann_whitney": {"rows": ("==",), "cols": {
            "n_a": ("x", F, 0), "n_b": ("x", F, 0)}},
        "agg_mode": {"rows": ("==",), "cols": {"n": ("x", C, 0)}},
        "agg_mutual_info": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "mi": ("==", 1e-6), "h_x": ("==", 1e-6),
            "h_y": ("==", 1e-6)}},
        "agg_ols_multi": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "b0": ("==", 1e-6), "b1": ("==", 1e-6),
            "b2": ("==", 1e-6)}},
        "agg_psi_drift": {"rows": ("==",), "cols": {
            "n_bins": ("==", 0), "psi": ("==", 1e-6)}},
        "agg_regression": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "slope": ("==", 1e-6),
            "icept": ("==", 1e-6), "r2": ("==", 1e-6)}},
        "agg_retention_cohort": {"rows": ("==",), "cols": {
            "active_users": ("==", 0)}},
        # adjacent exact copies cannot open or close a sign run -> r holds
        "agg_runs_test": {"rows": ("==",), "cols": {
            "n1": ("x", F, 0), "n2": ("x", F, 0), "r": ("==", 0)}},
        "agg_skew_kurtosis": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "mean_usd": ("==", 1e-6),
            "skewness": ("==", 1e-3), "ex_kurtosis": ("==", 1e-3)}},
        "agg_skyline_2d": {"rows": ("==",), "cols": {
            "price_usd": ("==", 0), "day_idx": ("==", 0)}},
        "agg_stats_corr": {"rows": ("==",), "cols": {
            "corr_qp": ("==", 1e-3), "covar_qp": ("==", 1e-2),
            "std_q": ("==", 1e-2)}},
        "agg_survival_km": {"rows": ("==",), "cols": {
            "duration_h": ("==", 0), "n_risk": ("==", 0),
            "d_events": ("==", 0), "survival": ("==", 1e-6)}},
        "agg_theil_index": {"rows": ("==",), "cols": {
            "n_customers": ("==", 0), "theil_t": ("==", 1e-6)}},
        # day-level collapse: pairs are day pairs (invariant); the slopes
        # ride day VOLUME sums, which scale xF
        "agg_theil_sen": {"rows": ("==",), "cols": {
            "n_pairs": ("==", 0), "sen_slope_per_day": ("x", F, 1e-6)}},
        "agg_ttest": {"rows": ("==",), "cols": {
            "na": ("x", F, 0), "nb": ("x", F, 0)}},
        "agg_winsorized_mean": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "lo": ("==", 0.01), "hi": ("==", 0.01),
            "winsorized_mean": ("==", 0.01)}},
        "agg_gini": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "gini": ("==", 1e-3)}, "nonneg": ["n"]},
        # all-ties top-k at x100 replication -> alpha is legitimately NULL
        # (the guard the probe forced); only the k contract is structural
        "agg_hill_tail": {"rows": ("==",), "cols": {"k": ("==", 0)}},
        # ---- batch 7 (round 14): joins + windows. Join row counts follow
        # which side(s) replicate (fact-fact xF, fact-dim xF, dim-dim ==,
        # corpus-corpus xC); as-of/nearest matches keep their VALUES
        # because the match set per probe row is id-shifted copies of the
        # same original. Windows over per-user/per-part keys scale rows xF
        # with invariant value domains; frame-boundary-sensitive keys get
        # floors. ----
        "join_asof_forward": {"rows": ("x", F), "cols": {
            "next_value": ("==", 0)}},
        "join_asof_nearest": {"rows": ("x", F), "cols": {
            "dt_us": ("==", 0)}},
        "join_asof_tolerance": {"rows": ("x", F), "cols": {
            "gap_ms": ("==", 0)}},
        "join_cross": {"rows": ("==",)},
        "join_dpp": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "max_value": ("==", 0)}},
        "join_full_outer": {"rows": ("==",), "cols": {
            "n_orders": ("x", F, 0), "total_spent": ("x", F, 1e-9)}},
        "join_fuzzy": {"rows": ("==",), "cols": {
            "dist": ("==", 0), "n_a": ("==", 0), "n_b": ("==", 0)}},
        "join_inner_broadcast": {"rows": ("==",)},
        "join_inner_shuffle": {"rows": ("x", F)},
        # pair sums over day-count products: both sides xF -> xF^2, exact
        "join_interval_overlap": {"rows": ("==",), "cols": {
            "n_pairs": ("x", F * F, 0), "overlap_days": ("x", F * F, 0)},
            "nonneg": ["n_pairs", "overlap_days"]},
        # adaptive-width grid: block occupancy (not topology) drives the
        # candidate listing -> growth floor only
        "join_knn_grid": {"rows": (">=", 100000)},
        "join_lateral_topk": {"rows": ("x", F)},
        "join_left_anti": {"rows": ("==",)},
        "join_left_outer": {"rows": ("x", F)},
        "join_left_semi": {"rows": ("==",)},
        "join_multiway_star": {"rows": ("==",), "cols": {
            "revenue": ("x", F, 1e-9), "n_lines": ("x", F, 0)},
            "nonneg": ["revenue", "n_lines"]},
        "join_nearest_value": {"rows": ("x", F)},
        "join_null_safe": {"rows": ("==",)},
        "join_runtime_bloom": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_qty": ("x", F, 1e-9)}},
        "join_spatial_grid": {"rows": ("x", C)},
        "join_temporal_dim": {"rows": ("x", F), "cols": {
            "dim_value": ("==", 0)}},
        "join_theta_range": {"rows": ("x", F)},
        "limit_topk": {"rows": ("==",)},
        "sort_multi": {"rows": ("==",), "cols": {
            "c_custkey": ("==", 0), "c_acctbal": ("==", 0)}},
        "subquery_decorrelate": {"rows": ("x", F), "cols": {
            "o_totalprice": ("==", 0)}},
        "window_bollinger": {"rows": ("x", F)},
        "window_cusum": {"rows": ("==",), "cols": {
            "n_events": ("x", F, 0), "max_s": ("x", F, 1e-9)}},
        "window_drawdown": {"rows": ("==",), "cols": {
            "max_dd_cents": ("==", 0), "max_dd": ("==", 1e-9)},
            "nonneg": ["max_dd_cents"]},
        "window_first_last": {"rows": ("x", F)},
        "window_holt": {"rows": ("x", F)},
        "window_lag_lead": {"rows": ("x", F), "cols": {
            "value": ("==", 0)}},
        "window_log_returns": {"rows": ("==",), "cols": {
            "n_rets": ("==", 0), "realized_vol": ("==", 1e-6)}},
        "window_ntile": {"rows": ("x", F), "cols": {
            "quartile": ("==", 0)}},
        "window_range_frame": {"rows": ("x", F), "cols": {
            "n_30d": ("x", F, 0), "sum_30d": ("x", F, 1e-9)}},
        "window_rank": {"rows": ("x", F)},
        "window_rank_change": {"rows": ("==",), "cols": {
            "rank_early": ("==", 0), "rank_late": ("==", 0),
            "rank_gain": ("==", 0)}},
        "window_rolling_distinct": {"rows": ("==",), "cols": {
            "wau": ("==", 0)}},
        "window_rolling_slope": {"rows": ("x", F), "cols": {
            "n": ("==", 0)}},
        # 14-row frame straddles replica-group boundaries -> ~xF floor
        "window_rsi": {"rows": (">=", 900000)},
        "window_running": {"rows": ("x", F)},
        # n_windows = (100n - 19) per prio vs (n - 19)x100 — off by the
        # warm-up rows, no closed form; completion + nonneg is the gate
        "window_spc_rule": {"rows": ("==",),
            "nonneg": ["n_windows", "n_violations"]},
        # exact replication forces every 5/20-SMA sign flip through 0
        # (sgn*psgn = -1 never fires) -> ZERO crossings is the CORRECT
        # scaled output; completion is the contract
        "window_sma_cross": {"rows": ("record",)},
        "window_time_decay": {"rows": ("x", F)},
        "window_time_range": {"rows": ("x", F), "cols": {
            "trailing_7d": ("x", F, 1e-9)}},
        "window_twap": {"rows": ("==",), "cols": {
            "n_spans": ("==", 0), "twap": ("==", 1e-6)}},
        "window_vwap": {"rows": ("x", F), "cols": {
            "vwap": ("==", 0)}},
        # ---- batch 8 (round 14): TPC-H + relational/set/fn surface.
        # Fixed-domain group sets keep row counts; SUM/COUNT measures xF;
        # AVG/share measures invariant; distinct-entity outputs invariant.
        # Top-k listings ranked by xF-scaled measures keep their SIZE and
        # their max (the scaled top), but replica tie-breaking reshuffles
        # which id-shifted copies fill the tail -> rows rules only. ----
        "sql_entry_q3": {"rows": ("==",)},
        "sql_tpch_q4": {"rows": ("==",), "cols": {
            "order_count": ("x", F, 0)}},
        "sql_tpch_q5": {"rows": ("==",), "cols": {
            "revenue": ("x", F, 1e-9)}},
        "sql_tpch_q6": {"rows": ("==",), "cols": {
            "revenue": ("x", F, 1e-9), "n_lines": ("x", F, 0)}},
        "sql_tpch_q7": {"rows": ("==",), "cols": {
            "l_year": ("==", 0), "revenue": ("x", F, 1e-9)}},
        "sql_tpch_q8": {"rows": ("==",), "cols": {
            "o_year": ("==", 0), "mkt_share": ("==", 1e-6)}},
        "sql_tpch_q9": {"rows": ("==",), "cols": {
            "o_year": ("==", 0), "sum_profit": ("x", F, 1e-9)}},
        "sql_tpch_q10": {"rows": ("==",), "cols": {
            "revenue": ("x", F, 1e-9), "c_acctbal": ("==", 0)}},
        "sql_tpch_q11": {"rows": ("==",), "cols": {
            "part_value": ("x", F, 1e-9)}},
        "sql_tpch_q12": {"rows": ("==",), "cols": {
            "high_line_count": ("x", F, 0), "low_line_count": ("x", F, 0)}},
        "sql_tpch_q13": {"rows": ("==",), "cols": {
            "custdist": ("==", 0)}},
        "sql_tpch_q14": {"rows": ("==",), "cols": {
            "promo_revenue": ("==", 1e-6), "n_lines": ("x", F, 0)}},
        "sql_tpch_q15": {"rows": ("==",), "cols": {
            "s_suppkey": ("==", 0), "total_revenue": ("x", F, 1e-9)}},
        "sql_tpch_q16": {"rows": ("==",), "cols": {
            "supplier_cnt": ("==", 0)}},
        "sql_tpch_q17": {"rows": ("==",), "cols": {
            "n_small": ("x", F, 0), "avg_yearly": ("x", F, 1e-9)}},
        "sql_tpch_q18": {"rows": ("==",)},
        "sql_tpch_q19": {"rows": ("==",), "cols": {
            "revenue": ("x", F, 1e-9), "n_lines": ("x", F, 0)}},
        "sql_tpch_q20": {"rows": ("==",), "cols": {
            "s_suppkey": ("==", 0)}},
        "sql_tpch_q21": {"rows": ("==",), "cols": {
            "numwait": ("x", F, 0)}},
        "sql_tpch_q22": {"rows": ("==",), "cols": {
            "numcust": ("==", 0), "totacctbal": ("==", 1e-9)}},
        "agg_cube": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "total": ("x", F, 1e-9)}},
        "agg_rollup": {"rows": ("==",), "cols": {
            "sum_qty": ("x", F, 1e-9), "n": ("x", F, 0)}},
        "agg_grouping_sets": {"rows": ("==",), "cols": {
            "sum_qty": ("x", F, 1e-9), "n": ("x", F, 0)}},
        "agg_distinct": {"rows": ("==",), "cols": {
            "l_quantity": ("==", 0)}},
        "agg_bool": {"rows": ("==",), "cols": {"n": ("x", F, 0)}},
        "agg_multi_stats": {"rows": ("==",), "cols": {
            "min_price": ("==", 0), "max_price": ("==", 0),
            "avg_price": ("==", 1e-6), "n_cust": ("==", 0),
            "n": ("x", F, 0)}},
        "agg_collect_sorted": {"rows": ("==",)},
        "agg_count_if": {"rows": ("==",), "cols": {
            "n_discounted": ("x", F, 0), "n_bulk": ("x", F, 0),
            "n": ("x", F, 0)}},
        "agg_min_max_by": {"rows": ("==",), "cols": {
            "first_value": ("==", 0), "n": ("x", F, 0)}},
        "agg_string_concat": {"rows": ("==",)},
        "agg_pivot": {"rows": ("==",), "cols": {
            "F": ("x", F, 0), "O": ("x", F, 0), "P": ("x", F, 0)}},
        "agg_pivot_dynamic": {"rows": ("==",), "cols": {
            "click": ("x", F, 0), "purchase": ("x", F, 0),
            "view": ("x", F, 0)}},
        "set_union_all": {"rows": ("==",)},
        "set_intersect": {"rows": ("==",)},
        "set_except": {"rows": ("==",)},
        "set_intersect_all": {"rows": ("x", F)},
        "set_except_all": {"rows": ("x", F)},
        "filter_pred": {"rows": ("x", F), "cols": {
            "l_quantity": ("==", 0), "l_discount": ("==", 0)}},
        "filter_null_semantics": {"rows": ("==",)},
        "filter_in_like": {"rows": ("==",)},
        "project_expr": {"rows": ("x", F), "cols": {
            "net_price": ("==", 0), "tax_amt": ("==", 0)}},
        "scan_parquet": {"rows": ("==",)},
        "scan_pruned": {"rows": ("x", F)},
        "topk_latest": {"rows": ("==",), "cols": {
            "value": ("==", 0), "ts_ms": ("==", 0)}},
        "agg_multi_distinct": {"rows": ("==",), "cols": {
            "n_parts": ("==", 0), "n_supps": ("==", 0),
            "n_orders": ("x", F, 0), "n_rows": ("x", F, 0)}},
        "join_hinted_strategies": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "revenue": ("x", F, 1e-9)}},
        "fn_try_arith": {"rows": ("x", F), "cols": {
            "td": ("==", 0), "te": ("==", 0), "tn": ("==", 0)}},
        "fn_datetime_tz": {"rows": ("x", F), "cols": {
            "ny_hour": ("==", 0)}},
        "agg_apdex": {"rows": ("==",), "cols": {
            "satisfied": ("x", F, 0), "tolerating": ("x", F, 0),
            "n": ("x", F, 0), "apdex": ("==", 1e-6)}},
        "quality_logistic_score": {"rows": ("x", C), "cols": {
            "score": ("==", 1e-6)}},
        # ---- batch 9 (round 14): events/resample/dq/privacy/sample/graph
        # breadth. Same derivation discipline; distinct-user measures and
        # share/ratio diagnostics invariant, raw counts xF; hash samples
        # get near-xF floors (md5 over SHIFTED ids resamples the subset). ----
        "bucket_agg_tumbling": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_value": ("x", F, 1e-9)}},
        # full-scan fingerprint: xor over an even replica count cancels
        # pairwise per original row, so only counts are structural
        "checksum_table": {"rows": ("==",), "cols": {
            "n_rows": ("x", F, 0)}},
        "dq_anomaly_iqr": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "n_outliers": ("==", 0),
            "q1": ("==", 0.01), "q3": ("==", 0.01)}},
        "dq_benford": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "share": ("==", 1e-6),
            "benford_p": ("==", 1e-6)}},
        "dq_benford_mad": {"rows": ("==",), "cols": {"mad": ("==", 1e-6)}},
        "dq_duplicate_keys": {"rows": ("==",), "cols": {
            "n_keys": ("x", F, 0), "n_rows": ("x", F, 0)}},
        "dq_freshness": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "last_s": ("==", 0), "lag_min": ("==", 0),
            "stale": ("==", 0)}},
        "dq_srm_check": {"rows": ("==",), "cols": {
            "n0": ("==", 0), "n1": ("==", 0), "chi2": ("==", 1e-6),
            "srm_alarm": ("==", 0)}},
        "dq_volume_drift": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "rel_change": ("==", 1e-6),
            "alarm": ("==", 0)}},
        "event_attribution": {"rows": ("==",), "cols": {
            "n_prior": ("x", F, 0)}},
        "event_burstiness": {"rows": ("==",), "cols": {
            "n": ("==", 0), "fano": ("x", F, 1e-6)}},
        "event_churn_hazard": {"rows": ("==",), "cols": {
            "ended": ("==", 0), "censored": ("==", 0),
            "at_risk": ("==", 0), "hazard": ("==", 1e-6)}},
        "event_conversion_lag": {"rows": ("==",), "cols": {
            "n_converted": ("==", 0), "med_lag_s": ("==", 0),
            "p90_lag_s": ("==", 0)}},
        "event_cooccurrence": {"rows": ("==",), "cols": {
            "n_both": ("==", 0), "n_a": ("==", 0), "n_b": ("==", 0),
            "support": ("==", 1e-6), "lift": ("==", 1e-6)}},
        "event_dau_wau": {"rows": ("==",), "cols": {
            "dau": ("==", 0), "wau": ("==", 0),
            "stickiness": ("==", 1e-6)}},
        "event_heatmap_hod_dow": {"rows": ("==",), "cols": {
            "n": ("x", F, 0)}},
        "event_hod_divergence": {"rows": ("==",), "cols": {
            "js_divergence_bits": ("==", 1e-6),
            "js_distance": ("==", 1e-6)}},
        # gaps between ADJACENT events shrink to 0 inside replica groups
        # (identical ts) -> only the max-gap envelope is structural
        "event_interarrival": {"rows": ("==",), "cols": {
            "max_gap": ("==", 0)}},
        "event_lifecycle_stages": {"rows": ("==",), "cols": {
            "n_users": ("==", 0)}},
        "event_markov_entropy": {"rows": ("==",)},
        "event_seq_pairs": {"rows": ("==",), "cols": {
            "sup": ("==", 0), "support": ("==", 1e-6)}},
        "event_spike_detect": {"rows": ("==",), "cols": {
            "c": ("x", F, 0)}},
        "event_transition_time": {"rows": ("==",), "cols": {
            "min_gap_s": ("==", 0), "max_gap_s": ("==", 0)}},
        "graph_degree_dist": {"rows": ("==",), "cols": {
            "degree": ("==", 0), "n_nodes": ("==", 0)}},
        "graph_modularity": {"rows": ("==",), "cols": {
            "n_communities": ("==", 0), "modularity": ("==", 1e-6)}},
        "graph_reciprocity": {"rows": ("==",), "cols": {
            "n_edges": ("==", 0), "n_recip": ("==", 0),
            "reciprocity": ("==", 1e-6)}},
        "privacy_dp_count": {"rows": ("==",), "cols": {
            "nk": ("==", 0), "n": ("==", 0), "dp_count": ("==", 0)}},
        "privacy_generalize": {"rows": ("==",), "cols": {
            "published_n": ("==", 0)}},
        "privacy_kanon": {"rows": ("==",), "cols": {"n": ("==", 0)}},
        "privacy_ldiversity": {"rows": ("==",), "cols": {
            "n": ("==", 0), "l_div": ("==", 0)}},
        "privacy_pseudonymize": {"rows": ("==",)},
        "privacy_risk_curve": {"rows": ("==",), "cols": {
            "rows_at_risk": ("==", 0), "risk_share": ("==", 1e-6)}},
        "privacy_suppress_cells": {"rows": ("==",), "cols": {
            "published": ("==", 0), "suppressed": ("==", 0)}},
        "privacy_tcloseness": {"rows": ("==",), "cols": {
            "n": ("==", 0), "t_closeness": ("==", 1e-6)}},
        "profile_skew": {"rows": ("==",), "cols": {
            "cnt": ("x", F, 0), "share": ("==", 1e-6),
            "skew_vs_uniform": ("==", 1e-6)}},
        "profile_stats_approx": {"rows": ("==",), "cols": {
            "n_null": ("==", 0)}},
        "resample_atr": {"rows": ("==",), "cols": {
            "atr_microusd": ("==", 0)}},
        "resample_deseasonalize": {"rows": ("==",), "cols": {
            "cnt": ("x", F, 0), "deseasonalized": ("x", F, 1e-6)}},
        "resample_forecast_naive": {"rows": ("==",), "cols": {
            "n_hours": ("==", 0), "smape": ("==", 1e-6)}},
        "resample_interpolate": {"rows": ("==",), "cols": {
            "filled": ("==", 0)}},
        "resample_lttb": {"rows": ("==",), "cols": {
            "cnt": ("x", F, 0)}},
        "resample_minmax_decimate": {"rows": ("==",), "cols": {
            "value_usd": ("==", 0)}},
        "resample_ohlc_volatility": {"rows": ("==",), "cols": {
            "n_bars": ("==", 0), "parkinson_vol": ("==", 1e-6)}},
        "resample_seasonal_strength": {"rows": ("==",), "cols": {
            "seasonal_strength": ("==", 1e-6)}},
        "resample_seasonality": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "idx": ("==", 1e-6)}},
        # md5 over SHIFTED ids -> each replica independently resamples;
        # expectation 1/256 of rows, so a generous near-xF band
        "sample_hash": {"rows": (">=", 9000000)},
        "sample_reservoir": {"rows": ("==",), "cols": {"rn": ("==", 0)}},
        "sample_split": {"rows": ("==",)},
        "sample_weighted": {"rows": (">=", 45000)},
        "unpivot_long": {"rows": ("x", F), "cols": {
            "value": ("==", 0)}},
        # ---- batch 10 (round 14): text/corpus/emb/dedup breadth. Corpus
        # replication (xC): per-doc rows scale xC with invariant per-doc
        # values; corpus-level diagnostics (entropy, PMI, Zipf/Heaps fits,
        # JSD, recall) are count-share-based and invariant; top-k listings
        # over replica-tied scores keep SIZE only. ----
        "text_stats": {"rows": ("x", C), "cols": {
            "n_chars": ("==", 0), "n_tokens": ("==", 0),
            "n_uniq": ("==", 0), "avg_token_len": ("==", 0)}},
        "text_token_bpe": {"rows": ("x", C), "cols": {
            "n_tokens": ("==", 0), "n_uniq": ("==", 0)}},
        "text_repetition": {"rows": ("x", C), "cols": {
            "rep_ratio": ("==", 0)}},
        "text_entropy": {"rows": ("x", C), "cols": {
            "char_entropy": ("==", 0)}},
        "text_lm_score": {"rows": ("x", C), "cols": {
            "n_tokens": ("==", 0), "lm_score": ("==", 0)}},
        "text_vocab_coverage": {"rows": ("x", C), "cols": {
            "coverage_pm": ("==", 0)}},
        "text_hash_features": {"rows": ("x", C), "cols": {
            "n_buckets": ("==", 0), "top_cnt": ("==", 0)}},
        "text_sentence_stats": {"rows": ("x", C), "cols": {
            "n_sentences": ("==", 0), "n_words": ("==", 0)}},
        "text_chunk_overlap": {"rows": ("x", C), "cols": {
            "n_tok": ("==", 0)}},
        "text_bigram_entropy": {"rows": ("==",), "cols": {
            "n_bigrams": ("==", 0), "cond_entropy": ("==", 1e-6)}},
        "text_bpe_train": {"rows": ("==",), "cols": {
            "freq": ("x", C, 0)}},
        "text_collocations": {"rows": ("==",), "cols": {
            "n_pair": ("x", C, 0), "pmi": ("==", 1e-6)}},
        "text_coverage_curve": {"rows": ("==",), "cols": {
            "covered": ("x", C, 0), "total": ("x", C, 0),
            "vocab": ("==", 0), "coverage": ("==", 1e-6)}},
        "text_hapax_ratio": {"rows": ("==",), "cols": {
            "vocab": ("==", 0), "hapax": ("==", 0),
            "tokens": ("x", C, 0), "hapax_vocab_share": ("==", 1e-6)}},
        "text_heaps_fit": {"rows": ("==",), "cols": {
            "vocab_size": ("==", 0), "heaps_beta": ("==", 1e-6),
            "heaps_k": ("==", 1e-6)}},
        "text_langid_confusion": {"rows": ("==",), "cols": {
            "n": ("x", C, 0), "recall": ("==", 1e-6)}},
        "text_langid_kappa": {"rows": ("==",), "cols": {
            "n_docs": ("x", C, 0), "accuracy": ("==", 1e-6),
            "kappa": ("==", 1e-6)}},
        "text_pii_mask": {"rows": ("==",), "cols": {
            "n_pii": ("==", 0)}},
        "text_script_detect": {"rows": ("==",), "cols": {
            "chars": ("x", C, 0), "cjk_share": ("==", 1e-6)}},
        "text_simpson_diversity": {"rows": ("==",), "cols": {
            "n": ("x", C, 0), "vocab": ("==", 0)}},
        "text_topterms": {"rows": ("==",), "cols": {
            "cnt": ("x", C, 0), "rn": ("==", 0)}},
        "text_zipf_fit": {"rows": ("==",), "cols": {
            "n": ("==", 0), "zipf_slope": ("==", 1e-6)}},
        "corpus_dup_stats": {"rows": ("==",), "cols": {
            "docs": ("x", C, 0), "distinct_texts": ("==", 0)}},
        "corpus_e2e_pipeline": {"rows": ("==",), "cols": {
            "n_chars": ("==", 0), "rk": ("==", 0)}},
        "corpus_eval_sample": {"rows": ("==",), "cols": {
            "rn": ("==", 0)}},
        "corpus_length_histogram": {"rows": ("==",), "cols": {
            "docs": ("x", C, 0)}},
        # per-source budget caps interact with replica ties -> near-xC
        "corpus_mix": {"rows": (">=", 60000)},
        "corpus_mix_temperature": {"rows": ("==",), "cols": {
            "n": ("x", C, 0), "alloc_docs": ("==", 0)}},
        "corpus_shard_write": {"rows": ("==",), "cols": {
            "n_langs": ("==", 0), "min_doc": ("==", 0)}},
        "corpus_source_divergence": {"rows": ("==",), "cols": {
            "n_words": ("==", 0), "jsd_vs_corpus": ("==", 1e-6)}},
        "corpus_source_overlap": {"rows": ("==",), "cols": {
            "v1": ("==", 0), "v2": ("==", 0), "jaccard": ("==", 1e-6)}},
        # budget cutoffs move when every doc gains 19 same-score twins
        "corpus_token_budget": {"rows": (">=", 939)},
        # replicas can share MORE eval n-grams than xC exactly
        "decontam_check": {"rows": (">=", 33760)},
        "dedup_containment": {"rows": (">=", 256)},
        "dedup_incremental": {"rows": ("x", C)},
        "dedup_prefix": {"rows": (">=", 202), "colmax": {
            "n_docs": (">=", 20)}},
        "emb_centroid_assign": {"rows": (">=", 39000), "cols": {
            "centroid_id": ("==", 0)}},
        # replicas fill BOTH id-halves with the same vector set -> zero
        # drift is the correct scaled answer; only the label set holds
        "emb_centroid_drift": {"rows": ("==",), "cols": {
            "label": ("==", 0)}},
        "emb_dim_reduce": {"rows": ("x", C), "cols": {
            "r0": ("==", 0), "r1": ("==", 0), "r2": ("==", 0),
            "r3": ("==", 0)}},
        "emb_knn_classify": {"rows": ("==",)},
        "emb_norm_histogram": {"rows": ("==",), "cols": {
            "norm_bucket_01": ("==", 0), "n_vectors": ("x", C, 0)}},
        "emb_normalize": {"rows": ("x", C)},
        "emb_outlier_distance": {"rows": ("==",)},
        # the probe vector gains C-1 exact twins -> they fill the top-10
        "emb_prefix_recall": {"rows": ("==",), "cols": {
            "prefix_dims": ("==", 0)}},
        "emb_quantize": {"rows": ("x", C)},
        "emb_recall_at_k": {"rows": ("==",), "cols": {"k": ("==", 0)}},
        "emb_triplet_mining": {"rows": ("==",), "cols": {
            "a_id": ("==", 0), "pos_cos": ("==", 1e-6),
            "neg_cos": ("==", 1e-6)}},
        "sim_cosine_topk": {"rows": ("==",)},
        "sim_pq_adc": {"rows": ("==",)},
        "sim_topk_batch": {"rows": ("==",), "cols": {
            "rank": ("==", 0)}},
        # ---- batch 11 (round 14, final): inference/mining aggs + typed
        # Dataset/UDx + fn representatives. Same derivations; test
        # statistics (z/t/q), CI widths, and distribution FITS over
        # xF-scaled counts are recorded, not asserted. ----
        "agg_backlog_aging": {"rows": ("==",), "cols": {
            "n_orders": ("x", F, 0)}},
        "agg_benjamini_hochberg": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "p_rank": ("==", 0),
            "bh_threshold": ("==", 1e-6)}},
        "agg_bitmap_distinct": {"rows": ("==",), "cols": {
            "nd": ("==", 0)}},
        "agg_brier_score": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "brier": ("==", 1e-6)}},
        "agg_calibration_bins": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "mean_score": ("==", 1e-6),
            "pos_rate": ("==", 1e-6)}},
        "agg_capture_recapture": {"rows": ("==",), "cols": {
            "n1": ("==", 0), "n2": ("==", 0), "m": ("==", 0),
            "n_true": ("==", 0), "lp_estimate": ("==", 1e-6),
            "chapman_estimate": ("==", 1e-6)}},
        "agg_circular_mean": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "mean_dir_deg": ("==", 1e-6),
            "resultant_len": ("==", 1e-6)}},
        "agg_cochran_armitage": {"rows": ("==",), "cols": {
            "n_users": ("==", 0), "n_conv": ("==", 0),
            "trend_z": ("==", 1e-6)}},
        "agg_cohens_d": {"rows": ("==",), "cols": {
            "n1": ("x", F, 0), "n0": ("x", F, 0),
            "cohens_d": ("==", 1e-3)}},
        "agg_concurrency_sweep": {"rows": ("==",), "cols": {
            "max_open": ("x", F, 0)}},
        "agg_cramers_v": {"rows": ("==",), "cols": {
            "chi2": ("x", F, 1e-6), "cramers_v": ("==", 1e-3)}},
        "agg_diff_in_diff": {"rows": ("==",), "cols": {
            "n00": ("x", F, 0), "n11": ("x", F, 0),
            "did_usd": ("==", 1e-6)}},
        "agg_hhi": {"rows": ("==",), "cols": {
            "n_firms": ("==", 0), "hhi": ("==", 1e-6)}},
        "agg_incremental_merge": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_value": ("x", F, 1e-9),
            "min_v": ("==", 0), "max_v": ("==", 0),
            "avg_value": ("==", 1e-6)}},
        "agg_james_stein": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "raw_mean": ("==", 1e-6)}},
        "agg_kmv_difference": {"rows": ("==",), "cols": {
            "kmv_diff": ("==", 0), "exact_diff": ("==", 0)}},
        "agg_negbin_fit": {"rows": ("==",), "cols": {
            "n_days": ("==", 0), "mean_daily": ("x", F, 1e-6)}},
        "agg_newsvendor": {"rows": ("==",), "cols": {
            "critical_fractile": ("==", 1e-6),
            "stock_level": ("x", F, 0.01)}},
        "agg_odds_ratio": {"rows": ("==",), "cols": {
            "a": ("x", F, 0), "d": ("x", F, 0),
            "odds_ratio": ("==", 1e-6)}},
        "agg_power_analysis": {"rows": ("==",), "cols": {
            "mde_pct": ("==", 0), "baseline_rate": ("==", 1e-6),
            "n_per_arm": ("==", 0)}},
        "agg_power_means": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "mean_usd": ("==", 1e-6),
            "gmean_usd": ("==", 1e-6), "hmean_usd": ("==", 1e-6)}},
        "agg_price_elasticity": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "elasticity": ("==", 1e-6)}},
        "agg_rare_collapse": {"rows": ("==",), "cols": {
            "n_rows": ("==", 0), "n_source_cats": ("==", 0),
            "share": ("==", 1e-6)}},
        "agg_ratio_delta_ci": {"rows": ("==",), "cols": {
            "n_users": ("==", 0), "ratio_usd": ("==", 1e-6)}},
        "agg_revenue_bridge": {"rows": ("==",), "cols": {
            "q0": ("x", F, 0), "q1": ("x", F, 0),
            "delta_rev_usd": ("x", F, 1e-6)}},
        "agg_sequential_peeking": {"rows": ("==",), "cols": {
            "n0": ("x", F, 0), "c0": ("x", F, 0),
            "obf_bound": ("==", 1e-6)}},
        "agg_simpson_paradox": {"rows": ("==",), "cols": {
            "n_segments_reversed": ("==", 0)}},
        "agg_stump_split": {"rows": ("==",), "cols": {
            "threshold_usd": ("==", 0), "gini": ("==", 1e-6),
            "n_left": ("x", F, 0), "n_right": ("x", F, 0)}},
        "agg_supplier_risk": {"rows": ("==",), "cols": {
            "n_suppliers": ("==", 0), "revenue_cents": ("x", F, 0),
            "revenue_share": ("==", 1e-6)}},
        "agg_theil_decompose": {"rows": ("==",), "cols": {
            "theil_within": ("==", 1e-6), "revenue_share": ("==", 1e-6)}},
        "agg_tukey_hsd": {"rows": ("==",), "cols": {
            "mean_a": ("==", 1e-6), "mean_b": ("==", 1e-6),
            "diff": ("==", 1e-6)}},
        "agg_two_proportion_z": {"rows": ("==",), "cols": {
            "n0": ("==", 0), "c0": ("==", 0), "rate0": ("==", 1e-6),
            "z": ("==", 1e-6)}},
        "agg_weibull_fit": {"rows": ("==",), "cols": {
            "n_points": ("==", 0), "weibull_shape": ("==", 1e-6),
            "weibull_scale_h": ("==", 1e-6)}},
        "agg_wilson_ci": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "k": ("x", F, 0),
            "p_hat": ("==", 1e-6)}},
        "dq_write_gate": {"rows": ("==",), "nonneg": ["n_rows"]},
        "ds_typed_ops": {"rows": ("==",), "cols": {
            "n_orders": ("x", F, 0), "max_price": ("==", 0)}},
        "fn_hash": {"rows": ("==",)},
        "fn_math": {"rows": ("x", F), "cols": {
            "price_r1": ("==", 0), "p2": ("==", 0)}},
        "fn_time_bucket": {"rows": ("==",), "cols": {
            "q15_start_s": ("==", 0), "b4h_start_s": ("==", 0)}},
        "fn_uuid_ns": {"rows": ("==",)},
        "join_right_outer": {"rows": (">=", 3000000)},
        "quality_gate": {"rows": ("x", C), "cols": {
            "stop_ratio": ("==", 0), "uniq_ratio": ("==", 0)}},
        "sim_ann_ivf": {"rows": ("==",)},
        "sim_ann_lsh": {"rows": (">=", 8)},
        "sql_tpch_q2": {"rows": ("==",), "cols": {
            "min_cost": ("==", 0)}},
        "text_fingerprint": {"rows": ("x", C), "cols": {
            "n_fp": ("==", 0), "fp_min": ("==", 0), "fp_max": ("==", 0)}},
        "text_fingerprint_md5": {"rows": ("x", C), "cols": {
            "n_fp": ("==", 0), "fp_min": ("==", 0), "fp_max": ("==", 0)}},
        "udaf_typed": {"rows": ("==",), "cols": {
            "weighted_avg_price": ("==", 1e-6), "n": ("==", 0)}},
        "udf_scalar": {"rows": ("==",)},
        "udtf_generate": {"rows": ("x", C), "cols": {
            "pos": ("==", 0), "v": ("==", 0)}},
        # ---- r15 closure batch: the last 75 keys (fn/scan/etl/mm/sql/
        # stream families). Replication recap that justifies the rules:
        # dims copy as-is (dim-only keys are output-IDENTICAL); fact rows
        # repeat xF with ONLY the lead key shifted (payload-derived
        # columns keep their min/max; key-derived maxima grow, so no rule);
        # the orderkey/event_id shift constants (150000 / 100000 at the
        # sf0.1 source) are divisible by 2 and 1000, so every %2/%1000
        # fixture filter replicates exactly; corpus docs repeat xC with
        # identical text, so byte-derived stats are invariant and per-doc
        # outputs scale xC. Stream keys: replicas land at IDENTICAL
        # timestamps, so window/session/sequence boundaries are invariant
        # (rows ==) while per-group counts/sums scale xF; detail re-emits
        # scale xF; the purchase-click stream-stream join pairs replicas
        # on both sides -> exactly xF^2.
        "fn_array": {"rows": ("x", C), "cols": {
            "dim": ("==", 0), "first_elem": ("==", 1e-9)}, "nonneg": ["dim"]},
        "fn_bitwise": {"rows": ("x", F), "nonneg": ["low_byte"]},
        "fn_collation": {"rows": ("==",), "cols": {
            "n": ("==", 0), "bal_cents": ("==", 0)}},
        "fn_conditional": {"rows": ("x", F), "cols": {
            "at_least": ("==", 1e-9), "at_most": ("==", 1e-9)}},
        "fn_csv": {"rows": ("x", F), "cols": {
            "b": ("==", 0), "c": ("==", 1e-9)}, "nonneg": ["a", "b"]},
        "fn_date": {"rows": ("x", F), "cols": {
            "y": ("==", 0), "m": ("==", 0), "dom": ("==", 0),
            "days_since": ("==", 0)}},
        "fn_encode": {"rows": ("==",), "cols": {"c_custkey": ("==", 0)}},
        "fn_json": {"rows": ("x", F), "cols": {"k_val": ("==", 0)}},
        "fn_levenshtein": {"rows": ("==",), "cols": {
            "p_partkey": ("==", 0), "brand_type_dist": ("==", 0),
            "case_dist": ("==", 0)}},
        "fn_map": {"rows": ("x", F)},
        "fn_regex": {"rows": ("==",), "cols": {"p_partkey": ("==", 0)}},
        "fn_sql_udf": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "revenue": ("x", F, 1e-9)}, "nonneg": ["n"]},
        "fn_string": {"rows": ("==",), "cols": {
            "c_custkey": ("==", 0), "len": ("==", 0)}},
        "fn_struct": {"rows": ("x", F)},
        "fn_url": {"rows": ("x", C)},
        "fn_variant": {"rows": ("x", F), "cols": {
            "k_val": ("==", 0), "miss_val": ("==", 0)}},
        "fn_xml": {"rows": ("==",), "cols": {
            "s_suppkey": ("==", 0), "xk": ("==", 0), "xnk": ("==", 0),
            "xd": ("==", 1e-9)}},
        "ingest_roundtrip": {"rows": ("==",), "cols": {
            "r_regionkey": ("==", 0)}},
        "layout_zorder": {"rows": ("==",), "cols": {
            "zbucket": ("==", 0), "n": ("x", F, 0), "min_a": ("==", 0),
            "max_a": ("==", 0), "min_b": ("==", 0), "max_b": ("==", 0)},
            "nonneg": ["n"]},
        "layout_cluster": {"rows": ("==",), "cols": {
            "total_rows": ("x", F, 0)}, "nonneg": ["n_files", "total_rows"]},
        "maintenance_restore": {"rows": ("x", F), "cols": {
            "o_totalprice": ("==", 1e-9)}, "nonneg": ["o_orderkey"]},
        "maintenance_vacuum": {"rows": ("==",), "cols": {
            "version": ("==", 0)}},
        # n_files_before is the fixed 64-way small-file fixture; the
        # packed count follows total bytes (~linear, no closed form)
        "maintenance_compact": {"rows": ("==",), "cols": {
            "n_files_before": ("==", 0)}, "nonneg": ["n_files_after"]},
        # the %9 is_del condition is NOT replica-invariant (the orderkey
        # shift 150000 = 6 mod 9, so the delete set rotates through the
        # residue cycle {0,6,3} across replicas) -> no exact xF row count
        # and the surviving min-price row differs per replica; the floor
        # is the %2 target half that can never be deleted below
        "merge_upsert_delete": {"rows": (">=", 70 * F * 1000),
            "nonneg": ["o_orderkey"]},
        "merge_upsert_evolve": {"rows": ("x", F), "cols": {
            "o_totalprice": ("==", 1e-9)}, "nonneg": ["o_orderkey"]},
        "mm_audio_window": {"rows": ("x", C), "cols": {
            "win_id": ("==", 0), "win_sum": ("==", 0), "win_max": ("==", 0)},
            "nonneg": ["win_sum"]},
        # banded phash pairs: every doc gains C-1 exact copies (all four
        # band chunks equal), so intra-group pairs alone put a hard floor
        # under the pair count; hot buckets past the 256 cap drop by
        # design, so no closed-form total (same posture as dedup_minhash)
        "mm_dedup_phash": {"rows": (">=", 10000), "nonneg": ["hamming"]},
        "mm_dedup_phash_hex": {"rows": (">=", 10000), "nonneg": ["hamming"]},
        "mm_feature_extract": {"rows": ("x", C), "cols": {
            "n_bytes": ("==", 0)}},
        "mm_frame_sample": {"rows": ("x", C), "cols": {
            "n_frames": ("==", 0), "n_sampled": ("==", 0)}},
        "mm_meta": {"rows": ("x", C), "cols": {"n_bytes": ("==", 0)}},
        "mm_resize": {"rows": ("x", C), "cols": {"orig_bytes": ("==", 0)}},
        "mm_video_scene": {"rows": ("x", C), "cols": {
            "n_frames": ("==", 0), "n_scenes": ("==", 0)}},
        "partition_overwrite_dynamic": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9)}},
        "partitioned_write": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9)}},
        "scan_binary_files": {"rows": ("==",), "cols": {
            "length": ("==", 0)}},
        "scan_corrupt_quarantine": {"rows": ("==",), "cols": {
            "id": ("==", 0)}},
        "scan_csv_infer": {"rows": ("==",), "cols": {
            "r_regionkey": ("==", 0)}},
        "scan_file_metadata": {"rows": ("==",), "cols": {
            "n_rows": ("x", F, 0), "min_key": ("==", 0)},
            "nonneg": ["n_rows"]},
        "scan_json_infer": {"rows": ("==",), "cols": {
            "c_custkey": ("==", 0), "c_acctbal": ("==", 1e-9)}},
        "scan_json_multiline": {"rows": ("==",), "cols": {
            "c_custkey": ("==", 0), "c_acctbal": ("==", 1e-9)}},
        "scan_json_rescue": {"rows": ("==",), "cols": {
            "s_suppkey": ("==", 0), "rescued_nationkey": ("==", 0),
            "rescued_acctbal": ("==", 1e-9)}},
        "scan_merge_schema": {"rows": ("==",), "cols": {
            "c_custkey": ("==", 0)}},
        "scan_observe_metrics": {"rows": ("==",), "cols": {
            "n_rows": ("x", F, 0), "sum_cents": ("x", F, 0),
            "n_negative": ("x", F, 0)}, "nonneg": ["n_rows", "sum_cents"]},
        "scan_orc_roundtrip": {"rows": ("==",), "cols": {
            "n_nationkey": ("==", 0), "n_regionkey": ("==", 0)}},
        "scan_state_store": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_cents": ("x", F, 0)},
            "nonneg": ["n", "sum_cents"]},
        "scan_state_store_tws": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_cents": ("x", F, 0)},
            "nonneg": ["n", "sum_cents"]},
        "scan_text_lines": {"rows": ("==",), "cols": {
            "n_nationkey": ("==", 0), "n_regionkey": ("==", 0)}},
        "scan_time_travel": {"rows": ("x", F), "cols": {
            "o_totalprice": ("==", 1e-9)}, "nonneg": ["o_orderkey"]},
        "scan_xml_roundtrip": {"rows": ("==",), "cols": {
            "n_nationkey": ("==", 0), "n_regionkey": ("==", 0)}},
        "scan_zone_map": {"rows": ("==",), "cols": {
            "n_rows": ("x", F, 0), "sum_qty": ("x", F, 1e-9),
            "min_ok": ("==", 0)}, "nonneg": ["n_rows"]},
        "sql_parameterized": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "total": ("x", F, 1e-9)}, "nonneg": ["n"]},
        "sql_pipe_syntax": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_price": ("x", F, 1e-9)}, "nonneg": ["n"]},
        "sql_session_variables": {"rows": ("==",), "cols": {
            "n_above": ("x", F, 0), "min_gap": ("==", 1e-6)},
            "nonneg": ["n_above"]},
        "stream_cdc_feed": {"rows": ("==",), "cols": {
            "before_n": ("x", F, 0), "after_n": ("x", F, 0),
            "before_cents": ("x", F, 0), "after_cents": ("x", F, 0)}},
        "stream_chained_windows": {"rows": ("==",), "cols": {
            "ws_ms": ("==", 0), "n15": ("x", F, 0), "n_sub": ("==", 0)},
            "nonneg": ["n15", "n_sub"]},
        "stream_custom_state": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_cents": ("x", F, 0)},
            "nonneg": ["n", "sum_cents"]},
        "stream_dedup_state": {"rows": ("x", F), "cols": {
            "ts_ms": ("==", 0)}, "nonneg": ["event_id"]},
        "stream_dedup_within_watermark": {"rows": ("x", F), "cols": {
            "ts_ms": ("==", 0)}, "nonneg": ["event_id"]},
        "stream_file_append": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9), "ts_ms": ("==", 0)}},
        "stream_join_static": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9)}},
        "stream_manifest_ingest": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9), "ts_ms": ("==", 0)}},
        "stream_observe_metrics": {"rows": ("==",), "cols": {
            "batch_id": ("==", 0), "n_rows": ("x", F, 0),
            "sum_cents": ("x", F, 0)}, "nonneg": ["n_rows"]},
        "stream_sequence_match": {"rows": ("==",), "cols": {
            "n_purchases": ("x", F, 0), "n_converted": ("x", F, 0)},
            "nonneg": ["n_purchases", "n_converted"]},
        "stream_session_window": {"rows": ("==",), "cols": {
            "ss_ms": ("==", 0), "se_ms": ("==", 0), "n": ("x", F, 0)},
            "nonneg": ["n"]},
        "stream_sliding_agg": {"rows": ("==",), "cols": {
            "ws_ms": ("==", 0), "n": ("x", F, 0)}, "nonneg": ["n"]},
        # replicas pair on BOTH sides at identical timestamps -> xF^2
        "stream_stream_join": {"rows": ("x", F * F), "cols": {
            "p_ms": ("==", 0), "c_ms": ("==", 0)}},
        "stream_throttled_backfill": {"rows": ("x", F), "cols": {
            "value": ("==", 1e-9), "ts_ms": ("==", 0)}},
        "stream_tumbling_agg": {"rows": ("==",), "cols": {
            "ws_ms": ("==", 0), "n": ("x", F, 0),
            "sum_value": ("x", F, 1e-9)}, "nonneg": ["n"]},
        "stream_tws_init_state": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_cents": ("x", F, 0)},
            "nonneg": ["n", "sum_cents"]},
        "stream_tws_list_state": {"rows": ("==",), "cols": {
            "last_ms": ("==", 0)}},
        "stream_tws_state": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "sum_cents": ("x", F, 0),
            "n_types": ("==", 0), "max_type_n": ("x", F, 0)},
            "nonneg": ["n", "sum_cents"]},
        "stream_tws_timers": {"rows": ("==",), "cols": {
            "start_ms": ("==", 0), "end_ms": ("==", 0), "n": ("x", F, 0),
            "sum_cents": ("x", F, 0)}, "nonneg": ["n", "sum_cents"]},
        "stream_upsert_sink": {"rows": ("==",), "cols": {
            "n_events": ("x", F, 0), "last_value": ("==", 1e-9)},
            "nonneg": ["n_events"]},
        "stream_watermark_audit": {"rows": ("==",), "cols": {
            "batch_id": ("==", 0), "input_rows": ("x", F, 0),
            "wm_ms": ("==", 0)}, "nonneg": ["input_rows"]},
        # ---- r15b signal/profile batch (10 keys). Derivations:
        # window_macd/stochastic/donchian: per-fact-row windows -> rows xF;
        # EMA/range states are convex integer combos bounded by the cents
        # domain (nonneg); macd/signal/k_bp interleave differently under
        # replication (same-ts replicas sort into id-blocks), so values
        # record.
        "window_macd": {"rows": ("x", F), "nonneg": ["fast_c", "slow_c"]},
        "window_stochastic": {"rows": ("x", F), "nonneg": ["k_bp", "d_bp"]},
        "window_donchian": {"rows": ("x", F),
            "nonneg": ["c", "brk_up", "brk_dn"]},
        # every-25th rank per stratum: scaled stratum sizes are 100*n_s and
        # 25 | 100*n_s exactly, so the sample is exactly 4*n_s per stratum =
        # orders_total/25 = 600000 at rep=100 over sf0.1's 150k orders
        "sample_systematic": {"rows": (">=", 600000),
            "nonneg": ["rn", "o_orderkey"]},
        # totalprice values repeat verbatim -> identical bucket set, counts
        # xF; the seeded per-bucket noise does NOT scale (dp_n records)
        "privacy_dp_histogram": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "bucket": ("==", 0)}, "nonneg": ["n", "bucket"]},
        # corpus replicates xC with lang/text verbatim: shares/targets are
        # floor-division-invariant ((C*n*1e4) div (C*T) == (n*1e4) div T)
        "corpus_lang_balance": {"rows": ("==",), "cols": {
            "n": ("x", C, 0), "share_bp": ("==", 0), "target_bp": ("==", 0),
            "factor_bp": ("==", 0)}, "nonneg": ["n", "share_bp"]},
        # replica vec_ids shift above the vec_id<200 probe window -> the
        # probe set is the untouched originals, output byte-identical
        "emb_hubness": {"rows": ("==",), "cols": {
            "k_occ": ("==", 0)}, "nonneg": ["k_occ"]},
        "text_stopword_profile": {"rows": ("==",), "cols": {
            "n_docs": ("x", C, 0), "n_tokens": ("x", C, 0),
            "n_stop": ("x", C, 0), "stop_bp": ("==", 0)},
            "nonneg": ["n_stop", "stop_bp"]},
        "text_punct_profile": {"rows": ("==",), "cols": {
            "n_docs": ("x", C, 0), "chars": ("x", C, 0),
            "alpha_bp": ("==", 0), "digit_bp": ("==", 0),
            "space_bp": ("==", 0), "punct_bp": ("==", 0)},
            "nonneg": ["chars", "alpha_bp"]},
        # per-pair join counts scale x100 = 2 (mod 7), and 2w = 0 (mod 7)
        # iff w = 0 (7 prime) -> the sparsified edge set is EXACTLY
        # invariant (same argument as graph_components) -> identical cores
        "graph_kcore": {"rows": ("==",), "cols": {
            "in_core": ("==", 0)}, "nonneg": ["in_core", "vid"]},
        # ---- r15b second batch (5 keys). Derivations:
        # HL pseudomedian: the value domain repeats verbatim; cross-value
        # pair masses scale xF^2 but same-value masses scale w(w-1)/2 ->
        # Fw(Fw-1)/2 (not xF^2), so the weighted median can move one
        # domain gap at a boundary — 1% tolerance, one gap is ~0.2%
        "agg_hodges_lehmann": {"rows": ("==",), "cols": {
            "hl_x2": ("==", 0.01), "hl": ("==", 0.01)},
            "nonneg": ["hl_x2"]},
        # corpus replicas carry IDENTICAL payloads at shifted vec_ids, so
        # the scaled top-10 is the ref top-ranks' replica copies — row
        # count pinned, dot values recorded (max equals ref by construction
        # but the rule grammar asserts min AND max together)
        "sim_mips_topk": {"rows": ("==",)},
        # always a k=3 release; counts xF widen the gaps so the seeded
        # Gumbel perturbation flips selection with lower, not higher,
        # probability — selection recorded, rank domain pinned
        "privacy_dp_topk": {"rows": ("==",), "cols": {
            "rk": ("==", 0)}, "nonneg": ["n", "rk"]},
        "window_seasonal_ewma": {"rows": ("x", F), "cols": {
            "slot": ("==", 0)}, "nonneg": ["sea_c", "slot"]},
        # 20 sources x K=15 survivors at any corpus size; the hash-order
        # winners legitimately change under xC (new doc_ids) — rk pinned
        "corpus_source_cap": {"rows": ("==",), "cols": {
            "rk": ("==", 0)}, "nonneg": ["rk", "doc_id"]},
        # ---- r15b third batch (5 keys). Derivations:
        # daily counts scale xF uniformly -> same top-5 cells, counts xF,
        # achg_bp floor-division-invariant ((F*a*1e4) div (F*p))
        "event_dod_movers": {"rows": ("==",), "cols": {
            "rn": ("==", 0), "day": ("==", 0), "n": ("x", F, 0),
            "prev_n": ("x", F, 0), "chg": ("x", F, 0),
            "achg_bp": ("==", 0)}, "nonneg": ["n", "prev_n"]},
        # orderkey distinct scales xF (shifted keys stay distinct) while
        # custkey/date/status candidates are replica-invariant -> min/max
        # of n_distinct mix both behaviors; row count and key verdicts pin
        "dq_key_discovery": {"rows": ("==",), "cols": {
            "is_key": ("==", 0)}, "nonneg": ["n_distinct", "uniq_bp"]},
        # flips key on md5(o_orderkey) and replicas get NEW orderkeys ->
        # obs/est re-randomize (recorded); truth repeats verbatim
        "privacy_randomized_response": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "true_cnt": ("x", F, 0),
            "true_rate": ("==", 1e-9)},
            "nonneg": ["n", "true_cnt", "obs"]},
        # text/source payloads repeat verbatim -> the distinct
        # (text-hash, source) relation and hence the matrix are identical
        "dedup_cross_source_matrix": {"rows": ("==",), "cols": {
            "shared_texts": ("==", 0)}, "nonneg": ["shared_texts"]},
        # per-fact-row channel: rows xF; ema is a convex integer combo of
        # cents (nonneg); lower_c may legitimately go negative (band wider
        # than the price floor), so only the centerline is a canary
        "window_keltner": {"rows": ("x", F), "nonneg": ["c", "ema_c", "rn"]},
        # ---- r15b fourth batch (4 keys). Derivations:
        # corpus xC multiplies shingle df past the MaxShingleDf cap, so the
        # candidate pair set legitimately changes (the same reason the
        # minhash pair keys carry floors) — the 6 threshold rows pin
        "dedup_threshold_sweep": {"rows": ("==",), "cols": {
            "t_bp": ("==", 0)}, "nonneg": ["n_pairs_ge", "t_bp"]},
        # edge set invariant (the mod-7 argument) -> identical core labels
        "graph_core_decompose": {"rows": ("==",), "cols": {
            "core": ("==", 0)}, "nonneg": ["core", "vid"]},
        # cell counts xF; raking ratios are scale-invariant, so quantized
        # weights scale xF up to the re-quantization error — which is
        # ABSOLUTE (±0.5 micro-unit per scaling round, 4 rounds), so on
        # ~1e4-scale weights the relative tolerance is ~2e-4, not 1e-6
        "agg_raking_ipf": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "weight_q": ("x", F, 1e-3)},
            "nonneg": ["n", "weight_q"]},
        # daily counts xF; floor-by-28 introduces <= 1 milli absolute vs a
        # ~1e6 value at sf10 -> 1e-4 relative covers it
        "resample_wma": {"rows": ("==",), "cols": {
            "day": ("==", 0), "n": ("x", F, 0),
            "wma_milli": ("x", F, 1e-4)}, "nonneg": ["n", "wma_milli"]},
        # totalprice repeats verbatim -> bucket shares are floor-division-
        # invariant -> the scripted grid search exits at the same threshold
        "sql_scripting": {"rows": ("==",), "cols": {
            "threshold": ("==", 0), "share_bp": ("==", 0)},
            "nonneg": ["threshold", "share_bp"]},
        # value domain repeats with w xF; k = (F*n) div 10 != F*(n div 10)
        # unless 10|n, so k records; the trimmed mean itself moves at most
        # one domain gap at the trim boundary
        "agg_trimmed_mean": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "trimmed_mean": ("==", 0.01)},
            "nonneg": ["n", "k"]},
        # per-fact-row running indicator: rows xF; obv is signed by design
        "window_obv": {"rows": ("x", F), "nonneg": ["c", "rn"]},
        # ---- round-16 batch ----
        # joint cells keep their row set with w xF -> pair products
        # (concordant/discordant) scale xF^2 EXACTLY; tau's tie terms are
        # O(1/n) off exact scaling -> tight tolerance, not equality
        "agg_kendall_tau": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "concordant": ("x", F * F, 0),
            "discordant": ("x", F * F, 0), "tau_b": ("==", 1e-3)},
            "nonneg": ["n", "concordant", "discordant"]},
        # mu invariant; sample sigma's (n-1) denominator shifts O(1/n)
        "agg_cpk": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "cp": ("==", 1e-4), "cpk": ("==", 1e-4)},
            "nonneg": ["n"]},
        # per-fact-row dump: replicas interleave inside the trailing frames
        # (shifted orderkeys at equal shipdates) so frame mins/maxes move;
        # the price domain itself is invariant
        "window_ichimoku": {"rows": ("x", F), "cols": {"c": ("==", 0)},
            "nonneg": ["c", "rn", "tenkan2", "kijun2", "span_a4",
                       "span_b2"]},
        # daily H/L/C bars are invariant under exact replication (the close
        # argmax lands on a replica of the original argmax row, same value)
        # -> every pivot level byte-identical
        "window_pivot_points": {"rows": ("==",), "cols": {
            "h": ("==", 0), "l": ("==", 0), "cl": ("==", 0),
            "p3": ("==", 0), "r1_3": ("==", 0), "s1_3": ("==", 0),
            "r2_3": ("==", 0), "s2_3": ("==", 0)},
            "nonneg": ["h", "l", "cl"]},
        # replicas at identical ts interleave in the row frames -> aroon
        # values move; bp stays in [0, 10000] and the value domain holds
        "window_aroon": {"rows": ("x", F), "cols": {"c": ("==", 0)},
            "nonneg": ["c", "rn", "aroon_up_bp", "aroon_down_bp"]},
        # daily bars invariant, volume xF, and floor(F*a/(F*b)) == floor(a/b)
        # -> mfi_bp byte-identical while the flows scale exactly
        "window_mfi": {"rows": ("==",), "cols": {
            "tp3": ("==", 0), "vol": ("x", F, 0), "pos": ("x", F, 0),
            "neg": ("x", F, 0), "mfi_bp": ("==", 0)},
            "nonneg": ["tp3", "vol", "pos", "neg", "mfi_bp"]},
        # ---- round-16 second batch ----
        # replication repeats each user's events (same user_id, same types)
        # -> channel sets, conversions, coalition values, and phi all
        # byte-identical; marginals are monotone so phi >= 0
        "agg_shapley_attribution": {"rows": ("==",), "cols": {
            "phi_q24": ("==", 0), "shapley": ("==", 0)},
            "nonneg": ["phi_q24"]},
        # per-group noise is a function of the group key alone (same draw);
        # moments scale xF so the noise's relative weight shrinks -> the
        # release converges toward the true mean, never away
        "privacy_dp_mean": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "dp_mean": ("==", 0.05)}, "nonneg": ["n"]},
        # per-user paired outcomes are invariant under exact replication
        "agg_mcnemar": {"rows": ("==",), "cols": {
            "n_users": ("==", 0), "b": ("==", 0), "c": ("==", 0),
            "chi2": ("==", 1e-9)}, "nonneg": ["n_users", "b", "c"]},
        # hourly bars (hi/lo/argmax-close) are invariant under exact
        # replication -> the whole Wilder recursion is byte-identical
        "window_adx": {"rows": ("==",), "cols": {
            "di_plus_bp": ("==", 0), "di_minus_bp": ("==", 0),
            "dx_bp": ("==", 0), "adx_bp": ("==", 0)},
            "nonneg": ["di_plus_bp", "di_minus_bp", "dx_bp", "adx_bp"]},
        # per-user spend scales xF uniformly -> within-block rank order
        # (and the type tie-break) is preserved -> ranks, rank sums, and
        # the statistic are all byte-identical
        "agg_friedman_test": {"rows": ("==",), "cols": {
            "rank_sum": ("==", 0), "n_blocks": ("==", 0),
            "chi2_f": ("==", 1e-9)}, "nonneg": ["rank_sum", "n_blocks"]},
        # daily argmax closes are invariant -> the pivot path replays
        # identically
        "window_zigzag": {"rows": ("==",), "cols": {
            "pivot_day": ("==", 0), "pivot_c": ("==", 0)},
            "nonneg": ["pivot_c"]},
        # each cell keeps its FIRST 10 measurements by (orderkey, lineno, x)
        # and replicas carry strictly larger orderkeys -> the kept design is
        # byte-identical under replication, hence so is the whole table
        "agg_gage_rr": {"rows": ("==",), "cols": {
            "n": ("==", 0), "ss_operator": ("==", 1e-9),
            "ss_part": ("==", 1e-9), "ss_interaction": ("==", 1e-9),
            "ss_repeat": ("==", 1e-9), "pct_grr": ("==", 1e-9)},
            "nonneg": ["n", "ss_repeat"]},
        # moments scale xF: means invariant, SE shrinks ~1/sqrt(F) so the
        # TOST statistics legitimately grow — only the means are pinned
        "agg_tost_equivalence": {"rows": ("==",), "cols": {
            "n1": ("x", F, 0), "n2": ("x", F, 0),
            "mean_diff": ("==", 1e-6)}, "nonneg": ["n1", "n2", "se"]},
        # ---- batch 11 (round 17): robust-stats module + dedup/sim adds.
        # Replication multiplies every per-(g,x) count by F: group medians
        # and deviation VALUES are invariant, moment totals scale xF, so
        # counts pin xF and the statistics pin nonneg (F-statistics grow
        # ~xF with N by design — that is the correct sampling behavior,
        # not drift).
        "agg_levene_test": {"rows": ("==",), "cols": {
            "k": ("==", 0), "n": ("x", F, 0)}, "nonneg": ["k", "n", "f_stat"]},
        "agg_bartlett_test": {"rows": ("==",), "cols": {
            "k": ("==", 0), "n": ("x", F, 0)}, "nonneg": ["k", "n", "t_stat"]},
        "agg_cronbach_alpha": {"rows": ("==",), "cols": {
            "n": ("x", F, 0)}, "nonneg": ["n"]},
        "agg_icc": {"rows": ("==",), "cols": {
            "k": ("==", 0), "n": ("x", F, 0)}, "nonneg": ["k", "n"]},
        # same sampled users; each user's series gains F-1 interleaved
        # duplicates (zero deltas), so DW legitimately moves — the user
        # set and positivity are the invariants
        "agg_durbin_watson": {"rows": ("==",), "cols": {
            "user_id": ("==", 0)}, "nonneg": ["user_id", "n", "dw"]},
        # per-user high-value incidence flags are replication-invariant ->
        # the whole statistic is byte-identical
        "agg_cochran_q": {"rows": ("==",), "cols": {
            "blocks": ("==", 0), "q_stat": ("==", 1e-9)},
            "nonneg": ["blocks", "q_stat"]},
        "agg_moods_median": {"rows": ("==",), "cols": {
            "grand_median_c": ("==", 0), "k": ("==", 0)},
            "nonneg": ["grand_median_c", "k", "chi2"]},
        # daily maxima are invariant under replication (max of F copies)
        # -> the whole fit is byte-identical
        "agg_gumbel_fit": {"rows": ("==",), "cols": {
            "n": ("==", 0), "mean_max": ("==", 1e-9),
            "scale_beta": ("==", 1e-9), "loc_mu": ("==", 1e-9),
            "p99_return_level": ("==", 1e-9)},
            "nonneg": ["n", "mean_max", "scale_beta"]},
        "window_williams_r": {"rows": ("x", F), "nonneg": ["c", "hh", "ll"]},
        # first bar per part drops its lag -> rows = xF minus the part count
        "window_force_index": {"rows": (">=", 1000), "nonneg": ["c", "v"]},
        "window_ulcer_index": {"rows": ("x", F), "nonneg": [
            "c", "peak", "dd_bp", "ulcer_bp"]},
        # corpus x20 exact replicas: fingerprint GROUPS are unchanged (same
        # distinct texts), each gains 19 more variants
        "dedup_near_exact": {"rows": ("==",), "cols": {
            "n_variants": ("x", C, 0)}, "nonneg": ["n_variants"]},
        # every base match gains C-1 exact copies and each probe gains its
        # own C-1 cosine-1.0 replicas
        "sim_range_search": {"rows": (">=", 600), "colmax": {
            "cos_sim": (">=", 0.999999)}},
        # demo cap 1: every exact-replica band bucket saturates; each doc
        # links to its group anchor at jaccard 1.0
        "dedup_minhash_star": {"rows": (">=", 1000), "colmax": {
            "jaccard": (">=", 0.999999)}},
        # first delta per part drops its lag row
        "window_cmo": {"rows": (">=", 1000), "nonneg": ["c", "su", "sd"]},
        "window_dpo": {"rows": (">=", 1000), "nonneg": ["c"]},
        # replication preserves mean and every |x - mean| exactly; the
        # sample sd moves at the 1/n level so only max_dev pins
        "agg_grubbs_test": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "max_dev": ("==", 1e-6)},
            "nonneg": ["n", "max_dev", "g_stat"]},
        # per-user cent totals scale xF uniformly -> every pairwise
        # comparison, sign, |d| ordering and tie structure is preserved ->
        # the whole statistic is byte-identical
        "agg_sign_test": {"rows": ("==",), "cols": {
            "n_plus": ("==", 0), "n_minus": ("==", 0), "z": ("==", 1e-9)},
            "nonneg": ["n_plus", "n_minus"]},
        "agg_wilcoxon_signed_rank": {"rows": ("==",), "cols": {
            "n": ("==", 0), "w_plus": ("==", 1e-9), "z": ("==", 1e-9)},
            "nonneg": ["n", "w_plus"]},
        # means invariant, weights scale ~xF -> F_w legitimately grows
        "agg_welch_anova": {"rows": ("==",), "cols": {
            "k": ("==", 0)}, "nonneg": ["k", "f_welch"]},
        # corpus replicas add exact copies (incl. the probe's own at
        # cosine 1.0); bucket domain stays [-10, 10]
        "emb_cosine_histogram": {"rows": (">=", 1), "nonneg": ["n"]},
        # raw power sums scale xF exactly -> the moment RATIOS (and hence
        # S and K) are invariant to float rounding of >2^53 sums; JB
        # itself legitimately grows xF
        "agg_jarque_bera": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "skewness": ("==", 1e-4),
            "excess_kurtosis": ("==", 1e-4)}, "nonneg": ["n", "jb_stat"]},
        "window_awesome_oscillator": {"rows": (">=", 1000),
            "nonneg": ["c", "s5", "s34"]},
        "window_price_roc": {"rows": (">=", 1000), "nonneg": ["c", "pc"]},
        # ---- r18: LSH-blocked hubness (top-100 readout is size-stable;
        # replica floods re-rank the hubs, so only the shape is invariant)
        "emb_hubness_ann": {"rows": ("==",), "nonneg": ["k_occ", "vec_id"]},
        # ---- r18 rank-test batch: per-user totals scale xF uniformly ->
        # pooled order, ties, and ranks are preserved -> the statistics
        # are byte-identical (ansari/cvm/page); jonckheere runs on RAW
        # event values whose per-value counts scale xF, so 2*JT scales
        # exactly xF^2 while z legitimately grows ~sqrt(F)
        "agg_ansari_bradley": {"rows": ("==",), "cols": {
            "n": ("==", 0), "m": ("==", 0), "ab2": ("==", 0),
            "z": ("==", 1e-9)}, "nonneg": ["n", "m", "ab2"]},
        "agg_cvm_test": {"rows": ("==",), "cols": {
            "n": ("==", 0), "m": ("==", 0), "u4": ("==", 1e-9),
            "t_stat": ("==", 1e-9)}, "nonneg": ["n", "m", "u4"]},
        "agg_jonckheere": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "jt2": ("x", F * F, 0)},
            "nonneg": ["n", "jt2"]},
        "agg_page_trend": {"rows": ("==",), "cols": {
            "b": ("==", 0), "k": ("==", 0), "l2": ("==", 0),
            "z": ("==", 1e-9)}, "nonneg": ["b", "k", "l2"]},
        # extremes invariant; a singleton extreme may gain F-1 copies, so
        # the gap ratios legitimately collapse to 0 there
        "agg_dixon_q": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "min_c": ("==", 0), "max_c": ("==", 0)},
            "nonneg": ["n"]},
        # hourly bars are invariant under fact replication (same values,
        # same hours; the close-struct max shifts only event_id, value
        # unchanged) -> vortex and mass index are byte-identical
        "window_vortex": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "vi_plus": ("==", 1e-9),
            "vi_minus": ("==", 1e-9)}, "nonneg": ["vi_plus", "vi_minus"]},
        "window_mass_index": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "mass_q": ("==", 0),
            "mass_index": ("==", 1e-9)}, "nonneg": ["mass_q"]},
        # per-part series grow xF -> different EMA/ROC paths by design
        "window_coppock": {"rows": (">=", 1000)},
        "window_trix": {"rows": (">=", 1000), "nonneg": ["e3_c"]},
        "text_gunning_fog": {"rows": ("x", C), "cols": {
            "n_sentences": ("==", 0), "n_words": ("==", 0),
            "n_complex": ("==", 0), "fog_index": ("==", 1e-9)},
            "nonneg": ["n_sentences", "n_words", "n_complex",
                       "fog_index"]},
        # ---- r18 batch 2: grid-association family — cell counts scale
        # xF, so C/D pair counts scale exactly xF^2 and every RATIO
        # measure is invariant (somers' tie term t(t-1) is not an exact
        # xF^2 scale, so d drifts O(1/(F*t)) — looser tol)
        "agg_gk_gamma": {"rows": ("==",), "cols": {
            "concordant": ("x", F * F, 1e-9),
            "discordant": ("x", F * F, 1e-9), "gamma": ("==", 1e-9)},
            "nonneg": ["concordant", "discordant"]},
        "agg_somers_d": {"rows": ("==",), "cols": {
            "concordant": ("x", F * F, 1e-9),
            "discordant": ("x", F * F, 1e-9), "somers_d": ("==", 1e-3)},
            "nonneg": ["concordant", "discordant"]},
        "agg_stuart_tau_c": {"rows": ("==",), "cols": {
            "n": ("x", F, 0), "m": ("==", 0), "tau_c": ("==", 1e-9)},
            "nonneg": ["n", "m"]},
        "agg_blomqvist_beta": {"rows": ("==",), "cols": {
            "n1": ("x", F, 0), "n2": ("x", F, 0), "n3": ("x", F, 0),
            "n4": ("x", F, 0), "beta": ("==", 1e-9)},
            "nonneg": ["n1", "n2", "n3", "n4"]},
        # cell probabilities invariant -> per-cell quantized entropy terms
        # byte-identical -> H and U exact
        "agg_theil_u": {"rows": ("==",), "cols": {
            "h_x": ("==", 1e-9), "h_y": ("==", 1e-9),
            "h_xy": ("==", 1e-9), "u_y_given_x": ("==", 1e-9)},
            "nonneg": ["h_x", "h_y", "h_xy", "u_y_given_x"]},
        # hourly bars invariant (open/close struct extremes shift only
        # event_id, value unchanged) -> byte-identical indicator series
        "window_qstick": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "s8": ("==", 0),
            "qstick_c": ("==", 1e-9)}},
        "window_bop": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "s14": ("==", 0),
            "bop_sma": ("==", 1e-9)}},
        "window_elder_ray": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "ema_c": ("==", 0),
            "bull_power": ("==", 0), "bear_power": ("==", 0)},
            "nonneg": ["ema_c"]},
        # ---- r18 batch 3: agreement family on per-user paired totals —
        # totals scale xF uniformly, so ranks (kendall_w) and every RATIO
        # (ccc, deming slope) are invariant; absolute-unit outputs
        # (bland-altman bounds, deming intercept) scale xF
        "agg_kendall_w": {"rows": ("==",), "cols": {
            "b": ("==", 0), "k": ("==", 0), "w": ("==", 1e-9)},
            "nonneg": ["b", "k"]},
        "agg_lin_ccc": {"rows": ("==",), "cols": {
            "n": ("==", 0), "ccc": ("==", 1e-9)}, "nonneg": ["n"]},
        "agg_bland_altman": {"rows": ("==",), "cols": {
            "n": ("==", 0), "mean_diff": ("x", F, 1e-9),
            "sd_diff": ("x", F, 1e-9), "loa_low": ("x", F, 1e-9),
            "loa_high": ("x", F, 1e-9)}, "nonneg": ["n", "sd_diff"]},
        "agg_deming_regression": {"rows": ("==",), "cols": {
            "n": ("==", 0), "slope": ("==", 1e-9),
            "intercept_usd": ("x", F, 1e-9)}, "nonneg": ["n"]},
        # ---- r18 batch 4: daily series scale xF uniformly -> mean-cleared
        # y scales xF, autocovariances xF^2, every rho and hence Q is
        # invariant; the daily sign sequence is invariant -> runs identical;
        # hourly bars invariant -> chandelier/heikin-ashi byte-identical
        "agg_ljung_box": {"rows": ("==",), "cols": {
            "n": ("==", 0), "q_stat": ("==", 1e-6)},
            "nonneg": ["n", "q_stat"]},
        "agg_runs_up_down": {"rows": ("==",), "cols": {
            "n": ("==", 0), "runs": ("==", 0), "z": ("==", 1e-9)},
            "nonneg": ["n", "runs"]},
        "window_chandelier_exit": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "long_exit_micro": ("==", 0),
            "short_exit_micro": ("==", 0)}},
        "resample_heikin_ashi": {"rows": ("==",), "cols": {
            "hour_idx": ("==", 0), "ha_open": ("==", 0),
            "ha_high": ("==", 0), "ha_low": ("==", 0),
            "ha_close": ("==", 0)},
            "nonneg": ["ha_open", "ha_high", "ha_low", "ha_close"]},
    }


# Corpus replication past the MaxShingleDf / MaxBandBucket skew caps (64)
# flips the similarity-path expectations BY DESIGN (r16 corpus-x200 probe):
# every shingle/band bucket of a >64-way duplicate group exceeds the cap,
# so the capped candidate paths emit EXACTLY zero pairs for it (asserting 0
# proves the cap engages cleanly instead of going quadratic), while the
# CLUSTERING keys keep full recall through the linear exact-duplicate star
# edges (LlmOps.exactStarEdges) and must still cluster every replica group.
def cap_overrides(r):
    for k in ("dedup_ngram_jaccard", "dedup_containment", "dedup_minhash"):
        r[k] = {"rows": ("==0",)}
    r["dedup_clusters"] = {"rows": (">=", 100000), "colmax": {
        "cluster_size": (">=", C)}}
    # the r17 recall pass must be NON-zero past the caps — that is its job:
    # every replica links to its group anchor at jaccard 1.0
    r["dedup_minhash_star"] = {"rows": (">=", 100000), "colmax": {
        "jaccard": (">=", 0.999999)}}
    return r


def is_bad_float(v):
    return isinstance(v, str) or (v is not None and (v != v))


def main():
    global F, C
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("scaled")
    ap.add_argument("--facts", type=int, default=100)
    ap.add_argument("--corpus", type=int, default=20)
    a = ap.parse_args()
    F, C = a.facts, a.corpus
    ref = json.load(open(a.ref))
    big = json.load(open(a.scaled))
    R = rules()
    if C > 64:  # past MaxShingleDf / MaxBandBucket — see cap_overrides
        R = cap_overrides(R)
    ok, fail = [], []
    for k in ref:
        notes = []
        bad = []
        r, b = ref.get(k), big.get(k)
        if not b:
            fail.append((k, ["missing from scaled run"])); continue
        if not b.get("ok"):
            fail.append((k, [f"scaled run FAILED: {b.get('error')}"]))
            continue
        if not r.get("ok"):
            fail.append((k, [f"reference run FAILED: {r.get('error')}"]))
            continue
        rule = R.get(k, {})
        # overflow canaries first — they apply to every numeric column
        for c, st in b.get("cols", {}).items():
            for bound in ("min", "max"):
                if is_bad_float(st[bound]):
                    bad.append(f"col {c} {bound} is {st[bound]!r} "
                               "(NaN/Inf canary)")
        for c in rule.get("nonneg", []):
            st = b["cols"].get(c)
            if st and st["min"] is not None and st["min"] < 0:
                bad.append(f"col {c} min {st['min']} < 0 (overflow canary)")
        rr = rule.get("rows", ("record",))
        if rr[0] == "==0" and b["rows"] != 0:
            bad.append(f"rows {b['rows']} != 0 (cap must engage cleanly)")
        elif rr[0] == "==" and b["rows"] != r["rows"]:
            bad.append(f"rows {b['rows']} != ref {r['rows']}")
        elif rr[0] == "x" and b["rows"] != r["rows"] * rr[1]:
            bad.append(f"rows {b['rows']} != ref {r['rows']} x{rr[1]}")
        elif rr[0] == ">=" and b["rows"] < rr[1]:
            bad.append(f"rows {b['rows']} < floor {rr[1]}")
        for c, (op, *rest) in rule.get("cols", {}).items():
            for bound in ("min", "max"):
                rv, bv = r["cols"][c][bound], b["cols"][c][bound]
                if is_bad_float(rv) or is_bad_float(bv):
                    continue  # already flagged above
                if rv is None or bv is None:
                    if rv != bv:
                        bad.append(f"col {c} {bound}: {bv} vs ref {rv}")
                    continue
                want = rv * rest[0] if op == "x" else rv
                tol = rest[-1]
                lim = tol * max(abs(want), 1e-12)
                if abs(bv - want) > lim:
                    bad.append(f"col {c} {bound}: {bv} != {want} "
                               f"(ref {rv}, rule {op}{rest})")
        for fld, key in (("colmin", "min"), ("colmax", "max")):
            for c, (op, thr) in rule.get(fld, {}).items():
                v = b["cols"][c][key]
                if is_bad_float(v) or v is None or v < thr:
                    bad.append(f"col {c} {key} {v} < {thr}")
        notes.append(f"{r['secs']:.1f}s -> {b['secs']:.1f}s "
                     f"({b['secs'] / max(r['secs'], 1e-9):.1f}x wall), "
                     f"rows {r['rows']} -> {b['rows']}")
        if bad:
            fail.append((k, bad + notes))
        else:
            ok.append((k, notes[0]))
    for k, m in ok:
        print(f"PASS {k}: {m}")
    for k, ms in fail:
        print(f"FAIL {k}: " + "; ".join(ms))
    print(f"\n{len(ok)} pass, {len(fail)} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
