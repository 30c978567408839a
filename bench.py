"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Env:
  SPARK_GRAFT_SF_DIR  fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Each query is fully executed via collect() (all results are aggregate- or
top-k-sized). Timings are per-query wall clock after a session warm-up.

Noise control: every query runs ITERS (≥3) times and the reported number
is the per-query MINIMUM — the steady-state cost of the plan, immune to
one co-tenant CPU spike (the r02 bench recorded a uniform ~20% drift on
untouched queries from machine load alone). All iterations are published
under "iterations_sec" so the variance is visible, not hidden.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-3 operators timed ONCE per run (cold, incl. codegen) and
# published under "extended_queries": evidence at sf0.1 without changing
# the round-over-round comparable HEADLINE set.
EXTENDED = [
    "ann_pq_adc",
    "ann_ivf_pq_adc",
    "event_funnel",
    "retention_cohorts",
    "events_gap_fill",
    "heavy_hitter_terms",
    "bm25_rank",
    "doc_dup_ngram_fraction",
    "decontamination",
    "seq_packing",
    "pii_redaction",
    "quality_weighted_sample",
    "sketch_distinct_bounds",
    "sketch_quantile_bounds",
    "fk_integrity_audit",
    # round-4 additions
    "zorder_layout",
    "tfidf_top_terms",
    "term_cooccurrence",
    "time_weighted_avg",
    "embedding_quantization_error",
    "pagerank_nations",
    "compaction_plan",
    "moving_avg_daily",
    "markov_transitions",
    "skew_salted_agg",
    "scd2_history",
    "bigram_lm",
    "winsorized_stats",
    "reservoir_sample",
    "incremental_rollup_merge",
    "source_lang_drift",
    "equi_depth_deciles",
    # round-5 additions
    "equi_depth_deciles_approx",
    "winsorized_stats_approx",
    "cross_doc_spans",
    "span_dedup_survivors",
    "intra_doc_repeats",
    "cdc_merge_apply",
    "embedding_decontamination",
    "content_defined_chunks",
    "mad_outliers",
    "flag_status_grouping_sets",
    "mixture_resample",
    "ewma_user_value",
    "nation_pair_trade",
    "order_window_functions",
    "ann_ivf_pq_refine",
    "cluster_safe_split",
    "similarity_gemm_topk",
    "priority_waiting_orders",
    "small_quantity_revenue",
    "cms_token_frequency",
    "hll_partition_merge",
    # round-6 additions
    "shipping_priority",
    "customer_order_distribution",
    "bpe_merge_candidates",
    "token_novelty_curve",
    "sliding_distinct_users",
    "sliding_distinct_users_approx",
    "cluster_keep_best",
    "user_value_trend",
    "embedding_dim_stats",
    "lang_id_confusion",
    "nation_type_revenue_other",
    "nation_market_share",
    "nation_year_profit",
    "top_revenue_supplier",
    "part_supplier_variety",
    "large_volume_orders",
    "disjunctive_brand_revenue",
    "waiting_supplier_orders",
    "idle_customer_balances",
    "similarity_triangle_count",
    "vocab_frequency_spectrum",
    "concurrent_sessions_curve",
    "partitioned_scan_prune",
    "flag_month_unpivot",
    "source_lang_chi2",
    "schema_evolution_read",
    # round-6h: the last four classic TPC-H shapes
    "forecast_revenue_change",
    "returned_item_revenue",
    "important_part_value",
    "min_cost_supplier",
    # round-7 rotation batch (streaming_heavy_hitters excluded: per-call
    # source copy + two checkpointed streaming runs, scaffolding-dominated
    # like the other streaming queries below)
    "priority_shipping_months",
    "promo_revenue_share",
    "dominant_part_suppliers",
    "dedup_incremental_batch",
    "rolling_7d_revenue",
    "asof_tolerance_attribution",
    # round-7b additions (streaming_ewma_value excluded: same per-call
    # streaming scaffolding)
    "embedding_covariance",
    "priority_sample_wor",
    "collocation_lift",
    "locf_gap_fill",
    "revenue_concentration",
    "asof_nearest_attribution",
    # round-7c additions
    "bucketed_interval_attribution",
    "incremental_join_delta",
    "holt_linear_trend",
    "event_debounce",
    "yoy_nation_growth",
    # round-7d additions
    "bpe_iterative_merges",
    "readability_scores",
    # round-7e additions
    "key_skew_report",
    "weekly_seasonal_anomalies",
    # round-7f additions
    "audience_overlap_minhash",
    # round-7g additions
    "funnel_conversion_ci",
    "hierarchical_share_rollup",
    # round-7h additions
    "hard_negative_mining",
    "cusum_change_points",
    # round-7i additions
    "bootstrap_mean_ci",
    "value_decile_conversion",
    # round-7j additions
    "survival_curve",
    "cluster_size_distribution",
    # round-8 additions
    "basket_type_lift",
    "funnel_time_percentiles",
    "intra_doc_repeats_planted",
    "rfm_segments",
    "brand_price_ols",
    "cuped_adjusted_lift",
    "supplier_part_cosine",
    "doc_containment",
    "nation_seat_apportionment",
    "user_active_coverage",
    "window_funnel_anchors",
    "weighted_price_quantiles",
    "benford_first_digit",
    "token_fertility_by_lang",
    "gini_by_nation",
    "session_path_topk",
    "source_contamination_matrix",
    # stream_static_enrichment excluded: per-call source copy + a
    # checkpointed streaming job — scaffolding-dominated like
    # streaming_sessions below
    # streaming_dedup_survivors excluded: per-call source copy + two
    # checkpointed streaming runs — scaffolding-dominated like
    # streaming_sessions below
    # bucketed_colocated_join excluded: each call WRITES both bucketed
    # tables (the one-time ingest cost it exists to demonstrate); timing
    # that write per-iteration would measure the layout build, not a query
    # streaming_sessions excluded for the same scaffolding reason as
    # streaming_click_attribution (per-call source copy + checkpoint)
    # streaming_click_attribution excluded: it writes its own source
    # parquet + runs a checkpointed streaming job per call — wall-clock
    # is dominated by that scaffolding, not the operator
    # fuzzy_name_pairs is excluded: on TPC-H's zero-padded names the TRUE
    # lev<=3 answer at sf0.1 is ~28M pairs (25% of all pairs), so the
    # run is output-bound (~150 s) and would triple bench wall-clock;
    # see operators/fuzzy.py for the density analysis.
    # round-8e ML-pipeline batch
    "value_drift_tvd",
    "multi_touch_attribution",
    "stratified_kfold_balance",
    "target_encoding_loo",
    "ks_cohort_distance",
    # round-8f time-series / cohort-test batch
    "daily_autocorr",
    "mannwhitney_u_cohorts",
    "temporal_split_leakage",
    # round-8g CH aggregate-dialect parity
    "ch_retention_agg",
    "ch_sequence_match",
    # round-8h CH combinators + robust/agreement statistics
    "ch_if_combinators",
    "ch_delta_sum",
    "theilsen_daily_trend",
    "hellinger_source_drift",
    "cohens_kappa_quality",
    # round-8i hybrid retrieval, drift, layout, forecast
    "ann_rank_fusion",
    "wasserstein_value_drift",
    "zone_map_prune_estimate",
    "mase_seasonal_baseline",
    # round-8j dialect + experiment/feature audits
    "ch_arg_min_max",
    "user_step_bitmask",
    "feature_hashing_collisions",
    "ab_srm_check",
    # round-8k embedding linalg + ranking eval
    "pca_variance_explained",
    "embedding_whitening_check",
    "ann_ndcg_eval",
    # round-8l graph shape + arrival process
    "graph_degree_distribution",
    "graph_assortativity",
    "arrival_dispersion_index",
    # round-9 model-eval / feature-audit batch
    "auc_exact",
    "pr_curve_thresholds",
    "calibration_ece",
    "welch_ttest_ab",
    "psi_feature_stability",
    "categorical_association",
    "gini_split_gain",
    "knn_label_noise",
    # round-9b corpus quality-filtering batch
    "quality_filter_funnel",
    "doc_perplexity_buckets",
    "oov_rate_by_lang",
    # round-12 crawl-ingest SQL slice (registered at the r12 flip;
    # ~13 s cold total at sf0.1 self-measured — the HTML-extract and
    # paragraph-hash Arrow edges are the operators under time)
    "paragraph_dedup_stats",
    "psl_domain_histogram",
    "canonical_url_dedup_stats",
    "extracted_text_funnel",
    # round-13 crawl-frontier slice (registered at the r13 flip):
    # robots parse + broadcast longest-match, sitemap XML Arrow edge,
    # WAT string-JSON path pruning
    "robots_allowed_rate",
    "sitemap_frontier_stats",
    "wat_link_histogram",
]

HEADLINE = [
    # reference-parity core
    "partition_diff",
    "partition_stats",
    "table_fingerprint",
    "partition_fingerprints",
    "schema_align",
    # analytics
    "pricing_summary",
    "orders_by_nation",
    "top_parts_by_quantity",
    "events_multikey_stats",
    # training-data pipeline
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_stats",
    "text_quality",
    "token_counts",
    "similarity_brute_topk",
    "similarity_lsh_topk",
    "dedup_embedding_cosine",
    # round-1 additions: windows, temporal joins, rollups, winnowing
    "customer_running_totals",
    "event_sessions",
    "asof_join_status",
    "hypertable_rollup",
    "doc_winnowing",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # Self-calibration (round-8 verdict item): a 2 s Spark-free probe of
    # the host's EFFECTIVE parallelism runs before and after the sweep
    # and is stamped into both outputs. local[N] wall-clock scales with
    # effective cores, which co-tenant load has twice pushed to 4-12 on
    # this 32-CPU host with no cgroup visible (r6, r8: uniform +52%
    # "regressions" on untouched plans) — the stamp turns every record
    # into evidence that distinguishes host drift from plan changes.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from probe_host import probe

    probe_before = probe()

    # The JVM writes startup banners straight to fd 1; contract is ONE JSON
    # line on stdout. Point fd 1 at stderr for the run, restore at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    import __spark_entry__ as entry
    from clickhouse_table_copier_spark.session import get_spark

    spark = get_spark(
        app_name="ctc-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    # warm-up: JVM JIT, codegen, shuffle machinery, parquet footers — one
    # untimed flagship run so per-query numbers measure steady-state work
    spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet").count()
    qs["partition_diff"](spark, sf_dir).collect()

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    ext_names = [n for n in EXTENDED if n in qs]
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE + ext_names}
    # round-robin over iterations (not per-query back-to-back) so a
    # transient load spike hits different queries in different passes.
    # HEADLINE iterates FIRST and alone, THEN the extended set: once
    # EXTENDED grew past ~70 queries (r6), interleaving both in one loop
    # inflated headline minimums ~20% (measured 26.3 vs 22.0 s at sf0.1 —
    # JVM heap/code-cache pressure from the 3× wider working set), which
    # would have broken round-over-round comparability of the headline.
    # ranks.py mechanisms persist one frame per CALL with caller-owned
    # lifetime (round-8 ADVICE): release between timed queries, outside
    # the timing window, so 3 iterations × N consumers don't accumulate
    # storage-memory pressure. This targets ONLY ranks-module caches —
    # the shared artifact cache (queries_pipeline) must stay warm.
    from clickhouse_table_copier_spark.operators.ranks import release_caches

    for _ in range(iters):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_caches()
    for _ in range(iters):
        for name in ext_names:
            fn = qs[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_caches()

    extended = {name: min(runs[name]) for name in ext_names}
    timings = {name: min(runs[name]) for name in HEADLINE}
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Per-iteration detail goes to a side file: the r03 bench JSON outgrew
    # the driver's tail capture once iterations_sec was inlined, truncating
    # the headline ("parsed": null). stdout stays ONE compact line, LAST.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # The stdout line carries ONLY the headline block: the r05 line grew
    # past the driver's tail capture once 50+ extended queries were
    # inlined ("parsed": null). Extended mins + per-iteration series live
    # in BENCH_DETAIL.json.
    probe_after = probe()
    with open(detail_path, "w") as f:
        json.dump(
            {
                "iterations": iters,
                "iterations_sec": runs,
                "extended_queries": extended,
                # methodology tag (ADVICE r4): extended numbers switched
                # from one-shot cold (≤ r03) to min-of-N warm (≥ r04) —
                # consumers must not compare across that boundary
                "extended_timing": "min_warm",
                "host_probe_before": probe_before,
                "host_probe_after": probe_after,
                "sf": sf_val,
            },
            f,
            indent=1,
        )
    # Record-integrity stamps (VERDICT r11 "What's wrong #3"): the
    # official record regressed two rounds running purely on host
    # noise (probes 12-17 of 32 cores, zero plan changes).  A headline
    # measured on an unhealthy host is explicitly ADVISORY, and the
    # best committed record rides along so upward drift can never
    # compound silently into a new "baseline".
    healthy = bool(
        probe_before.get("healthy") and probe_after.get("healthy")
    )
    best_committed = None
    for p in sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r*.json",
            )
        )
    ):
        try:
            with open(p) as f:
                rec = json.load(f).get("parsed") or {}
            v = rec.get("value")
            # float-normalize BOTH sides (ADVICE r12): a committed
            # record that stored sf as a string ('0.1' vs 0.1) must
            # not be silently skipped, or best_committed under-reports
            if (
                isinstance(v, (int, float))
                and float(rec.get("sf", "nan")) == float(sf_val)
                and (best_committed is None or v < best_committed)
            ):
                best_committed = v
        except (OSError, ValueError, TypeError):
            continue
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "headline_timing": "min_warm",
            "iterations": iters,
            # min of the before/after effective-core readings: the
            # pessimistic bound on the host during this record
            "host_effective_cores": min(
                probe_before["effective_cores"],
                probe_after["effective_cores"],
            ),
            "host_healthy": healthy,
            "headline_status": "official" if healthy else "advisory",
            "best_committed_sec": best_committed,
            "sf": sf_val,
        }
    )
    os.dup2(real_stdout, 1)
    print(line, flush=True)


if __name__ == "__main__":
    main()
