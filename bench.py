"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints the full JSON result line
{"queries": {...}, "metric": ..., "unit": "sec", "sf": ..., "value": total_sec}
followed by the driver-contract line (same headline fields plus the
heaviest queries' medians, packed to stay inside the driver's ~2.0 KB
stdout tail capture — see contract_line), and writes the full result to
bench_last.json.

Each query is forced with a full materialization to the driver via the
Arrow path (toPandas) — every value crosses to the driver, but through
columnar Arrow batches instead of per-row Py4J pickling, which is the
consumption pattern any real client of this engine would use. Time
includes plan + execution + transfer, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "store_merge_snapshot",
    "store_time_travel",
    "store_erasure_vacuum",
    "store_compaction",
    "store_stats_pruning",
    "store_change_feed",
    "store_schema_evolution",
    "store_history",
    "store_cdf_replay",
    "store_partition_pruning",
    "store_bloom_pruning",
    "store_pushdown_scan",
    "store_timewindow_scan",
    "store_writer_scan",
    "store_writer_partitioned",
    "store_log_retention",
    "store_zorder_scan",
    "store_restore",
    "streaming_store_merge",
    "streaming_store_cdf",
    "streaming_store_replica",
    "dedup_prefix_jaccard_topk",
    "text_pmi_collocations",
    "analytics_acf_daily",
    "streaming_acf_daily",
    "text_hashed_classifier",
    "similarity_pca_variance",
    "dedup_fellegi_sunter",
    "profile_t_closeness",
    "profile_kll_quantiles",
    "streaming_store_mutations",
    "text_phrase_search",
    "profile_expectation_suite",
    "dedup_sorted_neighborhood",
    "trade_vp_roundtrip",
    "credstore_apply_mutations",
    "trade_did_discovery",
    "text_dsir_weights",
    "profile_kmv_sets",
    "tpch_important_parts",
    "analytics_cohort_ltv",
    "range_interval_union",
    "multimodal_phash_pairs",
    "multimodal_scene_cuts",
    "dedup_soft_weights",
    "text_gopher_rules",
    "similarity_ivfpq_ndcg",
    "scd2_apply_changes",
    "metrics_histogram_rebucket",
    "source_jsonl_roundtrip",
    "source_orc_roundtrip",
    "source_schema_catalog",
    "source_avro_ocf_roundtrip",
    "tpch_shipmode_priority",
    "analytics_cusum_changepoint",
    "analytics_seasonal_decompose",
    "analytics_holt_forecast",
    "analytics_theil_sen_trend",
    "analytics_gini_concentration",
    "analytics_survival_churn",
    "tpch_supplier_hhi",
    "dedup_lsh_tuning",
    "dedup_minhash_accuracy",
    "dedup_soft_weight_ess",
    "graph_neardup_degree_hist",
    "graph_partition_modularity",
    "text_language_confusion",
    "trade_bollinger_bands",
    "sampling_bootstrap_ci",
    "text_substring_scrub",
    "analytics_incremental_join_mv",
    "tpch_grouping_sets",
    "graph_hierarchy_rollup",
    "dedup_prefix_jaccard_pairs",
    "sampling_weighted_reservoir",
    "analytics_pareto_skyline",
    "analytics_ab_cuped",
    "analytics_shapley_attribution",
    "transform_zonemap_pruning",
    "graph_bfs_reach",
    "sampling_neyman_allocation",
    "analytics_ab_srm",
    "analytics_sprt_monitor",
    "analytics_ab_power",
    "analytics_mann_whitney",
    "analytics_ab_did",
    "transform_compaction_plan",
    "transform_gdpr_erasure",
    "profile_mutual_information",
    "profile_functional_deps",
    "tpch_bucketed_join",
    "analytics_quantile_rollup",
    "analytics_set_algebra",
    "analytics_bitmap_rollup",
    "tpch_bloom_filter_join",
    "text_winnowing_fingerprints",
    "sampling_reservoir",
    "tpch_pricing_summary",
    "tpch_local_supplier_volume",
    "tpch_top_customers",
    "tpch_returnflag_rollup",
    "tpch_volume_shipping",
    "tpch_waiting_orders",
    "analytics_event_funnel",
    "analytics_session_windows",
    "asof_last_touch",
    "dedup_near_dup_clusters",
    "text_clean_corpus",
    "similarity_kmeans_refine",
    "analytics_throughput_30s",
    "analytics_sliding_rate",
    "analytics_p95_histogram",
    "trade_envelope",
    "trade_sign_verify",
    "wire_avro_roundtrip",
    "wire_proto_roundtrip",
    "wire_proto_payload_sizes",
    "wire_jwe_roundtrip",
    "trade_shared_secret",
    "trade_did_components",
    "trade_eth_tx_sign",
    "dedup_exact_events",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "text_quality_score",
    "similarity_brute_topk",
    "similarity_lsh_buckets",
    "similarity_ivf_topk",
    "similarity_ivf_probe_sweep",
    "multimodal_decode",
    "streaming_throughput_30s",
    "range_band_pricing",
    "range_session_overlap",
    "analytics_peak_concurrency",
    "asof_nearest_event",
    "scd2_customer_tiers",
    "sampling_train_split",
    "sampling_group_kfold",
    "text_tfidf_top_terms",
    "analytics_rolling_hourly_avg",
    "analytics_cdc_compaction",
    "analytics_multigrain_rollup",
    "profile_columns",
    "graph_pagerank_neardup",
    "graph_hits_purchase",
    "similarity_semantic_dedup",
    "analytics_mad_outliers",
    "analytics_ewma_smoothing",
    "analytics_incremental_mv",
    "transform_zorder_layout",
    "text_boilerplate_scrub",
    "dedup_fuzzy_name_pairs",
    "analytics_market_basket",
    "transform_sequence_pack",
    "transform_span_corruption",
    "text_chunk_windows",
    "text_char_entropy",
    "text_bigram_lm_score",
    "text_kn_bigram_score",
    "dedup_incremental",
    "profile_correlations",
    "analytics_ks_drift",
    "similarity_embedding_drift",
    "profile_quality_checks",
    "transform_snapshot_diff",
    "analytics_rolling_distinct_users",
    "sampling_weighted",
    "pipeline_provider_matrix",
    "credstore_vcs_by_claims",
    "credstore_paginated",
    "credstore_identifiers",
    "credstore_messages",
    "credstore_sdr_match",
    "credstore_sdr_validate",
    "similarity_ivf_recall",
    "similarity_retrieval_mrr_map",
    "similarity_late_interaction",
    "similarity_late_interaction_ivf",
    "profile_k_anonymity",
    "profile_l_diversity",
    "profile_referential_integrity",
    "profile_partition_skew",
    "analytics_trimmed_stats",
    "analytics_hh_turnover",
    "analytics_markov_kstep",
    "dedup_quality_canonical",
    "dedup_decontaminated_split",
    "sampling_token_budget_mix",
    "dedup_cross_source_matrix",
    "text_dup_ngrams",
    "text_intra_repetition",
    "text_perplexity_buckets",
    "transform_length_batches",
    "similarity_pq_topk",
    "similarity_pq_recall",
    "text_bm25_search",
    "text_hybrid_rrf",
    "similarity_hybrid_rrf",
    "similarity_mmr_rerank",
    "similarity_truncated_recall",
    "profile_benford_audit",
    "trade_realized_vol",
    "profile_cms_heavy_hitters",
    "similarity_ivfpq_topk",
    "wire_schema_evolution",
    "transform_training_shuffle",
    "wire_corrupt_route",
    "text_bpe_train",
    "similarity_ivfpq_recall",
    "streaming_cms_grid",
    "sampling_temperature_mix",
    "streaming_sign_verify",
    "streaming_provider_matrix",
    "streaming_neardup_gate",
    "streaming_ivf_ingest",
    "streaming_curation_gate",
    "streaming_online_dedup",
    "streaming_ab_monitor",
    "streaming_sprt_monitor",
    "streaming_holt_forecast",
    "streaming_event_transitions",
    "streaming_burn_rate",
    "streaming_l_diversity",
    "streaming_k_anonymity",
    "metrics_burn_rate",
]


# The driver tail-parses only ~2.0 KB of stdout; a line longer than that
# yields "parsed": null and loses the round's headline number (round-2
# incident). Budget chosen with ~60 B of safety under 2000.
CONTRACT_LINE_BUDGET = 1940


def contract_line(result: dict, budget: int = CONTRACT_LINE_BUDGET) -> str:
    """Build the final driver-contract stdout line.

    Carries the headline fields plus a ``queries`` map with as many
    per-query medians (2 dp) as fit in ``budget`` bytes, heaviest
    first — the complete map lives in bench_last.json and the preceding
    full stdout line. Deterministic: ties break on name.
    """
    per_query = result["queries"]
    summary = {
        "metric": result["metric"],
        "unit": result["unit"],
        "sf": result["sf"],
        "value": result["value"],
        "n_queries": len(per_query),
    }
    if "load_avg_1m" in result:
        summary["load_avg_1m"] = result["load_avg_1m"]
    cc = result.get("cache_census", {})
    short_cc = {
        k: cc[k]
        for k in ("memo_entries", "persisted_entries", "jvm_persistent_rdds")
        if k in cc
    }
    if short_cc:
        summary["cache_census"] = short_cc
    summary["queries"] = {}
    summary["queries_omitted"] = len(per_query)
    summary["queries_full"] = "bench_last.json"
    used = len(json.dumps(summary, separators=(",", ":")))
    qmap: dict[str, float] = {}
    for name, dt in sorted(per_query.items(), key=lambda kv: (-kv[1], kv[0])):
        val = round(dt, 2)
        entry = len(json.dumps(name)) + 1 + len(json.dumps(val)) + 1
        if used + entry > budget:
            continue  # a shorter name may still fit
        used += entry
        qmap[name] = val
    summary["queries"] = qmap
    summary["queries_omitted"] = len(per_query) - len(qmap)
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) <= budget + 2, f"contract line {len(line)}B > budget"
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry_mod
    from ssiintegrateddatapipeline_spark.session import get_spark

    spark = get_spark(app_name="ssi-spark-bench")
    queries = entry_mod.queries()

    # Warm-up: run every headline query once at the bench scale factor.
    # AQE finalizes different physical plans per scale factor (different
    # stats -> different codegen classes), so warming at a smaller sf leaves
    # Janino+JIT compilation inside the timed runs. One untimed pass at the
    # target sf compiles and JITs exactly the plans being measured.
    warm_dir = sf_dir
    t0 = time.perf_counter()
    warmup: dict[str, float] = {}
    for name in HEADLINE:
        tq = time.perf_counter()
        try:
            queries[name](spark, warm_dir).toPandas()
        except Exception as exc:  # warm-up must never fail the bench
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        warmup[name] = round(time.perf_counter() - tq, 3)
    print(
        f"# warmup pass ({warm_dir}): {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    # Cold cost of the disclosed once-per-session write-path-proof
    # fixtures (r11 VERDICT item 1): these two drives run inside the
    # warm-up and are memoized per (app, sf_dir), so their timed medians
    # measure the warm sink re-read — the artifact carries the cold drive
    # explicitly. (streaming_store_cdf re-drives per invocation since
    # round 12 and is NOT in this list.)
    FIXTURE_DRIVES = ["streaming_store_merge", "streaming_store_replica"]
    fixture_cold = {n: warmup[n] for n in FIXTURE_DRIVES if n in warmup}

    # Median-of-3 timed runs per query (round-4 VERDICT task 6): the box
    # hosts other processes whose bursts can inflate a single timing
    # several-fold, and best-of-2 still let one clean+one noisy pair read
    # as a regression; the median of three is robust to one outlier in
    # either direction. Each run is split into build (DataFrame
    # construction: driver-side analysis + any plan-time literal training)
    # and exec (toPandas: job + Arrow transfer) — regressions in the two
    # have different causes, so the split is recorded per query. CAVEAT:
    # streaming_* queries drain their bounded replay EAGERLY inside the
    # query function (run_available_now / run_foreach_batch), so for them
    # "build" contains the whole streaming execution and "exec" only
    # re-materializes the already-local result; read their split as
    # run-vs-fetch, not plan-vs-job.
    N_RUNS = 3
    per_query: dict[str, float] = {}
    detail: dict[str, dict] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        runs = []  # (wall, build, exec)
        rows = 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = df.toPandas()
            t2 = time.perf_counter()
            runs.append((t2 - t0, t1 - t0, t2 - t1))
            rows = len(n)
        first_wall = runs[0][0]
        runs.sort()
        med = runs[N_RUNS // 2]
        dt = round(med[0], 3)
        per_query[name] = dt
        detail[name] = {
            "median": dt,
            "n": N_RUNS,
            "best": round(runs[0][0], 3),
            "build": round(med[1], 3),
            "exec": round(med[2], 3),
            # run-1 wall (r11 VERDICT "what's wrong" #2): for queries
            # whose persisted intra-query streams survive in the
            # CacheManager across invocations, runs 2-3 read warm blocks;
            # first-vs-median makes that visible in the artifact
            "first": round(first_wall, 3),
        }
        total += dt
        # JVM-health timeline on stderr (outside every timed window): a
        # mid-suite GC or JIT-recompile storm shows up as a jump in these
        # deltas next to the queries it inflated — the per-query medians
        # on a noisy box are uninterpretable without this
        jvm = ""
        try:
            from ssiintegrateddatapipeline_spark.caches import census

            c = census(spark)
            jvm = (
                f" gc={c.get('jvm_gc_ms', 0)} jit={c.get('jvm_jit_ms', 0)}"
                f" ch={c.get('jvm_codeheap_used_mb', 0)}"
                f" heap={c.get('jvm_heap_used_mb', 0)}"
            )
        except Exception:
            pass
        print(
            f"# {name}: {dt:.3f}s (build {med[1]:.3f} exec {med[2]:.3f}, "
            f"best {runs[0][0]:.3f}, {rows} rows){jvm}",
            file=sys.stderr,
        )

    # Solo-rerun outlier pass (round-5 VERDICT task 6, threshold tightened
    # to 1.25x per round-7 task 4): suite contention can inflate an
    # untouched query's median (r7's recorded bench moved ~25 untouched
    # queries 1.3-1.7x under host load). Any query whose median moved
    # >1.25x in either direction vs the PREVIOUS bench_last.json gets one
    # solo rerun after the suite, recorded alongside the suite median —
    # a solo time near the old number says "contention", a solo time near
    # the new one says "real change". The BENCH_rN artifact itself then
    # carries the contention evidence.
    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
    )
    prev: dict[str, float] = {}
    try:
        with open(prev_path) as fh:
            prev = json.load(fh).get("queries", {})
    except Exception:
        pass
    flagged = [
        name
        for name, dt in per_query.items()
        if name in prev
        and prev[name] > 0
        and (dt / prev[name] > 1.25 or dt / prev[name] < 0.8)
    ]
    for name in flagged:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        solo = round(time.perf_counter() - t0, 3)
        detail[name]["solo"] = solo
        detail[name]["prev"] = prev[name]
        print(
            f"# solo-rerun {name}: suite {per_query[name]:.3f}s, "
            f"solo {solo:.3f}s, prev {prev[name]:.3f}s",
            file=sys.stderr,
        )

    # Stdout layout (round-12 fix for the empty PERF per-query contract —
    # r11 VERDICT item 2). Evidence on how the driver reads stdout: it
    # keeps a ~2.0 KB tail and json-parses the last line inside it —
    # round 1's 1.7 KB single line WITH its full "queries" map parsed
    # fine, round 2's 29 KB line yielded "parsed": null, and the compact
    # final lines of rounds 3-11 parsed but carried no "queries" map (so
    # PERF per_query sat empty two rounds running). A full 225-name map
    # is ~6.6 KB at 2 dp and can never fit, so:
    # (1) bench_last.json gets the complete result (all queries, detail,
    #     census, solo reruns) — the durable full record,
    # (2) the first stdout line is that same complete result as one JSON
    #     line (any full-stdout consumer still gets everything), and
    # (3) the LAST stdout line is the driver-contract object
    #     {"metric","unit","sf","value","queries":{name: sec},...} with
    #     the heaviest queries' medians (2 dp) greedily packed so the
    #     line stays under ~1.94 KB and always parses from the tail.
    #     "queries_omitted" counts the rest (all present in (1)/(2)).
    #     Selecting by descending median makes the 32- and 8-core runs'
    #     maps overlap on the heavy set, which is what the driver's
    #     scaling comparator needs. Timed methodology (warm-up,
    #     median-of-3, solo reruns) is byte-identical to rounds 4-11.
    result = {
        "queries": per_query,  # name -> median-of-3 seconds (driver contract)
        "queries_detail": detail,  # name -> {median, n, best, build, exec}
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "sf": sf,
        "value": round(total, 3),
        "warmup": warmup,  # first-ever call per query (fixture builds inside)
        "fixture_cold_s": fixture_cold,
    }
    # cache-accumulation evidence (r8-VERDICT task 2): the session's memo/
    # persist census after the full run, so growth across a ~200-query
    # session is observable in the artifact itself.
    try:
        from ssiintegrateddatapipeline_spark.caches import census

        result["cache_census"] = census(spark)
    except Exception:
        pass
    # contention evidence travels IN the artifact (r7-VERDICT task 4):
    # 1-min load average plus the largest solo-rerun movers, so a noisy
    # round is self-diagnosing without chasing bench_last.json.
    try:
        result["load_avg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    movers = sorted(
        (n for n in flagged if "solo" in detail.get(n, {})),
        key=lambda n: -abs(per_query[n] / prev[n] - 1.0),
    )[:12]
    if movers:
        result["solo_reruns"] = {
            n: {
                "suite": per_query[n],
                "solo": detail[n]["solo"],
                "prev": detail[n]["prev"],
            }
            for n in movers
        }
        result["n_flagged"] = len(flagged)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_last.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    line = json.dumps(result, separators=(",", ":"))
    print(line)
    print(contract_line(result))
    print(f"# bench line bytes: {len(line)}", file=sys.stderr)


if __name__ == "__main__":
    main()
