"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line with per-query
wall seconds.

Each query is fully materialized through the noop sink (count() would
let Spark prune projections). The JVM/session warmup runs a trivial
job first so query timings measure the plans, not interpreter startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Every suite query except array_membership_join, which is excluded by
# design: its scale path IS unnest_join (SURVEY §2.4 J2 -> J3 rewrite).
# Round 6 completed the set (was 130 of 164): per-query perf evidence
# now covers the whole declared surface.
BENCH_QUERIES = (
    "enriched_orders",
    "pricing_summary",
    "region_revenue",
    "unnest_join",
    "asof_join",
    "interval_join",
    "changelog_compaction",
    "debezium_pipeline",
    "logical_decoding",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_topk",
    "text_analysis",
    "token_histogram",
    "sessionize",
    "training_prep",
    "tfidf_topterms",
    "pack_sequences",
    "stratified_sample",
    "pii_scrub",
    "rollup_revenue",
    "asof_tolerance",
    "near_dedup",
    "bm25_scores",
    "dedup_lines",
    "curation_pipeline",
    "fuzzy_join",
    "expectations_check",
    "snapshot_diff",
    "weighted_sample",
    "zorder_index",
    "semantic_dedup",
    "rolling_features",
    "incremental_agg",
    "chunk_documents",
    "quantize_embeddings",
    "bigram_topk",
    "session_windows",
    "quality_percentile",
    "temperature_mix",
    "hop_counts",
    "cumulate_counts",
    "bpe_tokenize",
    "cube_revenue",
    "profile_columns",
    "cep_funnel",
    "cep_strict",
    "duplicate_spans",
    "approx_distinct",
    "psi_drift",
    "kmeans",
    "lm_scores",
    "hashed_features",
    "cms_heavy_hitters",
    "mask_dup_spans",
    "interpolate",
    "hist_quantiles",
    "span_corruption",
    "bm25_topk",
    "normalize_text",
    "mad_outliers",
    "key_skew",
    "corr_matrix",
    "gopher_quality",
    "asof_nearest",
    "pagerank",
    "grouping_sets",
    "standardize",
    "cooccur_pmi",
    "triangle_census",
    "char_entropy",
    "bloom_prune",
    "window_distribution",
    "dataset_split",
    "range_join_pairs",
    "rrf_fusion",
    "hop_distinct_users",
    "pagerank_weighted",
    "k_hop_reach",
    "pagerank_personalized",
    "url_dedup",
    "global_ids",
    "dedup_containment",
    "html_extract",
    "ks_drift",
    "pca_project",
    "negative_sample",
    "lpa_communities",
    "equidepth_bins",
    "k_anonymity",
    "cohort_retention",
    "hits_scores",
    "link_prediction",
    "winnow_pairs",
    "ewma_features",
    "nb_classify",
    "variant_shred",
    "xml_ingest",
    "record_linkage",
    "table_digest",
    "hop_hll_users",
    "source_overlap",
    "mannwhitney_drift",
    "cusum_alerts",
    "trend_lines",
    "chi2_independence",
    "kcore",
    "fk_audit",
    "rake_keywords",
    "woe_iv",
    "acf_features",
    "hll_overlap",
    "benford_audit",
    "association_rules",
    "transition_matrix",
    "assortativity",
    "winsorize",
    "zipf_fit",
    "local_clustering",
    "lsh_incremental",
    "seasonal_decompose",
    "quantile_normalize",
    "roc_auc",
    "cuped_metrics",
    "ndcg_eval",
    "welch_ttest",
    "js_divergence",
    "ndcg_graded_eval",
    "record_linkage_em",
    # round-6 additions: the previously un-benched remainder
    "view_projection",
    "time_functions",
    "hourly_counts",
    "supplier_stats",
    "lookup_join",
    "app_sql_pipeline",
    "top_orders",
    "set_ops",
    "semi_anti_join",
    "window_rank",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_ivf_topk",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "similarity_lsh_pairs",
    "skew_safe_collect",
    "take_per_stratum",
    "regex_token_stats",
    "multimodal_features",
    "distinct_agg_having",
    "unpivot_metrics",
    "pivot_events",
    "median_metrics",
    "dedup_clusters",
    "contamination_check",
    "repetition_stats",
    "scd2_intervals",
    "hourly_spine_gapfill",
    "vector_normalize",
    "json_props_stats",
    "repeat_mix",
    "asof_forward",
    "balanced_shards",
    "budget_select",
    "calibration_bins",
    "dsir_weights",
    "margin_mine",
    "tokenizer_fertility",
    "soft_dedup",
    "cross_lm_scores",
    "ts_correlation_topk",
    "margin_mine_ivf",
    "ts_lagged_topk",
    "kcenter_select",
    "excess_lm_scores",
    "domain_mixture",
)


def calibration_seconds(spark) -> float:
    """Fixed-work timing independent of the engine under test: a seeded
    50M-row JVM aggregation plus a 1M-row Arrow round trip. Host and JVM
    speed vary round-to-round on shared hardware; this number lets a
    reader normalize query timings across runs (query_sec / calibration)
    before calling a delta a regression. Min of two reps, same noise
    policy as the warm timings."""
    reps = []
    for _ in range(2):
        t0 = time.time()
        spark.range(50_000_000).selectExpr("sum(id * 2654435761 % 97)").collect()
        spark.range(1_000_000).mapInPandas(lambda it: it, "id long").write.format(
            "noop"
        ).mode("overwrite").save()
        reps.append(time.time() - t0)
    return round(min(reps), 3)


def _prior_record() -> dict:
    """The previously committed BENCH_FULL.json, for the contention
    self-check (VERDICT r11 #3). Prefer the git HEAD copy (the working
    tree one may already be this run's draft); fall back to the on-disk
    file; empty dict when neither parses."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"], cwd=here,
            capture_output=True, text=True, timeout=30,
        )
        if blob.returncode == 0:
            return json.loads(blob.stdout)
    except Exception:
        pass
    try:
        with open(os.path.join(here, "BENCH_FULL.json")) as f:
            return json.load(f)
    except Exception:
        return {}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = eng.get_spark("dpe-bench", cpus=cpus)
    # warm up the JVM, parquet footer caches, and the Python/Arrow worker
    # pool outside the timed region (a long-running cluster has all three
    # hot; cold numbers should measure plans, not process spin-up)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
    calibration = calibration_seconds(spark)

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = suite.QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # steady-state throughput on the already-compiled plan (what a
        # long-running cluster job sees after codegen warmup): min of two
        # reps — this host shows ±2x run-to-run variance from contention,
        # and min is the standard noise-robust estimator for wall time.
        reps = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        warm[name] = round(min(reps), 3)

    # Contention self-check (VERDICT r11 #3): the r11 record shipped a
    # host-contention artifact (lsh_incremental 6.50 s committed vs
    # 3.54 s re-measured) that the next round would misread as a
    # regression baseline. Any query whose CAL-NORMALIZED warm time
    # exceeds its previously committed cal-normalized value by >1.5x
    # gets one extra isolated rep — after the stress_curation GC nudge,
    # so the rep never pays an earlier query's storage eviction — and
    # the record notes which entries were re-run.
    prior = _prior_record()
    prior_cal = prior.get("queries_warm_cal", {})
    reran: list[str] = []
    for name in BENCH_QUERIES:
        prev = prior_cal.get(name)
        if prev is None or prev <= 0:
            continue
        if warm[name] / calibration <= 1.5 * prev:
            continue
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        fn = suite.QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm[name] = round(min(warm[name], time.time() - t0), 3)
        reran.append(name)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query record goes to a committed file; the driver captures
    # only the last ~2000 chars of stdout, so the printed line must stay
    # compact (round-4's 8 KB line was recorded as an unparseable tail).
    # Calibration-normalized per-query numbers (VERDICT r9 #7): cross-
    # round warm diffs kept needing a forensic pass to separate host drag
    # from genuine regressions (+22% raw was +3% normalized in r9) —
    # publish cal-units (sec / calibration_sec) per query at write time
    # so the reader's diff self-normalizes.
    warm_cal = {k: round(v / calibration, 3) for k, v in warm.items()}
    cold_cal = {k: round(v / calibration, 3) for k, v in timings.items()}
    full = {
        "metric": "suite_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_cal": cold_cal,
        "queries_warm": warm,
        "queries_warm_cal": warm_cal,
        "warm_total": round(sum(warm.values()), 3),
        "warm_total_cal": round(sum(warm_cal.values()), 3),
        "calibration_sec": calibration,
        "contention_reran": sorted(reran),
        "sf": sf_val,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    slowest = dict(sorted(warm.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "suite_wall_seconds",
        "value": full["value"],
        "unit": "sec",
        "queries": slowest,  # 10 slowest warm; full dict in BENCH_FULL.json
        "warm_total": full["warm_total"],
        "calibration_sec": calibration,
        "n_queries": len(timings),
        "sf": sf_val,
        "full": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    main()
