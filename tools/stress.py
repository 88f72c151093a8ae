"""Scaling-curve stress: replicate the sf0.1 FACT tables N× (dims stay
fixed — facts grow, dimensions don't) and time the relational headline
queries at each factor. Near-linear wall time across factors is the
evidence that the plans scale with data volume instead of blowing up on
a shuffle or driver-side bottleneck.

Fact keys are offset per replica so key cardinality grows with the data
(no artificial hot keys); the as-of self-join keeps o_custkey, so
versions-per-key grows N× — deliberately stressing the window operator.

Usage: python tools/stress.py [factors...] [--only=q1,q2]   (default: 1 4 16)
Prints one timing row per (factor, query) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTS = ("lineitem", "orders")
DIMS = ("customer", "part", "supplier", "nation", "region")
QUERIES = ("pricing_summary", "region_revenue", "cube_revenue", "enriched_orders", "asof_join", "unnest_join",
           "hop_counts", "cumulate_counts", "profile_columns",
           # round-4 additions: keyed pattern matching scales with the user
           # count (events replicate with SHIFTED user ids — per-key history
           # stays constant, the 100 TB shape); sketches/drift on replicated
           # orders; k-means on replicated embeddings
           "cep_funnel", "cep_strict", "approx_distinct", "psi_drift", "kmeans",
           # round-4 session-3: pagerank's edge extraction (orders⋈lineitem
           # distinct) grows with the facts while the distinct node/edge set
           # saturates — the join is the scaling surface; standardize scales
           # with events under constant group count
           "pagerank", "standardize",
           # round-4 session-4: co-occurrence/triangles — baskets (orders)
           # replicate while the item universe saturates, so pair/edge
           # cardinality is constant and the counted shuffle is the scaling
           # surface; bloom_prune's probe side (orders) grows, the filter
           # row stays fixed-width
           "cooccur_pmi", "triangle_census", "bloom_prune",
           # weighted ranks / frontier BFS on the same saturating graphs
           "pagerank_weighted", "k_hop_reach",
           # round-4 session-5: URL hygiene and equi-depth bins scale with
           # events (zero-/one-shuffle map work); exact KS over a FIXED value
           # grid (2dp values saturate) pins the prefix-sum constant; LPA and
           # k-anonymity ride the saturating purchase graph / customer dims
           "url_dedup", "ks_drift", "equidepth_bins", "lpa_communities",
           "k_anonymity",
           # round-4 session-6: HITS and link prediction ride the saturating
           # purchase graph (edge extraction is the scaling surface, like
           # pagerank/LPA); EWMA replicates events with shifted users (keys
           # scale, per-key history constant); the digest is row-local map
           # work into ONE row; windowed HLL keeps 512 registers per window
           # while the count shuffle grows; variant shredding is row-local
           # decode
           "hits_scores", "link_prediction", "ewma_features", "table_digest",
           "hop_hll_users", "variant_shred",
           # round-4 session-7: rank-sum/OLS/ACF/CUSUM ride events (value
           # grid and per-key history saturate, keys/counts grow);
           # chi-squared and WOE ride orders with a CONSTANT cell table;
           # the FK audit grows linearly on every join side; k-core rides
           # the saturating co-purchase graph like triangle_census
           "mannwhitney_drift", "cusum_alerts", "trend_lines", "acf_features",
           "chi2_independence", "woe_iv", "fk_audit", "kcore",
           # session-7 second batch: rules/assortativity/LCC ride the
           # saturating co-purchase and supplier graphs; transitions and
           # HLL overlap ride events with bounded output; winsorize and
           # benford ride orders with fixed bound/digit tables
           "association_rules", "transition_matrix", "assortativity",
           "local_clustering", "hll_overlap", "benford_audit", "winsorize")


def build(spark, factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        shutil.copy(os.path.join(BASE, f"{name}.parquet"), os.path.join(out_dir, f"{name}.parquet"))
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    okey_span = orders.agg(F.max("o_orderkey")).head()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    (
        orders.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * okey_span)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )
    (
        lineitem.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * okey_span)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )
    events = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    ekey_span = events.agg(F.max("event_id")).head()[0] + 1
    ukey_span = events.agg(F.max("user_id")).head()[0] + 1
    (
        events.select("*", rep)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * ekey_span)
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * ukey_span)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    vkey_span = emb.agg(F.max("vec_id")).head()[0] + 1
    (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * vkey_span)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )


def main() -> None:
    only: tuple[str, ...] | None = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = tuple(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    factors = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark("stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dpe_stress_")
    results: dict[str, dict[str, float]] = {}
    rows = {}
    try:
        for factor in factors:
            d = os.path.join(root, f"x{factor}")
            build(spark, factor, d)
            rows[factor] = spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()
            results[str(factor)] = {}
            for q in (only or QUERIES):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    suite.QUERIES[q](spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                results[str(factor)][q] = round(best, 2)
                print(f"x{factor:<3} ({rows[factor]:>9} lineitem) {q:<18} {best:>7.2f}s")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"base": BASE, "lineitem_rows": rows, "timings": results}))


if __name__ == "__main__":
    main()
