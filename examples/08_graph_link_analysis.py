"""Link analysis on the purchase graph with a shuffle-once edge layout.

The iterative graph family (pagerank / HITS) re-joins the SAME edge
list on the SAME key every round. Out of the box the operators pin a
materialized copy per key internally; on a long-lived cluster the
better lever is a ONE-TIME bucketed materialization of the edge list
(`layout.bucketed_table`) shared by every later job:

- write the edge set bucketed by `src` (pagerank + the HITS auth half)
  and by `dst` (the HITS hub half) ONCE;
- pass the bucketed scans with `prelaid=True` so every per-round join
  plans with no exchange and no sort on the edge side — only the small
  per-round score table moves.

At 100 TB that is K iterations x a node-table shuffle instead of
K iterations x an edge-list shuffle (the edge list is typically
10-100x the node table). The operators' exact-integer contract makes
the two paths BIT-IDENTICAL — this example digest-checks that.

Run: python examples/08_graph_link_analysis.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits, pagerank
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.layout import bucketed_table

PR_ITER = 4
HITS_ITER = 3
BUCKETS = 8


def digest(df) -> tuple:
    """Order-independent exact digest: row count + decimal sum of the
    per-row xxhash64 (same recipe as tools/graph_layout_ab.py)."""
    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).head()
    return (row["n"], row["h"])


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark("example-graph-layout", cpus=BUCKETS)

    # customer->supplier purchase edges (the reference's enriched-orders
    # join shape, reduced to its graph): distinct (c, s) pairs
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    directed = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    # pagerank wants both directions so no node dangles in this data
    both = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    print("== one-time bucketed edge twins (the cross-job layout lever) ==")
    pr_edges = bucketed_table(both, "ex08_edges_both_src", "src", BUCKETS)
    h_src = bucketed_table(directed, "ex08_edges_src", "src", BUCKETS)
    h_dst = bucketed_table(directed, "ex08_edges_dst", "dst", BUCKETS)
    print(f"edges: {pr_edges.count()} (both dirs), {h_src.count()} directed")

    print("== pagerank: default path vs prelaid bucketed scan ==")
    pr_default = pagerank(both, iterations=PR_ITER)
    pr_prelaid = pagerank(pr_edges, iterations=PR_ITER, prelaid=True)
    d0, d1 = digest(pr_default), digest(pr_prelaid)
    assert d0 == d1, f"pagerank digests diverge: {d0} vs {d1}"
    print(f"digest match: {d1}")
    pr_prelaid.orderBy(F.col("rank_micro").desc()).show(5)

    print("== HITS: default path vs prelaid src/dst bucketed twins ==")
    h_default = hits(directed, iterations=HITS_ITER)
    h_prelaid = hits(h_src, iterations=HITS_ITER, prelaid=True, edges_by_dst=h_dst)
    d0, d1 = digest(h_default), digest(h_prelaid)
    assert d0 == d1, f"hits digests diverge: {d0} vs {d1}"
    print(f"digest match: {d1}")
    h_prelaid.orderBy(F.col("auth_micro").desc()).show(5)

    for tbl in ("ex08_edges_both_src", "ex08_edges_src", "ex08_edges_dst"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    print("OK: both operators bit-identical across layouts")


if __name__ == "__main__":
    main()
