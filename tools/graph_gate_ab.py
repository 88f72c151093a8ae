"""A/B: BROADCAST_NODES gate — broadcast-hinted score side vs the
pinned-SMJ layout for the iterative graph family (VERDICT r13 #7).

The r13 gate (``graph.BROADCAST_NODES = 2M``) broadcast-hints the
per-round score/label table below 2M nodes and keeps the r9 pinned
sort-merge layout above it. This probe re-pins the gate empirically at
the replicated-purchase-graph sizes the VERDICT asked for (sf0.1 x4 /
x8 — 65k-130k nodes): both arms run the SAME operator on the SAME
materialized parquet edge list, with the gate constant monkeypatched
(huge -> broadcast arm, 0 -> pinned-SMJ arm), interleaved, digests
asserted bit-identical.

Usage: python tools/graph_gate_ab.py [factors...]   (default: 4 8)
Prints one row per (factor, query, arm, round) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import graph
from graph_layout_ab import build_edges, digest, timed

ROUNDS = int(os.environ.get("GATE_AB_ROUNDS", "2"))
PR_ITER = 4
HITS_ITER = 3


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [4, 8]
    spark = get_spark("graph-gate-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    work = tempfile.mkdtemp(prefix="graph_gate_ab_")
    results: dict = {"pr_iter": PR_ITER, "hits_iter": HITS_ITER, "rows": []}
    true_gate = graph.BROADCAST_NODES
    try:
        for factor in factors:
            epath = os.path.join(work, f"edges_x{factor}")
            build_edges(spark, factor, epath)
            directed = spark.read.parquet(epath)
            n_edges = directed.count()
            both = directed.union(
                directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            n_nodes = both.select("src").distinct().count()
            print(f"-- factor {factor}: {n_edges} directed edges, {n_nodes} nodes", flush=True)
            digests = {}
            for rnd in range(ROUNDS):
                for arm, gate in (("broadcast", 1 << 60), ("pinned", 0)):
                    graph.BROADCAST_NODES = gate
                    d_pr, t_pr = timed(lambda: digest(graph.pagerank(both, iterations=PR_ITER)))
                    d_h, t_h = timed(lambda: digest(graph.hits(directed, iterations=HITS_ITER)))
                    digests.setdefault(("pagerank", factor), set()).add(d_pr)
                    digests.setdefault(("hits", factor), set()).add(d_h)
                    results["rows"].append({
                        "factor": factor, "round": rnd, "arm": arm,
                        "nodes": n_nodes, "edges": n_edges,
                        "pagerank_s": t_pr, "hits_s": t_h,
                    })
                    print(f"x{factor} r{rnd} {arm:9s}: pagerank {t_pr}s hits {t_h}s", flush=True)
            for key, ds in digests.items():
                assert len(ds) == 1, f"digests diverge for {key}: {ds}"
            print(f"x{factor}: digests bit-identical across arms", flush=True)
    finally:
        graph.BROADCAST_NODES = true_gate
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
