"""A/B: per-round checkpoint storage discipline ON vs OFF for the
iterative operators (VERDICT r12 #3, the measurement the r12 change
shipped without — plus this round's connected_components fix).

The r12/r13 discipline frees each round's localCheckpoint blocks once
the next round has materialized, so an N-round run keeps ~2 live frames
instead of N+1. This tool runs pagerank / hits (iterations >= 8) and
connected_components (a synthetic long-chain component forces >= 12
label-propagation rounds over the FULL label frame) on the sf0.1 x
``factor`` purchase graph twice:

* ``disciplined`` — the shipped code;
* ``leaky``      — ``unpersist_local_checkpoint`` monkeypatched to a
  no-op in the operator modules, reproducing the pre-fix behavior
  exactly (the helper is best-effort by contract, so a no-op is a
  legal — just wasteful — implementation; results must be identical).

A sampler thread polls the JVM block manager during each run and
records the PEAK number of persistent RDDs and PEAK cached bytes; the
digests of both variants are asserted equal. The interesting output is
the storage shape (bounded vs linear-in-rounds); wall delta at sf0.1
is secondary (blocks are MEMORY_AND_DISK and this host has headroom —
the 100 TB argument is eviction pressure, not local wall).

Usage: python tools/graph_storage_ab.py [factor]   (default: 4)
Prints one row per (query, variant) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import dedup as D
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import graph as G
from tools.graph_layout_ab import BUCKETS, build_edges, digest, timed

PR_ITER = 8
HITS_ITER = 8
CHAIN = 14  # forces >= CHAIN-1 connected_components rounds


class PeakSampler:
    """Polls the driver block manager for (n persistent RDDs, cached
    bytes) at ~25 Hz and keeps the peak of each, baselined against the
    state at start() so pre-existing pins don't count."""

    def __init__(self, spark):
        self._sc = spark.sparkContext._jsc.sc()
        self.peak_rdds = 0
        self.peak_bytes = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _sample(self) -> tuple[int, int]:
        n = self._sc.getPersistentRDDs().size()
        mem = 0
        for info in self._sc.getRDDStorageInfo():
            mem += info.memSize() + info.diskSize()
        return n, mem

    def _run(self, base_n: int, base_b: int) -> None:
        while not self._stop.is_set():
            try:
                n, b = self._sample()
            except Exception:
                break  # context shutting down
            self.peak_rdds = max(self.peak_rdds, n - base_n)
            self.peak_bytes = max(self.peak_bytes, b - base_b)
            time.sleep(0.04)

    def __enter__(self):
        base_n, base_b = self._sample()
        self._thread = threading.Thread(
            target=self._run, args=(base_n, base_b), daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False


def chain_pairs(spark, edges_df):
    """The purchase pair graph plus one synthetic CHAIN-node path
    component (fresh 'x...' ids, disjoint from the c/s namespaces) —
    the path's diameter forces >= CHAIN-1 min-label rounds while every
    round still joins the FULL label frame (the leak-relevant shape)."""
    path = spark.createDataFrame(
        [(f"x{i:03d}", f"x{i + 1:03d}") for i in range(CHAIN - 1)],
        "id_a string, id_b string",
    )
    return edges_df.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    ).union(path)


def run_variant(name: str, spark, directed, pairs) -> list[dict]:
    rows = []
    both = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    jobs = [
        ("pagerank", lambda: digest(G.pagerank(both, iterations=PR_ITER))),
        ("hits", lambda: digest(G.hits(directed, iterations=HITS_ITER))),
        (
            "connected_components",
            lambda: digest(D.connected_components(pairs, max_iter=40)),
        ),
    ]
    for query, fn in jobs:
        with PeakSampler(spark) as sampler:
            d, t = timed(fn)
        rows.append(
            {
                "query": query,
                "variant": name,
                "wall_s": t,
                "peak_rdds": sampler.peak_rdds,
                "peak_mb": round(sampler.peak_bytes / 1e6, 1),
                "digest": list(map(str, d)),
            }
        )
        print(
            f"{query:22s} {name:12s} {t:7.2f}s  peak_rdds={sampler.peak_rdds:3d}"
            f"  peak_storage={rows[-1]['peak_mb']:.1f} MB",
            flush=True,
        )
    return rows


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("graph-storage-ab", cpus=BUCKETS)
    work = tempfile.mkdtemp(prefix="graph_storage_ab_")
    try:
        epath = os.path.join(work, f"edges_x{factor}")
        build_edges(spark, factor, epath)
        directed = spark.read.parquet(epath)
        pairs = chain_pairs(spark, directed)
        n_edges = directed.count()
        print(
            f"-- factor {factor}: {n_edges} directed edges, "
            f"pr_iter={PR_ITER} hits_iter={HITS_ITER} chain={CHAIN}",
            flush=True,
        )

        # cold-JVM pass: codegen/BLAS/executor warmup lands here, not
        # in the measured rows (the first variant otherwise eats it)
        run_variant("warmup", spark, directed, pairs)

        disciplined = run_variant("disciplined", spark, directed, pairs)

        # Reproduce the pre-fix behavior: the helper silently does
        # nothing (its documented fallback on Spark Connect).
        noop = lambda df: None  # noqa: E731
        saved = (G.unpersist_local_checkpoint, D.unpersist_local_checkpoint)
        G.unpersist_local_checkpoint = noop
        D.unpersist_local_checkpoint = noop
        try:
            leaky = run_variant("leaky", spark, directed, pairs)
        finally:
            G.unpersist_local_checkpoint, D.unpersist_local_checkpoint = saved

        by_q = {r["query"]: r for r in disciplined}
        for r in leaky:
            assert by_q[r["query"]]["digest"] == r["digest"], (
                f"{r['query']} digests diverge between variants"
            )
        out = {
            "factor": factor,
            "edges": n_edges,
            "pr_iter": PR_ITER,
            "hits_iter": HITS_ITER,
            "chain": CHAIN,
            "rows": disciplined + leaky,
        }
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
