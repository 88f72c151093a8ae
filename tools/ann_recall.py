"""ANN recall/latency sweep: IVF (vs n_probe), PQ (vs m/refine) and
IVF-PQ (residual IVFADC, vs n_probe/refine) against the exact
brute-force baseline on the embeddings table.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/ann_recall.py
Prints one row per configuration and a final JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import similarity as S
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

K = 5
N_QUERIES = 50


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("ann-recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.time()
    exact = {
        (r["vec_id_q"], r["vec_id_c"])
        for r in S.cosine_topk(q, emb, "vec_id", "vec_id", k=K).collect()
    }
    t_exact = time.time() - t0
    print(f"{'config':<38} {'recall@'+str(K):>9} {'sec':>7}   (corpus={n}, exact={t_exact:.2f}s)")

    results = {"corpus": n, "k": K, "exact_sec": round(t_exact, 3), "ivf": [], "pq": []}

    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        got = {
            (r["vec_id_q"], r["vec_id_c"])
            for r in S.ivf_cosine_topk(
                q, emb, "vec_id", "vec_id", k=K, n_cells=16, n_probe=n_probe
            ).collect()
        }
        dt = time.time() - t0
        rec = len(exact & got) / len(exact)
        print(f"{'ivf n_cells=16 n_probe=' + str(n_probe):<38} {rec:>9.3f} {dt:>7.2f}")
        results["ivf"].append({"n_probe": n_probe, "recall": round(rec, 3), "sec": round(dt, 2)})

    for m, n_centroids, refine in ((8, 16, 8), (16, 32, 4), (16, 32, 8), (16, 32, 16)):
        t0 = time.time()
        got = {
            (r["vec_id_q"], r["vec_id_c"])
            for r in S.pq_cosine_topk(
                q, emb, "vec_id", "vec_id", k=K,
                m=m, n_centroids=n_centroids, refine=refine,
            ).collect()
        }
        dt = time.time() - t0
        rec = len(exact & got) / len(exact)
        cfg = f"pq m={m} K={n_centroids} refine={refine}"
        print(f"{cfg:<38} {rec:>9.3f} {dt:>7.2f}")
        results["pq"].append(
            {"m": m, "n_centroids": n_centroids, "refine": refine,
             "recall": round(rec, 3), "sec": round(dt, 2)}
        )

    results["ivfpq"] = []
    for n_probe, refine in ((2, 8), (4, 8), (8, 8), (8, 16)):
        t0 = time.time()
        got = {
            (r["vec_id_q"], r["vec_id_c"])
            for r in S.ivf_pq_topk(
                q, emb, "vec_id", "vec_id", k=K,
                n_cells=16, n_probe=n_probe, m=16, n_centroids=32, refine=refine,
            ).collect()
        }
        dt = time.time() - t0
        rec = len(exact & got) / len(exact)
        cfg = f"ivfpq n_probe={n_probe} refine={refine}"
        print(f"{cfg:<38} {rec:>9.3f} {dt:>7.2f}")
        results["ivfpq"].append(
            {"n_probe": n_probe, "refine": refine, "recall": round(rec, 3), "sec": round(dt, 2)}
        )

    # distributed kNN JOIN (round-11): same cell geometry as IVF but no
    # query-side collect — its recall curve vs n_probe substantiates the
    # margin_mine_ivf approximation claim; n_probe == n_cells must hit
    # recall 1.0 by the exhaustive-probe equality contract
    results["knn_join"] = []
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        got = {
            (r["vec_id_q"], r["vec_id_c"])
            for r in S.ivf_knn_join(
                q, emb, "vec_id", "vec_id", k=K,
                n_cells=16, n_probe=n_probe, include_self=False,
            ).collect()
        }
        dt = time.time() - t0
        rec = len(exact & got) / len(exact)
        print(f"{'knn-join n_cells=16 n_probe=' + str(n_probe):<38} {rec:>9.3f} {dt:>7.2f}")
        results["knn_join"].append(
            {"n_probe": n_probe, "recall": round(rec, 3), "sec": round(dt, 2)}
        )
    assert results["knn_join"][-1]["recall"] == 1.0, "exhaustive knn-join probe must be exact"

    # persisted IVF index: partition-pruned probes must match the
    # in-memory IVF bit-for-bit at the same seed, at every n_probe
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="ann_ivf_idx_")
    try:
        t0 = time.time()
        S.ivf_write_index(emb, idx, "vec_id", n_cells=16, seed=42)
        t_build = time.time() - t0
        results["ivf_index"] = {"build_sec": round(t_build, 2), "probes": []}
        for n_probe in (1, 4):
            t0 = time.time()
            got = {
                (r["vec_id_q"], r["vec_id_c"])
                for r in S.ivf_probe_topk(q, idx, "vec_id", "vec_id", k=K, n_probe=n_probe).collect()
            }
            dt = time.time() - t0
            mem = {
                (r["vec_id_q"], r["vec_id_c"])
                for r in S.ivf_cosine_topk(
                    q, emb, "vec_id", "vec_id", k=K, n_cells=16, n_probe=n_probe
                ).collect()
            }
            rec = len(exact & got) / len(exact)
            tag = "OK" if got == mem else "DIVERGED-FROM-IN-MEMORY"
            print(f"{'ivf-index n_probe=' + str(n_probe):<38} {rec:>9.3f} {dt:>7.2f}   {tag}")
            results["ivf_index"]["probes"].append(
                {"n_probe": n_probe, "recall": round(rec, 3), "sec": round(dt, 2),
                 "matches_in_memory": got == mem}
            )
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
