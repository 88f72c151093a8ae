"""Margin-mining scaling stress: grow BOTH corpora past margin_mine's
``max_query_rows`` collect/broadcast cap and time the pool-scale path
(``margin_mine_ivf`` — distributed IVF kNN join, no driver collect).

Corpora derive from the sf embeddings table: each replica jitters every
component by a deterministic per-(vec_id, replica, dim) hash, so
replicas stay near their source vector (realistic cluster structure for
the coarse quantizer) without duplicating it exactly. LEFT = even
vec_ids, RIGHT = odd, as in the suite query.

At the largest factor the LEFT side exceeds 100k rows, where
``margin_mine`` RAISES by contract — the tool asserts that raise, then
runs the IVF path at the same size: the "executing beyond the cap"
evidence for SCALE.md (VERDICT r10 #5).

Usage: python tools/stress_margin.py [factors...]   (default: 16 64 224)
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
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
    margin_mine,
    margin_mine_ivf,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 100_000  # margin_mine's max_query_rows default


def build(spark, factor: int, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    idspan = emb.agg(F.max("vec_id")).head()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    # deterministic ±5% per-component jitter keyed on (vec_id, rep, dim)
    jitter = F.transform(
        "embedding",
        lambda x, i: x * (
            F.lit(0.95)
            + F.pmod(F.xxhash64(F.col("vec_id"), F.col("__rep"), i), F.lit(1000))
            / F.lit(10000.0)
        ).cast("float"),
    )
    out = (
        emb.select("*", rep)
        .withColumn("embedding", F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(jitter))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * idspan)
        .drop("__rep")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    return spark.read.parquet(os.path.join(out_dir, "embeddings.parquet")).count()


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [16, 64, 224]
    spark = get_spark("stress-margin", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).mapInPandas(lambda it: it, "id long").count()  # warm python pool
    root = tempfile.mkdtemp(prefix="dpe_smargin_")
    results: dict[str, dict] = {}
    try:
        for factor in factors:
            d = os.path.join(root, f"x{factor}")
            n = build(spark, factor, d)
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            left = emb.where(F.col("vec_id") % 2 == 0)
            right = emb.where(F.col("vec_id") % 2 == 1)
            n_left = left.count()
            # n_cells ~ sqrt(side): executor-sized cells at every factor
            n_cells = max(8, int(n_left ** 0.5) // 8 * 8)
            capped = n_left > CAP
            if capped:
                # the exact path must refuse this size by contract
                try:
                    margin_mine(left, right, "vec_id", "vec_id", knn_k=4)
                    raise AssertionError("margin_mine accepted a beyond-cap query side")
                except ValueError as exc:
                    assert "max_query_rows" in str(exc)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                margin_mine_ivf(
                    left, right, "vec_id", "vec_id",
                    knn_k=4, n_cells=n_cells, n_probe=4,
                    # FAISS heuristic: ~200 training rows per cell keeps
                    # the driver-side quantizer fit flat as n_cells grows
                    max_train_rows=200 * n_cells,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[str(factor)] = {
                "rows_per_side": n_left, "total": n, "n_cells": n_cells,
                "beyond_cap": capped, "ivf_sec": round(best, 2),
            }
            # _margin_select eagerly checkpoints the kNN frames; free
            # the orphaned blocks before the next factor's timing
            # (tools/stress_curation.py caveat)
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            print(
                f"x{factor:<3} ({n_left:>7}/side, n_cells={n_cells:>3}, "
                f"beyond_cap={capped}) margin_mine_ivf {best:6.2f}s",
                flush=True,
            )
        print(json.dumps({"base": BASE, "results": results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
