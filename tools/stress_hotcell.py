"""Hot-cell skew stress for ivf_knn_join's cell_parts lever (VERDICT
r11 #2): build a corpus where one dense embedding cluster holds most
rows — the quantizer then assigns it to ONE cell, i.e. one un-splittable
cogroup task — and A/B the unsplit path (cell_parts=1) against the
auto per-cell split (cell_parts=None), asserting digest equality.

The skewed corpus derives deterministically from the sf embeddings: a
HOT_FRAC share of replicated rows is pulled to a common hub direction
(tight 2% jitter, so they quantize into one cell), the rest keep the
stress_margin-style +-5% jitter spread.

The auto target is overridden to TARGET_OVERRIDE for the demo: at the
production 25k target the unsplit baseline's hot-cell task is a single-
core ~29k x 29k fold matmul (~7 min) — the very straggler the lever
removes, but too slow to A/B twice locally. The lever's threshold is a
constant; the skew behavior it splits is scale-free, so the scaled-down
demo exercises the identical code path. Default factors: 4 (hot cell
~4.8k rows, UNDER the override target — the control showing auto keeps
parts=1 and costs nothing beyond the count pass) and 8 (hot cell ~9.6k
rows -> auto parts=2, the straggler split).

Usage: python tools/stress_hotcell.py [factors...]   (default: 4 8)
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
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ivf_knn_join

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_FRAC = 0.6  # share of rows pulled into the one dense cluster
N_CELLS = 16
N_PROBE = 2
K = 3
TARGET_OVERRIDE = 6_000  # see module docstring


def build(spark, factor: int, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    idspan = emb.agg(F.max("vec_id")).head()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    # deterministic hot/cold assignment by content hash of (id, rep)
    hot = (
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("__rep")), F.lit(1000))
        < F.lit(int(HOT_FRAC * 1000))
    )
    # hub = the corpus's vec 0 direction; hot rows = hub +- 2% jitter
    hub_vec = emb.orderBy("vec_id").select("embedding").head()[0]
    hub = F.array(*[F.lit(float(x)) for x in hub_vec])
    tight = F.transform(
        hub,
        lambda x, i: x
        * (
            F.lit(0.99)
            + F.pmod(F.xxhash64(F.col("vec_id"), F.col("__rep"), i), F.lit(1000))
            / F.lit(50000.0)
        ).cast("float"),
    )
    spread = F.transform(
        "embedding",
        lambda x, i: x
        * (
            F.lit(0.95)
            + F.pmod(F.xxhash64(F.col("vec_id"), F.col("__rep"), i), F.lit(1000))
            / F.lit(10000.0)
        ).cast("float"),
    )
    out = (
        emb.select("*", rep)
        .withColumn("embedding", F.when(hot, tight).otherwise(spread))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * idspan)
        .drop("__rep")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    return spark.read.parquet(os.path.join(out_dir, "embeddings.parquet")).count()


def main() -> None:
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import similarity

    similarity._IVF_TARGET_CELL_ROWS = TARGET_OVERRIDE
    factors = [int(a) for a in sys.argv[1:]] or [4, 8]
    spark = get_spark("stress-hotcell", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).mapInPandas(lambda it: it, "id long").count()
    root = tempfile.mkdtemp(prefix="dpe_shot_")
    results: dict[str, dict] = {}
    try:
        for factor in factors:
            d = os.path.join(root, f"x{factor}")
            n = build(spark, factor, d)
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            row: dict = {"rows": n}
            digests = {}
            for label, parts in (("unsplit", 1), ("auto", None)):
                # rep 1: noop sink; rep 2: the order-independent digest
                # aggregation (same full compute plus a tiny agg) — min
                # of the two is the warm timing, digest the equality pin
                t0 = time.time()
                ivf_knn_join(
                    emb, emb, "vec_id", "vec_id", k=K,
                    n_cells=N_CELLS, n_probe=N_PROBE,
                    include_self=False, cell_parts=parts, query_parts=parts,
                ).write.format("noop").mode("overwrite").save()
                best = time.time() - t0
                t0 = time.time()
                digests[label] = (
                    ivf_knn_join(
                        emb, emb, "vec_id", "vec_id", k=K,
                        n_cells=N_CELLS, n_probe=N_PROBE,
                        include_self=False, cell_parts=parts, query_parts=parts,
                    )
                    .select(
                        # order-independent XOR digest (a bigint SUM of
                        # xxhash64 values overflows under ANSI mode)
                        F.expr("bit_xor(xxhash64(vec_id_q, vec_id_c, cos, rank))").alias("h"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .head()
                )
                best = min(best, time.time() - t0)
                row[label] = round(best, 2)
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
            assert digests["unsplit"] == digests["auto"], (
                f"digest mismatch at x{factor}: {digests}"
            )
            row["digest_equal"] = True
            results[str(factor)] = row
            print(
                f"x{factor:<4} ({n:>7} rows) unsplit {row['unsplit']:6.2f}s  "
                f"auto-split {row['auto']:6.2f}s  digests equal",
                flush=True,
            )
        print(json.dumps({"hot_frac": HOT_FRAC, "n_cells": N_CELLS,
                          "n_probe": N_PROBE, "k": K, "results": results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
