"""k-center coreset scaling stress: grow the corpus (same jittered
replication as tools/stress_margin.py) and time kcenter_select — the
evidence that the k sequential narrow passes stay linear in corpus
size and that the per-round 1-row argmax collects are the only driver
traffic.

Usage: python tools/stress_kcenter.py [--k=N] [factors...]
(default: k=16, factors 8 32 128; --k adds the center-count axis —
VERDICT r11 #6 extends the evidence to the 1M-row regime via factor
500 and a k=64 run)
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
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.semantic import kcenter_select
from tools.stress_margin import build

K = 16


def main() -> None:
    k = K
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        else:
            args.append(a)
    factors = [int(a) for a in args] or [8, 32, 128]
    spark = get_spark("stress-kcenter", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).mapInPandas(lambda it: it, "id long").count()
    root = tempfile.mkdtemp(prefix="dpe_skc_")
    results: dict[str, dict] = {}
    try:
        for factor in factors:
            d = os.path.join(root, f"x{factor}")
            n = build(spark, factor, d)
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                out = kcenter_select(emb, "vec_id", "embedding", k=k)
                out.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[str(factor)] = {"rows": n, "k": k, "sec": round(best, 2)}
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            print(f"x{factor:<4} ({n:>8} rows, k={k}) kcenter_select {best:6.2f}s", flush=True)
        print(json.dumps({"results": results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
