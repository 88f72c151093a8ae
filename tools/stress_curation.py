"""Scaling stress for the curation export tail (VERDICT r9 #4):
`balanced_shards` and `budget_select` both rest on
`assign_global_ids`' two-pass distributed prefix sum — one range
shuffle + an in-partition window + a bounded (num_partitions-row)
driver round-trip. This tool times both operators on synthetic
corpora of ``1M x factor`` rows and on a skewed-WEIGHT axis (one row's
weight 10^6x the median), because these are the steps a 100 TB run
ends with and the prefix-sum shuffle is their only scale risk.

Expected shape:
- near-linear wall growth with row count (the range shuffle moves
  every row once; the window is in-partition; the driver round-trip is
  num_partitions rows regardless of corpus size);
- the skew axis ~flat vs uniform at the same row count: the range
  partitioning keys on the ORDER (weight, tiebreak) rank, so a heavy
  weight VALUE does not concentrate rows — weight skew is not key skew
  here, unlike a groupBy(weight).

Weights are hash-derived from the row id (deterministic, no RNG), so
runs are reproducible.

Usage: python tools/stress_curation.py [factors...]   (default: 1 4 16)
Prints one row per (factor, op, axis) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
    balanced_shards,
    budget_select,
)

BASE_ROWS = 1_000_000
N_SHARDS = 64
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def corpus(spark, factor: int, skew: bool):
    """(id, w) rows: w hash-uniform in [1, 1000]; skew axis gives row 0
    a weight 10^6x the median (one document >> median)."""
    n = BASE_ROWS * factor
    df = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("w"),
    )
    if skew:
        df = df.withColumn(
            "w", F.when(F.col("id") == 0, F.lit(500_000_000)).otherwise(F.col("w"))
        )
    # materialize the input once so timings measure the operators, not
    # the range generation
    return df.localCheckpoint(eager=True)


def timed_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [1, 4, 16]
    spark = get_spark("stress-curation", cpus=CPUS)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows = []
    for factor in factors:
        for axis in ("uniform", "skew"):
            df = corpus(spark, factor, skew=(axis == "skew"))
            n = BASE_ROWS * factor
            t_sh = timed_noop(balanced_shards(df, "w", N_SHARDS, "id"))
            # budget: half the total weight — the cut lands mid-corpus
            total = df.agg(F.sum("w")).head()[0]
            t_bs = timed_noop(budget_select(df, "w", "w", int(total) // 2, "id"))
            rows.append({
                "factor": factor, "rows": n, "axis": axis,
                "balanced_shards_s": t_sh, "budget_select_s": t_bs,
                "driver_roundtrip_rows": n_part,
            })
            print(
                f"x{factor:<3} {axis:<8} rows={n:>9,} "
                f"balanced_shards {t_sh:6.2f}s  budget_select {t_bs:6.2f}s "
                f"(driver round-trip: {n_part} rows)",
                flush=True,
            )
            df.unpersist()
            # global_running_sum localCheckpoints its range-partitioned
            # input; those blocks are freed by the ContextCleaner only
            # after GC notices the orphaned refs — nudge both runtimes so
            # a later factor's timing never pays an earlier factor's
            # storage eviction (measured: a stale 16M-row run read 3x
            # slower before this)
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
    print(json.dumps({"base_rows": BASE_ROWS, "n_shards": N_SHARDS,
                      "shuffle_partitions": n_part, "rows": rows}))


if __name__ == "__main__":
    main()
