"""Training-data mixture design from excess loss: the selection family
end to end.

Given a raw pool and a small high-quality reference slice, three
engine operators stack into a mixture recipe without any external
model:

1. `excess_lm_scores` — per-DOCUMENT signal: how much more likely the
   reference bigram LM finds a document than the pool's own LM
   (RHO-1 / Selective-LM criterion). Positive excess = under-
   represented-but-reference-like; negative = pool boilerplate.
2. `domain_mixture_weights` — per-DOMAIN reduction (DoReMi-style):
   clipped per-domain average excess, normalized to exact-integer ppm
   sampling weights, with a uniform-smoothing knob.
3. `weighted_sample` family / `budget_select` — the weights then
   drive the actual draw (not shown at scale here; see
   examples/03_training_data_ops.py).

Everything is exact bigint arithmetic after one micro-rounded ln per
bigram, so the whole recipe is reproducible bit-for-bit from the
corpus alone — the property that lets the driver's DuckDB twin check
it row by row.

Run: python examples/10_data_mixing.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import (
    domain_mixture_weights,
    excess_lm_scores,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = eng.get_spark("data-mixing", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    target = docs.where(F.col("lang") == "en")

    print("== per-document excess (top/bottom 3 by avg excess) ==")
    ex = excess_lm_scores(docs, target).localCheckpoint(eager=False)
    ex.orderBy(F.col("avg_excess_micro").desc()).show(3, truncate=False)
    ex.orderBy(F.col("avg_excess_micro").asc()).show(3, truncate=False)

    print("== domain mixture, pure excess-proportional ==")
    domain_mixture_weights(docs, target).orderBy(
        F.col("weight_ppm").desc()
    ).show(10, truncate=False)

    print("== same, smoothed 20% toward uniform (DoReMi's s) ==")
    sm = domain_mixture_weights(docs, target, smoothing_ppm=200_000)
    sm.orderBy(F.col("weight_ppm").desc()).show(10, truncate=False)
    tot = sm.agg(F.sum("weight_ppm")).head()[0]
    print(f"weight mass: {tot} ppm (two floor divisions per weight "
          f"undershoot 1e6 by at most 2*n_domains - 2 ppm, never overshoot)")


if __name__ == "__main__":
    main()
