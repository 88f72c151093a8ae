"""Pool-scale bitext-style pair mining: exact vs distributed IVF path.

`margin_mine` is the exact Artetxe-Schwenk margin criterion, but it
collects and broadcasts the query side — contractually capped at
`max_query_rows` (100k). Mining ALL of a large left corpus against a
large right corpus needs `margin_mine_ivf`: a shared coarse quantizer,
both sides cogrouped per cell, every vector crossing the shuffle once.

This example demonstrates the three operating points on one dataset:

1. exact `margin_mine` (the ground truth at suite scale);
2. `margin_mine_ivf` with an EXHAUSTIVE probe (n_probe == n_cells) —
   digest-checked IDENTICAL to the exact path: the distributed
   machinery changes the plan, never the answer;
3. `margin_mine_ivf` with a real probe budget (n_probe << n_cells) —
   the 100 TB configuration — reporting how many of the exact path's
   mutual pairs it recovers.

It also shows the amortization lever for repeated mining jobs: fit the
quantizer ONCE (`_fit_cells` via the exposed `cent_df` parameter is
private; the public lever is simply calling margin_mine_ivf with the
same seed/n_cells — or holding the two ivf_knn_join halves yourself).

Run: python examples/09_pool_scale_mining.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
    margin_mine,
    margin_mine_ivf,
)


def digest(df) -> tuple:
    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).head()
    return (row["n"], row["h"])


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark("example-pool-mining", cpus=8)

    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    left = emb.where(F.col("vec_id") % 2 == 0)
    right = emb.where(F.col("vec_id") % 2 == 1)
    n_l, n_r = left.count(), right.count()
    print(f"corpora: {n_l} left x {n_r} right")

    print("== 1. exact margin_mine (query side broadcast) ==")
    exact = margin_mine(left, right, "vec_id", "vec_id", knn_k=4)
    d_exact = digest(exact)
    print(f"digest: {d_exact}")
    exact.orderBy(F.col("margin_ppm").desc()).show(5)

    print("== 2. margin_mine_ivf, exhaustive probe: must be identical ==")
    ivf_full = margin_mine_ivf(
        left, right, "vec_id", "vec_id", knn_k=4, n_cells=8, n_probe=8
    )
    d_full = digest(ivf_full)
    assert d_full == d_exact, f"digests diverge: {d_full} vs {d_exact}"
    print(f"digest match: {d_full}")

    print("== 3. margin_mine_ivf, probe budget n_probe=2 of 8 cells ==")
    ivf_fast = margin_mine_ivf(
        left, right, "vec_id", "vec_id", knn_k=4, n_cells=8, n_probe=2
    )
    want = {(r["vec_id_l"], r["vec_id_r"]) for r in exact.where("mutual").collect()}
    got = {(r["vec_id_l"], r["vec_id_r"]) for r in ivf_fast.where("mutual").collect()}
    rec = len(want & got) / max(1, len(want))
    print(f"mutual-pair recall at 1/4 the scan: {rec:.2f} ({len(want & got)}/{len(want)})")
    assert rec >= 0.5, "probe budget recall collapsed — check quantizer fit"


if __name__ == "__main__":
    main()
