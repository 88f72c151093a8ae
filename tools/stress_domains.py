"""domain_mixture_weights under domain-count growth and the all-clipped
fixture (VERDICT r12 #6 — the r12 stress column covered pool growth;
this adds the other axis).

The operator's scale claim is that per-domain state is four bigints, so
the domain table is executor-trivial at ANY domain count: the weights
stage is one id-keyed join, one counted shuffle onto domain keys, and a
broadcast 1-row totals frame. This tool re-keys the sf0.1 documents'
``source`` column to ``n_domains`` synthetic domains via a content hash
of doc_id (so domain population stays uniform as the count grows) and
times:

* ``mixture`` — the standard pool-vs-target (lang='en') run; and
* ``all_clipped`` — pool == target, where every per-domain excess is
  exactly 0, every clip is 0, and the operator must take the uniform
  fallback branch (weight = 1e6 div n_domains for every domain) — the
  branch is asserted, not just timed.

Wall should be FLAT in n_domains (the excess pass dominates and never
sees the domain column; only the final counted shuffle keys on it).

Usage: python tools/stress_domains.py [n_domains...]   (default: 20 200 2000)
Prints one row per (n_domains, variant) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import domain_mixture_weights

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [20, 200, 2000]
    spark = get_spark("stress-domains", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs0 = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    rows = []
    for nd in counts:
        docs = docs0.withColumn(
            "source",
            F.concat(F.lit("d"), F.pmod(F.xxhash64("doc_id"), F.lit(nd)).cast("string")),
        ).localCheckpoint(eager=True)
        target = docs.where(F.col("lang") == "en")

        t0 = time.time()
        out = domain_mixture_weights(docs, target).collect()
        t_mix = round(time.time() - t0, 2)
        tot = sum(r["weight_ppm"] for r in out)
        assert 1_000_000 - 2 * len(out) < tot <= 1_000_000, (nd, tot)

        t0 = time.time()
        uni = domain_mixture_weights(docs, docs).collect()
        t_clip = round(time.time() - t0, 2)
        # pool == target: excess identically 0 -> every clip 0 -> the
        # uniform fallback branch, exactly
        assert all(r["excess_micro_sum"] == 0 for r in uni), nd
        assert {r["weight_ppm"] for r in uni} == {1_000_000 // len(uni)}, nd

        rows.append(
            {"n_domains": nd, "domains_out": len(out), "mixture_s": t_mix,
             "all_clipped_s": t_clip, "all_clipped_domains": len(uni)}
        )
        print(
            f"n_domains={nd:5d}: mixture {t_mix:6.2f}s ({len(out)} domains out)"
            f" | all-clipped uniform {t_clip:6.2f}s ({len(uni)} domains)",
            flush=True,
        )
        docs._jdf.queryExecution().analyzed().rdd().unpersist(False)
    print(json.dumps({"base": BASE, "rows": rows}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
