"""Capture ``explain('formatted')`` for suite queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag_dir_suffix> <query> [query ...]
Writes plans/$PLANS_ROUND/<query>_<tag>.txt (default round dir: r14)
for each query (tag is e.g. ``before`` / ``after``). Iterative operators (pagerank/hits/kcore/...)
execute their driver-side rounds at DataFrame-construction time; for
those the captured plan is the final-round output plan — the
per-round shape is documented in OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r14"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = eng.get_spark("capture-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for name in names:
        df = suite.QUERIES[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
