"""Capture ``explain('formatted')`` with ``localCheckpoint`` no-op'd.

A checkpointed frame scans as ``ExistingRDD``, which hides the subtree
that actually executes (cogroups, windows, joins) from the committed
plan dumps. This capture variant monkeypatches
``DataFrame.localCheckpoint`` to identity during query CONSTRUCTION so
the full logical tree stays visible — the dumped plan is exactly what
materializes into the checkpoints at run time. Eager-executing
operators are also left lazy by the patch, so nothing runs.

Usage: python tools/capture_core_plans.py <tag> <query> [query ...]
Writes plans/$PLANS_ROUND/<query>_core_<tag>.txt (default dir: r14).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite
from pyspark.sql import DataFrame

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
    spark = eng.get_spark("capture-core-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # Spark 4 routes sessions through pyspark.sql.classic.dataframe,
    # whose concrete method shadows the base class — patch both.
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

        ClassicDataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    except ImportError:
        pass
    for name in names:
        df = suite.QUERIES[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{name}_core_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
