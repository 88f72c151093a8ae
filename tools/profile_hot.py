"""Phase-level profiling of the round-13 optimization targets at sf0.1.

Replicates the suite queries' internal phases and times each
materialization separately (noop sink / count), so the optimization
round can attribute warm seconds to edge derivation vs. iterations vs.
ranking instead of guessing (guide section 1: measure first).

Usage: python tools/profile_hot.py [target ...]
Targets: hits, pagerank, ppr, linkpred, ts_lagged, margin_ivf
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, df=None, action=None):
    t0 = time.time()
    if action is not None:
        out = action()
    else:
        df.write.format("noop").mode("overwrite").save()
        out = None
    print(f"  {label:42s} {time.time() - t0:7.3f}s")
    return out


def warm(spark, name, reps=2):
    fn = suite.QUERIES[name]
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"== {name}: warm min {best:.3f}s over {reps} reps")
    return best


def profile_hits(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    warm(spark, "hits_scores")
    tbl = suite.load_tables(spark, SF, ("orders", "lineitem"))
    edges = (
        tbl["orders"]
        .join(tbl["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    t("edge derivation (distinct)", edges)
    e = edges.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = t("nodes distinct count", action=lambda: nodes.count())
    print(f"    (n_nodes = {n})")
    t0 = time.time()
    out = hits(edges, iterations=3)
    out.write.format("noop").mode("overwrite").save()
    print(f"  {'full hits() on derived edges':42s} {time.time() - t0:7.3f}s")


def profile_pagerank(spark):
    warm(spark, "pagerank")
    warm(spark, "pagerank_personalized")


def profile_linkpred(spark):
    warm(spark, "link_prediction")


def profile_ts_lagged(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import (
        _centered_series,
    )

    warm(spark, "ts_lagged_topk")
    q = suite.QUERIES["ts_lagged_topk"]
    import inspect

    print("   source:", inspect.getsource(q).split("return")[-1][:200])


def profile_margin_ivf(spark):
    warm(spark, "margin_mine_ivf")
    warm(spark, "margin_mine")


TARGETS = {
    "hits": profile_hits,
    "pagerank": profile_pagerank,
    "linkpred": profile_linkpred,
    "ts_lagged": profile_ts_lagged,
    "margin_ivf": profile_margin_ivf,
}


def main():
    names = sys.argv[1:] or list(TARGETS)
    spark = eng.get_spark("profile-hot", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    for nm in names:
        TARGETS[nm](spark)


if __name__ == "__main__":
    main()
