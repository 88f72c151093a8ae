"""A/B: bucketed edge layout vs per-round shuffle for the iterative
graph family (VERDICT r8 #4).

pagerank / HITS re-join the SAME edge list on the SAME key every
round; the baseline pays an edge-sized exchange per round, while a
one-time ``layout.bucketed_table`` write pays that key's shuffle once
and serves every round from a bucketed scan (``prelaid=True`` — the
operator then plans the per-round join with NO exchange and no sort on
the edge side; verified from the executed plan by this tool).

Edges are the sf0.1 purchase graph replicated ``factor``× with
OFFSET custkey/suppkey/orderkey, so the edge set grows linearly —
the 100 TB shape where the lever matters (stress.py's replication
deliberately saturates the node set instead; that is the wrong axis
here). Both variants read the same materialized parquet edge list, so
the measured difference is purely the per-round layout.

Results must be BIT-IDENTICAL between variants (the operators'
exact-integer contract); the tool asserts digest equality.

Usage: python tools/graph_layout_ab.py [factors...]   (default: 1 4)
Prints one row per (factor, query, variant) and a final JSON line.
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
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits, pagerank
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.layout import bucketed_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BUCKETS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ITER = 4
HITS_ITER = 3


def build_edges(spark, factor: int, out: str) -> None:
    """Directed c->s purchase edges, replicated with offset keys so
    the DISTINCT edge set grows ~factor x, written once to parquet."""
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    okey = orders.agg(F.max("o_orderkey")).head()[0] + 1
    ckey = orders.agg(F.max("o_custkey")).head()[0] + 1
    skey = lineitem.agg(F.max("l_suppkey")).head()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    o = (
        orders.select("o_orderkey", "o_custkey", rep)
        .select(
            (F.col("o_orderkey") + F.col("__rep") * okey).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("__rep") * ckey).alias("o_custkey"),
        )
    )
    li = (
        lineitem.select("l_orderkey", "l_suppkey", rep)
        .select(
            (F.col("l_orderkey") + F.col("__rep") * okey).alias("l_orderkey"),
            (F.col("l_suppkey") + F.col("__rep") * skey).alias("l_suppkey"),
        )
    )
    (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
        .repartition(BUCKETS)
        .write.mode("overwrite")
        .parquet(out)
    )


def digest(df) -> tuple:
    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: exact, cannot hit ANSI bigint overflow
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).head()
    return (row["n"], row["h"])


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [1, 4]
    spark = get_spark("graph-layout-ab", cpus=BUCKETS)
    work = tempfile.mkdtemp(prefix="graph_ab_")
    results: dict = {"buckets": BUCKETS, "pr_iter": PR_ITER, "hits_iter": HITS_ITER, "rows": []}
    try:
        for factor in factors:
            epath = os.path.join(work, f"edges_x{factor}")
            build_edges(spark, factor, epath)
            directed = spark.read.parquet(epath)
            n_edges = directed.count()
            print(f"-- factor {factor}: {n_edges} directed edges", flush=True)

            # ---- pagerank (suite shape: both directions) ----------------
            # "checkpoint" reproduces the pre-r9 internal pinning exactly:
            # prelaid=True skips the operator's pin, and the input is the
            # same localCheckpointed unknown-partitioning scan it used.
            both = directed.union(
                directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            d_ckpt, t_ckpt = timed(lambda: digest(pagerank(
                both.localCheckpoint(eager=False), iterations=PR_ITER, prelaid=True)))
            eb, t_build = timed(
                lambda: bucketed_table(both, f"ab_pr_src_{factor}", "src", BUCKETS)
            )
            d_buck, t_buck = timed(
                lambda: digest(pagerank(eb, iterations=PR_ITER, prelaid=True))
            )
            d_pin, t_pin = timed(lambda: digest(pagerank(both, iterations=PR_ITER)))
            assert d_ckpt == d_buck == d_pin, f"pagerank digests diverge: {d_ckpt} {d_buck} {d_pin}"
            results["rows"].append(
                {"factor": factor, "query": "pagerank", "checkpoint_s": t_ckpt,
                 "build_s": t_build, "bucketed_run_s": t_buck, "pinned_s": t_pin,
                 "edges": 2 * n_edges}
            )
            print(f"pagerank   x{factor}: checkpoint {t_ckpt}s | bucketed {t_build}s"
                  f" + {t_buck}s | pinned {t_pin}s (digests ok)", flush=True)

            # ---- hits (suite shape: directed c->s) -----------------------
            collapsed = directed.distinct()
            d_ckpt, t_ckpt = timed(lambda: digest(hits(
                collapsed.localCheckpoint(eager=False), iterations=HITS_ITER, prelaid=True)))
            es, t_b1 = timed(
                lambda: bucketed_table(collapsed, f"ab_h_src_{factor}", "src", BUCKETS)
            )
            ed, t_b2 = timed(
                lambda: bucketed_table(collapsed, f"ab_h_dst_{factor}", "dst", BUCKETS)
            )
            d_buck, t_buck = timed(
                lambda: digest(
                    hits(es, iterations=HITS_ITER, prelaid=True, edges_by_dst=ed)
                )
            )
            d_pin, t_pin = timed(lambda: digest(hits(directed, iterations=HITS_ITER)))
            assert d_ckpt == d_buck == d_pin, f"hits digests diverge: {d_ckpt} {d_buck} {d_pin}"
            results["rows"].append(
                {"factor": factor, "query": "hits", "checkpoint_s": t_ckpt,
                 "build_s": round(t_b1 + t_b2, 2), "bucketed_run_s": t_buck,
                 "pinned_s": t_pin, "edges": n_edges}
            )
            print(f"hits       x{factor}: checkpoint {t_ckpt}s | bucketed "
                  f"{t_b1 + t_b2:.2f}s + {t_buck}s | pinned {t_pin}s (digests ok)",
                  flush=True)
            for tbl in (f"ab_pr_src_{factor}", f"ab_h_src_{factor}", f"ab_h_dst_{factor}"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
