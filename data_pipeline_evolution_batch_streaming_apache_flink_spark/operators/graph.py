"""Iterative graph analytics over edge-list DataFrames.

The reference pipeline's data model is relational, but its entity graph
(clients ↔ orders ↔ pizzas, users ↔ sessions) is exactly the shape
link-analysis runs on at corpus scale: rank hosts/documents by citation
structure before sampling a crawl, weight sources by influence, find
hub accounts. :func:`pagerank` is the canonical such computation —
implemented like :func:`~..dedup.connected_components`: a driver-side
loop of shuffle-bounded DataFrame rounds, lineage truncated per round.

Determinism contract (same policy as ``semantic.kmeans_quantized``):
all rank mass lives in EXACT integer fixed-point units (``scale``
micro-mass total) and every division is integer division, so the
result is bit-identical on any partition layout and reproducible by an
unrolled SQL twin on any engine — no float accumulation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Per iteration, with integer division throughout::

        contrib(u)   = rank(u) div outdeg(u)          -- u's share per edge
        rank'(v)     = base + (damping_pct * Σ_in contrib(u)) div 100
        base         = ((100 - damping_pct) * scale) div (100 * N)

    Nodes are everything appearing as ``src`` or ``dst``; initial rank is
    ``scale div N``. Dangling nodes (no out-edges) keep receiving rank
    but redistribute none — the standard dropped-mass simplification, so
    total mass shrinks slightly per round rather than being re-injected
    (exactness matters more than the constant factor here; ordering is
    unaffected for connected graphs). Undirected graphs: pass both edge
    directions.

    Scale shape: each round is one equi-join of the edge list with the
    N-row rank table on ``src`` followed by one ``groupBy(dst)`` sum —
    two key-hash shuffles of bounded width per round, no driver-side
    data movement. ``localCheckpoint`` truncates lineage every round so
    K iterations do not stack K plans (same pattern as
    ``connected_components``). On a real cluster, pre-partitioning the
    edge list by ``src`` once (bucketed write) removes the edge-side
    shuffle from every round.

    Returns ``(node, rank_micro)`` — rank in integer ``scale`` units.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # node table with degree (0-outdeg dangling nodes carried with NULL->no contrib)
    base_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left"
    ).localCheckpoint(eager=True)
    n = base_nodes.count()
    if n == 0:
        return base_nodes.select("node", F.lit(0).cast("bigint").alias("rank_micro"))
    init = scale // n
    base = ((100 - damping_pct) * scale) // (100 * n)

    ranks = base_nodes.select("node", "outdeg", F.lit(init).cast("bigint").alias("rank_micro"))
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"),
                    F.expr("rank_micro div outdeg").alias("__contrib"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__contrib").alias("__in"))
        )
        ranks = (
            base_nodes.join(contribs, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(__in, 0)) div 100")
                ).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank_micro")
