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

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import unpersist_local_checkpoint

__all__ = [
    "pagerank",
    "triangle_stats",
    "k_hop_reach",
    "label_propagation",
    "hits",
    "link_prediction",
    "k_core",
    "degree_assortativity",
    "local_clustering",
]


def _pin_by_key(df: DataFrame, key: str) -> DataFrame:
    """Materialize an iteration-static relation in RAM, hash-partitioned
    and sorted WITHIN partitions on the per-round join key.

    ``InMemoryRelation`` preserves outputPartitioning AND ordering, so
    every round's sort-merge join plans with NO exchange and NO sort on
    this side — only the small per-round score/label table moves. A
    ``localCheckpoint`` erases both properties (``Scan ExistingRDD``
    reports unknown partitioning) and re-pays an edge-list exchange +
    sort EVERY round; measured at sf0.1×4/×8 the pin halves
    pagerank/HITS wall time (tools/graph_layout_ab.py, NOTES r9).
    Default MEMORY_AND_DISK storage spills gracefully when the edge
    list outgrows executor memory. Callers unpersist() after their
    final round is eagerly checkpointed.

    NOT free: the pin costs one exchange + sort + cache fill up front,
    which only repays when the per-round join would otherwise shuffle
    the edge side. On SMALL graphs the per-round score table broadcasts
    (AQE runtime re-plan) and the edge side never shuffles — there the
    pin is pure overhead (interleaved A/B at suite sf0.1: +20-35%).
    Callers therefore gate it on their node count (``PIN_NODES``):
    below the threshold the score side is kilobytes → always broadcast;
    above it, broadcastability fades exactly as the per-round shuffle
    grows, the regime the pin wins."""
    pinned = df.repartition(F.col(key)).sortWithinPartitions(key).persist()
    pinned.count()  # eager fill: round 1 must read the cache, not race it
    return pinned


#: Node-count gate for _pin_by_key (see its docstring). ≤10k nodes the
#: per-round score/label table is a guaranteed runtime broadcast and the
#: checkpoint pin is faster; well above it the rounds degrade to
#: exchange-per-round SMJ, where the pinned layout halves wall time.
PIN_NODES = 10_000

#: Node-count ceiling for EXPLICITLY broadcasting the per-round
#: score/label table (guide §3.1: broadcast the side that fits, and
#: hint it — size ESTIMATES for a post-aggregation side are wrong
#: often enough that the planner instead broadcast the EDGE list here,
#: 22 MiB per half-round at suite scale, r13 plan audit). A score row
#: is an id plus one or two bigints (~40 B serialized), so 2M nodes is
#: a ~80 MB hash relation — comfortably inside executor memory at any
#: cluster size, and far under the 8 GB broadcast hard cap. The gate is
#: computed from the runtime node count, so it is scale-adaptive, not
#: a local-mode constant: a 100 TB corpus graph (n >> 2M) takes the
#: pinned sort-merge path exactly as before.
BROADCAST_NODES = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    weight: str | None = None,
    seeds: DataFrame | None = None,
    seed_col: str | None = None,
    prelaid: bool = False,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Per iteration, with integer division throughout::

        contrib(u->v) = (rank(u) * w(u,v)) div W(u)   -- u's share per edge
        rank'(v)      = base + (damping_pct * Σ_in contrib(u->v)) div 100
        base          = ((100 - damping_pct) * scale) div (100 * N)

    where ``w`` is the optional INTEGER edge weight column (``weight``;
    parallel edges sum) and ``W(u)`` its out-sum — unweighted input is
    the ``w = 1`` special case (then ``W = outdeg`` and the contrib
    reduces to the classic ``rank div outdeg``). Integer weights keep
    the arithmetic exact: ``rank * w`` stays within bigint for
    ``scale * Σw < 2^63`` (at the default scale, total weight per node
    up to ~9e6 — co-occurrence counts and affinity scores fit; rescale
    down for heavier weights).

    ``seeds`` switches to PERSONALIZED PageRank (random walk with
    restart): the teleport mass lands only on the seed set — initial
    rank and the per-round base term are ``scale div |S ∩ nodes|`` /
    ``((100-damping)·scale) div (100·|S ∩ nodes|)`` for seed nodes and
    ZERO elsewhere — so ranks measure relevance TO the seeds (topic- /
    segment-conditioned importance), not global importance. Seeds
    absent from the graph are ignored; same exact-integer discipline.

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
    ``connected_components``). Pre-partitioning the edge list by
    ``src`` once (``layout.bucketed_table``) removes the edge-side
    exchange from every round: pass the bucketed scan with
    ``prelaid=True`` so the operator trusts the storage layout instead
    of re-pinning via ``localCheckpoint`` (which would erase the
    scan's distribution metadata). ``prelaid`` expects an edge list
    that is already a cheap materialized scan; with ``weight`` the
    parallel-edge collapse re-shuffles on (src,dst) regardless, so
    there the flag only skips the pin.

    Returns ``(node, rank_micro)`` — rank in integer ``scale`` units.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    # the edge list is read EVERY iteration: pin one materialization by
    # RDD identity, or each round re-executes the caller's whole edge
    # derivation (for the suite query: an orders⋈lineitem distinct)
    if weight is None:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    else:
        # collapse parallel edges by weight sum; non-positive weights drop
        e = (
            edges.select(
                F.col(src).alias("src"), F.col(dst).alias("dst"),
                F.col(weight).cast("bigint").alias("__w"),
            )
            .where(F.col("__w") > 0)
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
    # prelaid only vouches for the CALLER's input layout; the weighted
    # parallel-edge collapse above is derived work either way and must
    # still be pinned, or every round re-runs its scan + (src,dst)
    # shuffle (review r9).
    if not prelaid or weight is not None:
        e = e.localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    if weight is None:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    else:
        outdeg = e.groupBy("src").agg(F.sum("__w").alias("outdeg"))
    # node table with degree (0-outdeg dangling nodes carried with NULL->no contrib)
    base_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left"
    )
    if seeds is not None:
        scol = seed_col or seeds.columns[0]
        seed_nodes = seeds.select(F.col(scol).alias("node")).distinct()
        base_nodes = base_nodes.join(
            seed_nodes.withColumn("__seed", F.lit(True)), "node", "left"
        ).withColumn("__seed", F.coalesce("__seed", F.lit(False)))
    base_nodes = base_nodes.localCheckpoint(eager=True)
    n = base_nodes.count()
    if n == 0:
        return base_nodes.select("node", F.lit(0).cast("bigint").alias("rank_micro"))
    if seeds is not None:
        n_seed = base_nodes.where("__seed").count()
        if n_seed == 0:
            raise ValueError("no seed appears in the graph — personalized ranks undefined")
        init_col = F.when(F.col("__seed"), F.lit(scale // n_seed)).otherwise(F.lit(0))
        base_expr = (
            f"CASE WHEN __seed THEN {((100 - damping_pct) * scale) // (100 * n_seed)}"
            " ELSE 0 END"
        )
    else:
        init_col = F.lit(scale // n)
        base_expr = str(((100 - damping_pct) * scale) // (100 * n))
    carry = ["node", "outdeg"] + (["__seed"] if seeds is not None else [])

    # Two regimes (guide §3.1, r13 plan audit — same scheme as
    # :func:`hits`). Small graphs (n ≤ BROADCAST_NODES): broadcast-HINT
    # the per-round rank table (an eager checkpoint scans as
    # ExistingRDD with an unknowably-large size estimate, so the
    # planner otherwise broadcasts the EDGE list every round) and keep
    # the checkpointed edges as the streamed probe side. Big graphs:
    # re-lay the checkpointed edges once (cheap: reads the checkpoint,
    # not the caller's derivation) so every round's SMJ is exchange-
    # and sort-free on this side.
    small = n <= BROADCAST_NODES
    pinned = not prelaid and not small
    if pinned:
        e = _pin_by_key(e, "src")

    ranks = base_nodes.select(*carry, init_col.cast("bigint").alias("rank_micro"))
    contrib = (
        "rank_micro div outdeg" if weight is None
        else "(rank_micro * __w) div outdeg"
    )
    prev_ranks: DataFrame | None = None
    for _ in range(iterations):
        rank_side = ranks.filter(F.col("outdeg").isNotNull()).select(
            F.col("node").alias("src"), "rank_micro", "outdeg"
        )
        if small:
            rank_side = F.broadcast(rank_side)
        contribs = (
            e.join(rank_side, "src")
            .select(F.col("dst").alias("node"), F.expr(contrib).alias("__contrib"))
            .groupBy("node")
            .agg(F.sum("__contrib").alias("__in"))
        )
        if small:
            contribs = F.broadcast(contribs)
        ranks = (
            base_nodes.join(contribs, "node", "left")
            .select(
                *carry,
                (
                    F.expr(base_expr)
                    + F.expr(f"({damping_pct} * coalesce(__in, 0)) div 100")
                ).cast("bigint").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
        # the new eager checkpoint has materialized; the prior round's
        # blocks are dead — free them (the kcenter_select storage
        # discipline, ADVICE r11). Never touches base_nodes or the
        # final round, which the returned select still reads.
        if prev_ranks is not None:
            unpersist_local_checkpoint(prev_ranks)
        prev_ranks = ranks
    if pinned:
        e.unpersist()  # ranks are eagerly checkpointed; the pin is done
    if prev_ranks is not None:
        # every round read base_nodes; with the final ranks checkpoint
        # materialized, its blocks are dead too (the returned select
        # reads only the last ranks checkpoint)
        unpersist_local_checkpoint(base_nodes)
    return ranks.select("node", "rank_micro")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle census of an undirected graph — one summary row
    ``(n_nodes, n_edges, n_wedges, n_triangles, gcc_micro)``.

    Triangle density is the classic structure signal over co-occurrence
    graphs (tightly-knit product/source/author communities vs. random
    co-mentions); the global clustering coefficient ``3T/W`` is emitted
    micro-rounded (single double division — house determinism policy),
    with the raw integer counts alongside so any downstream threshold
    stays exact.

    Input edges may arrive in either orientation with duplicates and
    self-loops; they collapse to canonical ``a < b`` first. Algorithm is
    the standard DEGREE-ORIENTED wedge join (Suri-Vassilvitskii shape):

    - orient every edge from the endpoint with smaller ``(degree, id)``
      to the larger, so every vertex's OUT-degree is O(sqrt(m)) on any
      graph (arboricity bound) — the per-key fanout of the wedge
      self-join is bounded even on power-law graphs, which is exactly
      the skew that kills the naive id-oriented plan at 100 TB;
    - wedges = oriented ⋈ oriented on the center (one equi-join), each
      wedge ``(v1 < v2)`` closed by an equi-join against the canonical
      edge set — every triangle counted exactly once, no OR-join.

    ``n_wedges`` is the full-degree path count ``Σ C(deg, 2)`` (the GCC
    denominator), computed exactly in bigints from the degree table.

    Shuffles: dedup (1), degree count (1), two orientation joins keyed
    by endpoint, wedge self-join + closing join keyed by vertex/pair.
    All equi-joins; the degree table is #nodes rows (broadcastable for
    dimension-sized graphs, shuffle-joined otherwise — left to AQE).

    ``e``/``deg``/``oriented`` each feed multiple consumers, so each is
    lazily ``localCheckpoint``-ed: RDD identity guarantees one
    materialization per stage (AQE's stage reuse is submission-order
    opportunistic) — the upstream edge derivation runs exactly once
    however expensive it was.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # orient each edge from smaller (deg, id) endpoint to larger
    oriented = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("__da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("__db")), "b")
        .select(
            F.when(
                (F.col("__da") < F.col("__db"))
                | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("__o")
        )
        .select("__o.u", "__o.v")
        .localCheckpoint(eager=False)
    )
    wedges = (
        oriented.select(F.col("u"), F.col("v").alias("__v1"))
        .join(oriented.select(F.col("u"), F.col("v").alias("__v2")), "u")
        .where(F.col("__v1") < F.col("__v2"))
        .select(F.col("__v1").alias("a"), F.col("__v2").alias("b"))
    )
    tri = wedges.join(e, ["a", "b"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
    )
    return (
        nodes.crossJoin(counts)
        .crossJoin(tri)
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.coalesce(F.col("n_wedges"), F.lit(0)).cast("bigint").alias("n_wedges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.expr(
                "CASE WHEN n_wedges > 0 THEN CAST(round(CAST(3 * n_triangles AS DOUBLE)"
                " / CAST(n_wedges AS DOUBLE) * 1000000) AS BIGINT) END"
            ).alias("gcc_micro"),
        )
    )


def k_hop_reach(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str | None = None,
) -> DataFrame:
    """Bounded-depth reachability census — per hop ``h`` in 0..hops, how
    many distinct nodes are within ``h`` edges of the seed set. The
    crawl-frontier / influence-spread shape: "how far does this
    brand/domain/source reach in k steps", exact and engine-portable
    (set arithmetic only, no floats anywhere).

    Frontier BFS with the standard distributed optimization: each round
    joins only the CURRENT FRONTIER against the edge list (not the
    whole reached set), then anti-joins out already-reached nodes — per
    round two keyed shuffles bounded by frontier size, lineage truncated
    via localCheckpoint exactly like :func:`pagerank` rounds. The edge
    list is checkpointed once and reused by every round. Directed
    semantics: pass both directions for undirected graphs.

    Returns ``(hop, n_reached, n_new)`` — hops+1 rows; hop 0 counts the
    distinct seeds themselves (whether or not they appear in the graph).
    EAGER: the BFS rounds execute at call time (each round's count
    drives the next — same driver-side-loop contract as ``pagerank``'s
    node count); the returned DataFrame is the materialized census.
    """
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    scol = seed_col or seeds.columns[0]
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=False
    )
    frontier = seeds.select(F.col(scol).alias("node")).distinct().localCheckpoint(eager=True)
    # reached is kept as a LAZY UNION of the per-hop frontier
    # checkpoints (disjoint by construction), not re-checkpointed per
    # round (r14): copying the whole cumulative set every hop cost
    # O(hops x reached) block writes and one extra job per hop for a
    # frame only the anti-join reads. Total live storage is unchanged
    # (the frontiers partition the reached set); the union plan is a
    # flat stack of ExistingRDD scans, hops deep at most.
    frontiers = [frontier]
    reached = frontier
    n0 = frontier.count()
    rows = [(0, n0, n0)]
    n_frontier = n0
    for h in range(1, hops + 1):
        # Post-checkpoint frames scan as ExistingRDD with unknown size,
        # so the planner would SMJ both joins — shuffling the EDGE LIST
        # every hop. The driver knows both sides' exact counts (each
        # hop's count drives the loop anyway): below BROADCAST_NODES,
        # hint them broadcast so the edge list never shuffles and the
        # anti-join is map-side; above the gate, unchanged (same
        # runtime-count gate as pagerank/hits/connected_components).
        fr = frontier.withColumnRenamed("node", "src")
        if n_frontier <= BROADCAST_NODES:
            fr = F.broadcast(fr)
        rch = reached
        if rows[-1][1] <= BROADCAST_NODES:
            rch = F.broadcast(rch)
        nxt = (
            e.join(fr, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(rch, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = nxt.count()
        reached = reached.union(nxt)
        frontiers.append(nxt)
        frontier = nxt
        n_frontier = n_new
        rows.append((h, rows[-1][1] + n_new, n_new))
        if n_new == 0:
            # frontier exhausted: remaining hops add nothing
            rows.extend((i, rows[-1][1], 0) for i in range(h + 1, hops + 1))
            break
    # the census rows are already on the driver — nothing downstream
    # reads the BFS frames, so every frontier checkpoint is dead
    # (kcenter discipline, ADVICE r11)
    for f in frontiers:
        unpersist_local_checkpoint(f)
    return seeds.sparkSession.createDataFrame(
        rows, "hop int, n_reached bigint, n_new bigint"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Deterministic synchronous label propagation (LPA, Raghavan et al.
    2007): community detection WITHIN components — the complement of
    :func:`connected_components` (which only finds the components) on
    the same edge-list machinery.

    Every node starts labeled with itself; each round every node adopts
    the most-voted label among its IN-neighbors (its own current label
    does not vote), with the classic nondeterminism removed: votes are
    exact integer counts and ties break to the SMALLEST label, so the
    result is identical on any layout, any engine, any run. Node ids
    must be numeric (the deterministic argmax is ``max(struct(votes,
    -label))``). Undirected graphs: pass both edge directions, same
    contract as :func:`pagerank`. Nodes with no in-edges this round
    keep their previous label.

    Scale shape per round: one equi-join of the edge list with the
    N-row label table + one (node, label) count + one per-node argmax —
    key-hash shuffles of bounded width, no driver data movement;
    ``localCheckpoint`` truncates lineage so K rounds don't stack K
    plans. Fixed iteration count, no convergence collect: at corpus
    scale you run a budget, not a fixpoint test (the oracle unrolls the
    identical rounds).

    Returns ``(node, label)`` — equal labels = one community.
    """
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("src"),
            F.col(dst).cast("bigint").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Same two regimes as pagerank/hits (guide §3.1, r13 plan audit):
    # small graphs broadcast-HINT the per-round label table (the
    # checkpointed label side scans as ExistingRDD with an unknown size
    # estimate, so the planner otherwise broadcasts the edge list every
    # round); big graphs re-lay the checkpointed edges once for
    # exchange-free SMJ rounds.
    small = nodes.count() <= BROADCAST_NODES
    pinned = not small
    if pinned:
        e = _pin_by_key(e, "src")
    labels = nodes.withColumn("label", F.col("node"))
    rounds: list[DataFrame] = []
    for _ in range(iterations):
        label_side = labels.select(F.col("node").alias("src"), "label")
        if small:
            label_side = F.broadcast(label_side)
        votes = (
            e.join(label_side, "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        picked = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("votes"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).cast("bigint").alias("__new"))
        )
        if small:
            picked = F.broadcast(picked)
        labels = (
            labels.join(picked, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        rounds.append(labels)
    if pinned:
        labels.count()  # materialize the lazy rounds off the pin
        e.unpersist()
        # the count materialized every round's lazy checkpoint; all but
        # the final round's blocks are dead (kcenter discipline, ADVICE
        # r11). Only safe on this branch — unpinned returns are lazy
        # and an unpersisted local checkpoint cannot be recomputed.
        for r in rounds[:-1]:
            unpersist_local_checkpoint(r)
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**6,
    prelaid: bool = False,
    edges_by_dst: DataFrame | None = None,
) -> DataFrame:
    """Exact-integer HITS (Kleinberg hubs & authorities) over a
    directed edge list — the link-analysis complement of
    :func:`pagerank`: authorities are the pointed-AT nodes worth
    keeping (canonical sources in a crawl, best-selling suppliers in
    the reference's purchase graph), hubs the pointers-TO worth
    trusting as curators.

    Power iteration with MAX-normalization, all in exact integers::

        auth_raw(v) = Σ_{(u,v)∈E} hub(u)          -- one join + one sum
        auth(v)     = (auth_raw(v) * scale) div max_v auth_raw
        hub_raw(u)  = Σ_{(u,v)∈E} auth(v)
        hub(u)      = (hub_raw(u) * scale) div max_u hub_raw

    Any positive per-round rescaling leaves power iteration's fixpoint
    direction unchanged; max-normalization (vs the textbook L2) keeps
    every quantity a bigint so the result is bit-identical on any
    layout/engine and an unrolled SQL twin reproduces it exactly —
    same determinism contract as :func:`pagerank` /
    ``semantic.kmeans_quantized``. No floats anywhere.

    Overflow bound: ``raw ≤ d_max·scale`` and the normalize product is
    ``raw·scale``, so ``d_max·scale² < 2^63`` — at the default
    micro-scale that supports max in/out-degree ~9.2e6; lower ``scale``
    for heavier hub degrees (ordering is insensitive well past 1e3).

    Scale shape per round: two edge⋈scores equi-joins + two grouped
    sums + two 1-row max aggregates (broadcast back via crossJoin — no
    driver collect); ``localCheckpoint`` truncates lineage per round.
    Parallel edges collapse first (presence, not multiplicity).

    The two halves join the edge list on DIFFERENT keys (auth on
    ``src``, hub on ``dst``), so the full bucketed-layout lever is two
    one-time writes: ``prelaid=True`` with a src-bucketed scan as
    ``edges``, plus the SAME collapsed edge set bucketed by dst as
    ``edges_by_dst`` (``layout.bucketed_table`` for both). ``prelaid``
    also skips the internal ``distinct`` — the caller asserts the
    scans are already parallel-edge-collapsed (the bucketed write of a
    distinct edge set is exactly that), since a re-distinct would
    re-shuffle and erase the layout. ``edges_by_dst`` must hold the
    identical row set to ``edges`` or the result is undefined.

    Returns ``(node, hub_micro, auth_micro)`` for every node; nodes
    with no out-edges have hub 0, no in-edges auth 0.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if prelaid:
        e_dst = (
            edges_by_dst.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            if edges_by_dst is not None
            else e
        )
    else:
        e = e.distinct().localCheckpoint(eager=False)
        e_dst = e
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Two regimes (guide §3.1, r13 plan audit). Small graphs
    # (n ≤ BROADCAST_NODES): the per-round score table is a few MB at
    # most — broadcast-HINT it (the planner's estimate for a
    # post-aggregation side is unreliable enough that it instead
    # broadcast the 22 MiB edge list per half-round at suite scale) and
    # keep the checkpointed edges as the streamed probe side: zero
    # per-round exchange on either join input, no pin to pay for. Big
    # graphs: pin TWO copies off the checkpoint, one per join key, so
    # each half's SMJ is exchange/sort-free on the edge side (2× cache
    # memory, MEMORY_AND_DISK spills; unpersisted after the final
    # round).
    n = nodes.count()
    small = n <= BROADCAST_NODES
    pinned = not prelaid and not small
    if pinned:
        base = e
        e = _pin_by_key(base, "src")
        e_dst = _pin_by_key(base, "dst")

    raw_ckpts: list[DataFrame] = []

    def _half(scores: DataFrame, join_on: str, emit: str) -> DataFrame:
        # scores: (node, s). Contributions flow join_on -> emit. Each
        # half joins the edge copy laid out on ITS key. Nodes whose
        # score is zero need no row here: they contribute nothing to
        # the sums, identically to an explicit 0 — the full node set is
        # zero-filled ONCE on the returned frame instead of once per
        # half (r13: removes a join + sort from every half-round).
        side = e if join_on == "src" else e_dst
        sc = scores.select(F.col("node").alias(join_on), "s")
        if small:
            sc = F.broadcast(sc)
        raw = (
            side.join(sc, join_on)
            .groupBy(F.col(emit).alias("node"))
            .agg(F.sum("s").alias("__raw"))
            # raw feeds BOTH the 1-row max and the normalized
            # projection: unpinned, the whole join+aggregate subtree
            # plans (and runs) TWICE per half (r13 plan audit, ~40%
            # of hits wall at sf0.1). Lazy checkpoint; the round loop
            # frees the blocks once the half's eager checkpoint lands.
            .localCheckpoint(eager=False)
        )
        raw_ckpts.append(raw)
        mx = raw.agg(F.max("__raw").alias("__mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.expr(f"(__raw * {scale}) div __mx").cast("bigint").alias("s"),
        )

    hub = nodes.select("node", F.lit(scale).cast("bigint").alias("s"))
    prev_auth: DataFrame | None = None
    prev_hub: DataFrame | None = None
    for _ in range(iterations):
        auth = _half(hub, "src", "dst").localCheckpoint(eager=True)
        # auth materialized reading the prior hub; free that round's
        # blocks (kcenter discipline, ADVICE r11) — never the final
        # auth/hub, which the returned join still reads
        if prev_hub is not None:
            unpersist_local_checkpoint(prev_hub)
        hub = _half(auth, "dst", "src").localCheckpoint(eager=True)
        if prev_auth is not None:
            unpersist_local_checkpoint(prev_auth)
        # both halves of the round are materialized: their raw
        # checkpoints have no further reader
        for r in raw_ckpts:
            unpersist_local_checkpoint(r)
        raw_ckpts.clear()
        prev_auth, prev_hub = auth, hub
    if pinned:
        e.unpersist()
        e_dst.unpersist()
    hubj = hub.withColumnRenamed("s", "hub_micro")
    authj = auth.withColumnRenamed("s", "auth_micro")
    if small:
        hubj, authj = F.broadcast(hubj), F.broadcast(authj)
    return (
        nodes.join(hubj, "node", "left")
        .join(authj, "node", "left")
        .select(
            "node",
            F.coalesce("hub_micro", F.lit(0)).cast("bigint").alias("hub_micro"),
            F.coalesce("auth_micro", F.lit(0)).cast("bigint").alias("auth_micro"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-overlap link prediction over an undirected graph:
    for every NON-adjacent node pair sharing ≥ ``min_common``
    neighbors, the three classic scores — common-neighbor count,
    Adamic–Adar, and neighborhood Jaccard. This is "which pairs should
    be edges": record-linkage candidates from co-citation, related-item
    suggestions from co-purchase, near-dup doc pairs from shared-host
    link structure.

    Determinism contract (house PMI policy): counts and degrees are
    exact bigints; each float enters as ONE double expression
    immediately micro-rounded —

        aa term(z)    = round(1e6 / ln(deg(z)))      -- per shared
                        neighbor z, then EXACT bigint sum
        jaccard_micro = round(cn * 1e6 / (deg_a + deg_b - cn))

    (a wedge center z is adjacent to two distinct nodes, so deg(z) ≥ 2
    and ``ln`` is never 0). Pairs are canonical ``node_a < node_b``;
    input direction is ignored (both orientations are unioned and
    deduped first).

    Scale shape: wedge generation is the adjacency self-join on the
    center — Σ_z deg(z)² rows, the same hot-hub quadratic as
    :func:`triangle_stats`, EXCEPT link prediction needs both wedge
    orientations so degree-orientation can't bound it. ``max_degree``
    is the guard: centers with more neighbors drop out of wedge
    generation entirely (standard practice — a 10^6-degree hub
    contributes ~0 Adamic–Adar per pair and 10^12 wedges; cap it).
    Everything else is key-hash equi-joins and one counted shuffle; the
    existing-edge removal is a broadcast-friendly anti-join.

    Returns ``(node_a, node_b, common_neighbors, deg_a, deg_b,
    adamic_adar_micro, jaccard_micro)``. With ``max_degree`` set, every
    score — including ``deg_a``/``deg_b`` and the jaccard denominator —
    is computed over the degree-capped neighbor sets
    ``N'(x) = {z in N(x) : deg(z) <= max_degree}``, so intersection and
    union count the same universe (hub neighbors are invisible to all
    of them, not just to the numerator).
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # deg feeds the center join AND (with max_degree) the capped-set
    # semi-join and the reported-degree aggregation — unpinned, each
    # consumer re-runs the 2|E|-row count shuffle (r13 plan audit: the
    # suite plan held 4 copies of it). Bounded: one row per node.
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()
    # wedge centers: z with its degree-derived Adamic-Adar term, hubs
    # capped. Degree-1 centers can't form a wedge — drop them BEFORE the
    # term evaluates (ln(1)=0 would divide-by-zero under ANSI mode).
    centers = adj.join(
        deg.where(F.col("deg") >= 2).withColumnRenamed("u", "v"), "v"
    ).select(
        F.col("v").alias("z"),
        F.col("u").alias("leaf"),
        F.expr("CAST(round(1e6 / ln(CAST(deg AS DOUBLE)), 0) AS BIGINT)").alias(
            "__aa"
        ),
        "deg",
    )
    if max_degree is not None:
        centers = centers.where(F.col("deg") <= max_degree)
    # both wedge-join sides consume centers: pin one materialization
    # (same reason triangle_stats/local_clustering pin their oriented
    # set). Bounded: Σ deg(z) over surviving centers ≤ 2|E| rows.
    # persist (not localCheckpoint): InMemoryRelation keeps size stats,
    # so the planner can still broadcast the small sides downstream —
    # an ExistingRDD scan reports an unknown size and forces SMJ
    # everywhere (r13 A/B: persist 2.9-4.4 s vs ckpt 3.9-6.6 s warm).
    centers = centers.persist()
    left = centers.select("z", F.col("leaf").alias("node_a"), "__aa")
    right = centers.select("z", F.col("leaf").alias("node_b"))
    pairs = (
        left.join(right, "z")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("__aa").alias("adamic_adar_micro"),
        )
        .where(F.col("common_neighbors") >= min_common)
    )
    # drop already-adjacent pairs (canonical orientation suffices: adj
    # holds both directions, so (a<b) adjacency appears as (u=a, v=b))
    existing = adj.where(F.col("u") < F.col("v")).select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b")
    )
    candidates = pairs.join(existing, ["node_a", "node_b"], "left_anti")
    # Consistency with the hub cap (ADVICE r4): when max_degree is set,
    # ALL three scores are computed over the degree-CAPPED neighbor
    # sets N'(x) = {z in N(x) : deg(z) <= max_degree} — the wedge join
    # above already intersects capped sets, so the reported degrees and
    # the jaccard denominator |N'(a)| + |N'(b)| - cn must count the
    # same capped sets, or jaccard mixes a filtered intersection with
    # an unfiltered union and biases low for pairs sharing hubs.
    if max_degree is not None:
        capped = deg.where(F.col("deg") <= max_degree).select("u")
        deg_rep = (
            adj.join(capped.withColumnRenamed("u", "v"), "v", "left_semi")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            # feeds both endpoint joins below — pin the capped-degree
            # recount once (bounded: one row per node; persist keeps
            # the size stats broadcastable, see centers above)
            .persist()
        )
    else:
        deg_rep = deg
    out = (
        candidates.join(
            deg_rep.select(F.col("u").alias("node_a"), F.col("deg").alias("deg_a")),
            "node_a",
        )
        .join(
            deg_rep.select(F.col("u").alias("node_b"), F.col("deg").alias("deg_b")),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            "adamic_adar_micro",
            F.expr(
                "CAST(round(common_neighbors * 1e6 /"
                " (deg_a + deg_b - common_neighbors), 0) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )
    # Bound the pins' lifetime (VERDICT r13 #1): every consumer of the
    # persisted intermediates runs inside this one eager checkpoint —
    # with the InMemoryRelation stats (and the broadcasts they enable)
    # intact — after which the CacheManager entries are freed instead
    # of accumulating per invocation for the life of the session. The
    # returned checkpoint's blocks self-clean via the ContextCleaner
    # when the caller drops the frame.
    out = out.localCheckpoint(eager=True)
    deg.unpersist()
    centers.unpersist()
    if deg_rep is not deg:
        deg_rep.unpersist()
    return out


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-core: the maximal subgraph where every node keeps degree
    >= k — the standard dense-community / spam-farm extractor (a node
    survives only if k neighbors THEMSELVES survive, so peeling
    cascades).

    Iterative peel: each round one degree aggregation over the live
    edges plus two semi-joins dropping edges touching sub-k nodes;
    lineage truncated per round with localCheckpoint (the engine's
    pagerank/connected-components discipline) so plans stay flat at any
    depth. Early-stops at the fixpoint — a round that removes nothing
    proves every later round is the identity, which is also what lets a
    bounded SQL unroll (the oracle) agree with the converged answer.
    Exact set arithmetic only; result is layout-independent.

    Undirected graphs pass both edge directions (the engine's
    convention — degree counts out-edges). Self-loops count toward
    their node's degree once per direction supplied. Parallel edges
    collapse first (presence, not multiplicity — review r7: duplicate
    edge rows inflated degrees and let non-core nodes survive the
    peel), same as every sibling graph operator.

    Returns the surviving nodes with their within-core degree:
    ``(node, degree)``. Empty result when the k-core is empty.
    EAGER: peel rounds execute at call time (each round's edge count
    drives the early stop).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    converged = n_edges == 0
    for _ in range(max_rounds):
        if n_edges == 0:
            converged = True
            break
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__d"))
            .where(F.col("__d") >= k)
            .select("src")
        )
        pruned = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_next = pruned.count()
        # pruned is materialized; the pre-peel round's edge blocks are
        # dead (kcenter discipline, ADVICE r11) — the final round's
        # survivors stay persisted for the returned degree aggregate
        unpersist_local_checkpoint(e)
        e = pruned
        if n_next == n_edges:
            converged = True
            break  # fixpoint: every node already has degree >= k
        n_edges = n_next
    if not converged:
        # the peel is still removing nodes — the survivors are NOT the
        # k-core yet (sub-k nodes may remain). Silent wrong answers are
        # worse than noise (ADVICE r4); callers who want the partial
        # peel can raise max_rounds or catch the warning.
        import warnings

        warnings.warn(
            f"k_core stopped after max_rounds={max_rounds} without reaching "
            "the peel fixpoint; the returned subgraph may still contain "
            f"nodes with degree < {k}. Increase max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("src").alias("node"), "degree")
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient: the Pearson correlation of
    endpoint degrees over the edge list — the one-number answer to "do
    hubs link to hubs?" (positive: social-network-like; negative:
    hub-and-spoke, typical of marketplaces and star schemas).

    Degrees come from one aggregation of the edge list; each edge then
    picks up both endpoint degrees via two equi-joins (the degree table
    is #nodes rows — broadcastable in practice, left to AQE), and the
    correlation reuses :func:`...stats.corr_matrix`'s exact-decimal
    moment machinery verbatim (scale=1 — degrees are already integers),
    so the result is layout- and engine-stable at 6dp.

    Input must be SYMMETRIZED (both directions of every undirected
    edge, the engine's graph convention): degree counts out-edges, so
    on a raw directed list an edge whose dst is a pure sink has no
    dst-degree row and would silently drop from the correlation
    (review r7). Symmetrize first, or compute directed assortativity
    variants explicitly.

    Undirected graphs pass both edge directions (house convention);
    the symmetrized directed computation then equals the standard
    undirected coefficient. Constant-degree graphs (every node equal)
    have undefined assortativity -> NULL.

    Returns one row: ``n_edges``, ``assortativity``.
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import corr_matrix

    # e feeds the degree aggregation plus both endpoint joins; deg feeds
    # both joins — pin one materialization each (house style, same as
    # local_clustering) or the caller's edge derivation replays per use.
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).localCheckpoint(
        eager=False
    )
    deg = (
        e.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        e.join(deg.select(F.col("__s"), F.col("__deg").alias("deg_src")), "__s")
        .join(
            deg.select(F.col("__s").alias("__d"), F.col("__deg").alias("deg_dst")),
            "__d",
        )
        .select("deg_src", "deg_dst")
    )
    corr = corr_matrix(pairs, ["deg_src", "deg_dst"], scale=1)
    return corr.where(
        (F.col("col_x") == "deg_src") & (F.col("col_y") == "deg_dst")
    ).select(
        F.col("n").cast("long").alias("n_edges"),
        F.col("corr").alias("assortativity"),
    )


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient — the node-level refinement
    of :func:`triangle_stats`' global census: ``lcc(v) = 2*T_v /
    (deg_v * (deg_v - 1))``, the probability that two of v's neighbors
    link each other (ego-density; the spam-farm/community membership
    feature PageRank can't see).

    Same canonicalization and DEGREE-ORIENTED wedge join as
    ``triangle_stats`` (per-key fanout O(sqrt(m)) on any graph); each
    closed triangle then credits its THREE corners via one posexplode
    and collapses in a counted shuffle. Exact bigints everywhere; the
    coefficient is one micro-rounded double ratio (house policy).

    Input edges may arrive in either orientation with duplicates and
    self-loops (dropped). Degree-1 nodes (and isolated inputs) have an
    undefined coefficient -> NULL, triangles 0.

    Returns ``(node, degree, n_triangles, lcc_micro)`` — one row per
    node of the deduped graph.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    oriented = (
        e.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("__da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("__db")), "b")
        .select(
            F.when(
                (F.col("__da") < F.col("__db"))
                | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("__o")
        )
        .select("__o.u", "__o.v")
        # pin: both sides of the wedge self-join consume this — without
        # the checkpoint the two degree joins above replay per side
        # (review r7; same reason triangle_stats pins its oriented set)
        .localCheckpoint(eager=False)
    )
    wedges = (
        oriented.select(F.col("u"), F.col("v").alias("__v1"))
        .join(oriented.select(F.col("u"), F.col("v").alias("__v2")), "u")
        .where(F.col("__v1") < F.col("__v2"))
        .select("u", F.col("__v1").alias("a"), F.col("__v2").alias("b"))
    )
    closed = wedges.join(e, ["a", "b"])
    per_node = (
        closed.select(
            F.explode(F.array(F.col("u"), F.col("a"), F.col("b"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )
    return out.withColumn(
        "lcc_micro",
        F.expr(
            "CASE WHEN degree >= 2 THEN CAST(round(CAST(2 * n_triangles AS DOUBLE)"
            " / CAST(degree * (degree - 1) AS DOUBLE) * 1000000) AS BIGINT) END"
        ),
    )
