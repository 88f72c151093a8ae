"""PageRank (operators/graph.py): fixed-point semantics, determinism."""

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import pagerank

import pytest


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank_micro for r in pagerank(df, **kw).collect()}


def test_pagerank_star_hub_outranks_leaves(spark):
    # a, b, c all point at hub; hub points back at a. hub and a trade the
    # bulk of the mass each round (period-2 oscillation decaying toward
    # hub > a), so assert at an odd iteration where hub just collected.
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    got = _ranks(spark, edges, iterations=11)
    assert got["hub"] > got["a"] > got["b"] == got["c"]


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # in a 2-cycle both nodes keep exactly the initial mass every round
    edges = [("x", "y"), ("y", "x")]
    got = _ranks(spark, edges, iterations=5)
    scale = 10**12
    assert got["x"] == got["y"]
    # base + 85% of (scale/2) = scale/2 exactly (all divisions land even)
    assert got["x"] == (15 * scale) // 200 + (85 * (scale // 2)) // 100


def test_pagerank_dangling_receives_but_drops_mass(spark):
    # z has no out-edges: it accumulates rank but redistributes none
    edges = [("a", "z"), ("b", "z")]
    got = _ranks(spark, edges, iterations=3)
    assert got["z"] > got["a"] == got["b"]
    # round 2+: a/b get only the base term (z returns nothing)
    scale, n = 10**12, 3
    assert got["a"] == (15 * scale) // (100 * n)


def test_pagerank_layout_independent(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r.node: r.rank_micro for r in pagerank(df, iterations=4).collect()}
    r2 = {
        r.node: r.rank_micro
        for r in pagerank(df.repartition(13, "dst"), iterations=4).collect()
    }
    assert r1 == r2


def test_pagerank_empty_and_bad_damping(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    one = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(one, damping_pct=100)


def test_pagerank_weighted_follows_weight_mass(spark):
    # hub receives from a (weight 9) and b (weight 1) via c's out-edges:
    # u gets 90% of c's damped mass, v gets 10%
    edges = [("c", "u", 9), ("c", "v", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=1, weight="w").collect()}
    scale = 10**12
    init = scale // 3
    base = (15 * scale) // (100 * 3)
    assert got["u"] == base + (85 * ((init * 9) // 10)) // 100
    assert got["v"] == base + (85 * ((init * 1) // 10)) // 100
    assert got["c"] == base


def test_pagerank_weight_one_matches_unweighted_on_simple_graph(spark):
    # no parallel edges -> w=1 weighted equals the unweighted computation
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    un = spark.createDataFrame(edges, "src string, dst string")
    w1 = un.withColumn("w", __import__("pyspark").sql.functions.lit(1))
    got_u = {r.node: r.rank_micro for r in pagerank(un, iterations=4).collect()}
    got_w = {r.node: r.rank_micro for r in pagerank(w1, iterations=4, weight="w").collect()}
    assert got_u == got_w


def test_pagerank_weighted_drops_nonpositive_and_collapses_parallel(spark):
    edges = [("a", "b", 2), ("a", "b", 3), ("a", "x", 0), ("a", "y", -4), ("b", "a", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=1, weight="w").collect()}
    # x and y only appeared via dropped edges -> not in the graph at all
    assert set(got) == {"a", "b"}


def test_k_hop_reach_path_graph(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_hop_reach

    import pytest

    # path a-b-c-d-e (undirected: both directions), seed {a}
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.hop: (r.n_reached, r.n_new) for r in k_hop_reach(edges, seeds, 3).collect()}
    assert got == {0: (1, 1), 1: (2, 1), 2: (3, 1), 3: (4, 1)}
    with pytest.raises(ValueError, match=">= 0"):
        k_hop_reach(edges, seeds, -1)


def test_k_hop_reach_exhausts_and_pads(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_hop_reach

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("z",)], "node string")  # z isolated
    got = {r.hop: (r.n_reached, r.n_new) for r in k_hop_reach(edges, seeds, 4).collect()}
    # hop0: {a, z}; hop1 adds b; frontier then exhausts, padding stays flat
    assert got == {0: (2, 2), 1: (3, 1), 2: (3, 0), 3: (3, 0), 4: (3, 0)}


def test_pagerank_personalized_mass_stays_near_seeds(spark):
    from pyspark.sql import functions as F

    import pytest

    # two disjoint 2-cycles; seed only {a}: the b-component gets ZERO mass
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=4, seeds=seeds).collect()}
    assert got["x"] == 0 and got["y"] == 0
    assert got["a"] > got["b"] > 0  # restart biases the seed itself
    # all-outside seed set is an error, not silent zeros
    bad = spark.createDataFrame([("zzz",)], "node string")
    with pytest.raises(ValueError, match="no seed"):
        pagerank(df, iterations=1, seeds=bad)


def _lpa_reference(edges, iterations):
    """Sequential synchronous LPA with the operator's exact tie rule."""
    from collections import Counter

    nodes = {x for e in edges for x in e}
    labels = {v: v for v in nodes}
    in_nbrs = {}
    for s, d in set(edges):
        in_nbrs.setdefault(d, []).append(s)
    for _ in range(iterations):
        new = {}
        for v in nodes:
            votes = Counter(labels[u] for u in in_nbrs.get(v, []))
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = labels[v]
        labels = new
    return labels


def test_label_propagation_matches_sequential_reference(spark):
    import random

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import label_propagation

    rng = random.Random(5)
    # two planted cliques plus sparse noise, symmetrized
    edges = []
    for group in ([0, 1, 2, 3, 4], [10, 11, 12, 13]):
        for a in group:
            for b in group:
                if a != b:
                    edges.append((a, b))
    for _ in range(10):
        a, b = rng.randrange(20), rng.randrange(20)
        if a != b:
            edges += [(a, b), (b, a)]

    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _lpa_reference(edges, iters), f"iterations={iters}"

    # layout independence
    got7 = {
        r["node"]: r["label"]
        for r in label_propagation(df.repartition(7), iterations=3).collect()
    }
    assert got7 == _lpa_reference(edges, 3)


def test_label_propagation_two_cliques_separate(spark):
    """Disconnected cliques converge to distinct min-id labels."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import label_propagation

    edges = []
    for group in ([1, 2, 3], [7, 8, 9]):
        for a in group:
            for b in group:
                if a != b:
                    edges.append((a, b))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=4).collect()}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[7], got[8], got[9]} == {7}


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------

def _hits_reference(edges, iterations, scale=10**6):
    """Sequential mirror of the exact-integer max-normalized rounds."""
    edges = sorted(set(edges))
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iterations):
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[v] += hub[u]
        mx = max(raw.values())
        auth = {n: (raw[n] * scale) // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[u] += auth[v]
        mx = max(raw.values())
        hub = {n: (raw[n] * scale) // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_sequential_reference(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    edges = [(f"n{i}", f"n{(i * i + 5) % 17}") for i in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub_micro, r.auth_micro) for r in hits(df, iterations=3).collect()}
    assert got == _hits_reference(edges, 3)


def test_hits_bipartite_split(spark):
    # pure bipartite pointers: left side are pure hubs, right pure
    # authorities; the most-pointed-at right node gets auth == scale
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    edges = [("l1", "r1"), ("l2", "r1"), ("l3", "r1"), ("l1", "r2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub_micro, r.auth_micro) for r in hits(df, iterations=3).collect()}
    assert got["r1"][1] == 10**6 and got["r1"][0] == 0
    assert got["l2"][1] == 0 and got["l2"][0] > 0
    assert got["l1"][0] == 10**6  # points at both authorities -> top hub
    assert got["l1"][0] > got["l2"][0] == got["l3"][0]


def test_hits_layout_independent(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    edges = [(f"a{i % 9}", f"b{(i * 3 + 1) % 13}") for i in range(80)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r.node: (r.hub_micro, r.auth_micro) for r in hits(df, iterations=3).collect()}
    r2 = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits(df.repartition(13, "dst"), iterations=3).collect()
    }
    assert r1 == r2


def test_hits_rejects_zero_iterations(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    one = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        hits(one, iterations=0)


# ---------------------------------------------------------------------------
# link prediction (common neighbors / Adamic-Adar / Jaccard)
# ---------------------------------------------------------------------------

def _lp_reference(edges, min_common, max_degree=None):
    import math
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {n: len(ns) for n, ns in adj.items()}

    # capped-neighbor-set semantics: with max_degree set, EVERY score
    # (incl. reported degrees and the jaccard union) counts only
    # neighbors whose degree is within the cap
    def capped(n):
        return {
            z for z in adj[n] if max_degree is None or deg[z] <= max_degree
        }

    out = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            common = capped(a) & capped(b)
            if len(common) < min_common:
                continue
            da, db = len(capped(a)), len(capped(b))
            aa = sum(round(1e6 / math.log(deg[z])) for z in common)
            jac = round(len(common) * 1e6 / (da + db - len(common)))
            out[(a, b)] = (len(common), da, db, aa, jac)
    return out


def test_link_prediction_matches_sequential_reference(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import link_prediction

    edges = [(f"n{i}", f"n{(i * 5 + 2) % 19}") for i in range(70)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.node_a, r.node_b): (
            r.common_neighbors, r.deg_a, r.deg_b,
            r.adamic_adar_micro, r.jaccard_micro,
        )
        for r in link_prediction(df, min_common=1).collect()
    }
    assert got == _lp_reference(edges, 1)


def test_link_prediction_excludes_adjacent_pairs(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import link_prediction

    # triangle + pendant: (a,b),(b,c),(a,c),(c,d) — every 2-common pair
    # is already an edge; only (a,d)/(b,d) qualify via center c
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.node_a, r.node_b) for r in link_prediction(df, min_common=1).collect()}
    assert got == {("a", "d"), ("b", "d")}


def test_link_prediction_max_degree_drops_hub_centers(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import link_prediction

    # star: hub adjacent to 6 leaves; all leaf pairs share only the hub
    edges = [("hub", f"l{i}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert link_prediction(df, min_common=1).count() == 15
    assert link_prediction(df, min_common=1, max_degree=5).count() == 0


def test_link_prediction_capped_degrees_consistent(spark):
    # ADVICE r4: with max_degree set, the jaccard union and reported
    # degrees must count the same capped neighbor sets as the
    # intersection. Graph: hub adjacent to everything, plus two
    # modest shared neighbors for (a, b).
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import link_prediction

    edges = (
        [("hub", x) for x in ("a", "b", "p", "q", "r", "s")]
        + [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2")]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.node_a, r.node_b): (
            r.common_neighbors, r.deg_a, r.deg_b,
            r.adamic_adar_micro, r.jaccard_micro,
        )
        for r in link_prediction(df, min_common=2, max_degree=4).collect()
    }
    want = _lp_reference(edges, 2, max_degree=4)
    assert got == want
    # the (a, b) pair's jaccard must be over capped sets: cn=2,
    # |N'(a)|=|N'(b)|=2 (hub invisible) -> jaccard = 2/(2+2-2) = 1.0
    assert got[("a", "b")][0] == 2
    assert got[("a", "b")][1:3] == (2, 2)
    assert got[("a", "b")][4] == 1_000_000


def test_link_prediction_rejects_bad_min_common(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import link_prediction

    one = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="min_common"):
        link_prediction(one, min_common=0)


def test_hits_empty_graph(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty).count() == 0


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------

def _both(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_k_core_peels_cascade(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_core

    # triangle {1,2,3} + a pendant path 3-4-5: 2-core is exactly the
    # triangle, and node 4 only falls AFTER node 5 (cascading peel)
    edges = spark.createDataFrame(
        _both([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]), "src int, dst int"
    )
    got = {r.node: r.degree for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # 3-core of a triangle is empty
    assert k_core(edges, k=3).count() == 0


def test_k_core_k1_keeps_every_connected_node_and_layout(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_core

    import random as _r
    rng = _r.Random(9)
    pairs = {(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)}
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(_both(pairs), "src int, dst int")
    one = {(r.node, r.degree) for r in k_core(edges, k=1).collect()}
    # k=1 drops nothing (every listed node has an edge): degrees = DISTINCT
    # neighbor-edge counts — parallel edges collapse (review r7: when the
    # generator drew both orientations of a pair, symmetrizing duplicated
    # the edge; multiplicity must not inflate degree)
    from collections import Counter
    deg = Counter(a for a, _ in set(_both(pairs)))
    assert one == set(deg.items())

    a = {(r.node, r.degree) for r in k_core(edges, k=3).collect()}
    b = {(r.node, r.degree) for r in k_core(edges.repartition(13), k=3).collect()}
    assert a == b  # layout-independent


def test_k_core_warns_when_max_rounds_exhausted(spark):
    # ADVICE r4: exhausting max_rounds before the peel fixpoint must
    # not silently return a non-core. Path 1-2-3-4-5-6 with k=2 peels
    # one endpoint layer per round; max_rounds=1 leaves sub-k nodes.
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        _both([(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]), "src int, dst int"
    )
    with pytest.warns(RuntimeWarning, match="max_rounds"):
        partial = k_core(edges, k=2, max_rounds=1)
    assert partial.where("degree < 2").count() > 0  # demonstrably not the core
    # enough rounds: converges quietly to the (empty) 2-core
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert k_core(edges, k=2).count() == 0


def test_k_core_validates_and_handles_empty(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_core

    edges = spark.createDataFrame([], "src int, dst int")
    assert k_core(edges, k=2).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        k_core(edges, k=0)


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------

def test_assortativity_star_is_disassortative(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import degree_assortativity

    # star: hub 0 with 5 leaves -> perfectly disassortative (-1)
    edges = spark.createDataFrame(
        _both([(0, i) for i in range(1, 6)]), "src int, dst int"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.n_edges == 10
    assert row.assortativity == -1.0

    # two disjoint cliques of different sizes: every edge joins equal
    # degrees -> within-edge degrees constant per component; the pooled
    # correlation of (deg, deg) pairs on the diagonal is exactly 1
    k3 = [(1, 2), (2, 3), (1, 3)]
    k4 = [(a + 10, b + 10) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]]
    cl = spark.createDataFrame(_both(k3 + k4), "src int, dst int")
    assert degree_assortativity(cl).collect()[0].assortativity == 1.0


def test_assortativity_regular_graph_null_and_reference(spark):
    import math
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import degree_assortativity

    # cycle: 2-regular -> zero degree variance -> undefined (NULL)
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    row = degree_assortativity(
        spark.createDataFrame(_both(cyc), "src int, dst int")
    ).collect()[0]
    assert row.assortativity is None

    # path graph 0-1-2-3: hand-checkable mixed degrees; compare with a
    # direct Pearson over the 6 directed (deg, deg) pairs
    path = [(0, 1), (1, 2), (2, 3)]
    deg = {0: 1, 1: 2, 2: 2, 3: 1}
    pts = [(deg[a], deg[b]) for a, b in path] + [(deg[b], deg[a]) for a, b in path]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    want = round((n * sxy - sx * sy)
                 / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    got = degree_assortativity(
        spark.createDataFrame(_both(path), "src int, dst int")
    ).collect()[0]
    assert abs(got.assortativity - want) < 2e-6


# ---------------------------------------------------------------------------
# local_clustering
# ---------------------------------------------------------------------------

def test_local_clustering_hand_computed(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import local_clustering

    # triangle {1,2,3} + pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=2*1/(3*2)=1/3,
    # lcc(4) undefined (degree 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    out = {r.node: r for r in local_clustering(edges).collect()}
    assert out[1].lcc_micro == 1000000 and out[1].n_triangles == 1
    assert out[2].lcc_micro == 1000000
    assert out[3].degree == 3 and out[3].n_triangles == 1
    assert out[3].lcc_micro == round(1 / 3 * 1e6)
    assert out[4].lcc_micro is None and out[4].n_triangles == 0

    # complete graph K4: every node has C(3,2)=3 wedge pairs, all closed
    # -> 3 triangles per node, lcc = 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k = {r.node: r for r in local_clustering(
        spark.createDataFrame(k4, "src int, dst int")).collect()}
    assert all(r.lcc_micro == 1000000 and r.n_triangles == 3 for r in k.values())


def test_local_clustering_orientation_and_layout_independent(spark):
    import random as _r
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import local_clustering

    rng = _r.Random(41)
    pairs = {(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(120)}
    pairs = [(a, b) for a, b in pairs if a != b]
    # duplicates + both orientations + self loops must collapse
    noisy = pairs + [(b, a) for a, b in pairs] + [(5, 5), (7, 7)]
    e1 = spark.createDataFrame(noisy, "src int, dst int")
    e2 = spark.createDataFrame(pairs, "src int, dst int")
    a = sorted(map(str, local_clustering(e1).collect()))
    b = sorted(map(str, local_clustering(e2).collect()))
    assert a == b
    c = sorted(map(str, local_clustering(e1.repartition(7)).collect()))
    assert a == c


def test_pagerank_layouts_are_bit_identical(spark, tmp_path):
    """r9 layout lever: the three edge layouts — default (gated
    checkpoint/pin), a prelaid bucketed table, and a graph big enough
    to cross PIN_NODES — must produce bit-identical ranks (the
    exact-integer contract is layout-independent by design)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import PIN_NODES
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.layout import bucketed_table
    from pyspark.sql import functions as F

    # small graph: default path (gate off) vs prelaid bucketed table
    edges = spark.createDataFrame(
        [(i % 50, (i * 7 + 1) % 50) for i in range(400)], "src long, dst long"
    ).where("src <> dst")
    want = sorted(
        (r["node"], r["rank_micro"])
        for r in pagerank(edges, iterations=3).collect()
    )
    eb = bucketed_table(edges, "t_pr_layout", "src", buckets=4)
    got = sorted(
        (r["node"], r["rank_micro"])
        for r in pagerank(eb, iterations=3, prelaid=True).collect()
    )
    spark.sql("DROP TABLE IF EXISTS t_pr_layout")
    assert got == want

    # big graph: crosses PIN_NODES, exercising the in-RAM pinned path;
    # compare against the explicit checkpoint layout via prelaid=True
    n = PIN_NODES + 5_000
    big = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") * 31 + 7) % n).alias("dst")
    ).where("src <> dst")
    a = sorted(
        (r["node"], r["rank_micro"])
        for r in pagerank(big, iterations=2).collect()
    )
    b = sorted(
        (r["node"], r["rank_micro"])
        for r in pagerank(
            big.localCheckpoint(eager=False), iterations=2, prelaid=True
        ).collect()
    )
    assert a == b and len(a) == n
