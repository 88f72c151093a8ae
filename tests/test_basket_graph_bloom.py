"""Session-4 operators: co-occurrence PMI, triangle census, char
entropy, Bloom-filter pruning."""

from __future__ import annotations

import math

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.basket import cooccurrence_pmi
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bloom import bloom_build, bloom_prune
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import triangle_stats
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import char_entropy


# ---------------------------------------------------------------- basket

def _pmi(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket int, item string")
    out = cooccurrence_pmi(df, "basket", "item", **kw).collect()
    return {(r.item_a, r.item_b): r for r in out}


def test_pmi_counts_and_value(spark):
    # baskets: {a,b}, {a,b}, {a,c} -> pair (a,b) count 2, (a,c) count 1, (b,c) never
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    got = _pmi(spark, rows)
    ab = got[("a", "b")]
    assert (ab.pair_count, ab.count_a, ab.count_b, ab.n_baskets) == (2, 3, 2, 3)
    # pmi = ln(2*3 / (3*2)) = 0
    assert ab.pmi_micro == 0
    ac = got[("a", "c")]
    assert ac.pair_count == 1 and ac.count_b == 1
    assert ac.pmi_micro == round(math.log((1 * 3) / (3 * 1)) * 1e6) == 0
    assert ("b", "c") not in got


def test_pmi_null_baskets_and_items_excluded(spark):
    rows = [(1, "a"), (1, "b"), (None, "a"), (None, "z"), (2, None), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {(r.item_a, r.item_b): r for r in cooccurrence_pmi(df, "basket", "item").collect()}
    ab = out[("a", "b")]
    # null basket contributes neither to n_baskets nor to item counts
    assert (ab.pair_count, ab.count_a, ab.count_b, ab.n_baskets) == (2, 2, 2, 2)


def test_pmi_duplicates_collapse_and_min_count(spark):
    # duplicate (basket,item) observations count once
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = _pmi(spark, rows)
    assert got[("a", "b")].pair_count == 2
    assert _pmi(spark, rows, min_pair_count=3) == {}


def test_pmi_positive_association(spark):
    # a,b always together among 4 baskets; c independent filler
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c"), (4, "c")]
    got = _pmi(spark, rows)
    ab = got[("a", "b")]
    # ln(2*4/(2*2)) = ln 2
    assert ab.pmi_micro == round(math.log(2) * 1e6) == 693147


def test_pmi_max_basket_guard_drops_large_baskets(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    got = _pmi(spark, rows, max_basket=2)
    # basket 1 (3 items) dropped entirely; only basket 2's pair remains
    assert set(got) == {("a", "b")}
    assert got[("a", "b")].pair_count == 1
    assert got[("a", "b")].n_baskets == 1


# -------------------------------------------------------------- triangles

def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return triangle_stats(df).collect()[0]


def test_triangle_single(spark):
    r = _tri(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (3, 3, 3, 1)
    assert r.gcc_micro == 1_000_000


def test_triangle_square_has_none(spark):
    r = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 4, 0)
    assert r.gcc_micro == 0


def test_triangle_k4_complete(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1:]]
    r = _tri(spark, edges)
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (6, 12, 4)
    assert r.gcc_micro == 1_000_000


def test_triangle_input_normalization(spark):
    # reversed duplicates + self loop collapse to one triangle
    r = _tri(spark, [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")])
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    r = triangle_stats(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (0, 0, 0, 0)
    assert r.gcc_micro is None


# ------------------------------------------------------------ char entropy

def _ent(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {r.doc_id: r for r in char_entropy(df, "doc_id", "text", **kw).collect()}


def test_entropy_extremes(spark):
    got = _ent(spark, ["aaaa", "ab", "", None])
    assert got[0].entropy_micro == 0  # single symbol
    assert got[0].n_unique_chars == 1
    # two equiprobable symbols: ln 2 (floor-div of the exact decomposition)
    assert abs(got[1].entropy_micro - round(math.log(2) * 1e6)) <= 1
    assert got[2].entropy_micro is None and got[2].n_chars_used == 0
    assert got[3].entropy_micro is None and got[3].n_chars_used == 0


def test_entropy_exact_decomposition(spark):
    # H = ln(n) - (sum round(c*ln(c)*1e6)) div n, exactly
    t = "aabbbc"
    n = 6
    s = sum(round(c * math.log(c) * 1e6) for c in (2, 3, 1))
    want = round(math.log(n) * 1e6) - s // n
    got = _ent(spark, [t])
    assert got[0].entropy_micro == want
    assert got[0].n_unique_chars == 3


def test_entropy_max_chars_truncates(spark):
    got = _ent(spark, ["abcdefgh"], max_chars=4)
    assert got[0].n_chars_used == 4
    assert got[0].n_unique_chars == 4
    assert got[0].entropy_micro == round(math.log(4) * 1e6)  # uniform over 4


def test_entropy_layout_independent(spark):
    texts = ["the quick brown fox", "aaaaaaa", "mixed Case And MORE chars!"]
    a = _ent(spark, texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    ).repartition(7)
    b = {r.doc_id: r for r in char_entropy(df).collect()}
    assert {k: v.entropy_micro for k, v in a.items()} == {
        k: v.entropy_micro for k, v in b.items()
    }


# ------------------------------------------------------------------ bloom

def test_bloom_no_false_negatives_and_prunes(spark):
    dim = spark.createDataFrame([(i,) for i in range(50)], "k int")
    probe = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    bloom = bloom_build(dim, "k", m=4096, k=3)
    kept = {r.k for r in bloom_prune(probe, "k", bloom, m=4096, k=3).collect()}
    assert set(range(50)) <= kept          # zero false negatives
    assert len(kept) < 5000                # actually prunes
    # sizing formula upper bound with slack: fp ~ (1-e^(-kn/m))^k ~ 0.1%
    assert len(kept) - 50 < 100


def test_bloom_mismatched_params_raise(spark):
    dim = spark.createDataFrame([(1,)], "k int")
    probe = spark.createDataFrame([(1,), (2,)], "k int")
    bloom = bloom_build(dim, "k", m=1024, k=3)
    with pytest.raises(ValueError, match="built with"):
        bloom_prune(probe, "k", bloom, m=4096, k=3)


def test_bloom_null_keys_dropped_and_empty_dim(spark):
    dim = spark.createDataFrame([], "k int")
    probe = spark.createDataFrame([(1,), (None,)], "k int")
    bloom = bloom_build(dim, "k", m=256, k=2)
    assert bloom_prune(probe, "k", bloom, m=256, k=2).count() == 0
    with pytest.raises(ValueError, match="positive"):
        bloom_build(dim, "k", m=0, k=1)


def test_bloom_merge_equals_union_build(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bloom import bloom_merge

    a = spark.createDataFrame([(i,) for i in range(0, 30)], "k int")
    b = spark.createDataFrame([(i,) for i in range(20, 60)], "k int")
    merged = bloom_merge(
        bloom_build(a, "k", m=512, k=2), bloom_build(b, "k", m=512, k=2)
    )
    whole = bloom_build(
        spark.createDataFrame([(i,) for i in range(0, 60)], "k int"), "k", m=512, k=2
    )
    assert merged.first()["bits"] == whole.first()["bits"]
    # merged filter probes identically to the monolithic build
    probe = spark.createDataFrame([(i,) for i in range(0, 200)], "k int")
    got = {r.k for r in bloom_prune(probe, "k", merged, m=512, k=2).collect()}
    want = {r.k for r in bloom_prune(probe, "k", whole, m=512, k=2).collect()}
    assert got == want and set(range(60)) <= got


# -------------------------------------------------------------------- rrf

def test_rrf_fuse_hand_checked(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import rrf_fuse

    import pytest

    a = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "query_id int, doc_id string, rank int"
    )
    b = spark.createDataFrame(
        [(1, "y", 1), (1, "z", 2)], "query_id int, doc_id string, rank int"
    )
    got = {r.doc_id: r for r in rrf_fuse([a, b]).collect()}
    c = lambda r: round(1e6 / (60 + r))
    # y appears in both lists: 1/(60+2) + 1/(60+1)
    assert got["y"].rrf_micro == c(2) + c(1) and got["y"].n_lists == 2
    assert got["x"].rrf_micro == c(1) and got["x"].n_lists == 1
    assert got["z"].rrf_micro == c(2)
    assert [got[d].fused_rank for d in ("y", "x", "z")] == [1, 2, 3]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# association_rules (operators/basket.py)
# ---------------------------------------------------------------------------

def test_association_rules_hand_computed(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.basket import association_rules

    # baskets: {x,y} {x,y} {x,z} {y} -> n=4, cx=3, cy=3, cz=1, pair(x,y)=2, (x,z)=1
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(df, "bk", "it").collect()}
    xy = out[("x", "y")]
    assert xy.pair_count == 2
    assert xy.support_micro == 500000                  # 2/4
    assert xy.confidence_micro == round(2 / 3 * 1e6)   # 2/cx
    assert xy.lift_micro == round(2 * 4 / (3 * 3) * 1e6)
    zx = out[("z", "x")]
    assert zx.confidence_micro == 1000000              # 1/cz -> certain rule
    assert out[("x", "z")].confidence_micro == round(1 / 3 * 1e6)
    # lift symmetric, confidence not
    assert xy.lift_micro == out[("y", "x")].lift_micro


def test_association_rules_confidence_prune_and_layout(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.basket import association_rules

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "bk int, it string")
    strict = association_rules(df, "bk", "it", min_confidence_micro=900000)
    assert {(r.antecedent, r.consequent) for r in strict.collect()} == {("z", "x")}

    a = sorted(map(str, association_rules(df, "bk", "it").collect()))
    b = sorted(map(str, association_rules(df.repartition(5), "bk", "it").collect()))
    assert a == b


def test_kcore_parallel_edges_collapse(spark):
    """Review r7: duplicate edge rows must not inflate degrees — two
    nodes with one (triplicated) edge have no 3-core."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_core

    rows = [(1, 2)] * 3 + [(2, 1)] * 3
    e = spark.createDataFrame(rows, "src long, dst long")
    assert k_core(e, k=3).count() == 0
    assert k_core(e, k=1).count() == 2
