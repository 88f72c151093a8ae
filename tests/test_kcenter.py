"""Greedy k-center coreset selection (operators/semantic.py
kcenter_select) vs a sequential Gonzalez reference in the same exact
micro-int arithmetic."""

from __future__ import annotations

import random

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.semantic import kcenter_select


def _quant(vec):
    # sign-aware half-away-from-zero, mirroring Spark's HALF_UP round()
    # — Python round() is banker's rounding and would diverge from the
    # engine on a component landing exactly on a .5 micro boundary
    # (ADVICE r11)
    import math

    return [
        int(math.copysign(math.floor(abs(x) * 1_000_000 + 0.5), x)) for x in vec
    ]


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _reference(points: dict, k: int):
    """Sequential greedy: seed = min id; each round the farthest
    not-yet-chosen point (max running d2, id tiebreak); assignment ties
    break to the earlier-chosen center."""
    q = {i: _quant(v) for i, v in points.items()}
    centers = [min(q)]
    d2 = {i: _d2(q[i], q[centers[0]]) for i in q}
    while len(centers) < min(k, len(q)):
        cand = [(-(d2[i]), i) for i in q if i not in centers]
        nxt = min(cand)[1]
        centers.append(nxt)
        for i in q:
            d2[i] = min(d2[i], _d2(q[i], q[nxt]))
    out = {}
    for i in q:
        best = min(
            (( _d2(q[i], q[c]), order) for order, c in enumerate(centers)),
        )
        out[i] = (centers[best[1]], best[1], best[0])
    return out


def _df(spark, points):
    return spark.createDataFrame(
        [(i, v) for i, v in points.items()], "vec_id long, embedding array<float>"
    )


def _collect(df):
    return {
        r["vec_id"]: (r["center_id"], r["center_order"], r["d2"])
        for r in df.collect()
    }


def test_kcenter_matches_sequential_reference(spark):
    import numpy as np

    rng = random.Random(19)
    points = {
        i: [float(np.float32(rng.uniform(-1, 1))) for _ in range(6)]
        for i in range(40)
    }
    got = _collect(kcenter_select(_df(spark, points), "vec_id", "embedding", k=5))
    # reference must see the float32-rounded values Spark stores
    want = _reference(points, k=5)
    assert got == want
    # exactly 5 centers, each assigned to itself at distance 0
    centers = {c for c, _, _ in got.values()}
    assert len(centers) == 5
    for c in centers:
        assert got[c][0] == c and got[c][2] == 0


def test_kcenter_layout_independent(spark):
    rng = random.Random(4)
    points = {i: [rng.uniform(0, 1) for _ in range(4)] for i in range(30)}
    a = _collect(kcenter_select(_df(spark, points), "vec_id", "embedding", k=4))
    b = _collect(
        kcenter_select(_df(spark, points).repartition(11), "vec_id", "embedding", k=4)
    )
    assert a == b


def test_kcenter_spread_beats_random_prefix(spark):
    """The point of farthest-point selection: its coverage radius
    (max assignment d2) must not exceed the radius of the first-k-ids
    baseline on clustered data."""
    import numpy as np

    rng = np.random.default_rng(7)
    cents = rng.normal(size=(4, 5)) * 10
    points = {}
    for i in range(48):
        points[i] = [float(x) for x in cents[i // 12] + 0.1 * rng.normal(size=5)]
    out = _collect(kcenter_select(_df(spark, points), "vec_id", "embedding", k=4))
    radius = max(d for _, _, d in out.values())
    q = {i: _quant(v) for i, v in points.items()}
    naive = [0, 1, 2, 3]  # first-k ids: all from planted cluster 0
    naive_radius = max(min(_d2(q[i], q[c]) for c in naive) for i in q)
    assert radius < naive_radius
    # one exemplar lands in each planted cluster
    centers = {c for c, _, _ in out.values()}
    assert {c // 12 for c in centers} == {0, 1, 2, 3}


def test_kcenter_k_exceeds_corpus(spark):
    points = {i: [float(i), 0.0] for i in range(3)}
    out = _collect(kcenter_select(_df(spark, points), "vec_id", "embedding", k=10))
    assert len(out) == 3
    assert all(c == i and d == 0 for i, (c, _, d) in out.items())


def test_kcenter_guards(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="k must"):
        kcenter_select(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="256"):
        kcenter_select(df, "vec_id", "embedding", k=300)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(empty, "vec_id", "embedding", k=2)


def test_kcenter_frees_per_round_checkpoints(spark):
    """ADVICE r11: each greedy round unpersists the PRIOR round's local
    checkpoint once the new one materializes — storage must not grow by
    ~k frames per call. Allow the two live frames (pts + the current
    round's) plus anything persisted before the call."""
    rng = random.Random(11)
    points = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(50)}
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = _collect(kcenter_select(_df(spark, points), "vec_id", "embedding", k=12))
    assert len(out) == 50
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 2, (
        f"kcenter_select leaked {after - before} persistent RDDs for k=12"
    )


def test_quant_reference_matches_spark_half_up(spark):
    """ADVICE r11: the test reference must quantize half-away-from-zero
    like Spark round(), not Python banker's rounding. Probe with values
    whose micro product is EXACTLY n + 0.5 in doubles."""
    probes = []
    n = 1
    while len(probes) < 4 and n < 10_000:
        x = (n + 0.5) / 1_000_000.0
        if x * 1_000_000.0 == n + 0.5:  # round-trips exactly -> a true tie
            probes.extend([x, -x])
        n += 2  # odd n: banker's rounding would go DOWN, HALF_UP goes UP
    assert probes, "no exactly-representable .5 micro boundary found"
    got = _quant(probes)
    want = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in probes], "x double")
        .selectExpr("CAST(round(x * 1000000.0) AS BIGINT) AS q")
        .collect()
    ]
    assert got == want
