"""Time-series similarity search (operators/timeseries.py
series_vectors + ts_correlation_topk)."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import (
    series_vectors,
    ts_correlation_topk,
)


def test_series_vectors_dense_fill_and_guards(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 3), (2, 2)], "sid long, b int"
    )
    got = {r["sid"]: r["vec"] for r in series_vectors(df, "sid", "b", 4).collect()}
    assert got == {1: [2, 0, 0, 1], 2: [0, 0, 1, 0]}
    with pytest.raises(ValueError, match="n_buckets"):
        series_vectors(df, "sid", "b", 0)
    with pytest.raises(Exception, match="bucket out of"):
        series_vectors(
            spark.createDataFrame([(1, 7)], "sid long, b int"), "sid", "b", 4
        ).collect()
    with pytest.raises(TypeError, match="integral"):
        series_vectors(
            spark.createDataFrame([(1, 0, 0.5)], "sid long, b int, v double"),
            "sid", "b", 4, value_col="v",
        )


def test_ts_correlation_matches_numpy_pearson(spark):
    """Top-k by exact Pearson: compare ranks AND values (6dp) against
    numpy.corrcoef on the same dense count matrix; constant series must
    be absent from both sides."""
    rng = {
        0: [5, 1, 4, 2, 8, 3],
        1: [4, 1, 5, 2, 7, 3],   # near-copy of 0
        2: [1, 6, 1, 7, 1, 6],   # anti-phase
        3: [2, 2, 2, 2, 2, 2],   # constant -> dropped
        4: [0, 5, 1, 6, 0, 7],
    }
    rows = [(sid, b) for sid, counts in rng.items()
            for b, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "sid long, b int")
    out = ts_correlation_topk(df, "sid", "b", n_buckets=6, k=2)
    got = {(r["sid_q"], r["rank"]): (r["sid_c"], r["cos"]) for r in out.collect()}
    live = [s for s in rng if s != 3]
    M = np.array([rng[s] for s in live], dtype=np.float64)
    C = np.corrcoef(M)
    want = {}
    for qi, q in enumerate(live):
        scored = sorted(
            ((round(C[qi, ci], 6), c) for ci, c in enumerate(live) if c != q),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, c) in enumerate(scored[:2], start=1):
            want[(q, rank)] = (c, cos)
    assert got == want
    assert not any(q == 3 or c == 3 for (q, _), (c, _) in got.items())
    # the planted near-copy is rank 1 both ways
    assert got[(0, 1)][0] == 1 and got[(1, 1)][0] == 0


def test_ts_correlation_layout_independent(spark):
    rows = [(sid, (sid * 7 + i) % 5) for sid in range(6) for i in range(sid + 2)]
    df = spark.createDataFrame(rows, "sid long, b int")
    a = sorted(map(tuple, ts_correlation_topk(df, "sid", "b", 5, k=2).collect()))
    b = sorted(map(tuple, ts_correlation_topk(
        df.repartition(7), "sid", "b", 5, k=2).collect()))
    assert a == b


def test_series_vectors_rejects_fractional_bucket(spark):
    """Review r10: a double bucket would truncate toward zero per row
    (3.9 -> slot 3, -0.5 -> slot 0) and silently mis-bucket series —
    reject at plan time, same contract as value_col."""
    df = spark.createDataFrame([(1, 3.9)], "sid long, b double")
    with pytest.raises(TypeError, match="integral"):
        series_vectors(df, "sid", "b", 4)


def test_series_vectors_accepts_decimal_scale0(spark):
    """ADVICE r10: decimal(p, 0) buckets/values are exact integral —
    no truncation is possible, so they must pass the guard and produce
    the same vectors as their long-typed twins; fractional decimals
    stay rejected."""
    df = spark.createDataFrame(
        [(1, 0, 2), (1, 3, 1), (2, 2, 5)], "sid long, b long, v long"
    )
    dec = df.selectExpr(
        "sid", "cast(b as decimal(10,0)) b", "cast(v as decimal(10,0)) v"
    )
    want = {r["sid"]: r["vec"] for r in series_vectors(df, "sid", "b", 4, value_col="v").collect()}
    got = {r["sid"]: r["vec"] for r in series_vectors(dec, "sid", "b", 4, value_col="v").collect()}
    assert got == want == {1: [2, 0, 0, 1], 2: [0, 0, 5, 0]}
    frac = df.selectExpr("sid", "cast(b as decimal(10,2)) b")
    with pytest.raises(TypeError, match="integral"):
        series_vectors(frac, "sid", "b", 4)
