"""Time-series similarity search (operators/timeseries.py
series_vectors + ts_correlation_topk + ts_lagged_topk)."""

from __future__ import annotations

import math

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


def _lag_reference(series: dict, n: int, k: int, max_lag: int):
    """All-pairs x all-lags sequential reference: center w = n*v - sum,
    circular-rotate the QUERY, cosine rounded 6dp, per pair max r with
    the smallest attaining lag, per query top-k by (r desc, id asc)."""
    cent = {}
    for sid, vec in series.items():
        s = sum(vec)
        w = [x * n - s for x in vec]
        if any(x != 0 for x in w):
            cent[sid] = w
    out = {}
    for q, qw in cent.items():
        rows = []
        for c, cw in cent.items():
            if c == q:
                continue
            best, best_lag = None, None
            for lag in range(-max_lag, max_lag + 1):
                dot = 0.0
                for i in range(n):
                    dot += float(qw[(i + lag) % n]) * float(cw[i])
                nq = math.sqrt(sum(float(x) * float(x) for x in qw))
                nc = math.sqrt(sum(float(x) * float(x) for x in cw))
                r = round(dot / (nq * nc), 6)
                if best is None or r > best:
                    best, best_lag = r, lag
            rows.append((c, best, best_lag))
        rows.sort(key=lambda t: (-t[1], t[0]))
        out[q] = [
            (c, r, lag, rk + 1) for rk, (c, r, lag) in enumerate(rows[:k])
        ]
    return out


def _lag_df(spark, series):
    rows = [
        (sid, b, v)
        for sid, vec in series.items()
        for b, v in enumerate(vec)
        if v != 0
    ]
    return spark.createDataFrame(rows, "sid long, b int, v long")


def test_ts_lagged_matches_sequential_reference(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ts_lagged_topk

    import random

    rng = random.Random(11)
    n = 12
    series = {sid: [rng.randrange(0, 6) for _ in range(n)] for sid in range(9)}
    series[9] = [3] * n  # constant: dropped on both sides
    df = _lag_df(spark, series)
    got = {}
    for row in ts_lagged_topk(df, "sid", "b", n, k=3, max_lag=2, value_col="v").collect():
        got.setdefault(row["sid_q"], []).append(
            (row["sid_c"], row["cos"], row["lag"], row["rank"])
        )
    for q in got:
        got[q].sort(key=lambda t: t[3])
    want = _lag_reference(series, n, k=3, max_lag=2)
    assert got == want
    assert 9 not in got and all(9 != c for rows in got.values() for c, *_ in rows)


def test_ts_lagged_finds_planted_shift(spark):
    """Series 1 is series 0 rotated: 1[t] = 0[t+2] (1 lags 0 by 2), so
    querying 0 must surface 1 at r=1.0 with lag=+2 under the documented
    sign convention rot_lag(q)[i] = q[(i+lag) mod n]."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ts_lagged_topk

    n = 10
    base = [5, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    series = {
        0: base,
        1: [base[(i + 2) % n] for i in range(n)],
        2: [1, 0, 2, 0, 1, 0, 3, 0, 1, 0],
    }
    df = _lag_df(spark, series)
    out = {
        (r["sid_q"], r["rank"]): (r["sid_c"], r["cos"], r["lag"])
        for r in ts_lagged_topk(df, "sid", "b", n, k=1, max_lag=3, value_col="v").collect()
    }
    assert out[(0, 1)] == (1, 1.0, 2)
    assert out[(1, 1)] == (0, 1.0, -2)


def test_ts_lagged_layout_independent_and_zero_lag_matches_plain(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import (
        ts_correlation_topk, ts_lagged_topk,
    )

    import random

    rng = random.Random(3)
    n = 8
    series = {sid: [rng.randrange(0, 5) for _ in range(n)] for sid in range(7)}
    df = _lag_df(spark, series)
    a = sorted(tuple(x) for x in ts_lagged_topk(df, "sid", "b", n, k=2, max_lag=2, value_col="v").collect())
    b = sorted(tuple(x) for x in ts_lagged_topk(
        df.repartition(9), "sid", "b", n, k=2, max_lag=2, value_col="v"
    ).collect())
    assert a == b
    # max_lag=0 degenerates to plain correlation search plus lag==0
    plain = sorted(
        (r["sid_q"], r["sid_c"], r["cos"], r["rank"])
        for r in ts_correlation_topk(df, "sid", "b", n, k=2, value_col="v").collect()
    )
    lag0 = ts_lagged_topk(df, "sid", "b", n, k=2, max_lag=0, value_col="v")
    assert sorted(
        (r["sid_q"], r["sid_c"], r["cos"], r["rank"]) for r in lag0.collect()
    ) == plain
    assert {r["lag"] for r in lag0.collect()} == {0}


def test_ts_lagged_guards(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ts_lagged_topk

    df = spark.createDataFrame([(1, 0, 1)], "sid long, b int, v long")
    with pytest.raises(ValueError, match="max_lag"):
        ts_lagged_topk(df, "sid", "b", 4, max_lag=-1)
    with pytest.raises(ValueError, match="wider than the bucket domain"):
        ts_lagged_topk(df, "sid", "b", 4, max_lag=2)


def test_series_vectors_wide_bucket_raises_not_wraps(spark):
    """Review r11: the bucket used to be cast('int') BEFORE the range
    guard, so a >= 2^31 value could silently WRAP into range on an
    ANSI-off cluster. The range guard now sees the wide (bigint) value;
    the int narrowing runs post-guard on in-range rows only. Either the
    guard's message (non-ANSI evaluation order) or ANSI's CAST_OVERFLOW
    may surface first — both are LOUD; the bug was the silent wrap."""
    df = spark.createDataFrame([(1, 2 ** 32, 1)], "sid long, b long, v long")
    with pytest.raises(Exception, match="bucket out of|CAST_OVERFLOW"):
        series_vectors(df, "sid", "b", 4, value_col="v").collect()


def test_exact_integral_rejects_wide_decimals(spark):
    """Review r11: decimal(p > 18, 0) can exceed int64, where
    cast('long') crashes under ANSI or NULLs without it — the guard
    must reject it at plan time despite scale 0."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import is_exact_integral
    from pyspark.sql import types as T

    assert is_exact_integral(T.DecimalType(18, 0))
    assert not is_exact_integral(T.DecimalType(19, 0))
    assert not is_exact_integral(T.DecimalType(38, 0))
    wide = spark.createDataFrame([(1, 0)], "sid long, b long").selectExpr(
        "sid", "cast(b as decimal(38,0)) b"
    )
    with pytest.raises(TypeError, match="integral"):
        series_vectors(wide, "sid", "b", 4)
