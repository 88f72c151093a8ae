"""Linear interpolation (operators/timeseries.py) and histogram
quantiles (operators/sketches.py histogram_quantiles)."""

from __future__ import annotations

import math
import random

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import histogram_quantiles
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import interpolate_linear


def _series(spark, rows):
    return spark.createDataFrame(rows, "k int, ts bigint, v double")


def test_interior_gap_interpolates(spark):
    df = _series(spark, [(1, 0, 10.0), (1, 10, None), (1, 20, 30.0), (1, 15, None)])
    got = {r.ts: r.v_filled for r in interpolate_linear(df, "k", "ts", "v").collect()}
    assert got == {0: 10.0, 10: 20.0, 15: 25.0, 20: 30.0}


def test_edge_fills_and_all_null(spark):
    df = _series(
        spark,
        [(1, 0, None), (1, 10, 5.0), (1, 20, None), (2, 0, None), (2, 10, None)],
    )
    got = {(r.k, r.ts): r.v_filled for r in interpolate_linear(df, "k", "ts", "v").collect()}
    assert got == {(1, 0): 5.0, (1, 10): 5.0, (1, 20): 5.0, (2, 0): None, (2, 10): None}


def test_uneven_spacing_weighting(spark):
    df = _series(spark, [(1, 0, 0.0), (1, 30, None), (1, 40, 100.0)])
    got = {r.ts: r.v_filled for r in interpolate_linear(df, "k", "ts", "v").collect()}
    assert got[30] == pytest.approx(75.0)


def test_histogram_quantiles_match_exact_on_uniform(spark):
    from pyspark.sql import functions as F

    # 0..9999 uniform, 100 bins of width 100: interpolation is exact up
    # to the within-bin uniform assumption
    df = spark.range(10000).select(F.col("id").cast("double").alias("x"))
    got = {
        r.q_micro: r.est
        for r in histogram_quantiles(df, "x", 0.0, 10000.0, bins=100).collect()
    }
    assert got[500000] == pytest.approx(5000.0, abs=100)
    assert got[900000] == pytest.approx(9000.0, abs=100)
    assert got[990000] == pytest.approx(9900.0, abs=100)
    assert all(r == 10000 for r in [10000])


def test_histogram_quantiles_grouped_and_clamped(spark):
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double"))
        .otherwise(F.lit(1e9))  # out of range -> clamps to top bin
        .alias("x"),
    )
    out = histogram_quantiles(df, "x", 0.0, 1000.0, bins=10, qs_micro=(500000,), group_cols=["g"])
    got = {r.g: r.est for r in out.collect()}
    assert 400.0 <= got[0] <= 600.0
    assert 900.0 <= got[1] <= 1000.0  # everything clamped into the last bin
    assert {r.total for r in out.collect()} == {500}


def test_histogram_state_is_mergeable(spark):
    """Per-shard histograms summed == whole-corpus histogram: quantile
    estimates identical."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(F.col("id").cast("double").alias("x"))
    a = df.where("x < 2000")
    b = df.where("x >= 2000")
    whole = {
        r.q_micro: r.est for r in histogram_quantiles(df, "x", 0.0, 5000.0, bins=50).collect()
    }
    # merging shards = just running on the union (counts are additive)
    merged = {
        r.q_micro: r.est
        for r in histogram_quantiles(a.unionAll(b), "x", 0.0, 5000.0, bins=50).collect()
    }
    assert whole == merged


def test_histogram_bad_params(spark):
    from pyspark.sql import functions as F

    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="bins"):
        histogram_quantiles(df, "x", 0.0, 1.0, bins=0)
    with pytest.raises(ValueError, match="qs_micro"):
        histogram_quantiles(df, "x", 0.0, 1.0, qs_micro=(0,))


def test_equal_timestamp_neighbors_no_division_error(spark):
    # null flanked by two observations at the SAME ts: takes the earlier
    df = spark.createDataFrame(
        [(1, 10, 0, 3.0), (1, 10, 1, None), (1, 10, 2, 7.0)],
        "k int, ts bigint, tie int, v double",
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import interpolate_linear as il

    out = il(df, "k", "ts", "v", tiebreak_cols=("tie",)).collect()
    got = {r.tie: r.v_filled for r in out}
    assert got == {0: 3.0, 1: 3.0, 2: 7.0}  # gap filled from earlier obs, no 0/0


def test_histogram_and_psi_ignore_nan(spark):
    from pyspark.sql import functions as F
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift

    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, F.lit(float("nan")))
        .otherwise(F.col("id").cast("double"))
        .alias("x")
    )
    hq = histogram_quantiles(df, "x", 0.0, 100.0, bins=10, qs_micro=(500000,)).collect()
    assert hq[0].total == 90
    psi = psi_drift(df, df, "x", 0.0, 100.0, bins=5).collect()
    assert sum(r.n_a for r in psi) == 90


# ---------------------------------------------------------------------------
# truncated exact-integer EWMA
# ---------------------------------------------------------------------------

def _ewma_ref(vals, L, dn=1, dd=2, q=100, so=10**4):
    import math

    cents = [math.floor(v * q) for v in vals]
    out = []
    for i in range(len(vals)):
        win = cents[max(0, i - L + 1):i + 1]
        s = len(win)
        n = sum(x * dn ** (s - 1 - idx) * dd ** idx for idx, x in enumerate(win))
        w = sum(dn ** (s - 1 - idx) * dd ** idx for idx in range(s))
        out.append((n * so) // w)  # python // floors, the pinned semantic
    return out


def test_ewma_matches_reference_including_negatives(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ewma

    vals = [3.5, -1.2, 7.77, 0.0, 2.25, 9.99, -5.5, 1.01, -0.07]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    got = {r.t: r.ewma_micro for r in ewma(df, "k", "t", "v", window=4).collect()}
    assert [got[i] for i in range(len(vals))] == _ewma_ref(vals, 4)


def test_ewma_slow_decay_rational(spark):
    # retention 3/4: the general-rational recurrence path
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ewma

    vals = [10.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
    )
    got = {
        r.t: r.ewma_micro
        for r in ewma(df, "k", "t", "v", window=4, decay_num=3, decay_den=4).collect()
    }
    assert [got[i] for i in range(4)] == _ewma_ref(vals, 4, dn=3, dd=4)
    # slow decay keeps more of the old value than the default would
    fast = {r.t: r.ewma_micro for r in ewma(df, "k", "t", "v", window=4).collect()}
    assert got[3] > fast[3]


def test_ewma_keys_independent_and_layout_stable(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ewma

    rows = [(k, i, float((i * 7 + hash(k)) % 50) / 3) for k in "abc" for i in range(12)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    a = sorted(map(tuple, ewma(df, "k", "t", "v", window=5).collect()))
    b = sorted(map(tuple, ewma(df.repartition(7, "t"), "k", "t", "v", window=5).collect()))
    assert a == b
    for k in "abc":
        vals = [v for kk, _, v in rows if kk == k]
        got = [x[-1] for x in sorted(a) if x[0] == k]
        assert got == _ewma_ref(vals, 5)


def test_ewma_rejects_bad_params(spark):
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ewma

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t int, v double")
    with _pytest.raises(ValueError, match="window"):
        ewma(df, "k", "t", "v", window=0)
    with _pytest.raises(ValueError, match="decay_num"):
        ewma(df, "k", "t", "v", decay_num=2, decay_den=2)


def test_ewma_null_values_are_missing_observations(spark):
    # NULLs contribute to no frame; the weight denominator covers only
    # the values present (docstring contract)
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ewma

    rows = [("a", 0, 4.0), ("a", 1, None), ("a", 2, 8.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r.t: r.ewma_micro for r in ewma(df, "k", "t", "v", window=3).collect()}
    # t=0: [400] -> 400*1e4
    assert got[0] == 4_000_000
    # t=1: frame (4.0, NULL) -> only 400 survives, weights [1]
    assert got[1] == 4_000_000
    # t=2: frame (4.0, NULL, 8.0) -> [400, 800], weights [1, 2]/3
    assert got[2] == (400 * 1 + 800 * 2) * 10**4 // 3


# ---------------------------------------------------------------------------
# cusum
# ---------------------------------------------------------------------------

def _cusum_reference(values, ref, slack):
    """Textbook sequential recurrence (the form the operator avoids)."""
    s_hi, s_lo, out = 0, 0, []
    for v in values:
        if v is None:
            out.append((None, None))
            continue
        c = math.floor(v * 100)
        s_hi = max(0, s_hi + (c - ref - slack))
        s_lo = max(0, s_lo - (c - ref + slack))
        out.append((s_hi, s_lo))
    return out


def test_cusum_matches_sequential_recurrence(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import cusum

    rng = random.Random(3)
    rows = []
    for uid in range(5):
        vals = [rng.uniform(0, 120) for _ in range(60)]
        if uid == 2:  # injected upward shift mid-series
            vals[30:] = [v + 80 for v in vals[30:]]
        rows += [(uid, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid int, seq int, value double")
    out = cusum(df, "uid", "seq", "value", ref_cents=5000, threshold_cents=150000)
    got = {(r.uid, r.seq): (r.cusum_hi, r.cusum_lo, r.alert) for r in out.collect()}
    fired = 0
    for uid in range(5):
        vals = [v for u, _, v in rows if u == uid]
        for i, (hi, lo) in enumerate(_cusum_reference(vals, 5000, 0)):
            ghi, glo, alert = got[(uid, i)]
            assert (ghi, glo) == (hi, lo)
            assert alert == (hi >= 150000 or lo >= 150000)
            fired += alert
    assert fired > 0  # the injected shift must trip the threshold

    again = cusum(
        df.repartition(13), "uid", "seq", "value",
        ref_cents=5000, threshold_cents=150000,
    ).collect()
    assert {(r.uid, r.seq): (r.cusum_hi, r.cusum_lo, r.alert) for r in again} == got


def test_cusum_nulls_pass_through_unscored(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, None), (1, 2, 90.0)], "uid int, seq int, value double"
    )
    rows = {r.seq: r for r in cusum(df, "uid", "seq", "value", 5000, 1000).collect()}
    assert rows[1].cusum_hi is None and rows[1].alert is None
    # the null contributes nothing: row 2 continues from row 0's state
    want = _cusum_reference([10.0, 90.0], 5000, 0)[1]
    assert (rows[2].cusum_hi, rows[2].cusum_lo) == want
    assert rows[2].alert == (want[0] >= 1000 or want[1] >= 1000)


def test_cusum_slack_suppresses_small_drift(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import cusum

    # constant small excess of +0.30 over ref: dies under slack >= 30 cents
    df = spark.createDataFrame(
        [(1, i, 50.30) for i in range(50)], "uid int, seq int, value double"
    )
    tight = cusum(df, "uid", "seq", "value", ref_cents=5000, threshold_cents=500)
    assert tight.filter("alert").count() > 0
    slacked = cusum(
        df, "uid", "seq", "value", ref_cents=5000, threshold_cents=500, slack_cents=30
    )
    assert slacked.filter("alert").count() == 0


# ---------------------------------------------------------------------------
# acf
# ---------------------------------------------------------------------------

def _acf_reference(xs, lag):
    """Definitional full-series-mean estimator on cent-quantized values."""
    cs = [math.floor(v * 100) for v in xs]
    n = len(cs)
    mu = sum(cs) / n
    den = sum((c - mu) ** 2 for c in cs)
    num = sum((cs[t] - mu) * (cs[t - lag] - mu) for t in range(lag, n))
    return num / den if den > 0 else None


def test_acf_matches_reference_and_detects_period(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import acf

    rng = random.Random(17)
    # period-2 alternation: strong negative r at lag 1, positive at lag 2
    xs = [(50.0 if i % 2 == 0 else 10.0) + rng.uniform(0, 2) for i in range(120)]
    df = spark.createDataFrame([(1, i, v) for i, v in enumerate(xs)],
                               "k int, seq int, value double")
    out = {r.lag: r for r in acf(df, "k", "seq", "value", max_lag=3).collect()}
    for lag in (1, 2, 3):
        want = _acf_reference(xs, lag)
        assert abs(out[lag].r - round(want, 6)) < 2e-6, lag
        assert out[lag].n_pairs == 120 - lag
    assert out[1].r < -0.8 and out[2].r > 0.8

    again = {r.lag: r for r in
             acf(df.repartition(7), "k", "seq", "value", max_lag=3).collect()}
    assert again == out


def test_acf_null_drop_constant_and_short_series(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import acf

    df = spark.createDataFrame(
        # k=1: nulls dropped -> series (1, 3, 5) keeps lag-1 pairs across the gap
        [(1, 0, 1.0), (1, 1, None), (1, 2, 3.0), (1, 3, 5.0),
         # k=2: constant -> NULL r, pairs still counted
         (2, 0, 7.0), (2, 1, 7.0), (2, 2, 7.0),
         # k=3: single point -> lag grid present, zero pairs
         (3, 0, 2.0)],
        "k int, seq int, value double",
    )
    out = {(r.k, r.lag): r for r in acf(df, "k", "seq", "value", max_lag=2).collect()}
    assert len(out) == 6                      # 3 keys x 2 lags, grid complete
    assert out[(1, 1)].n_pairs == 2
    want = _acf_reference([1.0, 3.0, 5.0], 1)
    assert abs(out[(1, 1)].r - round(want, 6)) < 2e-6
    assert out[(2, 1)].r is None and out[(2, 1)].n_pairs == 2
    assert out[(3, 1)].n_pairs == 0 and out[(3, 1)].r is None
    with pytest.raises(ValueError, match="max_lag"):
        acf(df, "k", "seq", "value", max_lag=0)


# ---------------------------------------------------------------------------
# seasonal_decompose
# ---------------------------------------------------------------------------


def _sd_reference(rows, period=4):
    """Sequential decomposition mirroring the integer semantics."""
    half = period // 2
    win = 2 * half + 1
    scale = 1_000_000

    def idiv(a, b):  # truncate toward zero, like Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    by_key = {}
    for k, t, y in rows:
        by_key.setdefault(k, []).append((t, y))
    out = {}
    for k, series in by_key.items():
        series.sort()
        n = len(series)
        tr = [None] * n
        for i in range(half, n - half):
            s = sum(y for _, y in series[i - half : i + half + 1])
            tr[i] = idiv(s * scale, win)
        detr = [
            (series[i][0] % period, series[i][1] * scale - tr[i])
            for i in range(n)
            if tr[i] is not None
        ]
        phase_sum, phase_n = {}, {}
        for ph, d in detr:
            phase_sum[ph] = phase_sum.get(ph, 0) + d
            phase_n[ph] = phase_n.get(ph, 0) + 1
        s_micro = {ph: idiv(phase_sum[ph], phase_n[ph]) for ph in phase_sum}
        off = idiv(sum(s_micro.values()), len(s_micro))
        c_micro = {ph: s - off for ph, s in s_micro.items()}
        for i, (t, y) in enumerate(series):
            if tr[i] is None:
                out[(k, t)] = (y, None, None, None)
            else:
                d = y * scale - tr[i]
                c = c_micro[t % period]
                out[(k, t)] = (
                    y,
                    round(tr[i] / scale, 6),
                    round(c / scale, 6),
                    round((d - c) / scale, 6),
                )
    return out


def test_seasonal_decompose_reference_reconstruction_and_layout(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import seasonal_decompose

    rng = random.Random(7)
    period = 4
    rows = []
    for k in ("x", "y"):
        base = 500 if k == "x" else -200
        for t in range(60):
            seasonal = [40, -10, -25, -5][t % period]
            rows.append((k, t, base + 3 * t + seasonal + rng.randint(-4, 4)))
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")

    out = seasonal_decompose(df, "k", "t", "y", period=period)
    got = {
        (r.k, r.t): (r.y, r.trend, r.seasonal, r.remainder) for r in out.collect()
    }
    assert got == _sd_reference(rows, period)

    again = {
        (r.k, r.t): (r.y, r.trend, r.seasonal, r.remainder)
        for r in seasonal_decompose(
            df.repartition(13), "k", "t", "y", period=period
        ).collect()
    }
    assert again == got

    # interior rows reconstruct: y == trend + seasonal + remainder
    for (k, t), (y, tr, se, re) in got.items():
        if tr is not None:
            assert abs((tr + se + re) - y) < 2e-6, (k, t)
    # edges (first/last half-window of each key) have no trend
    assert got[("x", 0)][1] is None and got[("x", 59)][1] is None
    assert got[("x", 2)][1] is not None

    # the seasonal component recovers the planted cycle shape: phase 0
    # is the peak, phase 2 the trough, for both keys
    for k in ("x", "y"):
        ph = {t % period: se for (kk, t), (_, tr, se, _) in got.items() if kk == k and tr is not None}
        assert max(ph, key=ph.get) == 0 and min(ph, key=ph.get) == 2


def test_seasonal_decompose_validation(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import seasonal_decompose

    df = spark.createDataFrame([("a", 1, 1)], "k string, t bigint, y bigint")
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "k", "t", "y", period=1)
