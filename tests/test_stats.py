"""Exact correlation matrix (operators/stats.py)."""

from __future__ import annotations

import math
import random

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import corr_matrix


def _np_corr(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))


def test_matches_quantized_reference_and_layout_independent(spark):
    rng = random.Random(5)
    rows = [
        (i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(2000)
    ]
    rows = [(i, a, 0.8 * a + 0.2 * b) for i, a, b in rows]  # correlated
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    out = {(r.col_x, r.col_y): r.corr for r in corr_matrix(df, ["x", "y"], scale=1000).collect()}
    # reference on the SAME quantized values
    xs = [round(a * 1000) for _, a, _ in rows]
    ys = [round(b * 1000) for _, _, b in rows]
    want = round(_np_corr(xs, ys), 6)
    assert abs(out[("x", "y")] - want) < 2e-6
    assert out[("x", "y")] > 0.95

    b = {(r.col_x, r.col_y): r.corr for r in corr_matrix(df.repartition(13), ["x", "y"], scale=1000).collect()}
    assert out == b  # bit-identical under any layout


def test_constant_column_yields_null(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double")
    out = corr_matrix(df, ["x", "y"]).collect()
    assert out[0].corr is None


def test_anticorrelation_and_null_rows_dropped(spark):
    rows = [(float(i), float(100 - i)) for i in range(50)] + [(None, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = corr_matrix(df, ["x", "y"]).collect()[0]
    assert out.n == 50
    assert out.corr == pytest.approx(-1.0, abs=1e-6)


def test_needs_two_columns(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="2 columns"):
        corr_matrix(df, ["x"])


def test_standardize_grouped_exact_and_clipped(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import standardize

    # max |z| is (n-1)/sqrt(n), so the outlier group needs n >= 11 for
    # a z above 3 — 20 tight points + one far value clips cleanly
    rows = (
        [(i, "a", float(i % 3)) for i in range(1, 21)]
        + [(21, "a", 1_000_000.0)]                         # winsorized to +3
        + [(31, "b", 10.0), (32, "b", 10.0)]               # zero variance -> NULL
        + [(41, "a", None), (42, "a", float("nan"))]       # pass through NULL z
    )
    df = spark.createDataFrame(rows, "id bigint, g string, x double")
    got = {r.id: r.z for r in standardize(df, "x", ["g"], clip=3.0).collect()}
    assert got[31] is None and got[32] is None
    assert got[41] is None and got[42] is None
    assert got[21] == 3.0  # winsorized
    assert got[3] < got[1] < got[2]  # x: 0.0 < 1.0 < 2.0 ordering preserved


def test_standardize_ungrouped_layout_independent(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import standardize

    rows = [(i, float(i % 17) + 0.25) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, x double")
    a = {r.id: r.z for r in standardize(df, "x").collect()}
    b = {r.id: r.z for r in standardize(df.repartition(7, "id"), "x").collect()}
    assert a == b
    import statistics
    xs = [float(i % 17) + 0.25 for i in range(300)]
    mean, pstd = statistics.fmean(xs), statistics.pstdev(xs)
    assert a[0] == pytest.approx((0.25 - mean) / pstd, abs=1e-4)


def test_standardize_all_null_group_passes_through(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import standardize

    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "z", None), (4, "z", float("nan"))]
    df = spark.createDataFrame(rows, "id bigint, g string, x double")
    got = {r.id: r.z for r in standardize(df, "x", ["g"]).collect()}
    assert set(got) == {1, 2, 3, 4}  # group z not dropped
    assert got[3] is None and got[4] is None


def test_pca_matches_numpy_and_layout_independent(spark):
    """Components/projection equal a driver-side numpy reference built
    from the SAME exact-integer covariance; repartitioned input gives a
    bit-identical model (integer sums are order-insensitive)."""
    import numpy as np

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import pca_fit, pca_project

    rng = np.random.default_rng(3)
    base = rng.normal(size=(200, 3)) @ np.diag([3.0, 1.0, 0.2])
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    model = pca_fit(df, "embedding", k=2, scale=10**6)
    model2 = pca_fit(df.repartition(7), "embedding", k=2, scale=10**6)
    assert np.array_equal(model["components"], model2["components"])
    assert np.array_equal(model["mean"], model2["mean"])
    assert model["n"] == 200

    # numpy reference over the identically quantized data
    q = np.rint(base * 10**6) / 10**6
    mu = q.mean(axis=0)
    cov = (q - mu).T @ (q - mu) / len(q)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    ref = vecs[:, order].T.copy()
    for row in ref:
        p = int(np.argmax(np.abs(row)))
        if row[p] < 0:
            row *= -1.0
    assert np.allclose(model["components"], ref, atol=1e-9)
    assert (
        model["explained_var"][0] >= model["explained_var"][1] >= 0 - 1e-12
    )

    proj = {
        r["vec_id"]: r["pca"]
        for r in pca_project(df, "vec_id", "embedding", model).collect()
    }
    # projection runs on the RAW vectors; quantization exists only for
    # the exact moment sums, so the reference must do the same
    want = np.round((base - model["mean"]) @ model["components"].T, 6)
    for i in range(200):
        assert proj[i] == list(want[i])


def test_pca_fit_empty_raises(spark):
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import pca_fit

    df = spark.createDataFrame([], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", k=2)


def test_ntile_global_matches_window_and_is_layout_independent(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import ntile_global

    rows = [(i, float((i * 13) % 7)) for i in range(103)]  # heavy ties
    df = spark.createDataFrame(rows, "id int, v double")
    got = {
        r["id"]: r["bin"]
        for r in ntile_global(df, ["v", "id"], bins=10).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["nt"]
        for r in df.withColumn("nt", F.ntile(10).over(w)).collect()
    }
    assert got == want
    got7 = {
        r["id"]: r["bin"]
        for r in ntile_global(df.repartition(7), ["v", "id"], bins=10).collect()
    }
    assert got7 == want


def test_ntile_global_fewer_rows_than_bins(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import ntile_global
    import pytest

    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    got = sorted(
        (r["id"], r["bin"]) for r in ntile_global(df, ["id"], bins=5).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]
    with pytest.raises(ValueError):
        ntile_global(df, ["id"], bins=0)


# ---------------------------------------------------------------------------
# mannwhitney_drift
# ---------------------------------------------------------------------------

def _mwu_reference(xs, ys):
    """Textbook U_b + tie-corrected z on average ranks (pure Python)."""
    merged = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    n = len(merged)
    ranks = {}
    i = 0
    tcorr = 0
    while i < n:
        j = i
        while j < n and merged[j][0] == merged[i][0]:
            j += 1
        t = j - i
        tcorr += t * t * t - t
        avg = (i + 1 + j) / 2  # average of ranks i+1 .. j
        for k in range(i, j):
            ranks[k] = avg
        i = j
    r_b = sum(ranks[k] for k in range(n) if merged[k][1] == 1)
    na, nb = len(xs), len(ys)
    u_b = r_b - nb * (nb + 1) / 2
    var = na * nb / 12 * ((n + 1) - tcorr / (n * (n - 1)))
    z = (u_b - na * nb / 2) / math.sqrt(var) if var > 0 else None
    return u_b, z


def test_mannwhitney_matches_reference_and_layout_independent(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import mannwhitney_drift

    rng = random.Random(11)
    xs = [rng.randint(0, 40) for _ in range(500)]          # many ties
    ys = [rng.randint(5, 45) for _ in range(300)]          # shifted up
    a = spark.createDataFrame([(v,) for v in xs], "v int")
    b = spark.createDataFrame([(v,) for v in ys], "v int")
    row = mannwhitney_drift(a, b, "v").collect()[0]
    u_b, z = _mwu_reference(xs, ys)
    assert row.n_a == 500 and row.n_b == 300
    assert row.u2_b == round(2 * u_b)          # doubled units are integral
    assert abs(row.z - round(z, 6)) < 2e-6
    assert abs(row.rank_biserial - (2 * u_b / (500 * 300) - 1)) < 2e-6
    # shifted-up B: most (a, b) pairs have a < b, so U_b is large, z > 0
    assert row.z > 3

    again = mannwhitney_drift(
        a.repartition(13), b.repartition(7), "v", num_partitions=5
    ).collect()[0]
    assert again == row  # bit-identical under any layout


def test_mannwhitney_all_tied_yields_null_z(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import mannwhitney_drift

    a = spark.createDataFrame([(7,)] * 4, "v int")
    b = spark.createDataFrame([(7,)] * 6, "v int")
    row = mannwhitney_drift(a, b, "v").collect()[0]
    assert row.z is None
    assert row.u2_b == 2 * 4 * 6 // 2 * 1  # all ties: U_b = na*nb/2 -> u2 = na*nb
    assert row.rank_biserial == 0.0


def test_mannwhitney_empty_side_degrades_to_null(spark):
    # ADVICE r4 (medium): an empty side made rank_biserial's division
    # throw DIVIDE_BY_ZERO under ANSI mode. A streaming drift monitor's
    # live window can legitimately be empty — the row must come back
    # with NULL z / rank_biserial, not kill the job.
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import mannwhitney_drift

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([], "v double")
    row = mannwhitney_drift(a, b, "v").collect()[0]
    assert (row.n_a, row.n_b) == (2, 0)
    assert row.u2_b == 0
    assert row.z is None
    assert row.rank_biserial is None
    # both sides empty: aggregate still yields one all-degenerate row
    row2 = mannwhitney_drift(b, b, "v").collect()[0]
    assert (row2.n_a, row2.n_b) == (0, 0)
    assert row2.z is None and row2.rank_biserial is None


def test_mannwhitney_nulls_ignored_and_disjoint_sides(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import mannwhitney_drift

    a = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    b = spark.createDataFrame([(10,), (None,), (20,)], "v int")
    row = mannwhitney_drift(a, b, "v").collect()[0]
    assert (row.n_a, row.n_b) == (2, 2)
    assert row.u2_b == 2 * 4          # every pair a < b: U_b = na*nb = 4
    assert row.rank_biserial == 1.0   # maximal effect


# ---------------------------------------------------------------------------
# ols_trend
# ---------------------------------------------------------------------------

def test_ols_trend_recovers_line_and_layout_independent(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import ols_trend

    rng = random.Random(7)
    rows = []
    for g, (a, b) in enumerate([(3, 40), (-2, 500), (0, 17)]):
        for x in range(200):
            noise = rng.randint(-5, 5) if g < 2 else 0
            rows.append((g, x, a * x + b + noise))
    df = spark.createDataFrame(rows, "g int, x int, y int")
    out = {r.g: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert out[0].n == 200 and abs(out[0].slope - 3) < 0.05 and abs(out[0].intercept - 40) < 6
    assert abs(out[1].slope - (-2)) < 0.05 and out[1].r2 > 0.99
    # exact line, zero noise: slope/intercept exact, constant-y r2 rules don't apply
    assert out[2].slope == 0.0 and out[2].intercept == 17.0 and out[2].r2 is None

    again = {r.g: r for r in ols_trend(df.repartition(13), ["g"], "x", "y").collect()}
    assert again == out  # exact moments -> bit-identical under any layout


def test_ols_trend_degenerate_groups(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import ols_trend

    df = spark.createDataFrame(
        [(1, 5, 10), (1, 5, 20),   # constant x
         (2, 1, 7),                # single point
         (3, 1, 2), (3, 2, None), (3, 3, 8)],  # null y dropped
        "g int, x int, y int",
    )
    out = {r.g: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert out[1].slope is None and out[1].intercept is None and out[1].r2 is None
    assert out[2].n == 1 and out[2].slope is None
    assert out[3].n == 2 and out[3].slope == 3.0 and out[3].intercept == -1.0 and out[3].r2 == 1.0


def test_ols_trend_slope_unit_rescales(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import ols_trend

    df = spark.createDataFrame([(1, i, 2 * i) for i in range(10)], "g int, x int, y int")
    base = ols_trend(df, ["g"], "x", "y").collect()[0]
    scaled = ols_trend(df, ["g"], "x", "y", slope_unit=1000.0).collect()[0]
    assert base.slope == 2.0 and scaled.slope == 2000.0
    assert base.intercept == scaled.intercept == 0.0


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------

def _chi2_reference(pairs):
    """Textbook full-table chi-squared over the FULL expected grid."""
    from collections import Counter
    obs = Counter(pairs)
    ra, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    n = len(pairs)
    chi2 = sum(
        (obs.get((a, b), 0) - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra for b in cb
    )
    return chi2, (len(ra) - 1) * (len(cb) - 1)


def test_chi2_matches_reference_including_missing_cells(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import chi2_independence

    rng = random.Random(13)
    pairs = []
    for _ in range(3000):
        a = rng.choice("xyz")
        # dependent: b leans toward a's index; cell ('z','q') never occurs
        b = rng.choice({"x": "ppq", "y": "pqq", "z": "pp"}[a])
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    row = chi2_independence(df, "a", "b").collect()[0]
    want, dof = _chi2_reference(pairs)
    assert row.dof == dof and row.n_obs == 3000
    # micro-rounded term sum: within 5e-7 * cells of the exact value
    assert abs(row.chi2 - want) < 1e-4
    assert abs(row.cramers_v - math.sqrt(want / (3000 * 1))) < 1e-4

    again = chi2_independence(df.repartition(17), "a", "b").collect()[0]
    assert again == row  # integer micro-sum -> layout-independent


def test_chi2_independent_columns_near_zero_and_degenerate(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import chi2_independence

    # perfectly balanced grid: chi2 exactly 0
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = chi2_independence(df, "a", "b").collect()[0]
    assert row.chi2 == 0.0 and row.dof == 1 and row.cramers_v == 0.0

    # single category on one side: dof 0, V undefined
    one = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r1 = chi2_independence(one, "a", "b").collect()[0]
    assert r1.dof == 0 and r1.cramers_v is None

    # nulls dropped listwise
    withnull = spark.createDataFrame(
        [("x", "p"), (None, "q"), ("y", None), ("y", "q")], "a string, b string"
    )
    assert chi2_independence(withnull, "a", "b").collect()[0].n_obs == 2


# ---------------------------------------------------------------------------
# winsorize
# ---------------------------------------------------------------------------

def test_winsorize_clips_at_exact_order_statistics(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import winsorize

    # values 1..100: p5 rank = ceil(0.05*100)=5 -> 5, p95 rank = 95 -> 95
    df = spark.createDataFrame([(1, float(i)) for i in range(1, 101)], "g int, v double")
    out = winsorize(df, ["g"], "v").collect()
    lows = [r for r in out if r.v < 5.0]
    highs = [r for r in out if r.v > 95.0]
    assert all(r.v_winsorized == 5.0 and r.clipped for r in lows)
    assert all(r.v_winsorized == 95.0 and r.clipped for r in highs)
    mid = [r for r in out if 5.0 <= r.v <= 95.0]
    assert all(r.v_winsorized == r.v and not r.clipped for r in mid)
    assert {(r.lo_bound, r.hi_bound) for r in out} == {(5.0, 95.0)}
    assert sum(r.clipped for r in out) == 4 + 5

    a = sorted(map(str, out))
    b = sorted(map(str, winsorize(df.repartition(9), ["g"], "v").collect()))
    assert a == b


def test_winsorize_null_passthrough_groups_and_validation(spark):
    import pytest as _pt
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 100.0), (1, None), (2, 7.0)],
        "g int, v double",
    )
    out = {(r.g, r.v): r for r in winsorize(df, ["g"], "v",
                                            lower_micro=0, upper_micro=670000).collect()}
    # group 1: n=3, k_hi = (670000*3+999999)//1e6 = 3 -> bound is the max
    assert out[(1, 100.0)].v_winsorized == 100.0   # rank-3 bound = 100 itself
    assert out[(1, None)].v_winsorized is None and out[(1, None)].clipped is None
    # singleton group: both bounds = the value
    assert out[(2, 7.0)].v_winsorized == 7.0 and not out[(2, 7.0)].clipped

    tight = {(r.g, r.v): r for r in winsorize(df, ["g"], "v",
                                              lower_micro=0, upper_micro=340000).collect()}
    # k_hi = (340000*3+999999)//1e6 = 2 -> bound 2.0; 100 clips down
    assert tight[(1, 100.0)].v_winsorized == 2.0 and tight[(1, 100.0)].clipped

    with _pt.raises(ValueError, match="lower <= upper"):
        winsorize(df, ["g"], "v", lower_micro=900000, upper_micro=100000)


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def _qn_reference(rows):
    """Sequential nearest-rank quantile normalization on (group, value)."""
    from collections import Counter, defaultdict

    pooled = sorted(v for _, v in rows)
    n = len(pooled)
    per_group = defaultdict(list)
    for g, v in rows:
        per_group[g].append(v)
    out = {}
    for g, vs in per_group.items():
        vs.sort()
        n_g = len(vs)
        counts = Counter(vs)
        cum = 0
        for v in sorted(counts):
            cnt = counts[v]
            cum += cnt
            midrank2 = 2 * cum - cnt + 1
            idx = max(1, min(n, (midrank2 * n) // (2 * n_g)))
            out[(g, v)] = (cnt, pooled[idx - 1])
    return out


def test_quantile_normalize_matches_reference_and_layout(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import quantile_normalize

    rng = random.Random(11)
    # three groups with deliberately different scales/skews + ties
    rows = (
        [("a", rng.randint(0, 40)) for _ in range(500)]
        + [("b", rng.randint(100, 120)) for _ in range(300)]
        + [("c", rng.randint(0, 1000)) for _ in range(200)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {
        (r.g, r.v): (r.cnt, r.normalized)
        for r in quantile_normalize(df, "g", "v").collect()
    }
    assert got == _qn_reference(rows)

    again = {
        (r.g, r.v): (r.cnt, r.normalized)
        for r in quantile_normalize(df.repartition(17), "g", "v", num_partitions=5).collect()
    }
    assert again == got  # layout- and partition-count-independent

    # normalized values are actual pooled data values, and within each
    # group the mapping is monotone in the source value
    pooled = {v for _, v in rows}
    assert all(nv in pooled for _, nv in got.values())
    for g in ("a", "b", "c"):
        series = sorted((v, nv) for (gg, v), (_, nv) in got.items() if gg == g)
        assert all(x[1] <= y[1] for x, y in zip(series, series[1:]))


def test_quantile_normalize_identical_group_becomes_global(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import quantile_normalize

    # one group IS the whole corpus: normalization must be (near-)identity
    rows = [("only", v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {r.v: r.normalized for r in quantile_normalize(df, "g", "v").collect()}
    assert got == {v: v for v in range(1, 101)}


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------


def _auc_reference(pairs):
    """O(n^2) tie-aware AUC: doubled-integer pair credit, then Spark's
    HALF_UP rounding (Python's round() is banker's — differs at an
    exact .5 ulp, which this data actually hits)."""
    from decimal import ROUND_HALF_UP, Decimal

    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    num2 = sum(2 if p > n else 1 if p == n else 0 for p in pos for n in neg)
    q = num2 / (2.0 * len(pos) * len(neg))
    return float(Decimal(repr(q)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_roc_auc_matches_pairwise_reference(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import roc_auc

    rng = random.Random(3)
    # overlapping distributions with heavy ties
    pairs = [(rng.randint(0, 30), True) for _ in range(400)] + [
        (rng.randint(10, 40), False) for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "s bigint, y boolean")
    row = roc_auc(df, "s", "y").collect()[0]
    assert (row.n_pos, row.n_neg) == (400, 300)
    assert row.auc == _auc_reference(pairs)
    # this construction makes the POSITIVES the lower-scored class
    assert row.auc < 0.5

    again = roc_auc(df.repartition(9), "s", "y", num_partitions=5).collect()[0]
    assert again == row  # layout-independent


def test_roc_auc_edges(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import roc_auc

    # perfect separation -> 1.0; single class -> NULL auc
    sep = spark.createDataFrame(
        [(10, True), (11, True), (1, False), (2, False)], "s bigint, y boolean"
    )
    assert roc_auc(sep, "s", "y").collect()[0].auc == 1.0
    one = spark.createDataFrame([(1, True), (2, True)], "s bigint, y boolean")
    r = roc_auc(one, "s", "y").collect()[0]
    assert r.auc is None and r.n_neg == 0


def test_roc_auc_accepts_numeric_01_labels(spark):
    """The sklearn convention: a named numeric label column means
    non-zero = positive — identical result to the boolean form."""
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import roc_auc

    rows = [(0.9, True), (0.8, False), (0.7, True), (0.2, False), (0.5, True), (0.5, False)]
    b = spark.createDataFrame(rows, "s double, lab boolean")
    want = tuple(roc_auc(b, "s", "lab").collect()[0])
    as_int = b.withColumn("lab", F.col("lab").cast("int"))
    as_dbl = b.withColumn("lab", F.col("lab").cast("double") * 7.5)
    assert tuple(roc_auc(as_int, "s", "lab").collect()[0]) == want
    assert tuple(roc_auc(as_dbl, "s", "lab").collect()[0]) == want
    # Column-expression path unchanged (must be boolean)
    assert tuple(roc_auc(b, "s", F.col("lab")).collect()[0]) == want


# ---------------------------------------------------------------------------
# cuped_adjust
# ---------------------------------------------------------------------------


def test_cuped_reduces_variance_and_preserves_mean(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import cuped_adjust

    rng = random.Random(19)
    # y correlated with pre-period covariate x plus noise
    units = []
    for i in range(2000):
        x = rng.randint(0, 10000)
        units.append((i, x, x + rng.randint(-500, 500)))
    df = spark.createDataFrame(units, "unit bigint, x bigint, y bigint")
    rows = cuped_adjust(df, "x", "y").collect()

    ys = [r.y for r in rows]
    adj = [r.y_adjusted for r in rows]
    n = len(rows)
    mean = lambda v: sum(v) / n
    var = lambda v: sum((a - mean(v)) ** 2 for a in v) / n
    # same mean (CUPED is mean-preserving), much less variance
    assert abs(mean(adj) - mean(ys)) < 1e-3
    assert var(adj) < 0.2 * var(ys)
    # theta recovers the planted unit slope
    assert abs(rows[0].theta - 1.0) < 0.05

    again = cuped_adjust(df.repartition(7), "x", "y").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_cuped_degenerate_covariate_and_nulls(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import cuped_adjust

    df = spark.createDataFrame(
        [(1, 5, 10), (2, 5, 30), (3, None, 20)], "unit bigint, x bigint, y bigint"
    )
    rows = {r.unit: r for r in cuped_adjust(df, "x", "y").collect()}
    # constant x -> no information -> theta 0, passthrough
    assert rows[1].theta == 0.0 and rows[1].y_adjusted == 10.0
    assert rows[2].y_adjusted == 30.0
    # null covariate -> excluded from moments, NULL adjustment
    assert rows[3].y_adjusted is None


# ---------------------------------------------------------------------------
# ndcg_binary (operators/similarity.py — eval for the retrieval family)
# ---------------------------------------------------------------------------


def test_ndcg_binary_hand_computed(spark):
    import math

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ndcg_binary

    w = lambda r: round(1_000_000 * math.log(2) / math.log(r + 1))
    results = [
        # q1: relevant at ranks 1,2 of 5; 2 relevant exist -> perfect -> 1.0
        *[("q1", r, 1 if r <= 2 else 0) for r in range(1, 6)],
        # q2: same 2 relevant but at the BOTTOM ranks 4,5 -> discounted
        *[("q2", r, 1 if r >= 4 else 0) for r in range(1, 6)],
        # q3: nothing relevant anywhere -> NULL ndcg
        *[("q3", r, 0) for r in range(1, 6)],
        # q4: 10 relevant exist (> k) -> ideal truncates at k
        *[("q4", r, 1) for r in range(1, 6)],
    ]
    totals = [("q1", 2), ("q2", 2), ("q3", 0), ("q4", 10)]
    res = spark.createDataFrame(results, "q string, rank int, rel int")
    tot = spark.createDataFrame(totals, "q string, n int")
    got = {r.q: r for r in ndcg_binary(res, "q", "rank", "rel", tot, "n", k=5).collect()}

    assert got["q1"].ndcg == 1.0 and got["q1"].hits == 2
    want_q2 = round((w(4) + w(5)) / (w(1) + w(2)), 6)
    assert got["q2"].ndcg == want_q2 and 0 < want_q2 < 1
    assert got["q3"].ndcg is None and got["q3"].n_relevant == 0
    assert got["q4"].ndcg == 1.0  # every retrieved slot relevant == truncated ideal

    with pytest.raises(ValueError, match="k must be"):
        ndcg_binary(res, "q", "rank", "rel", tot, "n", k=0)


def test_ndcg_graded_hand_computed(spark):
    """Graded ideal DCG from the corpus grade HISTOGRAM: each grade
    fills a contiguous ideal-rank span, clipped to k."""
    import math

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ndcg_graded

    w = lambda r: round(1_000_000 * math.log(2) / math.log(r + 1))
    gain = lambda g: (1 << g) - 1
    res = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 0), (1, 3, 2), (1, 4, 1),
         (2, 1, 0), (2, 2, 0)],
        "q long, rank int, rel int",
    )
    # corpus for q1: one grade-3, two grade-2, three grade-1 docs ->
    # ideal top-4 = [3, 2, 2, 1]; q2 has a single grade-1 doc it missed
    hist = spark.createDataFrame(
        [(1, 3, 1), (1, 2, 2), (1, 1, 3), (2, 1, 1), (3, 2, 1)],
        "q long, grade int, cnt long",
    )
    got = {r.q: r for r in ndcg_graded(res, "q", "rank", "rel", hist, "grade", "cnt", k=4).collect()}

    dcg = gain(3) * w(1) + gain(2) * w(3) + gain(1) * w(4)
    idcg = gain(3) * w(1) + gain(2) * w(2) + gain(2) * w(3) + gain(1) * w(4)
    assert got[1].ndcg == round(dcg / idcg, 6)
    assert got[1].graded_hits == 3 and got[1].n_graded == 6
    assert got[2].ndcg == 0.0 and got[2].n_graded == 1
    assert 3 not in got  # histogram-only queries don't invent result rows

    # query with NO positively-graded doc anywhere -> NULL ndcg (binary parity)
    res9 = spark.createDataFrame([(9, 1, 0)], "q long, rank int, rel int")
    hist9 = spark.createDataFrame([(9, 1, 0)], "q long, grade int, cnt long")
    r9 = ndcg_graded(res9, "q", "rank", "rel", hist9, "grade", "cnt", k=3).collect()[0]
    assert r9.ndcg is None and r9.n_graded == 0

    # out-of-range grades fail loudly instead of silently overflowing
    bad = spark.createDataFrame([(1, 1, 50)], "q long, rank int, rel int")
    with pytest.raises(Exception, match="grade out of"):
        ndcg_graded(bad, "q", "rank", "rel", hist, "grade", "cnt", k=3).collect()
    with pytest.raises(ValueError, match="max_grade"):
        ndcg_graded(res, "q", "rank", "rel", hist, "grade", "cnt", k=3, max_grade=41)


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_reference(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import welch_ttest

    rng = random.Random(23)
    rows = [("a", rng.gauss(10.0, 2.0)) for _ in range(400)] + [
        ("b", rng.gauss(10.8, 5.0)) for _ in range(250)
    ] + [("c", 99.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "g", "v", "a", "b").collect()[0]

    # sequential reference on the same cent grid
    xa = [math.floor(v * 100) for g, v in rows if g == "a" and v is not None]
    xb = [math.floor(v * 100) for g, v in rows if g == "b"]
    na, nb = len(xa), len(xb)
    va = (na * sum(x * x for x in xa) - sum(xa) ** 2) / (na * (na - 1.0))
    vb = (nb * sum(x * x for x in xb) - sum(xb) ** 2) / (nb * (nb - 1.0))
    se2 = va / na + vb / nb
    t = (sum(xa) / na - sum(xb) / nb) / math.sqrt(se2)
    dof = se2 * se2 / ((va / na) ** 2 / (na - 1.0) + (vb / nb) ** 2 / (nb - 1.0))

    assert (r.n_a, r.n_b) == (400, 250)
    assert r.t_stat == pytest.approx(t, abs=2e-6)
    assert r.df == pytest.approx(dof, abs=1e-4)
    assert r.mean_a == pytest.approx(sum(xa) / na / 100.0, abs=2e-6)
    # Welch df lands strictly between min(n)-1 and na+nb-2
    assert min(na, nb) - 1 <= r.df <= na + nb - 2

    again = welch_ttest(df.repartition(11), "g", "v", "a", "b").collect()[0]
    assert again == r  # exact moments -> layout-independent


def test_welch_ttest_degenerate(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import welch_ttest

    # identical constant groups: zero variance -> NULL t; means still real
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], "g string, v double"
    )
    r = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert r.t_stat is None and r.df is None
    assert r.mean_a == 5.0 and r.mean_b == 5.0
    # missing group entirely
    solo = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r2 = welch_ttest(solo, "g", "v", "a", "b").collect()[0]
    assert r2.n_b == 0 and r2.t_stat is None and r2.mean_b is None


def test_standardize_and_winsorize_null_groups(spark):
    """Review r7: NULL group keys must match their own group's stats
    (z-scores computed, extremes clipped) instead of silently getting
    NULL z / passing through unclipped with clipped=False."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import standardize, winsorize

    df = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, None, 3.0), (4, "g", 10.0), (5, "g", 20.0)],
        "id long, grp string, x double",
    )
    z = {r["id"]: r["z"] for r in standardize(df, "x", ["grp"]).collect()}
    assert z[1] is not None and z[3] is not None  # NULL group standardized
    assert z[2] == 0.0

    rows = [(i, None, float(i)) for i in range(1, 21)]
    wdf = spark.createDataFrame(rows, "id long, grp string, x double")
    out = {r["id"]: r for r in winsorize(wdf, ["grp"], "x", lower_micro=100000, upper_micro=900000).collect()}
    assert out[1]["clipped"] is True and out[20]["clipped"] is True


def test_calibration_bins_hand_computed(spark):
    """r9 calibration_bins: exact micro-integer reliability table on a
    hand-computed fixture; right-closed last bin (p=1.0 -> bin B-1);
    numeric label follows the sklearn non-zero convention; NULLs drop;
    out-of-range probabilities raise."""
    import pytest
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import calibration_bins

    rows = [
        (0.05, 1), (0.05, 0),          # bin 0: mean 50000, pos 500000
        (0.25, 1), (0.35, 0),          # bins 2 and 3
        (1.0, 1),                      # clamps into bin 9
        (None, 1), (0.5, None),        # dropped
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: (r["n"], r["mean_pred_micro"], r["pos_rate_micro"])
           for r in calibration_bins(df, "p", "y", n_bins=10).collect()}
    assert got == {
        0: (2, 50_000, 500_000),
        2: (1, 250_000, 1_000_000),
        3: (1, 350_000, 0),
        9: (1, 1_000_000, 1_000_000),
    }
    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "p", "y", n_bins=0)
    bad = spark.createDataFrame([(1.2, 1)], "p double, y int")
    with pytest.raises(Exception, match="outside"):
        calibration_bins(bad, "p", "y").collect()
