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
