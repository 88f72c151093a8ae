"""Feature hashing (operators/features.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import hashed_features


def _h60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_counts_match_python_reference(spark):
    dim = 64
    rows = [(1, "the cat sat on the mat the end"), (2, "one two two three three three")]
    got = {
        r.doc_id: [(s.idx, s.cnt) for s in r.features]
        for r in hashed_features(_docs(spark, rows), dim=dim).collect()
    }
    for doc_id, text in rows:
        counts: dict[int, int] = {}
        for t in text.split():
            counts[_h60(t) % dim] = counts.get(_h60(t) % dim, 0) + 1
        assert got[doc_id] == sorted(counts.items()), doc_id


def test_signed_mode_matches_reference_and_drops_zero_sums(spark):
    dim = 4  # force collisions so sign cancellation can occur
    text = " ".join(f"tok{i}" for i in range(40))
    got = {
        (s.idx, s.cnt)
        for s in hashed_features(_docs(spark, [(1, text)]), dim=dim, signed=True)
        .collect()[0]
        .features
    }
    counts: dict[int, int] = {}
    for t in text.split():
        h = _h60(t)
        sgn = 1 if (h // dim) % 2 == 0 else -1
        counts[h % dim] = counts.get(h % dim, 0) + sgn
    want = {(i, c) for i, c in counts.items() if c != 0}
    assert got == want


def test_zero_shuffle_plan(spark, sf_dir):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

    df = hashed_features(read_parquet(spark, f"{sf_dir}/documents.parquet"), dim=256)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_layout_independent(spark):
    rows = [(i, f"alpha beta gamma tok{i} tok{i % 3}") for i in range(50)]
    df = _docs(spark, rows)
    a = {r.doc_id: tuple((s.idx, s.cnt) for s in r.features) for r in hashed_features(df, dim=32).collect()}
    b = {
        r.doc_id: tuple((s.idx, s.cnt) for s in r.features)
        for r in hashed_features(df.repartition(7), dim=32).collect()
    }
    assert a == b


def test_bad_dim_rejected(spark):
    with pytest.raises(ValueError, match="dim"):
        hashed_features(_docs(spark, [(1, "x")]), dim=1)


def test_fast_hash_mode_same_shape_different_indexes(spark):
    rows = [(1, "alpha beta gamma alpha"), (2, "delta epsilon")]
    slow = hashed_features(_docs(spark, rows), dim=4096)
    fast = hashed_features(_docs(spark, rows), dim=4096, portable=False)
    s = {r.doc_id: sorted((x.idx, x.cnt) for x in r.features) for r in slow.collect()}
    f = {r.doc_id: sorted((x.idx, x.cnt) for x in r.features) for r in fast.collect()}
    # same multiset of counts per doc (no tokens lost), indexes free to differ
    assert {k: sorted(c for _, c in v) for k, v in s.items()} == {
        k: sorted(c for _, c in v) for k, v in f.items()
    }
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# woe_iv (operators/features.py)
# ---------------------------------------------------------------------------

def test_woe_iv_hand_computed_with_smoothing(spark):
    import math
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import woe_iv

    rows = (
        [("A", False)] * 3 + [("A", True)] * 1
        + [("B", False)] * 1 + [("B", True)] * 3
        + [("C", False)] * 2          # zero bad cell: smoothing must save the ln
    )
    df = spark.createDataFrame(rows, "f string, bad boolean")
    out = {r.category: r for r in woe_iv(df, "f", "bad").collect()}
    G, B = 6, 4

    def want_woe(g, b):
        return round(math.log((2 * g + 1) * (2 * B) / ((2 * b + 1) * (2 * G))) * 1e6)

    assert out["A"].woe_micro == want_woe(3, 1)
    assert out["B"].woe_micro == want_woe(1, 3)
    assert out["C"].woe_micro == want_woe(2, 0)   # finite thanks to +0.5
    assert out["A"].woe_micro > 0 > out["B"].woe_micro
    # IV total identical on every row and equals the bigint sum of terms
    totals = {r.iv_total_micro for r in out.values()}
    assert totals == {sum(r.iv_micro for r in out.values())}


def test_woe_iv_null_category_bucket_and_null_label_drop(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import woe_iv

    df = spark.createDataFrame(
        [("x", True), (None, False), (None, True), ("x", None)],
        "f string, bad boolean",
    )
    out = {r.category: r for r in woe_iv(df, "f", "bad").collect()}
    assert set(out) == {"x", None}          # NULL category kept as its own bucket
    assert out["x"].n_good == 0 and out["x"].n_bad == 1  # null label dropped
    assert out[None].n_good == 1 and out[None].n_bad == 1


def test_woe_iv_layout_independent_and_informative_ordering(spark):
    import random as _r
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import woe_iv

    rng = _r.Random(21)
    rows = []
    for _ in range(2000):
        c = rng.choice("pqrs")
        p_bad = {"p": 0.9, "q": 0.6, "r": 0.4, "s": 0.1}[c]
        rows.append((c, rng.random() < p_bad))
    df = spark.createDataFrame(rows, "f string, bad boolean")
    a = sorted(map(str, woe_iv(df, "f", "bad").collect()))
    b = sorted(map(str, woe_iv(df.repartition(13), "f", "bad").collect()))
    assert a == b
    out = {r.category: r.woe_micro for r in woe_iv(df, "f", "bad").collect()}
    # monotone: more bad -> lower WOE
    assert out["s"] > out["r"] > out["q"] > out["p"]


def test_timeseries_nan_and_empty_frame_contracts(spark):
    """Review r7: NaN observations are excluded like NULL (not coerced
    to 0 cents), and an all-missing EWMA frame yields NULL instead of a
    REMAINDER_BY_ZERO job abort."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import acf, ewma

    nan = float("nan")
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 4.0), ("a", 2, nan), ("a", 3, 6.0)],
        "k string, t long, v double",
    )
    rows = {r["t"]: r["ewma_micro"] for r in ewma(df, "k", "t", "v", window=2).collect()}
    assert rows[0] is None  # empty surviving frame -> NULL, no crash
    assert rows[1] == 4_000_000  # single obs
    assert rows[2] == 4_000_000  # NaN excluded -> frame is just t=1
    ref = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 0.0), ("a", 2, 2.0), ("a", 3, 3.0)],
        "k string, t long, v double",
    )
    withnan = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, nan), ("a", 2, 2.0), ("a", 3, 3.0)],
        "k string, t long, v double",
    )
    r_zero = {r["lag"]: r["r"] for r in acf(ref, "k", "t", "v", max_lag=1).collect()}
    r_nan = {r["lag"]: r["r"] for r in acf(withnan, "k", "t", "v", max_lag=1).collect()}
    assert r_nan != r_zero  # NaN no longer scored as the value 0.0
