"""DSIR importance weights (operators/dsir.py).

The sequential reference re-implements the whole estimator in plain
Python (hashlib md5 fold, add-one multinomials, micro-nat rounding),
so the test pins exact values, not just direction.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dsir import dsir_weights

SEP = chr(31)


def _h256(g: str) -> int:
    """First 15 hex chars of md5 folded in integer arithmetic — the
    engine-portable hash shared with features.hashed_features."""
    acc = 0
    for ch in hashlib.md5(g.encode()).hexdigest()[:15]:
        acc = acc * 16 + int(ch, 16)
    return acc % 256


def _grams(text: str) -> list[str]:
    toks = text.strip().split()
    if text.strip() == "":
        toks = [""]  # split keeps the empty string, as both engines do
    return toks + [toks[i] + SEP + toks[i + 1] for i in range(len(toks) - 1)]


def _reference(raw: dict[int, str], target_ids: set[int], n_buckets: int = 256):
    rb: dict[int, int] = {}
    tb: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for i, text in raw.items():
        bs = [_h256(g) for g in _grams(text)]
        per_doc[i] = bs
        for b in bs:
            rb[b] = rb.get(b, 0) + 1
            if i in target_ids:
                tb[b] = tb.get(b, 0) + 1
    ct_tot, cr_tot = sum(tb.values()), sum(rb.values())
    lr = {
        b: round(
            (
                math.log(tb.get(b, 0) + 1.0)
                - math.log(rb[b] + 1.0)
                + math.log(cr_tot + n_buckets)
                - math.log(ct_tot + n_buckets)
            )
            * 1_000_000
        )
        for b in rb
    }
    return {i: (len(bs), sum(lr[b] for b in bs)) for i, bs in per_doc.items()}


RAW = {
    1: "the cat sat on the mat",
    2: "the dog sat on the log",
    3: "uno dos tres cuatro cinco seis",
    4: "siete ocho nueve diez once doce",
    5: "the cat and the dog",
}
TARGET_IDS = {1, 2}  # "english" slice


def _run(spark, df_raw, n_buckets=256):
    target = df_raw.where("doc_id IN (1, 2)")
    out = dsir_weights(df_raw, target, n_buckets=n_buckets)
    return {r["doc_id"]: (r["n_grams"], r["logw_micro"]) for r in out.collect()}


def test_dsir_matches_sequential_reference_exactly(spark):
    df = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    got = _run(spark, df)
    want = _reference(RAW, TARGET_IDS)
    assert got == want
    # direction: target-like docs outscore the disjoint-vocabulary ones
    english = min(got[i][1] for i in (1, 2, 5))
    other = max(got[i][1] for i in (3, 4))
    assert english > other


def test_dsir_layout_independent(spark):
    df = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    assert _run(spark, df) == _run(spark, df.repartition(7))


def test_dsir_null_and_empty_text(spark):
    rows = [(1, "alpha beta"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_grams"], r["logw_micro"])
           for r in dsir_weights(df, df.where("doc_id = 1")).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == (0, 0)          # NULL text: no features, scores 0
    assert out[3][0] == 1            # "" tokenizes to the single '' token
    assert out[1][0] == 3            # 2 unigrams + 1 bigram


def test_dsir_rejects_tiny_bucket_space(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(df, df, n_buckets=1)


def test_dsir_gram_build_runs_once_over_the_pool(spark):
    """Review r10: the raw gram build feeds both the profile and the
    scoring join — the lazy pin must keep the pool's expensive
    explode+hash stage at ONE execution. The tracked stage sees each
    raw row exactly twice: once feeding the (pinned) gram build, once
    for the id-only left join."""
    df = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    n_rows = df.count()
    acc = spark.sparkContext.accumulator(0)

    def _tick(batches):
        for p in batches:
            acc.add(len(p))
            yield p

    tracked = df.mapInPandas(_tick, df.schema)
    dsir_weights(tracked, df.where("doc_id IN (1, 2)"), n_buckets=64).collect()
    assert acc.value == 2 * n_rows, (
        f"raw pool evaluated {acc.value / n_rows:g}x, expected exactly 2x "
        "(pinned gram build + id join)"
    )
