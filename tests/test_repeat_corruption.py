"""repeat_dataset and span_corruption (operators/curation.py) vs
sequential references sharing the Knuth hash."""

from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import repeat_dataset, span_corruption

_KNUTH, _MOD = 2654435761, 4294967296


def _hash(i: int) -> int:
    return ((i % 2147483648) * _KNUTH) % _MOD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repeat_weight_2_3(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = repeat_dataset(df, 2.3, "doc_id")
    got = {}
    for r in out.collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    extra = round(0.3 * _MOD)
    for i in range(1000):
        want = 2 + (1 if _hash(i) < extra else 0)
        assert got.get(i, 0) == want, i
    # epochs are 0..copies-1
    eps = {(r.doc_id, r.epoch) for r in out.collect()}
    assert all((d, e) in eps for d, c in got.items() for e in range(c))


def test_repeat_subsample_and_zero(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    frac = repeat_dataset(df, 0.4, "doc_id")
    n = frac.count()
    assert 0 < n < 500
    assert frac.select("epoch").distinct().collect()[0].epoch == 0
    assert repeat_dataset(df, 0.0, "doc_id").count() == 0
    with pytest.raises(ValueError, match="weight"):
        repeat_dataset(df, -1.0, "doc_id")


def _corruption_reference(doc_id, text, mask_rate=0.15, mean_span=3):
    toks = text.split()
    start_p = round(mask_rate / mean_span * _MOD)
    width = 2 * mean_span - 1
    covered = set()
    for pos in range(len(toks)):
        if _hash(doc_id * 1000003 + pos) < start_p:
            ln = _hash(doc_id * 1000033 + pos) % width + 1
            covered.update(range(pos, min(pos + ln, len(toks))))
    inp, tgt = [], []
    span_id = -1
    for pos, t in enumerate(toks):
        if pos in covered:
            if pos - 1 not in covered:
                span_id += 1
                inp.append(f"<extra_id_{span_id}>")
                tgt.append(f"<extra_id_{span_id}> {t}")
            else:
                tgt.append(t)
        else:
            inp.append(t)
    return " ".join(inp), " ".join(tgt), len(covered)


def test_span_corruption_matches_reference(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(30)]
    out = {
        r.doc_id: (r.input_text, r.target_text, r.n_masked)
        for r in span_corruption(_docs(spark, rows)).collect()
    }
    for doc_id, text in rows:
        assert out[doc_id] == _corruption_reference(doc_id, text), doc_id
    # sanity: sentinels appear in both sides with matching ids
    any_masked = [v for v in out.values() if v[2] > 0]
    assert any_masked, "expected at least one corrupted doc in 1200 tokens"
    inp, tgt, _ = any_masked[0]
    assert "<extra_id_0>" in inp and "<extra_id_0>" in tgt


def test_span_corruption_layout_independent(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(60))) for i in range(20)]
    a = {tuple(r) for r in span_corruption(_docs(spark, rows)).collect()}
    b = {tuple(r) for r in span_corruption(_docs(spark, rows).repartition(7)).collect()}
    assert a == b


def test_span_corruption_bad_params(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="mask_rate"):
        span_corruption(df, mask_rate=0.0)
    with pytest.raises(ValueError, match="mean_span"):
        span_corruption(df, mean_span=0)
