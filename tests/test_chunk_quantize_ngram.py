"""Round-4 additions: document chunking, int8 embedding quantization,
and corpus n-gram statistics — each checked against an in-test
sequential reference (the DuckDB oracle twin covers the sf0.01 path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import chunk_documents
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import quantize_int8
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import (
    ngram_histogram,
    token_histogram,
)


def _ref_chunks(text: str, size: int, overlap: int):
    toks = text.strip().split()
    if not toks:
        toks = [""]
    stride = size - overlap
    n = len(toks)
    n_chunks = 1 if n <= size else 1 + math.ceil((n - size) / stride)
    out = []
    for i in range(n_chunks):
        start = i * stride
        window = toks[start : start + size]
        out.append((i, " ".join(window), len(window)))
    return out


@pytest.mark.parametrize(
    "size,overlap",
    [(8, 0), (8, 3), (5, 4), (1, 0)],
)
def test_chunk_documents_matches_sequential_reference(spark, size, overlap):
    texts = [
        "",  # empty -> one empty chunk
        "one",
        " ".join(f"w{i}" for i in range(7)),  # < size for most params
        " ".join(f"w{i}" for i in range(8)),  # == size
        " ".join(f"w{i}" for i in range(9)),  # size + 1
        " ".join(f"w{i}" for i in range(40)),  # many chunks
        " ".join(f"w{i}" for i in range(41)),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, size=size, overlap=overlap).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for cid, ctext, ctoks in _ref_chunks(t, size, overlap):
            want[(i, cid)] = (ctext, ctoks)
    assert got == want


def test_chunk_documents_covers_every_token_when_overlapping(spark):
    """Every token position appears in >= 1 chunk; with overlap o,
    consecutive chunks share exactly o tokens (except a short tail)."""
    n_tok = 100
    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n_tok)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, size=16, overlap=4).collect(), key=lambda r: r["chunk_id"]
    )
    seen = set()
    prev = None
    for r in rows:
        toks = r["chunk_text"].split()
        seen.update(toks)
        if prev is not None and len(toks) == 16:
            assert prev[-4:] == toks[:4]
        prev = toks
    assert seen == {str(i) for i in range(n_tok)}


def test_chunk_documents_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=-1)


def test_chunk_documents_zero_shuffle(spark):
    """The chunking plan must contain no Exchange — map-side only."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_documents(df, size=2, overlap=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantize_int8_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [rng.standard_normal(16).astype("float32") for _ in range(20)]
    vecs.append(np.zeros(16, dtype="float32"))  # all-zero edge
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        x = v.astype("float64")
        maxabs = float(np.max(np.abs(x)))
        r = rows[i]
        assert r["dim"] == 16
        if maxabs == 0.0:
            assert r["scale"] == 0.0
            assert r["codes"] == [0] * 16
            assert r["err_1e9"] == 0
            continue
        scale = maxabs / 127.0
        codes = np.clip(np.floor(x / scale + 0.5), -127, 127).astype("int64")
        assert r["codes"] == codes.tolist()
        assert abs(r["scale"] - round(scale, 6)) < 1e-12
        err = np.sum(np.round((x - codes * scale) ** 2 * 1e9))
        assert r["err_1e9"] == int(err)
        # reconstruction is genuinely close: max per-dim error <= scale/2 + ulp
        assert float(np.max(np.abs(x - codes * scale))) <= scale / 2 + 1e-9


def test_quantize_int8_codes_bounded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_int8(emb).select(
        F.array_max("codes").alias("hi"), F.array_min("codes").alias("lo")
    ).agg(F.max("hi").alias("hi"), F.min("lo").alias("lo")).collect()[0]
    assert out["hi"] <= 127 and out["lo"] >= -127


def _ref_ngrams(texts, n):
    from collections import Counter

    c = Counter()
    for t in texts:
        # engine tokenizer semantics: split(trim(text), '\s+') yields one
        # empty token for empty text (matches token_histogram + oracle)
        toks = t.strip().split() or [""]
        if len(toks) >= n:
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i : i + n])] += 1
    return dict(c)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_histogram_matches_sequential_reference(spark, n):
    texts = [
        "the cat sat on the mat",
        "the cat sat",
        "cat",
        "",
        "on the mat on the mat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["ngram"]: r["freq"] for r in ngram_histogram(df, n=n).collect()}
    assert got == _ref_ngrams(texts, n)


def test_ngram_histogram_n1_equals_token_histogram(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        (r["ngram"], r["freq"])
        for r in ngram_histogram(docs, n=1, top_n=50).withColumnRenamed("token", "ngram").collect()
    }
    b = {(r["token"], r["freq"]) for r in token_histogram(docs, top_n=50).collect()}
    assert a == b


def test_ngram_histogram_rejects_bad_n(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        ngram_histogram(df, n=0)


def test_chunk_documents_property_reconstruction(spark):
    """Property (hypothesis): for any token count / size / overlap, the
    first chunk plus each later chunk minus its overlapping prefix
    reassembles the document exactly, and chunk counts follow the
    closed form. One Spark round trip over a batch of generated cases
    (examples collected first — Spark jobs are too slow per-example)."""
    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=60, deadline=None)
    @given(
        n_tok=st.integers(min_value=0, max_value=60),
        size=st.integers(min_value=1, max_value=20),
        overlap_frac=st.floats(min_value=0.0, max_value=0.99),
    )
    def collect(n_tok, size, overlap_frac):
        overlap = min(size - 1, int(size * overlap_frac))
        cases.append((n_tok, size, overlap))

    collect()

    # group by (size, overlap) so each Spark job covers many docs
    from collections import defaultdict

    grouped = defaultdict(list)
    for i, (n_tok, size, overlap) in enumerate(cases):
        grouped[(size, overlap)].append((i, n_tok))
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import chunk_documents as cd

    for (size, overlap), docs in grouped.items():
        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in docs],
            "doc_id long, text string",
        )
        out = defaultdict(list)
        for r in cd(df, size=size, overlap=overlap).collect():
            out[r["doc_id"]].append((r["chunk_id"], r["chunk_text"], r["chunk_tokens"]))
        stride = size - overlap
        for i, n in docs:
            toks = [f"t{j}" for j in range(n)] or [""]
            chunks = sorted(out[i])
            expect_n = 1 if len(toks) <= size else 1 + math.ceil((len(toks) - size) / stride)
            assert len(chunks) == expect_n, (n, size, overlap)
            rebuilt = chunks[0][1].split(" ") if chunks[0][1] != "" else [""]
            for cid, ctext, ctoks in chunks[1:]:
                ct = ctext.split(" ")
                assert ct[:overlap] == rebuilt[cid * stride : cid * stride + overlap]
                rebuilt.extend(ct[overlap:])
            # '' splits back to [''] which matches the single empty token
            assert rebuilt == toks, (n, size, overlap)


def test_quantize_int8_zero_shuffle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
