"""Operator guard rails: layout-independent PQ training, query-side
collect caps, and LSH bucket-size bounds for adversarial corpora."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import dedup as D
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pq_codebooks_layout_independent(emb):
    """Same corpus, different partition layout -> bit-identical codebooks
    (hash-threshold sampling; sample()/limit() would differ)."""
    books_a = S.pq_fit_codebooks(emb, m=8, n_centroids=8, max_train_rows=100)
    scrambled = emb.repartition(7).sortWithinPartitions("embedding")
    books_b = S.pq_fit_codebooks(scrambled, m=8, n_centroids=8, max_train_rows=100)
    assert np.array_equal(books_a, books_b)


def test_pq_codebooks_cap_is_hard(emb):
    """The cap bounds the training matrix even without sample_frac."""
    corpus_n = emb.count()
    assert corpus_n > 50
    books = S.pq_fit_codebooks(emb, m=8, n_centroids=8, max_train_rows=50)
    assert books.shape[0] == 8 and books.shape[1] == 8


def test_cosine_topk_query_cap_raises(emb):
    with pytest.raises(ValueError, match="embedding_cosine_pairs"):
        S.cosine_topk(emb, emb, "vec_id", "vec_id", k=3, max_query_rows=10)


def test_pq_topk_query_cap_raises(emb):
    with pytest.raises(ValueError, match="max_query_rows"):
        S.pq_cosine_topk(emb, emb, "vec_id", "vec_id", k=3, max_query_rows=10)


def test_cosine_topk_cap_allows_small_query(emb):
    q = emb.limit(5)
    rows = S.cosine_topk(q, emb, "vec_id", "vec_id", k=2, max_query_rows=10).collect()
    assert len(rows) == 10  # 5 queries x k=2


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    """300 identical documents (one giant LSH bucket per band) plus one
    seeded near-dup pair that stays under any sane bucket bound."""
    same = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(300)]
    near = [
        (1000, "completely different text about distributed query engines at scale"),
        (1001, "completely different text about distributed query engines at large scale"),
    ]
    return spark.createDataFrame(same + near, "doc_id long, text string")


def test_minhash_max_bucket_drops_adversarial_bucket(adversarial_docs):
    pairs = D.minhash_lsh_pairs(
        adversarial_docs, "doc_id", "text", n=3, threshold=0.5,
        num_perm=16, bands=8, max_bucket=50,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 300-identical clique (~45k pairs) is dropped; the small pair survives
    assert found == {(1000, 1001)}


def test_simhash_max_bucket(adversarial_docs):
    pairs = D.simhash_pairs(
        adversarial_docs, "doc_id", "text", nbits=32, max_hamming=3, bands=4,
        max_bucket=50,
    ).collect()
    assert all(not (r["id_a"] < 300 and r["id_b"] < 300) for r in pairs)


def test_bucketed_cosine_pairs_max_bucket(spark):
    """An all-identical embedding corpus collapses into one bucket per
    table; max_bucket keeps the pair count at zero instead of K^2/2."""
    vec = [float(x) for x in range(8)]
    near = [v + (0.01 if i == 0 else 0.0) for i, v in enumerate(vec)]
    rows = [(i, vec) for i in range(200)] + [(1000, near)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.bucketed_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.9, n_planes=4, n_tables=4,
        max_bucket=50,
    ).collect()
    assert out == []

    # without the identical flood the same config still finds near pairs
    small = spark.createDataFrame([(1, vec), (2, near)], "vec_id long, embedding array<float>")
    out2 = S.bucketed_cosine_pairs(
        small, "vec_id", "embedding", threshold=0.9, n_planes=4, n_tables=4,
        max_bucket=50,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out2} == {(1, 2)}


def test_degenerate_histogram_range_raises(spark):
    """hi == lo would make every bin expression divide by zero; both
    equal-width-histogram entry points reject it up front like
    layout.bucketize does."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="hi > lo"):
        psi_drift(df, df, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_quantiles(df, "v", lo=5.0, hi=4.0)
