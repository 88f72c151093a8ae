"""Non-default parameter paths — every optional argument gets at least
one test through its non-default branch (lesson from the txid-timeout
bug: the default-only path hid a runtime TypeError for months)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import interval_join, unnest_join
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import tf_idf
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import fan_out


def test_exact_dedup_multi_key(spark):
    rows = [(1, "a", 10, 5), (2, "a", 10, 7), (3, "a", 20, 9), (4, "b", 10, 1)]
    df = spark.createDataFrame(rows, "id int, k1 string, k2 int, v int")
    out = {(r.k1, r.k2): r.id for r in exact_dedup(df, ["k1", "k2"], "id").collect()}
    assert out == {("a", 10): 1, ("a", 20): 3, ("b", 10): 4}


def test_interval_join_asymmetric_bounds(spark):
    """lower != upper: rights from 10 min BEFORE to 1 min AFTER."""
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:10:00")], "user_id int, lid int, lts string"
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:02:00"),  # 8 min before -> in
            (1, "2024-01-01 10:10:30"),  # 30 s after -> in
            (1, "2024-01-01 10:12:00"),  # 2 min after -> out
            (1, "2024-01-01 09:58:00"),  # 12 min before -> out
        ],
        "user_id int, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    j = interval_join(left, right, "user_id", "lts", "rts", "10 MINUTES", "1 MINUTE")
    assert j.count() == 2


def test_unnest_join_no_broadcast_and_fact_cols(spark):
    fact = spark.createDataFrame([(1, [10, 10, 20], "x")], "fid int, arr array<int>, extra string")
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "k int, name string")
    out = unnest_join(fact, dim, "arr", "k", fact_cols=["fid"], broadcast_dim=False)
    rows = sorted((r.fid, r.name) for r in out.collect())
    assert rows == [(1, "a"), (1, "a"), (1, "b")]  # multiset kept
    assert "extra" not in out.columns


def test_minhash_rejects_bad_band_split(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(df, "doc_id", "text", num_perm=100, bands=64)


def test_ivfpq_rejects_indivisible_subspaces(spark):
    """dim % m != 0 must fail fast with the pq_fit_codebooks error, not
    produce garbage codes."""
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ivf_pq_topk

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1), float(i + 2)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="not divisible"):
        ivf_pq_topk(emb.limit(3), emb, "vec_id", "vec_id", k=2, n_cells=2, m=2).count()


def test_tfidf_without_topk_returns_all_terms(spark):
    df = spark.createDataFrame(
        [(1, "red red blue"), (2, "blue green")], "doc_id int, text string"
    )
    out = tf_idf(df, top_k=None)
    assert "rank" not in out.columns
    got = {(r.doc_id, r.term): r.tf for r in out.collect()}
    assert got[(1, "red")] == 2 and got[(2, "green")] == 1
    assert len(got) == 4


def test_fan_out_respects_min_partitions_and_noop(spark):
    df = spark.range(100)
    assert fan_out(df, min_partitions=16).rdd.getNumPartitions() >= 16
    wide = df.repartition(32)
    # already >= target: no extra repartition node
    assert fan_out(wide, min_partitions=8) is wide


def test_streaming_sessionize_without_watermark(spark):
    """watermark_delay=None must not attach a watermark (batch usage)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import streaming_sessionize

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")], "user_id int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = streaming_sessionize(df, "user_id", "ts", gap="30 minutes", watermark_delay=None)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].n_events == 2
