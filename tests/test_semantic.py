"""Semantic dedup: determinism, cluster locality, adversarial guard."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import vectors as V
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.semantic import assign_clusters, semantic_dedup


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_assignment_is_layout_independent(spark, sf_dir):
    """Exemplars are content-independent hash picks and assignment is a
    deterministic fold — repartitioning the corpus must not change a
    single cluster id."""
    emb = _emb(spark, sf_dir)
    a = {r["vec_id"]: r["cluster"] for r in assign_clusters(emb, "vec_id", "embedding", 8).collect()}
    b = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb.repartition(13), "vec_id", "embedding", 8).collect()
    }
    assert a == b
    # every cluster id is one of the k exemplar vec_ids
    assert len(set(a.values())) <= 8


def test_assignment_picks_highest_cosine_exemplar(spark):
    """Hand-built corpus: 3 axis-aligned exemplar candidates with the
    smallest ids, probes aligned to each axis must join that axis's
    exemplar."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (100, [0.9, 0.1, 0.0]),
        (101, [0.1, 0.9, 0.0]),
        (102, [0.0, 0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # k=3: the hash draw picks SOME 3 rows as exemplars; force it to be
    # the axis rows by keeping only ids whose hash ranks them first.
    got = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, "vec_id", "embedding", 3).collect()}
    ex = sorted(set(got.values()))
    # whatever 3 exemplars the hash chose, each probe's cluster must be
    # its argmax-cosine exemplar (recompute in python)
    vecs = dict((i, v) for i, v in rows)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    for vid, cluster in got.items():
        best = min(ex, key=lambda e: (-cos(vecs[vid], vecs[e]), e))
        assert cluster == best, (vid, cluster, best)


def test_semantic_dedup_drops_only_within_cluster_near_dups(spark):
    rng = random.Random(3)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    # add exact copies of ids 0..4 at high ids: near-dups guaranteed
    rows += [(1000 + i, list(base[i])) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, "vec_id", "embedding", k=4, threshold=0.999)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    # copies land in the same cluster as their original (identical vector
    # -> identical assignment) and must be dropped; originals survive
    for i in range(5):
        assert i in kept_ids
        assert 1000 + i not in kept_ids
    assert len(kept_ids) == 20


def test_max_cluster_guard_keeps_rows_instead_of_exploding(spark):
    """Adversarial all-identical corpus: one cluster swallows everything;
    with max_cluster the pair stage is skipped for it and every row is
    KEPT (recall trade, not a blow-up or a mass drop)."""
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    guarded = semantic_dedup(df, "vec_id", "embedding", k=2, threshold=0.5, max_cluster=10)
    assert guarded.count() == 50
    unguarded = semantic_dedup(df, "vec_id", "embedding", k=2, threshold=0.5)
    assert unguarded.count() == 1


def test_semantic_dedup_block_scoring_matches_pair_join(spark, sf_dir):
    """r13: within-cluster scoring moved from an exploded SQL pair join
    to a per-cluster numpy block pass. The drop set must equal the old
    formulation's exactly — including pairs at the 6dp rounding
    boundary and clusters larger than the 1024-row scoring chunk (the
    sf0.01 embeddings at k=2 exceed it, exercising the chunk loop)."""
    emb = _emb(spark, sf_dir)
    k, threshold = 2, 0.45
    kept = semantic_dedup(emb, "vec_id", "embedding", k=k, threshold=threshold)
    got = sorted(r["vec_id"] for r in kept.select("vec_id").collect())

    # reference: the pre-r13 exploded pair-join formulation, verbatim
    assigned = assign_clusters(emb, "vec_id", "embedding", k)
    pair_src = assigned.select(
        F.col("vec_id").alias("__pid"),
        F.col("embedding").alias("__pvec"),
        V.norm("embedding").alias("__pnrm"),
        "cluster",
    )
    a = pair_src.select(
        F.col("__pid").alias("__id_a"), F.col("__pvec").alias("__va"),
        F.col("__pnrm").alias("__na"), "cluster",
    )
    b = pair_src.select(
        F.col("__pid").alias("__id_b"), F.col("__pvec").alias("__vb"),
        F.col("__pnrm").alias("__nb"), "cluster",
    )
    cos6 = F.round(V.dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6)
    doomed = (
        a.join(b, "cluster")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(cos6 >= threshold)
        .select(F.col("__id_b").alias("vec_id"))
        .distinct()
    )
    want = sorted(
        r["vec_id"]
        for r in assigned.join(doomed, "vec_id", "left_anti").select("vec_id").collect()
    )
    assert got == want and len(got) > 0


def test_oversize_cluster_fallback_matches_block_path(spark, sf_dir, monkeypatch):
    """r14 (ADVICE r13): clusters above _SEMANTIC_BLOCK_MAX_ROWS are
    scored by the streaming SQL pair join instead of one single-worker
    numpy block (OOM guard). Shrink the gate so real clusters cross it
    and check the drop set is identical to the (default, all-block)
    path — the routing must be execution-only."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import semantic as sem

    emb = _emb(spark, sf_dir)
    k, threshold = 3, 0.45
    want = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, "vec_id", "embedding", k=k, threshold=threshold)
        .select("vec_id").collect()
    )
    monkeypatch.setattr(sem, "_SEMANTIC_BLOCK_MAX_ROWS", 10)
    got = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, "vec_id", "embedding", k=k, threshold=threshold)
        .select("vec_id").collect()
    )
    assert got == want and len(got) > 0
