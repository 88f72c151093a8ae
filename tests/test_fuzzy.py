"""Fuzzy (edit-distance) join: blocking losslessness + plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.fuzzy import fuzzy_self_join


def _brute_force(spark, df, max_dist):
    a = df.select(F.col("s").alias("id_a"), F.col("s").alias("text_a"))
    b = df.select(F.col("s").alias("id_b"), F.col("s").alias("text_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def test_fuzzy_join_matches_brute_force_including_short_strings(spark):
    """The q-gram block is only lossless for strings >= q*(d+1) chars;
    shorter ones go through the length-band block. Exercise both paths
    plus the short/long boundary with a vocabulary of mixed lengths."""
    rng = random.Random(7)
    alphabet = "abcd"
    vocab = set()
    for _ in range(120):
        n = rng.randint(0, 12)  # includes empty and very short strings
        vocab.add("".join(rng.choice(alphabet) for _ in range(n)))
    df = spark.createDataFrame([(v,) for v in vocab], "s string")

    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in fuzzy_self_join(df, "s", d).collect()
        }
        want = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in _brute_force(spark, df, d).collect()
        }
        assert got == want, f"d={d}: missing={want - got} extra={got - want}"


def test_fuzzy_join_exact_duplicates_and_ids(spark):
    """With an explicit id column, duplicate strings on different ids
    surface as dist-0 pairs, oriented id_a < id_b."""
    df = spark.createDataFrame(
        [(1, "sparkly"), (2, "sparkly"), (3, "sparkle"), (4, "zzzzzzz")],
        "id long, s string",
    )
    rows = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_join(df, "s", 2, id_col="id").collect()
    }
    assert (1, 2, 0) in rows
    assert (1, 3, 1) in rows and (2, 3, 1) in rows
    assert not any(a == 4 or b == 4 for a, b, _ in rows)


def test_fuzzy_join_no_cartesian_product(spark, sf_dir):
    names = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_name").distinct()
    plan = (
        fuzzy_self_join(names, "p_name", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
