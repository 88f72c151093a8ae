"""Skew utilities: results must be exactly equivalent to the unsalted
formulations (salting is a physical rewrite, never a semantic one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.skew import salted_join, two_phase_collect


def test_two_phase_collect_equals_plain(spark):
    # key 1 is hot (80% of rows), incl. duplicate values (multiset check)
    rows = [(1, v % 10) for v in range(800)] + [(k, v) for k in (2, 3) for v in range(100)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["k"]: r["collected"]
        for r in two_phase_collect(df, "k", "v", n_salt=8).collect()
    }
    expected = {
        r["k"]: sorted(r["plain"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("plain")).collect()
    }
    assert got == expected


def test_two_phase_collect_distinct(spark):
    df = spark.createDataFrame([(1, 5), (1, 5), (1, 6)], "k int, v int")
    [row] = two_phase_collect(df, "k", "v", n_salt=4, distinct=True).collect()
    assert row["collected"] == [5, 6]


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(50)] + [(9, 0)],
        "k int, payload int",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "unused")], "k int, label string")
    got = sorted(map(tuple, salted_join(big, small, "k", n_salt=8).collect()))
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == plain

    left = sorted(
        map(tuple, salted_join(big, small, "k", n_salt=8, how="left").collect())
    )
    plain_left = sorted(map(tuple, big.join(small, "k", "left").collect()))
    assert left == plain_left


def test_two_phase_collect_spreads_constant_payload(spark):
    """ADVICE r1: a hot key whose rows all carry ONE distinct value must
    still fan out over the salts (the row-position mix), and the result
    must equal the plain grouped collect."""
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.skew import _salt, two_phase_collect

    df = spark.createDataFrame([(1, 7)] * 5000, "k int, v int")
    n_salts = df.withColumn("s", _salt(["v"], 8)).select("s").distinct().count()
    assert n_salts >= 6  # constant payload no longer collapses to one salt
    out = two_phase_collect(df, "k", "v", n_salt=8).collect()
    assert len(out) == 1 and list(out[0]["collected"]) == [7] * 5000


def test_key_skew_stats_hot_key(spark):
    from pyspark.sql import functions as F
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.skew import key_skew_stats

    # 9000 rows on key 0, 1 row each on keys 1..1000
    df = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit(0)).otherwise(F.col("id") - 8999).alias("k")
    )
    row = key_skew_stats(df, ["k"]).collect()[0]
    assert row.n_rows == 10000 and row.n_keys == 1001
    assert row.max_count == 9000
    assert row.top_share_micro == 900000  # 90%
    assert row.p50_count == 1.0
