"""Snapshot diff (batch CDC derivation): classification + round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.changelog import latest_per_key, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


def test_classifies_insert_update_delete(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 30.0), (4, "w", 4.0)])
    got = {r["k"]: (r["op"], r["a"], r["b"]) for r in snapshot_diff(old, new, "k").collect()}
    assert got == {
        1: ("D", "x", 1.0),   # delete carries the before-image
        3: ("U", "z", 30.0),  # update carries the new values
        4: ("I", "w", 4.0),
    }


def test_null_safe_column_compare(spark):
    old = _snap(spark, [(1, None, 1.0), (2, "y", None)])
    new = _snap(spark, [(1, None, 1.0), (2, "y", 2.0)])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, "k").collect()}
    # NULL == NULL must NOT look like a change; NULL -> value must
    assert got == {2: "U"}


def test_compare_subset_ignores_other_columns(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "CHANGED", 1.0)])
    assert snapshot_diff(old, new, "k", compare=["b"]).count() == 0
    with pytest.raises(ValueError):
        snapshot_diff(old, new, "k", compare=["nope"])


def test_diff_applied_to_old_reproduces_new(spark, sf_dir):
    """The whole point of deriving a changelog: replaying the diff over
    the old snapshot through the engine's changelog compaction
    (latest_per_key with delete tombstones) must reproduce the new
    snapshot exactly."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(old, new, "o_orderkey")

    # replay: old rows at seq 0, diff rows at seq 1, compact, drop deletes
    changelog = old.withColumn("op", F.lit("U")).withColumn("seq", F.lit(0)).unionByName(
        diff.withColumn("seq", F.lit(1))
    )
    replayed = latest_per_key(changelog, "o_orderkey", "seq", op_col="op", delete_ops=("D",)).drop(
        "op", "seq"
    )
    assert replayed.exceptAll(new).count() == 0
    assert new.exceptAll(replayed).count() == 0
