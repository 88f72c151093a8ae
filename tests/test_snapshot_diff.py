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


def test_incremental_agg_handles_group_moves_and_vanishing_groups(spark):
    """A row UPDATE that moves between groups must retract from the old
    group and add to the new; a group whose last row is deleted must
    disappear from the maintained aggregate."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.changelog import incremental_sum_count, snapshot_diff
    import pyspark.sql.functions as SF

    old = spark.createDataFrame(
        [(1, "g1", 10), (2, "g1", 20), (3, "g2", 5), (4, "g3", 7)],
        "k long, g string, v long",
    )
    new = spark.createDataFrame(
        [(1, "g1", 10), (2, "g2", 25), (5, "g1", 100)],  # 2 moved g1->g2, 3+4 deleted, 5 inserted
        "k long, g string, v long",
    )
    prev = old.groupBy("g").agg(SF.sum("v").alias("s"), SF.count(SF.lit(1)).alias("n"))
    diff = snapshot_diff(old, new, "k", include_before=True)
    got = {
        r["g"]: (r["s"], r["n"])
        for r in incremental_sum_count(prev, diff, "g", "v", "s", "n").collect()
    }
    want = {
        r["g"]: (r["s"], r["n"])
        for r in new.groupBy("g").agg(SF.sum("v").alias("s"), SF.count(SF.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert "g3" not in got  # vanished group dropped, not left at zero


def test_snapshot_diff_before_images(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0)])
    new = _snap(spark, [(1, "x2", 1.0), (3, "z", 3.0)])
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k", include_before=True).collect()}
    assert rows[1]["op"] == "U" and rows[1]["a"] == "x2" and rows[1]["a_before"] == "x"
    assert rows[3]["op"] == "I" and rows[3]["a_before"] is None
    assert rows[2]["op"] == "D" and rows[2]["a_before"] == "y" and rows[2]["a"] == "y"


def test_snapshot_diff_null_keys_match_null_safe(spark):
    """Review r7: NULL keys must match across snapshots (eqNullSafe), not
    split into a spurious D + I pair with nondeterministic replay."""
    old = _snap(spark, [(None, "x", 1.0), (1, "a", 1.0)])
    new = _snap(spark, [(None, "y", 1.0), (1, "a", 1.0)])
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert set(rows) == {None}  # key 1 unchanged -> dropped
    assert rows[None]["op"] == "U" and rows[None]["a"] == "y"
    # identical NULL-key rows -> no diff at all
    assert snapshot_diff(old, old, "k").count() == 0


def test_latest_per_key_null_op_is_not_a_delete(spark):
    """Review r7: a NULL op (snapshot/backfill row in a CDC feed) must be
    kept as an upsert — the bare ~isin filter silently dropped it."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.changelog import latest_per_key

    log = spark.createDataFrame(
        [(1, 1, "c", "v1"), (1, 2, None, "v2"), (2, 1, "c", "w1"), (2, 2, "d", None)],
        "k long, seq long, op string, v string",
    )
    rows = {r["k"]: r["v"] for r in latest_per_key(log, "k", "seq", op_col="op").collect()}
    assert rows == {1: "v2"}  # NULL-op latest kept; tombstoned key 2 dropped
