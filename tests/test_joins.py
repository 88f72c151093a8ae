"""Join operator tests (SURVEY §2.4 J3-J6) + changelog compaction (W5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import (
    asof_join,
    interval_join,
    latest_per_key,
    lookup_join,
    unnest_join,
)

TS = dt.datetime


def test_unnest_join_multiset(spark):
    fact = spark.createDataFrame([(1, [10, 10, 20])], "id int, arr array<int>")
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "k int, v string")
    rows = unnest_join(fact, dim, "arr", "k").orderBy("k").collect()
    assert [(r["id"], r["k"], r["v"]) for r in rows] == [(1, 10, "a"), (1, 10, "a"), (1, 20, "b")]


def test_lookup_join_batch(spark):
    stream = spark.createDataFrame([(1, 100), (2, 999)], "id int, key int")
    lookup = spark.createDataFrame([(100, "x")], "key int, val string")
    rows = lookup_join(stream, lookup, "key", how="left").orderBy("id").collect()
    assert rows[0]["val"] == "x" and rows[1]["val"] is None
    assert "proctime" in rows[0].asDict()


def test_asof_join_versions(spark):
    """Each fact row joins the dim version valid at its event time
    (Flink FOR SYSTEM_TIME AS OF, reference 06-flink-cdc-temporal-join.json:30)."""
    dim = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0), "v1"),
         (1, TS(2024, 1, 1, 12, 0), "v2"),
         (2, TS(2024, 1, 1, 11, 0), "w1")],
        "k int, ts timestamp, val string",
    )
    fact = spark.createDataFrame(
        [(101, 1, TS(2024, 1, 1, 9, 0)),    # before any version -> NULL
         (102, 1, TS(2024, 1, 1, 10, 0)),   # exactly at v1 -> v1 (inclusive)
         (103, 1, TS(2024, 1, 1, 11, 59)),  # between -> v1
         (104, 1, TS(2024, 1, 1, 12, 0)),   # exactly at v2 -> v2
         (105, 2, TS(2024, 1, 1, 23, 0)),   # latest of key 2 -> w1
         (106, 3, TS(2024, 1, 1, 10, 0))],  # key never in dim -> NULL
        "fid int, k int, fts timestamp",
    )
    got = {r["fid"]: r["val"] for r in asof_join(fact, dim, "k", "fts", "ts").collect()}
    assert got == {101: None, 102: "v1", 103: "v1", 104: "v2", 105: "w1", 106: None}

    inner = {r["fid"] for r in asof_join(fact, dim, "k", "fts", "ts", how="inner").collect()}
    assert inner == {102, 103, 104, 105}


def test_asof_join_tolerance(spark):
    dim = spark.createDataFrame([(1, TS(2024, 1, 1, 0, 0), "old")], "k int, ts timestamp, val string")
    fact = spark.createDataFrame([(9, 1, TS(2024, 1, 1, 5, 0))], "fid int, k int, fts timestamp")
    assert asof_join(fact, dim, "k", "fts", "ts").collect()[0]["val"] == "old"
    assert asof_join(fact, dim, "k", "fts", "ts", tolerance="1 hour").collect()[0]["val"] is None


def test_interval_join(spark):
    left = spark.createDataFrame([(1, 1, TS(2024, 1, 1, 10, 0))], "lid int, k int, lts timestamp")
    right = spark.createDataFrame(
        [(11, 1, TS(2024, 1, 1, 9, 58)), (12, 1, TS(2024, 1, 1, 10, 4)), (13, 1, TS(2024, 1, 1, 10, 30))],
        "rid int, k int, rts timestamp",
    )
    rows = interval_join(left, right, "k", "lts", "rts", "5 minutes", "5 minutes").collect()
    assert sorted(r["rid"] for r in rows) == [11, 12]


def test_latest_per_key_with_tombstones(spark):
    log = spark.createDataFrame(
        [(1, 1, "c", "a"), (1, 2, "u", "b"), (2, 3, "c", "x"), (2, 4, "d", None), (3, 5, "c", "z")],
        "k int, seq long, op string, v string",
    )
    rows = {r["k"]: r["v"] for r in latest_per_key(log, "k", "seq", op_col="op").collect()}
    assert rows == {1: "b", 3: "z"}  # key 2 deleted by tombstone


def test_asof_join_dim_delete_tombstone(spark):
    """ADVICE r1 (medium): a CDC delete on the dim side must stop later
    facts from matching — NULL image under left, dropped under inner —
    until the next live version, like Flink's temporal join."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import asof_join

    dim = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5, "c"),
            (1, "2024-01-01 10:02:00", 5, "d"),   # delete: price is the before-image
            (1, "2024-01-01 10:04:00", 9, "c"),   # re-insert
            # same-(key, ts) delete + update: live version must win the tie
            (2, "2024-01-01 10:00:00", 7, "u"),
            (2, "2024-01-01 10:00:00", 7, "d"),
        ],
        "k int, dts string, price int, op string",
    ).withColumn("dts", F.to_timestamp("dts"))
    fact = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 10:01:00"),  # -> 5 (before delete)
            (1, 101, "2024-01-01 10:03:00"),  # -> NULL (tombstoned)
            (1, 102, "2024-01-01 10:05:00"),  # -> 9 (after re-insert)
            (2, 103, "2024-01-01 10:01:00"),  # -> 7 (live wins same-ts tie)
        ],
        "k int, fid int, fts string",
    ).withColumn("fts", F.to_timestamp("fts"))

    left = asof_join(fact, dim, key="k", fact_ts="fts", dim_ts="dts", how="left", dim_op="op")
    got = {(r["fid"], r["price"]) for r in left.collect()}
    assert got == {(100, 5), (101, None), (102, 9), (103, 7)}

    inner = asof_join(fact, dim, key="k", fact_ts="fts", dim_ts="dts", how="inner", dim_op="op")
    assert {r["fid"] for r in inner.collect()} == {100, 102, 103}

    # without dim_op the op column is ordinary payload: no tombstoning
    plain = asof_join(fact, dim.drop("op"), key="k", fact_ts="fts", dim_ts="dts")
    assert {(r["fid"], r["price"]) for r in plain.collect()} == {
        (100, 5), (101, 5), (102, 9), (103, 7),
    }


def test_debezium_to_temporal_join_integration(spark):
    """End-to-end CDC path: Debezium envelopes (with a REPLICA IDENTITY
    FULL delete) -> decode_debezium -> asof_join(dim_op='op'). The decoded
    op column drives tombstoning without any intermediate rewriting."""
    import json

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import asof_join
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    def env(op, before, after, src_ts):
        return json.dumps({
            "before": before, "after": after,
            "source": {"ts_ms": src_ts, "txId": 1, "lsn": 1},
            "op": op, "ts_ms": src_ts,
        })

    t0 = 1_700_000_000_000
    events = [
        env("c", None, {"id": 1, "price": 5}, t0),
        env("d", {"id": 1, "price": 5}, None, t0 + 60_000),
        env("c", None, {"id": 1, "price": 9}, t0 + 180_000),
    ]
    dim = decode_debezium(
        spark.createDataFrame([(e,) for e in events], "value string"),
        "id int, price int",
    ).select("id", "price", "op", "event_time")

    facts = spark.createDataFrame(
        [(1, 100, t0 + 30_000), (1, 101, t0 + 120_000), (1, 102, t0 + 240_000)],
        "id int, fid int, fts_ms long",
    ).select("id", "fid", F.timestamp_millis("fts_ms").alias("fts"))
    out = {r["fid"]: r["price"] for r in asof_join(
        facts, dim, key="id", fact_ts="fts", dim_ts="event_time", dim_op="op"
    ).collect()}
    assert out == {100: 5, 101: None, 102: 9}


def test_asof_join_forward_and_nearest(spark):
    """merge_asof-style directions: forward = earliest version at-or-after,
    nearest = closer of the two with ties preferring backward."""
    dim = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0), "v1"),
         (1, TS(2024, 1, 1, 12, 0), "v2"),
         (2, TS(2024, 1, 1, 11, 0), "w1")],
        "k int, ts timestamp, val string",
    )
    fact = spark.createDataFrame(
        [(101, 1, TS(2024, 1, 1, 9, 0)),    # fwd: v1; nearest: v1 (1h vs inf)
         (102, 1, TS(2024, 1, 1, 10, 0)),   # exactly at v1: both inclusive -> v1
         (103, 1, TS(2024, 1, 1, 11, 0)),   # equidistant 1h/1h -> tie prefers backward v1
         (104, 1, TS(2024, 1, 1, 11, 30)),  # fwd v2; nearest v2 (30m vs 1h30)
         (105, 1, TS(2024, 1, 1, 13, 0)),   # after all: fwd NULL; nearest v2
         (106, 2, TS(2024, 1, 1, 23, 0)),   # fwd NULL; nearest w1
         (107, 3, TS(2024, 1, 1, 10, 0))],  # key absent everywhere -> NULL
        "fid int, k int, fts timestamp",
    )
    fwd = {r["fid"]: r["val"]
           for r in asof_join(fact, dim, "k", "fts", "ts", direction="forward").collect()}
    assert fwd == {101: "v1", 102: "v1", 103: "v2", 104: "v2",
                   105: None, 106: None, 107: None}
    near = {r["fid"]: r["val"]
            for r in asof_join(fact, dim, "k", "fts", "ts", direction="nearest").collect()}
    assert near == {101: "v1", 102: "v1", 103: "v1", 104: "v2",
                    105: "v2", 106: "w1", 107: None}


def test_asof_join_forward_tolerance_and_errors(spark):
    import pytest as _pytest

    dim = spark.createDataFrame([(1, TS(2024, 1, 1, 5, 0), "future")], "k int, ts timestamp, val string")
    fact = spark.createDataFrame([(9, 1, TS(2024, 1, 1, 0, 0))], "fid int, k int, fts timestamp")
    got = asof_join(fact, dim, "k", "fts", "ts", direction="forward").collect()[0]["val"]
    assert got == "future"
    bounded = asof_join(
        fact, dim, "k", "fts", "ts", direction="forward", tolerance="1 hour"
    ).collect()[0]["val"]
    assert bounded is None
    with _pytest.raises(ValueError, match="direction"):
        asof_join(fact, dim, "k", "fts", "ts", direction="sideways")


def test_asof_nearest_single_exchange(spark):
    """nearest computes both candidates off ONE key shuffle — the two
    window sorts must share the Exchange, not add one each."""
    dim = spark.createDataFrame([(1, TS(2024, 1, 1, 0, 0), "x")], "k int, ts timestamp, val string")
    fact = spark.createDataFrame([(9, 1, TS(2024, 1, 1, 0, 0))], "fid int, k int, fts timestamp")
    df = asof_join(fact, dim, "k", "fts", "ts", direction="nearest")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------ keyless range join

def test_range_join_matches_nested_loop_reference(spark):
    import random

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import range_join

    rnd = random.Random(7)
    base = 1_700_000_000_000
    lrows = [(i, base + rnd.randrange(0, 60_000)) for i in range(40)]
    rrows = [(i, base + rnd.randrange(0, 60_000)) for i in range(40)]
    l = spark.createDataFrame(lrows, "l_id int, l_ms long").selectExpr(
        "l_id", "timestamp_millis(l_ms) AS l_ts"
    )
    r = spark.createDataFrame(rrows, "r_id int, r_ms long").selectExpr(
        "r_id", "timestamp_millis(r_ms) AS r_ts"
    )
    got = {
        (x.l_id, x.r_id)
        for x in range_join(l, r, "l_ts", "r_ts", 1500, 3000).collect()
    }
    want = {
        (li, ri)
        for li, lt in lrows
        for ri, rt in rrows
        if lt - 1500 <= rt <= lt + 3000
    }
    assert got == want and want  # non-trivial by seed


def test_range_join_boundaries_inclusive_and_errors(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import range_join

    import pytest

    l = spark.sql("SELECT 1 AS l_id, timestamp_millis(10000) AS l_ts")
    r = spark.sql(
        "SELECT * FROM VALUES (1, timestamp_millis(8000)), (2, timestamp_millis(8001)),"
        " (3, timestamp_millis(13000)), (4, timestamp_millis(13001)) AS t(r_id, r_ts)"
    )
    got = sorted(x.r_id for x in range_join(l, r, "l_ts", "r_ts", 2000, 3000).collect())
    assert got == [1, 2, 3]  # both window edges inclusive, outside excluded
    with pytest.raises(ValueError, match="share column names"):
        range_join(l, l, "l_ts", "l_ts", 0, 1000)
    with pytest.raises(ValueError, match=">= 0"):
        range_join(l, r, "l_ts", "r_ts", -1, 1000)


def test_range_join_plans_hash_join_not_nested_loop(spark, sf_dir):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    plan = (
        suite.QUERIES["range_join_pairs"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_microsecond_boundary_exact(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import range_join

    l = spark.sql("SELECT 1 AS l_id, timestamp_micros(10000000) AS l_ts")
    r = spark.sql(
        "SELECT * FROM VALUES (1, timestamp_micros(12000000)),"
        " (2, timestamp_micros(12000001)) AS t(r_id, r_ts)"
    )
    got = sorted(x.r_id for x in range_join(l, r, "l_ts", "r_ts", 0, 2000).collect())
    assert got == [1]  # +2s inclusive at exactly 12.000000s; 1 microsecond past excluded
