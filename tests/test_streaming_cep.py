"""Streaming CEP (streaming/cep.py) — watermark-driven pattern matching
replayed from files in real micro-batches; the batch matcher on the same
events is the golden oracle (SURVEY §5 pattern)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep import match_pattern
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream
from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming.cep import streaming_match_pattern

STEPS = [
    ("a", "event_type = 'signup'"),
    ("b", "event_type = 'click'"),
    ("c", "event_type = 'purchase'"),
]
WITHIN = 10 * 60_000  # 10 minutes


def _write_batches(dirpath, batches):
    os.makedirs(dirpath, exist_ok=True)
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        p = os.path.join(dirpath, f"batch_{i:03d}.json")
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))


def _run(spark, tmp_path, batches, name, delay="2 minutes"):
    in_dir = str(tmp_path / f"{name}_in")
    _write_batches(in_dir, batches)
    stream = json_file_stream(
        spark, in_dir, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = streaming_match_pattern(
        stream, STEPS, key_col="user_id", ts_col="ts", id_col="event_id",
        within=WITHIN, delay=delay,
    )
    out_dir = str(tmp_path / f"{name}_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def _batch_expected(spark, rows):
    df = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["ts"], r["event_type"]) for r in rows],
        "user_id bigint, event_id bigint, ts string, event_type string",
    ).withColumn("ts_ms", F.unix_millis(F.to_timestamp("ts")))
    out = match_pattern(
        df, STEPS, key_col="user_id", order_col="ts_ms", id_col="event_id", within=WITHIN
    )
    return {
        (r.user_id, r.match_seq, r.a_ts_ms, r.a_event_id, r.b_ts_ms, r.b_event_id,
         r.c_ts_ms, r.c_event_id)
        for r in out.collect()
    }


def _ev(u, eid, ts, t):
    return {"user_id": u, "event_id": eid, "ts": ts, "event_type": t}


def test_streaming_matches_batch(spark, tmp_path):
    rows = [
        # user 1: two complete matches, with noise between the steps
        _ev(1, 1, "2024-01-01 10:00:00", "signup"),
        _ev(1, 2, "2024-01-01 10:01:00", "error"),
        _ev(1, 3, "2024-01-01 10:02:00", "click"),
        _ev(1, 4, "2024-01-01 10:04:00", "purchase"),
        _ev(1, 5, "2024-01-01 10:20:00", "signup"),
        _ev(1, 6, "2024-01-01 10:22:00", "click"),
        _ev(1, 7, "2024-01-01 10:25:00", "purchase"),
        # user 2: start times out (purchase > 10 min later), retry succeeds
        _ev(2, 8, "2024-01-01 10:00:00", "signup"),
        _ev(2, 9, "2024-01-01 10:01:00", "click"),
        _ev(2, 10, "2024-01-01 10:30:00", "signup"),
        _ev(2, 11, "2024-01-01 10:31:00", "click"),
        _ev(2, 12, "2024-01-01 10:33:00", "purchase"),
        # user 3: never completes
        _ev(3, 13, "2024-01-01 10:00:00", "signup"),
        _ev(3, 14, "2024-01-01 10:01:00", "click"),
    ]
    heartbeat = _ev(99, 999, "2024-01-01 13:00:00", "error")

    # interleave out-of-order within the 2-minute delay across batches
    batches = [rows[:3], [rows[4], rows[3]], rows[5:9], rows[9:], [heartbeat]]
    got_df = _run(spark, tmp_path, batches, "cep_parity")
    got = {
        (r.user_id, r.match_seq, r.a_ts_ms, r.a_event_id, r.b_ts_ms, r.b_event_id,
         r.c_ts_ms, r.c_event_id)
        for r in got_df.collect()
    }
    assert got == _batch_expected(spark, rows)
    assert len(got) == 3  # two for user 1, one for user 2


def test_streaming_late_data_within_delay_reordered(spark, tmp_path):
    """A click arriving one batch late (but inside the watermark delay)
    must still slot between signup and purchase in event time."""
    rows = [
        _ev(1, 1, "2024-01-01 10:00:00", "signup"),
        _ev(1, 3, "2024-01-01 10:03:00", "purchase"),
        _ev(1, 2, "2024-01-01 10:01:30", "click"),  # late arrival
    ]
    heartbeat = _ev(99, 999, "2024-01-01 13:00:00", "error")
    batches = [rows[:2], [rows[2]], [heartbeat]]
    got_df = _run(spark, tmp_path, batches, "cep_late", delay="5 minutes")
    got = {(r.user_id, r.a_event_id, r.b_event_id, r.c_event_id) for r in got_df.collect()}
    assert got == {(1, 1, 2, 3)}


def test_streaming_requires_within(spark):
    df = spark.createDataFrame([], "user_id bigint, event_id bigint, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="within"):
        streaming_match_pattern(df, STEPS, within=None)


def test_streaming_strict_matches_batch(spark, tmp_path):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep import match_strict

    rows = [
        _ev(1, 1, "2024-01-01 10:00:00", "click"),
        _ev(1, 2, "2024-01-01 10:01:00", "click"),
        _ev(1, 3, "2024-01-01 10:02:00", "purchase"),  # run 1-2-3? needs click,click,purchase
        _ev(1, 4, "2024-01-01 10:03:00", "click"),
        _ev(1, 5, "2024-01-01 10:04:00", "click"),
        _ev(1, 6, "2024-01-01 10:05:00", "purchase"),
        _ev(2, 7, "2024-01-01 10:00:00", "click"),
        _ev(2, 8, "2024-01-01 10:01:00", "view"),  # breaks contiguity
        _ev(2, 9, "2024-01-01 10:02:00", "purchase"),
    ]
    steps = [
        ("x", "event_type = 'click'"),
        ("y", "event_type = 'click'"),
        ("z", "event_type = 'purchase'"),
    ]
    heartbeat = _ev(99, 999, "2024-01-01 13:00:00", "error")
    in_dir = str(tmp_path / "strict_in")
    # split mid-run so a match spans the trigger boundary
    _write_batches(in_dir, [rows[:2], rows[2:5], rows[5:], [heartbeat]])
    stream = json_file_stream(
        spark, in_dir, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = streaming_match_pattern(
        stream, steps, key_col="user_id", ts_col="ts", id_col="event_id",
        contiguity="strict", delay="1 minute",
    )
    out_dir = str(tmp_path / "strict_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "strict_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.x_event_id, r.y_event_id, r.z_event_id)
        for r in spark.read.parquet(out_dir).collect()
    }

    import pyspark.sql.functions as F

    batch = spark.createDataFrame(
        [(r["user_id"], r["event_id"], r["ts"], r["event_type"]) for r in rows],
        "user_id bigint, event_id bigint, ts string, event_type string",
    ).withColumn("ts_ms", F.unix_millis(F.to_timestamp("ts")))
    want = {
        (r.user_id, r.x_event_id, r.y_event_id, r.z_event_id)
        for r in match_strict(
            batch, steps, key_col="user_id", order_col="ts_ms", id_col="event_id"
        ).collect()
    }
    assert got == want
    assert got == {(1, 1, 2, 3), (1, 4, 5, 6)}


def test_streaming_strict_needs_no_within(spark):
    df = spark.createDataFrame([], "user_id bigint, event_id bigint, ts timestamp, event_type string")
    # no raise for strict without within; relaxed still requires it
    streaming_match_pattern(df, STEPS, contiguity="strict")
    with pytest.raises(ValueError, match="within"):
        streaming_match_pattern(df, STEPS, contiguity="relaxed")
    with pytest.raises(ValueError, match="contiguity"):
        streaming_match_pattern(df, STEPS, within=10, contiguity="weird")
