"""HOP / CUMULATE window TVFs (operators/windows.py) — Flink window
parity beyond tumble. Sequential references pin assignment semantics
(events live in [start, end)); the hop/cumulate suite oracles cover the
sf0.01 corpus."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.windows import cumulate_window, hop_window

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)
MIN = 60_000


def _df(spark, minutes):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m)) for i, m in enumerate(minutes)],
        "event_id long, ts timestamp",
    )


def test_hop_window_assignment(spark):
    """Event at 10:20 with 1h/15m hop lands in starts 09:30..10:15;
    an event exactly on a slide boundary (10:15) lands in 09:30..10:15
    too (window [start, start+1h) half-open)."""
    df = _df(spark, [20, 15])
    got = {
        (r["event_id"], str(r["window_start"]), str(r["window_end"]))
        for r in hop_window(df, "ts", "1 hour", "15 minutes").collect()
    }
    def wins(eid, starts):
        return {
            (eid, f"2024-01-01 {s}:00", f"2024-01-01 {e}:00")
            for s, e in starts
        }
    assert got == wins(0, [("09:30", "10:30"), ("09:45", "10:45"), ("10:00", "11:00"), ("10:15", "11:15")]) | \
                  wins(1, [("09:30", "10:30"), ("09:45", "10:45"), ("10:00", "11:00"), ("10:15", "11:15")])


def test_cumulate_window_assignment_matches_flink_semantics(spark):
    """CUMULATE(step=15m, size=1h): an event at offset d of its hour
    belongs to every growing prefix ending strictly after it."""
    df = _df(spark, [0, 14, 15, 59])
    got = {}
    for r in cumulate_window(df, "ts", "15 minutes", "1 hour").collect():
        got.setdefault(r["event_id"], set()).add(
            (str(r["window_start"]), str(r["window_end"]))
        )
    hour = "2024-01-01 10:00:00"
    ends = [f"2024-01-01 10:15:00", f"2024-01-01 10:30:00",
            f"2024-01-01 10:45:00", f"2024-01-01 11:00:00"]
    assert got[0] == {(hour, e) for e in ends}          # ts == start: all 4
    assert got[1] == {(hour, e) for e in ends}          # 10:14 < every end
    assert got[2] == {(hour, e) for e in ends[1:]}      # 10:15 not in [.., 10:15)
    assert got[3] == {(hour, ends[3])}                  # 10:59 only the full hour


def test_cumulate_window_rejects_non_multiple(spark):
    df = _df(spark, [0])
    with pytest.raises(ValueError):
        cumulate_window(df, "ts", step="7 minutes", size="1 hour")


def test_cumulate_explode_is_map_side(spark):
    df = _df(spark, [0, 30])
    plan = cumulate_window(df, "ts")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_hop_counts_append_mode(spark, tmp_path):
    """Sliding-window aggregation is append-mode-native on a stream:
    counts per hop window equal the batch hop aggregation."""
    import json as _json
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream

    in_dir = str(tmp_path / "hop_in")
    os.makedirs(in_dir)
    rows = [
        {"user": "u1", "ts": "2024-01-01 10:05:00"},
        {"user": "u1", "ts": "2024-01-01 10:20:00"},
        {"user": "u2", "ts": "2024-01-01 12:10:00"},  # advances watermark
    ]
    base_m = 1_700_000_000
    for i, r in enumerate(rows):
        p = os.path.join(in_dir, f"b{i}.json")
        with open(p, "w") as fh:
            fh.write(_json.dumps(r) + "\n")
        os.utime(p, (base_m + i * 10, base_m + i * 10))

    stream = json_file_stream(spark, in_dir, "user string, ts timestamp")
    agg = (
        stream.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    out_dir = str(tmp_path / "hop_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(str(r["ws"]), r["n"]) for r in spark.read.parquet(out_dir).collect()}
    # hour-10 windows are closed by the 12:10 watermark push
    assert ("2024-01-01 09:45:00", 1) in got
    assert ("2024-01-01 10:00:00", 2) in got
    assert ("2024-01-01 10:15:00", 1) in got


def test_streaming_cumulate_update_mode_upsert(spark, tmp_path):
    """CUMULATE on a stream, as documented: derived window columns are
    not event-time-trackable, so run the aggregation in update mode into
    a keyed upsert sink — partials update in place (Flink early-fire
    semantics) and the compacted state equals the batch cumulate
    aggregation over all events."""
    import json as _json
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import ParquetUpsertSink
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream

    rows_batches = [
        [{"user": "u1", "ts": "2024-01-01 10:05:00"},
         {"user": "u2", "ts": "2024-01-01 10:20:00"}],
        [{"user": "u1", "ts": "2024-01-01 10:40:00"}],  # updates later partials
    ]
    in_dir = str(tmp_path / "cum_in")
    os.makedirs(in_dir)
    base_m = 1_700_000_000
    for i, rows in enumerate(rows_batches):
        p = os.path.join(in_dir, f"b{i}.json")
        with open(p, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        os.utime(p, (base_m + i * 10, base_m + i * 10))

    def agg(df):
        w = cumulate_window(df, "ts", "15 minutes", "1 hour")
        return w.groupBy("window_start", "window_end").agg(F.count("*").alias("n"))

    stream = json_file_stream(spark, in_dir, "user string, ts timestamp")
    sink = ParquetUpsertSink(
        str(tmp_path / "cum_sink"), keys=["window_start", "window_end"], order_by=["n"]
    )
    q = (
        agg(stream).writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "cum_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch_df = spark.createDataFrame(
        [(r["user"], r["ts"]) for b in rows_batches for r in b], "user string, ts string"
    ).select("user", F.col("ts").cast("timestamp").alias("ts"))
    want = {
        (str(r["window_start"]), str(r["window_end"]), r["n"])
        for r in agg(batch_df).collect()
    }
    got = {
        (str(r["window_start"]), str(r["window_end"]), r["n"])
        for r in sink.current_state(spark).collect()
    }
    assert got == want
    # the 10:45 and 11:00 partials must reflect BOTH micro-batches (u1 twice + u2)
    assert ("2024-01-01 10:00:00", "2024-01-01 11:00:00", 3) in got
