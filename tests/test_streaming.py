"""Streaming-construct tests (SURVEY §2.8, §2.4 J5/J7 streaming).

Strategy per SURVEY §5: file-fed change-event fixtures replayed with
maxFilesPerTrigger=1 + availableNow, so watermarks advance across real
micro-batches; final sink state is compared against the batch oracle
computed from the same rows.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.changelog import latest_per_key
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import asof_join, lookup_join
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import ParquetUpsertSink
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream
from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import (
    streaming_asof_join,
    txid_complete_transactions,
)


def _write_batches(dirpath: str, batches: list[list[dict]]) -> None:
    """One file per intended micro-batch, with strictly increasing mtimes:
    the file source orders by modification time, and same-second ties make
    later-written files (with later event times) process first — which
    turns earlier files into late data the watermark then drops."""
    os.makedirs(dirpath, exist_ok=True)
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        p = os.path.join(dirpath, f"batch_{i:03d}.json")
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))


def _run_available_now(stream_df, tmp_path, name):
    out_dir = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return out_dir


def test_streaming_asof_matches_batch(spark, tmp_path):
    """Scenario-6 core: streaming temporal join == batch as-of join on the
    same changelog (the batch 'view' is the golden oracle, SURVEY §5)."""
    dim_rows = [
        {"k": 1, "dts": "2024-01-01 10:00:00", "price": 5},
        {"k": 1, "dts": "2024-01-01 10:02:00", "price": 7},
        {"k": 2, "dts": "2024-01-01 10:01:00", "price": 9},
    ]
    fact_rows = [
        {"k": 1, "fid": 100, "fts": "2024-01-01 10:00:30"},  # -> price 5
        {"k": 1, "fid": 101, "fts": "2024-01-01 10:02:00"},  # inclusive -> 7
        {"k": 2, "fid": 102, "fts": "2024-01-01 10:00:30"},  # before any dim -> null
        {"k": 2, "fid": 103, "fts": "2024-01-01 10:03:00"},  # -> 9
        {"k": 3, "fid": 104, "fts": "2024-01-01 10:01:00"},  # keyless dim -> null
    ]
    heartbeat = {"k": 99, "fid": 999, "fts": "2024-01-01 12:00:00"}

    dim_dir = str(tmp_path / "dim_in")
    fact_dir = str(tmp_path / "fact_in")
    # interleave across files so several micro-batches run
    _write_batches(dim_dir, [dim_rows[:1], dim_rows[1:]])
    _write_batches(fact_dir, [fact_rows[:2], fact_rows[2:], [heartbeat]])

    dim_stream = json_file_stream(spark, dim_dir, "k int, dts timestamp, price int")
    fact_stream = json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp")

    joined = streaming_asof_join(
        fact_stream, dim_stream, key="k", fact_ts="fts", dim_ts="dts", how="left"
    )
    out_dir = _run_available_now(joined, tmp_path, "asof")
    got = {
        (r["fid"], r["price"])
        for r in spark.read.parquet(out_dir).collect()
        if r["fid"] != 999
    }

    dim_b = spark.createDataFrame(
        [(r["k"], r["dts"], r["price"]) for r in dim_rows], "k int, dts string, price int"
    ).withColumn("dts", F.to_timestamp("dts"))
    fact_b = spark.createDataFrame(
        [(r["k"], r["fid"], r["fts"]) for r in fact_rows], "k int, fid int, fts string"
    ).withColumn("fts", F.to_timestamp("fts"))
    expected = {
        (r["fid"], r["price"])
        for r in asof_join(fact_b, dim_b, key="k", fact_ts="fts", dim_ts="dts", how="left")
        .select("fid", "price")
        .collect()
    }
    assert got == expected
    assert got == {(100, 5), (101, 7), (102, None), (103, 9), (104, None)}


def test_streaming_asof_inner_drops_unmatched(spark, tmp_path):
    dim_dir = str(tmp_path / "d2")
    fact_dir = str(tmp_path / "f2")
    _write_batches(dim_dir, [[{"k": 1, "dts": "2024-01-01 10:00:00", "price": 5}]])
    _write_batches(
        fact_dir,
        [
            [{"k": 1, "fid": 1, "fts": "2024-01-01 09:59:00"}],
            [{"k": 1, "fid": 2, "fts": "2024-01-01 10:30:00"}],
            [{"k": 9, "fid": 99, "fts": "2024-01-01 12:00:00"}],  # heartbeat
        ],
    )
    joined = streaming_asof_join(
        json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp"),
        json_file_stream(spark, dim_dir, "k int, dts timestamp, price int"),
        key="k", fact_ts="fts", dim_ts="dts", how="inner",
    )
    out_dir = _run_available_now(joined, tmp_path, "asof_inner")
    got = {(r["fid"], r["price"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(2, 5)}  # fid 1 precedes all versions; 99 unmatched+inner


def test_txid_complete_transactions(spark, tmp_path):
    """J7: only transactions whose full event set arrived are released."""
    in_dir = str(tmp_path / "tx_in")
    _write_batches(
        in_dir,
        [
            [
                {"txId": 1, "event_count": 2, "payload": "a"},
                {"txId": 2, "event_count": 2, "payload": "x"},
            ],
            [{"txId": 1, "event_count": 2, "payload": "b"}],
            # txId 2's second event never arrives
        ],
    )
    stream = json_file_stream(spark, in_dir, "txId long, event_count long, payload string")
    gated = txid_complete_transactions(stream, "txId", "event_count", timeout=None)
    out_dir = _run_available_now(gated, tmp_path, "txid")
    got = {(r["txId"], r["payload"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "a"), (1, "b")}


def test_stream_static_lookup_join(spark, tmp_path):
    """J4: stream-static join = per-micro-batch lookup of current state."""
    in_dir = str(tmp_path / "lk_in")
    _write_batches(
        in_dir,
        [
            [{"order_id": 1, "client_id": 10}],
            [{"order_id": 2, "client_id": 20}, {"order_id": 3, "client_id": 99}],
        ],
    )
    stream = json_file_stream(spark, in_dir, "order_id int, client_id int")
    clients = spark.createDataFrame([(10, "ann"), (20, "bob")], "client_id int, client_name string")
    joined = lookup_join(stream, clients, on="client_id", how="inner", proctime_col=None)
    out_dir = _run_available_now(joined, tmp_path, "lookup")
    got = {(r["order_id"], r["client_name"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "ann"), (2, "bob")}  # 99 has no current version


def test_streaming_upsert_sink_with_cdc(spark, tmp_path):
    """Scenario 4 end-to-end: Debezium envelopes -> decode -> upsert sink;
    final state = latest per key with tombstones applied (W5/S7)."""
    def env(op, eid, key, name, ts_ms):
        img = {"id": key, "name": name, "seq": eid}
        return {
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "op": op,
            "ts_ms": ts_ms,
            "source": {"ts_ms": ts_ms, "txId": eid, "lsn": eid},
        }

    in_dir = str(tmp_path / "cdc_in")
    _write_batches(
        in_dir,
        [
            [env("c", 1, 1, "one", 1000), env("c", 2, 2, "two", 1000)],
            [env("u", 3, 1, "one-v2", 2000), env("c", 4, 3, "three", 2000)],
            [env("d", 5, 2, "two", 3000)],
        ],
    )
    img = "struct<id:int, name:string, seq:long>"
    stream = json_file_stream(
        spark, in_dir,
        f"before {img}, after {img}, op string, ts_ms long, source struct<ts_ms:long, txId:long, lsn:long>",
    )
    # re-serialize to a raw value column so the real decoder runs end-to-end
    raw = stream.select(F.to_json(F.struct("*")).alias("value"))

    decoded = decode_debezium(raw, "id int, name string, seq long")

    sink = ParquetUpsertSink(str(tmp_path / "sink_data"), keys="id", order_by=["ts_ms", "seq"], op_col="op")
    q = (
        decoded.writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "sink_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    state = {(r["id"], r["name"]) for r in sink.current_state(spark).select("id", "name").collect()}
    assert state == {(1, "one-v2"), (3, "three")}  # key 2 tombstoned


def test_streaming_application_spec_lookup(spark, tmp_path):
    """SURVEY §3.2 lifecycle: a {sources, statement} spec where one
    source is a CDC stream and one a static lookup view, the statement is
    SQL (stream-static lookup join, scenario 3), and the sink is the
    keyed upsert materialization."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.app import ApplicationSpec, run_streaming_application
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.tables import TableSpec

    in_dir = str(tmp_path / "app_in")
    _write_batches(
        in_dir,
        [
            [{"id": 1, "client_id": 10, "ts_ms": 1000}],
            [{"id": 1, "client_id": 20, "ts_ms": 2000},  # order 1 reassigned
             {"id": 2, "client_id": 10, "ts_ms": 2000}],
        ],
    )
    orders_stream = json_file_stream(spark, in_dir, "id int, client_id int, ts_ms long")
    clients = spark.createDataFrame([(10, "ann"), (20, "bob")], "client_id int, client_name string")

    spec = ApplicationSpec(
        sources=[TableSpec(name="orders_cdc", primary_key=("id",)), TableSpec(name="clients_lookup")],
        statement="""
            SELECT o.id AS order_id, o.ts_ms, c.client_name
            FROM orders_cdc o JOIN clients_lookup c ON o.client_id = c.client_id
        """,
    )
    sink, q = run_streaming_application(
        spark, spec,
        dataframes={"orders_cdc": orders_stream, "clients_lookup": clients},
        sink_keys="order_id", sink_order_by=["ts_ms"],
        checkpoint_dir=str(tmp_path / "app_run"),
    )
    q.awaitTermination(300)
    state = {(r["order_id"], r["client_name"]) for r in sink.current_state(spark).collect()}
    assert state == {(1, "bob"), (2, "ann")}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Exact streaming dedup: duplicate keys across micro-batches inside
    the watermark window emit once; state is watermark-bounded."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import streaming_dedup

    in_dir = str(tmp_path / "dd_in")
    _write_batches(
        in_dir,
        [
            [
                {"k": 1, "ts": "2024-01-01 10:00:00", "v": "a"},
                {"k": 1, "ts": "2024-01-01 10:00:05", "v": "a-dup"},
            ],
            [
                {"k": 1, "ts": "2024-01-01 10:00:10", "v": "a-dup2"},
                {"k": 2, "ts": "2024-01-01 10:00:10", "v": "b"},
            ],
        ],
    )
    stream = json_file_stream(spark, in_dir, "k int, ts timestamp, v string")
    deduped = streaming_dedup(stream, "k", watermark_col="ts", delay="1 hour")
    out_dir = _run_available_now(deduped, tmp_path, "dd")
    got = {(r["k"], r["v"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_streaming_update_mode_agg_to_upsert(spark, tmp_path):
    """A6: streaming aggregation in update mode feeding a keyed upsert
    sink — each micro-batch emits changed groups only; the compacted sink
    state equals the batch aggregate over all rows (the upsert-kafka
    materialization semantics of every reference scenario)."""
    in_dir = str(tmp_path / "agg_in")
    _write_batches(
        in_dir,
        [
            [{"user": "u1", "amount": 5}, {"user": "u2", "amount": 3}],
            [{"user": "u1", "amount": 2}],  # u1's aggregate must update to 7
        ],
    )
    stream = json_file_stream(spark, in_dir, "user string, amount long")
    agg = stream.groupBy("user").agg(
        F.sum("amount").alias("total"), F.count("*").alias("n")
    )
    sink = ParquetUpsertSink(str(tmp_path / "agg_sink"), keys="user", order_by=["n"])
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "agg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    state = {(r["user"], r["total"], r["n"]) for r in sink.current_state(spark).collect()}
    assert state == {("u1", 7, 2), ("u2", 3, 1)}


def test_streaming_interval_join(spark, tmp_path):
    """J6 streaming: stream-stream join with watermarks + time-range
    condition is native Structured Streaming; output must equal the batch
    interval join over the same rows."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import interval_join

    err_rows = [
        {"user_id": 1, "err_id": 10, "err_ts": "2024-01-01 10:00:00"},
        {"user_id": 2, "err_id": 20, "err_ts": "2024-01-01 10:30:00"},
    ]
    clk_rows = [
        {"user_id": 1, "click_ts": "2024-01-01 09:58:00"},  # within -5m
        {"user_id": 1, "click_ts": "2024-01-01 10:04:00"},  # within +5m
        {"user_id": 1, "click_ts": "2024-01-01 10:20:00"},  # outside
        {"user_id": 2, "click_ts": "2024-01-01 10:31:00"},  # within
    ]
    err_dir, clk_dir = str(tmp_path / "err_in"), str(tmp_path / "clk_in")
    _write_batches(err_dir, [err_rows])
    _write_batches(clk_dir, [clk_rows[:2], clk_rows[2:]])

    err_s = json_file_stream(spark, err_dir, "user_id int, err_id int, err_ts timestamp").withWatermark("err_ts", "10 minutes")
    clk_s = json_file_stream(spark, clk_dir, "user_id int, click_ts timestamp").withWatermark("click_ts", "10 minutes")
    joined = interval_join(err_s, clk_s, "user_id", "err_ts", "click_ts", "5 MINUTES", "5 MINUTES")
    out_dir = _run_available_now(joined.select("err_id", "click_ts"), tmp_path, "ivj")
    got = {(r["err_id"], str(r["click_ts"])) for r in spark.read.parquet(out_dir).collect()}
    assert got == {
        (10, "2024-01-01 09:58:00"),
        (10, "2024-01-01 10:04:00"),
        (20, "2024-01-01 10:31:00"),
    }


def test_streaming_hourly_counts_watermarked(spark, tmp_path):
    """W1/W4/A5: watermarked tumbling-window count in append mode."""
    in_dir = str(tmp_path / "win_in")
    _write_batches(
        in_dir,
        [
            [
                {"user": "u1", "ts": "2024-01-01 10:05:00"},
                {"user": "u1", "ts": "2024-01-01 10:55:00"},
                {"user": "u2", "ts": "2024-01-01 10:30:00"},
            ],
            [{"user": "u1", "ts": "2024-01-01 12:10:00"}],  # advances watermark past hour 10
        ],
    )
    stream = json_file_stream(spark, in_dir, "user string, ts timestamp")
    counts = (
        stream.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("user"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour"), "user", "n")
    )
    out_dir = _run_available_now(counts, tmp_path, "win")
    got = {(str(r["hour"]), r["user"], r["n"]) for r in spark.read.parquet(out_dir).collect()}
    assert ("2024-01-01 10:00:00", "u1", 2) in got
    assert ("2024-01-01 10:00:00", "u2", 1) in got


def test_streaming_asof_recovers_from_checkpoint(spark, tmp_path):
    """Kill-and-restart recovery: stop the query after the first tranche
    of files, then restart on the SAME checkpoint with new input. The
    restarted query must (a) not re-emit already-emitted facts and
    (b) join later facts against dim versions received BEFORE the stop —
    i.e. versioned state survives in the state store."""
    dim_dir = str(tmp_path / "rdim_in")
    fact_dir = str(tmp_path / "rfact_in")
    out_dir = str(tmp_path / "rec_out")
    ckpt = str(tmp_path / "rec_ckpt")

    # tranche 1: one dim version, one fact, one small watermark push
    _write_batches(dim_dir, [[{"k": 1, "dts": "2024-01-01 10:00:00", "price": 5}]])
    _write_batches(fact_dir, [
        [{"k": 1, "fid": 100, "fts": "2024-01-01 10:00:30"}],
        [{"k": 50, "fid": 500, "fts": "2024-01-01 10:30:00"}],  # advances wm past fid 100
    ])

    def run_once():
        dim_stream = json_file_stream(spark, dim_dir, "k int, dts timestamp, price int")
        fact_stream = json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp")
        joined = streaming_asof_join(
            fact_stream, dim_stream, key="k", fact_ts="fts", dim_ts="dts", how="left"
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # first run drains tranche 1, then the query stops
    first = {(r["fid"], r["price"]) for r in spark.read.parquet(out_dir).collect()}
    assert (100, 5) in first

    # tranche 2 (written AFTER the stop): a fact whose as-of version is the
    # pre-restart dim row, plus a heartbeat to flush it
    import os, json as _json
    for i, rows in enumerate([
        [{"k": 1, "fid": 101, "fts": "2024-01-01 10:40:00"}],
        [{"k": 99, "fid": 999, "fts": "2024-01-01 12:00:00"}],
    ]):
        p = os.path.join(fact_dir, f"late_{i}.json")
        with open(p, "w") as fh:
            fh.writelines(_json.dumps(r) + "\n" for r in rows)
        os.utime(p, (1_700_000_100 + i * 10,) * 2)

    run_once()  # restart on the same checkpoint
    rows = [r for r in spark.read.parquet(out_dir).collect()]
    got = {(r["fid"], r["price"]) for r in rows if r["fid"] not in (500, 999)}
    # fid 101 joined against the dim version learned before the restart
    assert got == {(100, 5), (101, 5)}
    # no duplicate emission of fid 100 across the two runs
    assert sum(1 for r in rows if r["fid"] == 100) == 1


def test_lookup_join_sees_jdbc_updates_between_batches(spark, tmp_path):
    """Scenario 3 executed for real: a CDC-style stream lookup-joined to a
    LIVE JDBC table (embedded Derby). The static side is re-read every
    micro-batch, so an update applied between batches is visible to the
    next batch — the per-batch-snapshot version of the reference's
    processing-time lookup freshness (README.md:256-302)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import lookup_join
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import jdbc_table_reader

    url = f"jdbc:derby:{tmp_path}/lkdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    def write_clients(rows):
        (
            spark.createDataFrame(rows, "client_id int, client_name string")
            .write.format("jdbc")
            .option("url", url).option("dbtable", "clients").option("driver", driver)
            .option("createTableColumnTypes", "client_name VARCHAR(32)")
            .mode("overwrite")
            .save()
        )

    write_clients([(10, "ann_v1")])

    in_dir = str(tmp_path / "lkj_in")
    _write_batches(
        in_dir,
        [
            [{"order_id": 1, "client_id": 10}],
            [{"order_id": 2, "client_id": 10}],
        ],
    )
    stream = json_file_stream(spark, in_dir, "order_id int, client_id int")
    lookup = jdbc_table_reader(spark, url, "clients", driver=driver).load()
    joined = lookup_join(stream, lookup, on="client_id", how="inner", proctime_col=None)

    seen = []

    def sink(batch_df, batch_id):
        seen.extend((r["order_id"], r["client_name"]) for r in batch_df.collect())
        if batch_id == 0:
            write_clients([(10, "ann_v2")])  # update the DB between batches

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "lkj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sorted(seen) == [(1, "ann_v1"), (2, "ann_v2")]


def test_streaming_upsert_jdbc_sink(spark, tmp_path):
    """S7 executed against a real external keyed store: CDC envelopes ->
    decode -> per-batch compaction -> staged MERGE into embedded Derby.
    Final table state = latest per key with deletes applied, across
    micro-batch boundaries (update and delete arrive after the insert)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import write_upsert_jdbc
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/upsdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    def env(op, eid, key, name, ts_ms):
        img = {"id": key, "name": name, "seq": eid}
        return {
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "op": op,
            "ts_ms": ts_ms,
            "source": {"ts_ms": ts_ms, "txId": eid, "lsn": eid},
        }

    in_dir = str(tmp_path / "ujs_in")
    _write_batches(
        in_dir,
        [
            [env("c", 1, 1, "ann", 1000), env("c", 2, 2, "bob", 1001)],
            [env("u", 3, 1, "ann2", 1002), env("c", 4, 3, "cay", 1003)],
            [env("d", 5, 2, "bob", 1004)],
        ],
    )
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .text(in_dir)
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    decoded = decode_debezium(raw, "id int, name string, seq int")

    q = (
        decoded.writeStream.foreachBatch(
            lambda df, eid: write_upsert_jdbc(
                df, keys="id", order_by=["ts_ms", "seq"],
                url=url, table="accounts", driver=driver, op_col="op",
            )
        )
        .option("checkpointLocation", str(tmp_path / "ujs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    final = {
        (r["id"], r["name"])
        for r in read_jdbc(spark, url, "accounts", driver=driver).select("id", "name").collect()
    }
    assert final == {(1, "ann2"), (3, "cay")}  # bob deleted, ann updated


def test_streaming_training_prep_gate_and_dedup(spark, tmp_path):
    """The training-data prep path on a document STREAM: codegen'd
    quality/language scoring is stateless (runs per micro-batch), and
    exact dedup uses dropDuplicatesWithinWatermark for bounded state.
    Duplicates arriving in LATER micro-batches within the watermark must
    still be suppressed; low-quality docs never reach the sink."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import text as TXT
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import streaming_dedup

    good = (
        "the quick brown fox jumps over the lazy dog and runs far away to the "
        "hills where it is safe and the grass is green and the water is clear"
    )
    in_dir = str(tmp_path / "tp_in")
    _write_batches(
        in_dir,
        [
            [
                {"doc_id": 1, "text": good, "ts": "2024-01-01 10:00:00"},
                {"doc_id": 2, "text": "!!! ??? !!!", "ts": "2024-01-01 10:00:01"},
            ],
            [
                {"doc_id": 3, "text": good, "ts": "2024-01-01 10:00:05"},  # dup, later batch
                {"doc_id": 4, "text": good + " extra tail of words here", "ts": "2024-01-01 10:00:06"},
            ],
        ],
    )
    stream = json_file_stream(spark, in_dir, "doc_id int, text string, ts timestamp")
    scored = stream.select(
        "doc_id", "ts",
        F.md5("text").alias("text_key"),
        TXT.quality_score("text").alias("quality"),
        TXT.lang_id("text").alias("lang_pred"),
    )
    kept = scored.filter((F.col("quality") >= 0.3) & (F.col("lang_pred") == "en"))
    deduped = streaming_dedup(kept, "text_key", watermark_col="ts", delay="10 minutes")
    out_dir = _run_available_now(deduped, tmp_path, "tprep")
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    # doc 2 fails the gate; doc 3 is a cross-batch duplicate of doc 1
    assert got == [1, 4]


def test_txid_incomplete_transactions_discarded_after_timeout(spark, tmp_path):
    """J7 state bound (the reference's "possibly large state" caveat,
    README.md:559): an incomplete transaction's buffer is discarded once
    the processing-time timeout fires, so its late second half can no
    longer complete it — and state does not grow forever."""
    in_dir = str(tmp_path / "txo_in")
    _write_batches(
        in_dir,
        [
            [{"txId": 1, "event_count": 2, "payload": "a"}],   # half of tx 1
            [{"txId": 2, "event_count": 1, "payload": "ok"}],  # fires tx 1's timeout
            [{"txId": 1, "event_count": 2, "payload": "b"}],   # too late: buffer was dropped
        ],
    )
    stream = json_file_stream(spark, in_dir, "txId long, event_count long, payload string")
    gated = txid_complete_transactions(stream, "txId", "event_count", timeout="1 millisecond")
    out_dir = _run_available_now(gated, tmp_path, "txo")
    got = {(r["txId"], r["payload"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(2, "ok")}


def test_streaming_asof_dim_delete_tombstone(spark, tmp_path):
    """A dim-side CDC delete must tombstone the key for later facts in the
    streaming operator too, matching the batch dim_op semantics, and
    same-ts duplicate versions with NULL payload must sort None-safely."""
    dim_rows = [
        {"k": 1, "dts": "2024-01-01 10:00:00", "price": 5, "op": "c"},
        {"k": 1, "dts": "2024-01-01 10:02:00", "price": 5, "op": "d"},
        {"k": 1, "dts": "2024-01-01 10:04:00", "price": 9, "op": "c"},
        # same-(key, ts) duplicates, one NULL payload: sort must not crash
        # and the deterministic winner is the max image (non-null)
        {"k": 2, "dts": "2024-01-01 10:00:00", "price": None, "op": "u"},
        {"k": 2, "dts": "2024-01-01 10:00:00", "price": 7, "op": "u"},
    ]
    fact_rows = [
        {"k": 1, "fid": 100, "fts": "2024-01-01 10:01:00"},  # -> 5
        {"k": 1, "fid": 101, "fts": "2024-01-01 10:03:00"},  # -> NULL (tombstone)
        {"k": 1, "fid": 102, "fts": "2024-01-01 10:05:00"},  # -> 9
        {"k": 2, "fid": 103, "fts": "2024-01-01 10:01:00"},  # -> 7 (max image)
    ]
    heartbeat = {"k": 99, "fid": 999, "fts": "2024-01-01 12:00:00"}

    dim_dir = str(tmp_path / "tomb_dim_in")
    fact_dir = str(tmp_path / "tomb_fact_in")
    _write_batches(dim_dir, [dim_rows[:2], dim_rows[2:]])
    _write_batches(fact_dir, [fact_rows[:2], fact_rows[2:], [heartbeat]])

    dim_stream = json_file_stream(spark, dim_dir, "k int, dts timestamp, price int, op string")
    fact_stream = json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp")

    joined = streaming_asof_join(
        fact_stream, dim_stream, key="k", fact_ts="fts", dim_ts="dts", how="left", dim_op="op"
    )
    out_dir = _run_available_now(joined, tmp_path, "tomb_asof")
    got = {
        (r["fid"], r["price"])
        for r in spark.read.parquet(out_dir).collect()
        if r["fid"] != 999
    }

    dim_b = spark.createDataFrame(
        [(r["k"], r["dts"], r["price"], r["op"]) for r in dim_rows],
        "k int, dts string, price int, op string",
    ).withColumn("dts", F.to_timestamp("dts"))
    fact_b = spark.createDataFrame(
        [(r["k"], r["fid"], r["fts"]) for r in fact_rows], "k int, fid int, fts string"
    ).withColumn("fts", F.to_timestamp("fts"))
    expected = {
        (r["fid"], r["price"])
        for r in asof_join(
            fact_b, dim_b, key="k", fact_ts="fts", dim_ts="dts", how="left", dim_op="op"
        ).select("fid", "price").collect()
    }
    assert got == expected
    assert got == {(100, 5), (101, None), (102, 9), (103, 7)}


def test_upsert_kafka_wire_contract(spark):
    """Broker-free contract test of the upsert-kafka record layout
    (VERDICT r1 item 6): the exact (key, value) strings write_upsert_kafka
    hands the Kafka writer, per reference how-to-aiven/04-flink-cdc-outbox.md
    (json key = PK, json value = row, delete -> tombstone null value)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import upsert_kafka_records

    changelog = spark.createDataFrame(
        [
            (1, "ann", "corner", '[{"pizza":"margherita"}]', 1, "c"),
            (1, "ann", "window", '[{"pizza":"margherita"}]', 2, "u"),  # latest for key 1
            (2, "bob", "corner", "[]", 1, "c"),
            (2, "bob", "corner", "[]", 2, "d"),                        # delete -> tombstone
            (3, "eve", "patio", "[]", 1, "c"),
        ],
        "order_id int, client_name string, table_name string, pizzas string, seq int, op string",
    )
    rows = {
        r["key"]: r["value"]
        for r in upsert_kafka_records(changelog, "order_id", "seq", op_col="op").collect()
    }
    # per-batch compaction: one record per key
    assert len(rows) == 3
    # key layout: JSON object of the PK
    assert set(rows) == {'{"order_id":1}', '{"order_id":2}', '{"order_id":3}'}
    # value layout (Flink value.fields-include=ALL): full row incl. PK, no op
    assert rows['{"order_id":1}'] == (
        '{"order_id":1,"client_name":"ann","table_name":"window",'
        '"pizzas":"[{\\"pizza\\":\\"margherita\\"}]","seq":2}'
    )
    # delete op wins the compaction for key 2 and becomes a tombstone
    assert rows['{"order_id":2}'] is None
    # EXCEPT_KEY mode drops the PK from the value
    except_key = {
        r["key"]: r["value"]
        for r in upsert_kafka_records(
            changelog, "order_id", "seq", op_col="op", value_fields="except_key"
        ).collect()
    }
    assert except_key['{"order_id":3}'] == '{"client_name":"eve","table_name":"patio","pizzas":"[]","seq":1}'


def test_kafka_murmur2_matches_published_vectors():
    """kafka_murmur2 reproduces Apache Kafka's Utils.murmur2 exactly —
    golden values from Kafka's own public UtilsTest — so the partition
    column we emit is the partition a real DefaultPartitioner broker
    client would pick."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import kafka_murmur2

    def signed(h):
        return h - (1 << 32) if h >= (1 << 31) else h

    assert signed(kafka_murmur2(b"21")) == -973932308
    assert signed(kafka_murmur2(b"foobar")) == -790332482
    assert signed(kafka_murmur2(b"a-little-bit-long-string")) == -985981536
    assert signed(kafka_murmur2(b"a-little-bit-longer-string")) == -1486304829
    assert signed(kafka_murmur2(b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8")) == -58897971


def test_upsert_kafka_partition_assignment(spark):
    """Key-based partition placement on the compacted topic
    (flink-applications/01-basic-jdbc.json:26): every record for a key —
    including its delete tombstone — must land in the same partition, the
    placement must not depend on data layout, and keys must spread across
    partitions."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import (
        kafka_default_partition,
        upsert_kafka_records,
    )

    changelog = spark.createDataFrame(
        [(i, f"client_{i}", i, "c") for i in range(100)]
        + [(7, "client_7b", 100, "u"), (9, "client_9", 100, "d")],
        "order_id int, client_name string, seq int, op string",
    )
    recs = upsert_kafka_records(
        changelog, "order_id", "seq", op_col="op", num_partitions=6
    ).collect()
    parts = {r["key"]: r["partition"] for r in recs}
    # placement is exactly DefaultPartitioner on the JSON key bytes
    assert all(p == kafka_default_partition(k, 6) for k, p in parts.items())
    # tombstone for key 9 exists and is placed like any record of key 9
    tomb = [r for r in recs if r["value"] is None]
    assert len(tomb) == 1 and tomb[0]["partition"] == kafka_default_partition('{"order_id":9}', 6)
    # layout independence: scrambling the input changes nothing
    parts2 = {
        r["key"]: r["partition"]
        for r in upsert_kafka_records(
            changelog.repartition(13), "order_id", "seq", op_col="op", num_partitions=6
        ).collect()
    }
    assert parts2 == parts
    # 100 keys over 6 partitions: every partition is used
    assert set(parts.values()) == set(range(6))


def test_streaming_asof_state_survives_query_restart(spark, tmp_path):
    """Stateful recovery: dim versions and pending facts checkpointed by
    run 1 must be restored by a NEW query over the same checkpoint — a
    fact arriving after restart still matches a dim version received
    before it (state-store round-trip, the backlog's recovery story)."""
    dim_dir = str(tmp_path / "rec_dim_in")
    fact_dir = str(tmp_path / "rec_fact_in")
    # run 1: dim v5@10:00 arrives; a fact@10:01 stays pending (wm lags)
    _write_batches(dim_dir, [[{"k": 1, "dts": "2024-01-01 10:00:00", "price": 5}]])
    _write_batches(fact_dir, [[{"k": 1, "fid": 100, "fts": "2024-01-01 10:01:00"}]])

    def build():
        dim_stream = json_file_stream(spark, dim_dir, "k int, dts timestamp, price int")
        fact_stream = json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp")
        return streaming_asof_join(
            fact_stream, dim_stream, key="k", fact_ts="fts", dim_ts="dts", how="left"
        )

    out_dir = str(tmp_path / "rec_out")
    ckpt = str(tmp_path / "rec_ckpt")

    def run_once():
        q = (
            build().writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # nothing emitted yet: watermark has not passed the fact

    # "restart": new files arrive while the first query is stopped — a
    # second fact plus a heartbeat that advances the watermark past both
    base = 1_700_001_000
    import json as _json

    p1 = os.path.join(fact_dir, "late_1.json")
    with open(p1, "w") as fh:
        fh.write(_json.dumps({"k": 1, "fid": 101, "fts": "2024-01-01 10:02:00"}) + "\n")
    os.utime(p1, (base, base))
    p2 = os.path.join(fact_dir, "late_2.json")
    with open(p2, "w") as fh:
        fh.write(_json.dumps({"k": 99, "fid": 999, "fts": "2024-01-01 12:00:00"}) + "\n")
    os.utime(p2, (base + 10, base + 10))

    run_once()  # fresh query object, same checkpoint -> state restored

    got = {
        (r["fid"], r["price"])
        for r in spark.read.parquet(out_dir).collect()
        if r["fid"] != 999
    }
    # both facts match the dim version that arrived BEFORE the restart
    assert got == {(100, 5), (101, 5)}


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """J6 streaming: the native watermarked stream-stream interval join
    emits exactly the batch interval_join's row set on the same data."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import interval_join
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_interval_join

    order_rows = [
        {"k": 1, "oid": 1, "ots": "2024-01-01 10:00:00"},
        {"k": 1, "oid": 2, "ots": "2024-01-01 10:10:00"},
        {"k": 2, "oid": 3, "ots": "2024-01-01 10:05:00"},
    ]
    ship_rows = [
        {"k": 1, "sid": 10, "sts": "2024-01-01 10:02:00"},  # in [o1-1m, o1+5m]; in [o2-1m..]? 10:02 < 10:09 no
        {"k": 1, "sid": 11, "sts": "2024-01-01 10:14:00"},  # matches oid 2 (within +5m)
        {"k": 2, "sid": 12, "sts": "2024-01-01 10:20:00"},  # outside oid 3's window
        {"k": 3, "sid": 13, "sts": "2024-01-01 10:00:00"},  # keyless
    ]
    l_dir, r_dir = str(tmp_path / "ivl_l"), str(tmp_path / "ivl_r")
    _write_batches(l_dir, [order_rows[:1], order_rows[1:]])
    _write_batches(r_dir, [ship_rows[:2], ship_rows[2:]])

    joined = streaming_interval_join(
        json_file_stream(spark, l_dir, "k int, oid int, ots timestamp"),
        json_file_stream(spark, r_dir, "k int, sid int, sts timestamp"),
        key="k", left_ts="ots", right_ts="sts",
        lower="1 minute", upper="5 minutes",
        watermark_left="0 seconds", watermark_right="0 seconds",
    ).select("oid", "sid")
    out_dir = _run_available_now(joined, tmp_path, "ivl")
    got = {(r["oid"], r["sid"]) for r in spark.read.parquet(out_dir).collect()}

    orders_b = spark.createDataFrame(
        [(r["k"], r["oid"], r["ots"]) for r in order_rows], "k int, oid int, ots string"
    ).withColumn("ots", F.to_timestamp("ots"))
    ships_b = spark.createDataFrame(
        [(r["k"], r["sid"], r["sts"]) for r in ship_rows], "k int, sid int, sts string"
    ).withColumn("sts", F.to_timestamp("sts"))
    expected = {
        (r["oid"], r["sid"])
        for r in interval_join(
            orders_b, ships_b, "k", "ots", "sts", "1 minute", "5 minutes"
        ).select("oid", "sid").collect()
    }
    assert got == expected
    assert got == {(1, 10), (2, 11)}


def test_streaming_asof_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-restart recovery for the applyInPandasWithState as-of
    join: a dim version learned in run 1 must match a fact that only
    arrives in run 2 on the SAME checkpoint — proving per-key state is
    restored from the state store, not rebuilt from the (gone) input."""
    dim_dir = str(tmp_path / "rst_dim")
    fact_dir = str(tmp_path / "rst_fact")
    out_dir = str(tmp_path / "rst_out")
    ckpt = str(tmp_path / "rst_ckpt")

    def run_once():
        joined = streaming_asof_join(
            json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp"),
            json_file_stream(spark, dim_dir, "k int, dts timestamp, price int"),
            key="k", fact_ts="fts", dim_ts="dts", how="left",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: dim version + one matching fact + heartbeat to advance wm
    _write_batches(dim_dir, [[{"k": 1, "dts": "2024-01-01 10:00:00", "price": 5}]])
    _write_batches(fact_dir, [
        [{"k": 1, "fid": 1, "fts": "2024-01-01 10:01:00"}],
        [{"k": 99, "fid": 999, "fts": "2024-01-01 11:00:00"}],
    ])
    run_once()

    # run 2 (restart, same checkpoint): a NEW fact for k=1 arrives; the
    # dim file from run 1 is already consumed — only recovered state can
    # price it. (mtimes continue increasing past run 1's batches.)
    import json as _json
    import os as _os
    p = _os.path.join(fact_dir, "batch_100.json")
    with open(p, "w") as fh:
        fh.write(_json.dumps({"k": 1, "fid": 2, "fts": "2024-01-01 11:30:00"}) + "\n")
    _os.utime(p, (1_700_010_000, 1_700_010_000))
    p2 = _os.path.join(fact_dir, "batch_101.json")
    with open(p2, "w") as fh:
        fh.write(_json.dumps({"k": 98, "fid": 998, "fts": "2024-01-01 13:00:00"}) + "\n")
    _os.utime(p2, (1_700_010_010, 1_700_010_010))
    run_once()

    got = {
        (r["fid"], r["price"])
        for r in spark.read.parquet(out_dir).collect()
        if r["fid"] not in (999, 998)
    }
    assert got == {(1, 5), (2, 5)}  # fid 2 priced purely from recovered state


def test_streaming_interval_join_left_outer_emits_null_padded(spark, tmp_path):
    """J6 streaming, outer mode: an order with no shipment inside its
    window must surface null-padded — but only once BOTH watermarks
    prove no match can still arrive (heartbeats push them past the
    window). Matched rows must not double-emit."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_interval_join

    order_rows = [
        {"k": 1, "oid": 1, "ots": "2024-01-01 10:00:00"},  # ship 10 matches
        {"k": 2, "oid": 2, "ots": "2024-01-01 10:05:00"},  # no match -> null pad
    ]
    ship_rows = [
        {"k": 1, "sid": 10, "sts": "2024-01-01 10:02:00"},
    ]
    # heartbeats (filtered from the result) advance BOTH watermarks far
    # past every window so the unmatched left row's state is finalized
    hb_l = {"k": 99, "oid": 999, "ots": "2024-01-01 12:00:00"}
    hb_r = {"k": 99, "sid": 999, "sts": "2024-01-01 12:00:00"}
    l_dir, r_dir = str(tmp_path / "ivlo_l"), str(tmp_path / "ivlo_r")
    _write_batches(l_dir, [order_rows, [hb_l]])
    _write_batches(r_dir, [ship_rows, [hb_r]])

    joined = streaming_interval_join(
        json_file_stream(spark, l_dir, "k int, oid int, ots timestamp"),
        json_file_stream(spark, r_dir, "k int, sid int, sts timestamp"),
        key="k", left_ts="ots", right_ts="sts",
        lower="1 minute", upper="5 minutes",
        watermark_left="0 seconds", watermark_right="0 seconds",
        how="left_outer",
    ).select("oid", "sid")
    out_dir = _run_available_now(joined, tmp_path, "ivlo")
    got = sorted(
        (r["oid"], r["sid"])
        for r in spark.read.parquet(out_dir).collect()
        if r["oid"] != 999
    )
    assert got == [(1, 10), (2, None)]


def test_streaming_rolling_agg_matches_batch_window(spark, tmp_path):
    """Flink OVER-window parity: the streaming trailing-N aggregate
    equals the batch ROWS-frame window on the same data, in exact
    cents."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_rolling_agg

    rows = [
        {"k": 1, "eid": 1, "ts": "2024-01-01 10:00:00", "v": 3.5},
        {"k": 1, "eid": 2, "ts": "2024-01-01 10:01:00", "v": 1.25},
        {"k": 1, "eid": 3, "ts": "2024-01-01 10:02:00", "v": 9.0},
        {"k": 1, "eid": 4, "ts": "2024-01-01 10:03:00", "v": 0.75},
        {"k": 2, "eid": 5, "ts": "2024-01-01 10:00:30", "v": 7.0},
        {"k": 2, "eid": 6, "ts": "2024-01-01 10:02:30", "v": 2.5},
    ]
    hb = [
        {"k": 9, "eid": 99, "ts": "2024-01-01 12:00:00", "v": 0.0},
    ]
    d = str(tmp_path / "roll_in")
    _write_batches(d, [rows[:3], rows[3:], hb])
    stream = json_file_stream(spark, d, "k int, eid int, ts timestamp, v double")
    out = streaming_rolling_agg(
        stream, "k", "ts", "v", window_rows=3, tiebreak_cols=("eid",)
    )
    out_dir = _run_available_now(out, tmp_path, "roll")
    got = {
        r["eid"]: (r["roll_n"], r["roll_sum_cents"], r["roll_min_cents"], r["roll_max_cents"])
        for r in spark.read.parquet(out_dir).collect()
        if r["eid"] != 99
    }

    batch = spark.createDataFrame(
        [(r["k"], r["eid"], r["ts"], r["v"]) for r in rows],
        "k int, eid int, ts string, v double",
    ).selectExpr("k", "eid", "CAST(ts AS TIMESTAMP) AS ts",
                 "CAST(floor(v * 100) AS BIGINT) AS cents")
    from pyspark.sql import Window as W
    w = W.partitionBy("k").orderBy("ts", "eid").rowsBetween(-2, 0)
    exp = {
        r["eid"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in batch.select(
            "eid",
            F.count("cents").over(w).cast("int").alias("n"),
            F.sum("cents").over(w).alias("s"),
            F.min("cents").over(w).alias("mn"),
            F.max("cents").over(w).alias("mx"),
        ).collect()
    }
    assert got == exp
    assert got[3] == (3, 350 + 125 + 900, 125, 900)


def test_streaming_rolling_agg_state_bounded_and_null_dropped(spark, tmp_path):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_rolling_agg

    rows = [
        {"k": 1, "eid": i, "ts": f"2024-01-01 10:{i:02d}:00", "v": float(i)}
        for i in range(1, 10)
    ] + [{"k": 1, "eid": 50, "ts": "2024-01-01 10:30:00", "v": None}]
    hb = [{"k": 9, "eid": 99, "ts": "2024-01-01 12:00:00", "v": 0.0}]
    d = str(tmp_path / "rollb_in")
    _write_batches(d, [rows, hb])
    stream = json_file_stream(spark, d, "k int, eid int, ts timestamp, v double")
    out_dir = _run_available_now(
        streaming_rolling_agg(stream, "k", "ts", "v", window_rows=4,
                              tiebreak_cols=("eid",)),
        tmp_path, "rollb",
    )
    res = {r["eid"]: r for r in spark.read.parquet(out_dir).collect() if r["eid"] < 50}
    # the 9th event's window covers only the trailing 4
    assert (res[9]["roll_n"], res[9]["roll_sum_cents"]) == (4, (6 + 7 + 8 + 9) * 100)
    # null-valued event emitted nothing
    assert 50 not in res


def test_streaming_cusum_matches_batch(spark, tmp_path):
    """Streaming CUSUM (O(1) recurrence state) equals the batch
    prefix-sum closed form in exact cents, alerts included."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_cusum
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import cusum

    rows = [
        {"k": 1, "eid": i, "ts": f"2024-01-01 10:{i:02d}:00",
         "v": [10.0, 80.0, 95.0, 70.0, 5.0, 90.0][i - 1]}
        for i in range(1, 7)
    ] + [
        {"k": 2, "eid": 10, "ts": "2024-01-01 10:00:30", "v": 40.0},
        {"k": 2, "eid": 11, "ts": "2024-01-01 10:02:30", "v": 41.0},
    ]
    hb = [{"k": 9, "eid": 99, "ts": "2024-01-01 12:00:00", "v": 50.0}]
    d = str(tmp_path / "cusum_in")
    _write_batches(d, [rows[:4], rows[4:], hb])
    stream = json_file_stream(spark, d, "k int, eid int, ts timestamp, v double")
    out_dir = _run_available_now(
        streaming_cusum(stream, "k", "ts", "v", ref_cents=5000,
                        threshold_cents=8000, tiebreak_cols=("eid",)),
        tmp_path, "cusum",
    )
    got = {r["eid"]: (r["cusum_hi"], r["cusum_lo"], r["alert"])
           for r in spark.read.parquet(out_dir).collect() if r["eid"] != 99}

    batch = spark.createDataFrame(
        [(r["k"], r["eid"], r["ts"], r["v"]) for r in rows],
        "k int, eid int, ts string, v double",
    ).selectExpr("k", "eid", "CAST(ts AS TIMESTAMP) AS ts", "v")
    exp = {r["eid"]: (r["cusum_hi"], r["cusum_lo"], r["alert"])
           for r in cusum(batch, "k", "ts", "v", ref_cents=5000,
                          threshold_cents=8000, tiebreak_cols=("eid",)).collect()}
    assert got == exp
    assert any(a for _, _, a in got.values())       # the high run must alert
    assert got[10] == (0, 1000, False)              # below-ref start: lo side grows


def test_streaming_debezium_dead_letter_quarantine(spark, tmp_path):
    """VERDICT r4 item 5: undecodable envelopes must land in a
    quarantine sink while the pipeline keeps processing, and counts
    must reconcile (clean + quarantined == non-tombstone input)."""
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import quarantine_split
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    def env(op, eid, rid, name, ts_ms):
        img = {"id": rid, "name": name, "seq": eid}
        return json.dumps({
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "op": op,
            "ts_ms": ts_ms,
            "source": {"ts_ms": ts_ms, "txId": eid, "lsn": eid},
        })

    corrupt1 = '{"after": {"id": 7'                      # truncated JSON
    corrupt2 = json.dumps({"foreign": "payload", "x": 1})  # valid JSON, no envelope
    batches = [
        [env("c", 1, 1, "one", 1000), env("c", 2, 2, "two", 1000)],
        [corrupt1, env("u", 3, 1, "one-v2", 2000), corrupt2],
        [env("d", 4, 2, "two", 3000)],   # pipeline continues past bad batch
    ]
    in_dir = str(tmp_path / "dlq_in")
    os.makedirs(in_dir)
    base = 1_700_000_000
    for i, lines in enumerate(batches):
        p = os.path.join(in_dir, f"batch_{i:03d}.txt")
        with open(p, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .text(in_dir)
    )
    decoded = decode_debezium(raw, "id int, name string, seq long", lenient=True)

    clean_dir = str(tmp_path / "dlq_clean")
    quar_dir = str(tmp_path / "dlq_quarantine")

    def route(batch_df, epoch_id):
        clean, bad = quarantine_split(batch_df)
        clean.write.mode("append").parquet(clean_dir)
        bad.write.mode("append").parquet(quar_dir)

    q = (
        decoded.writeStream.foreachBatch(route)
        .option("checkpointLocation", str(tmp_path / "dlq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    clean = spark.read.parquet(clean_dir).collect()
    bad = spark.read.parquet(quar_dir).collect()
    # counts reconcile: 4 good envelopes decode, 2 corrupt quarantined
    assert len(clean) == 4 and len(bad) == 2
    assert {r["raw"] for r in bad} == {corrupt1, corrupt2}
    # the batch AFTER the corrupt one was processed (pipeline survived)
    assert {(r["op"], r["id"], r["name"]) for r in clean} == {
        ("c", 1, "one"), ("c", 2, "two"), ("u", 1, "one-v2"), ("d", 2, "two"),
    }
    # no clean row carries a corrupt marker; every good field decoded
    assert all(r["id"] is not None for r in clean)


def test_decode_debezium_lenient_batch_and_logical_message(spark):
    """Batch-side dead-letter contract: _corrupt_record only on
    undecodable rows; tombstones stay dropped, not quarantined; the
    logical-message decoder shares the contract."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import quarantine_split
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import (
        decode_debezium,
        decode_logical_message,
    )

    good = json.dumps({
        "before": None, "after": {"id": 1, "name": "a", "seq": 1},
        "op": "c", "ts_ms": 1000,
        "source": {"ts_ms": 1000, "txId": 1, "lsn": 1},
    })
    df = spark.createDataFrame(
        [(good,), ("{broken",), (None,)], "value string"
    )
    out = decode_debezium(df, "id int, name string, seq long", lenient=True)
    clean, bad = quarantine_split(out)
    assert clean.count() == 1 and clean.first()["id"] == 1
    assert [r["raw"] for r in bad.collect()] == ["{broken"]  # tombstone not quarantined

    import base64
    content = base64.b64encode(b'{"order_id": 5, "client_name": "c", "table_name": "t", "pizzas": "[]"}').decode()
    goodmsg = json.dumps({
        "op": "m", "ts_ms": 1, "source": {"ts_ms": 1, "txId": 1, "lsn": 1},
        "message": {"prefix": "orders", "content": content},
    })
    mdf = spark.createDataFrame([(goodmsg,), ("not json",)], "value string")
    mout = decode_logical_message(mdf, lenient=True, drop_tombstones=False)
    mclean, mbad = quarantine_split(mout)
    assert mclean.first()["order_id"] == 5
    assert [r["raw"] for r in mbad.collect()] == ["not json"]


def test_stateful_streaming_under_rocksdb_state_store(spark, tmp_path):
    """Cluster-scale state realism: the RocksDB state store provider
    (the off-heap, incrementally-checkpointed store a 100-TB deployment
    runs — `configure_streaming(state_store_provider=...)`) must
    execute the engine's stateful operators and produce output
    IDENTICAL to the default HDFS-backed store. Covers both stateful
    shapes: applyInPandasWithState (streaming as-of) and native
    stream-stream join state (interval join)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.session import configure_streaming
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_interval_join

    dim_rows = [
        {"k": 1, "dts": "2024-01-01 10:00:00", "price": 5},
        {"k": 1, "dts": "2024-01-01 10:02:00", "price": 7},
        {"k": 2, "dts": "2024-01-01 10:01:00", "price": 9},
    ]
    fact_rows = [
        {"k": 1, "fid": 100, "fts": "2024-01-01 10:00:30"},
        {"k": 1, "fid": 101, "fts": "2024-01-01 10:02:00"},
        {"k": 2, "fid": 102, "fts": "2024-01-01 10:00:30"},
        {"k": 2, "fid": 103, "fts": "2024-01-01 10:03:00"},
    ]
    heartbeat = {"k": 99, "fid": 999, "fts": "2024-01-01 12:00:00"}
    hb_dim = {"k": 99, "dts": "2024-01-01 12:00:00", "price": 0}
    dim_dir, fact_dir = str(tmp_path / "rdb_dim"), str(tmp_path / "rdb_fact")
    _write_batches(dim_dir, [dim_rows[:1], dim_rows[1:], [hb_dim]])
    _write_batches(fact_dir, [fact_rows[:2], fact_rows[2:], [heartbeat]])

    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    default_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")

    def run_asof(name):
        joined = streaming_asof_join(
            json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp"),
            json_file_stream(spark, dim_dir, "k int, dts timestamp, price int"),
            key="k", fact_ts="fts", dim_ts="dts", how="left",
        )
        out = _run_available_now(joined, tmp_path, name)
        return sorted(
            (r["fid"], r["price"])
            for r in spark.read.parquet(out).collect()
            if r["fid"] != 999
        )

    def run_interval(name):
        joined = streaming_interval_join(
            json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp"),
            json_file_stream(spark, dim_dir, "k int, dts timestamp, price int"),
            key="k", left_ts="fts", right_ts="dts",
            lower="2 minutes", upper="2 minutes",
            watermark_left="0 seconds", watermark_right="0 seconds",
        ).select("fid", "price")
        out = _run_available_now(joined, tmp_path, name)
        return sorted(
            (r["fid"], r["price"])
            for r in spark.read.parquet(out).collect()
            if r["fid"] != 999
        )

    try:
        configure_streaming(spark, state_store_provider=rocksdb)
        asof_rdb = run_asof("asof_rdb")
        ivl_rdb = run_interval("ivl_rdb")
        # sanity: the provider really was in force for those queries
        assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == rocksdb
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", default_provider)
    asof_hdfs = run_asof("asof_hdfs")
    ivl_hdfs = run_interval("ivl_hdfs")

    assert asof_rdb == asof_hdfs == [(100, 5), (101, 7), (102, None), (103, 9)]
    assert ivl_rdb == ivl_hdfs
    assert len(ivl_rdb) > 0


def test_streaming_asof_idle_ttl_expires_keys_end_to_end(spark, tmp_path):
    """REAL-Spark integration of manual event-time idle-key expiry
    (ADVICE r6 high asked for one; the TWS twin can only mock-test it —
    protobuf-gated — so this sibling operator carries the executed
    evidence for the shared semantics). A dim key idle past ``idle_ttl``
    on the watermark clock is dropped wholesale, so a later fact
    NULL-pads exactly as never-seen; the identical schedule WITHOUT
    idle_ttl still serves the retained version."""
    dim_rows = [{"k": 1, "dts": "2024-01-01 10:00:00", "price": 5}]

    def hb(h, m):
        return {"k": 99, "fid": 999, "fts": f"2024-01-01 {h:02d}:{m:02d}:00"}

    late_fact = {"k": 1, "fid": 200, "fts": "2024-01-01 11:30:00"}
    fact_batches = [
        [hb(10, 5)],   # b1 (with the dim file): wm -> 10:05 after
        [hb(11, 0)],   # b2: wm -> 11:00; key-1 deadline 10:30 now passed
        [hb(11, 5)],   # b3: the expiry timeout fires, key 1 removed
        [late_fact],   # b4: fact for the expired key, buffered
        [hb(12, 0)],   # b5: wm -> 12:00
        [hb(12, 30)],  # b6: drain timeout fires for the buffered fact
    ]
    for ttl, want in [("30 minutes", None), (None, 5)]:
        sub = tmp_path / ("ttl" if ttl else "nottl")
        sub.mkdir()
        dim_dir, fact_dir = str(sub / "dim_in"), str(sub / "fact_in")
        _write_batches(dim_dir, [dim_rows])
        _write_batches(fact_dir, fact_batches)
        joined = streaming_asof_join(
            json_file_stream(spark, fact_dir, "k int, fid int, fts timestamp"),
            json_file_stream(spark, dim_dir, "k int, dts timestamp, price int"),
            key="k", fact_ts="fts", dim_ts="dts", how="left", idle_ttl=ttl,
        )
        out_dir = _run_available_now(joined, sub, "asofttl")
        got = {
            (r["fid"], r["price"])
            for r in spark.read.parquet(out_dir).collect()
            if r["fid"] != 999
        }
        assert got == {(200, want)}, f"idle_ttl={ttl}: {got}"


def test_upsert_jdbc_null_op_and_string_keys(spark, tmp_path):
    """Review r7 twin fixes, executed against real Derby: (1) a NULL-op
    row (snapshot/backfill mixed into CDC) INSERTs — the bare NOT IN
    predicate was UNKNOWN for NULL and silently dropped it; (2) a
    string-typed key merges — Spark's Derby writer stages StringType as
    CLOB, which the raw ON comparison could not handle."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import write_upsert_jdbc
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/upsnull;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    b1 = spark.createDataFrame(
        [("k1", "v1", "c", 1), ("k2", "v2", None, 2)],  # NULL op = upsert
        "email string, val string, op string, ts_ms long",
    )
    write_upsert_jdbc(b1, keys="email", order_by="ts_ms", url=url,
                      table="snap", driver=driver, op_col="op")
    b2 = spark.createDataFrame(
        [("k1", "v1b", None, 3), ("k2", "v2", "d", 4), ("k3", "v3", None, 5)],
        "email string, val string, op string, ts_ms long",
    )
    write_upsert_jdbc(b2, keys="email", order_by="ts_ms", url=url,
                      table="snap", driver=driver, op_col="op")
    got = {
        (r["email"], r["val"])
        for r in read_jdbc(spark, url, "snap", driver=driver).collect()
    }
    # k1 updated via NULL op, k2 deleted, k3 inserted via NULL op
    assert got == {("k1", "v1b"), ("k3", "v3")}


def test_upsert_jdbc_long_keys_do_not_collide(spark, tmp_path):
    """ADVICE r8 (medium): the MERGE ON clause used a fixed
    CAST(.. AS VARCHAR(512)) — explicit casts truncate silently, so two
    distinct keys sharing a 512-char prefix compared equal and the
    update hit the wrong target row. Widths are now sized from the
    staged data, so long keys stay distinct end-to-end."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import write_upsert_jdbc
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/upslong;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    prefix = "p" * 600
    ka, kb = prefix + "A", prefix + "B"
    b1 = spark.createDataFrame(
        [(ka, "va", 1), (kb, "vb", 2)], "email string, val string, ts_ms long"
    )
    write_upsert_jdbc(b1, keys="email", order_by="ts_ms", url=url,
                      table="longsnap", driver=driver)
    # Update ONLY ka; kb must keep its value (the old truncating cast
    # matched both rows and delete/update hit the wrong one).
    b2 = spark.createDataFrame(
        [(ka, "va2", 3)], "email string, val string, ts_ms long"
    )
    write_upsert_jdbc(b2, keys="email", order_by="ts_ms", url=url,
                      table="longsnap", driver=driver)
    got = {
        (r["email"], r["val"])
        for r in read_jdbc(spark, url, "longsnap", driver=driver).collect()
    }
    assert got == {(ka, "va2"), (kb, "vb")}


def test_upsert_jdbc_widens_target_for_longer_later_batch(spark, tmp_path):
    """ADVICE r9: the target's DDL width was frozen at first-batch
    max(staged, varchar_width), so a later batch with a longer key hit
    a hard INSERT truncation error — an availability cliff for the
    streaming query. The sink now ALTER-widens the column in place
    (verified against real Derby) before the MERGE."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import write_upsert_jdbc
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/upswide;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    b1 = spark.createDataFrame(
        [("k1", "v1", 1)], "email string, val string, ts_ms long"
    )
    write_upsert_jdbc(b1, keys="email", order_by="ts_ms", url=url,
                      table="widesnap", driver=driver, varchar_width=8)
    long_key, long_val = "k" * 40, "v" * 64
    b2 = spark.createDataFrame(
        [(long_key, long_val, 2), ("k1", "v1b", 3)],
        "email string, val string, ts_ms long",
    )
    write_upsert_jdbc(b2, keys="email", order_by="ts_ms", url=url,
                      table="widesnap", driver=driver, varchar_width=8)
    got = {
        (r["email"], r["val"])
        for r in read_jdbc(spark, url, "widesnap", driver=driver).collect()
    }
    assert got == {("k1", "v1b"), (long_key, long_val)}


def test_decode_debezium_rejects_meta_column_clash(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    df = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError, match="ts_ms"):
        decode_debezium(df, "id int, ts_ms long")


def test_decode_logical_message_tombstones_and_truncated_payload(spark):
    """Review r7: null Kafka values (tombstones) are dropped, and a
    truncated/garbage base64 content — which unbase64 decodes
    best-effort without erroring — is quarantined, not emitted as a
    clean all-null row."""
    import base64
    import json

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_logical_message

    good_doc = base64.b64encode(json.dumps(
        {"order_id": 7, "client_name": "ann", "table_name": "t", "pizzas": "[]"}
    ).encode()).decode()
    good = json.dumps({"op": "m", "ts_ms": 1,
                       "source": {"ts_ms": 1, "txId": 1, "lsn": 1},
                       "message": {"prefix": "orders", "content": good_doc}})
    truncated = json.dumps({"op": "m", "ts_ms": 2,
                            "source": {"ts_ms": 2, "txId": 2, "lsn": 2},
                            "message": {"prefix": "orders", "content": good_doc[:10]}})
    df = spark.createDataFrame([(good,), (truncated,), (None,)], "value string")
    out = decode_logical_message(df, lenient=True, drop_tombstones=True).collect()
    assert len(out) == 2  # tombstone dropped when opted in
    by_tx = {r["txId"]: r for r in out}
    assert by_tx[1]["order_id"] == 7 and by_tx[1]["_corrupt_record"] is None
    assert by_tx[2]["_corrupt_record"] is not None  # truncated -> quarantined
    # ADVICE r9: the unset default behaves as False but WARNS at plan
    # time — the flag's default flipped twice across releases, so the
    # decoder names the choice instead of making it silently.
    import pytest

    with pytest.warns(UserWarning, match="drop_tombstones"):
        dflt = decode_logical_message(df, lenient=True).collect()
    assert len(dflt) == 3
    assert sum(1 for r in dflt if r["txId"] is None and r["order_id"] is None) == 1


def test_sessionize_drops_null_timestamps(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(1, None), (1, None), (1, 1000), (1, 2_000_000)],
        "user_id long, ts_ms long",
    )
    rows = sessionize(df, gap="30 minutes").collect()
    assert len(rows) == 2  # NULL-ts rows dropped, no phantom sessions
    assert {r["session_seq"] for r in rows} == {1, 2}
