"""Scenario-6 streaming throughput at volume: drive the incremental
temporal-enrichment engine with a generated CDC stream (dim churn +
orders) and report events/second end-to-end.

The generator is Spark-side (range -> to_json, no driver loops); each
logical batch lands as its own file with increasing mtimes so the file
source replays them as ordered micro-batches.

Usage: python tools/stream_bench.py [n_orders] [n_batches] [--restart]
       python tools/stream_bench.py N B --rocksdb [--idle-ttl=D] [--hot-pct=P]
Prints one JSON line. ``--hot-pct=P`` routes P% of facts onto ONE key
(Zipfian-CDC skew axis, VERDICT r8 #7).

``--restart`` (VERDICT r4 item 4) runs the SAME input twice: once
straight through (the baseline), once with an induced mid-stream kill —
the first query runs with a processingTime trigger and is stopped as
soon as a few micro-batches have applied (possibly mid-epoch), then a
FRESH engine instance over the same base_dir resumes from the
checkpoint with availableNow. Exactly-once evidence: the two runs'
output digests (order-insensitive table_digest over every output
column) must be identical, and the restarted run's output must hold
exactly one row per order. Result JSON gains ``restart_*`` fields.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.pizzeria_streaming import (
    ENVELOPE_SCHEMA,
    scenario6_engine,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream

N_CLIENTS, N_TABLES, N_ASSIGN, N_PIZZAS = 1000, 100, 5000, 100
BASE_TS = "2024-03-01 10:00:00"


def _fmt(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def _env(table: str, data_col) -> F.Column:
    return F.to_json(F.struct(F.lit(table).alias("table"), F.lit("c").alias("op"), data_col.alias("data")))


def _ts(offset_sec):
    return _fmt(F.lit(BASE_TS).cast("timestamp") + F.make_interval(secs=offset_sec))


def gen_dims(spark):
    c = spark.range(1, N_CLIENTS + 1).select(_env("clients", F.to_json(F.struct(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("client_"), F.col("id")).alias("name"),
        _ts(F.lit(0)).alias("event_time")))).alias("value"))
    t = spark.range(1, N_TABLES + 1).select(_env("tables", F.to_json(F.struct(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("table_"), F.col("id")).alias("name"),
        _ts(F.lit(0)).alias("event_time")))).alias("value"))
    a = spark.range(1, N_ASSIGN + 1).select(_env("table_assignment", F.to_json(F.struct(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % N_CLIENTS + 1).cast("int").alias("client_id"),
        (F.col("id") % N_TABLES + 1).cast("int").alias("table_id"),
        _ts(F.lit(0)).alias("event_time")))).alias("value"))
    p = spark.range(1, N_PIZZAS + 1).select(_env("pizzas", F.to_json(F.struct(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("pizza_"), F.col("id")).alias("name"),
        (F.col("id") % 9 + 4).cast("int").alias("price"),
        _ts(F.lit(0)).alias("event_time")))).alias("value"))
    return c.union(t).union(a).union(p)


def gen_orders(spark, start: int, count: int):
    # event times strictly increase across the id range so each batch's
    # heartbeat-free watermark advances naturally
    return spark.range(start, start + count).select(_env("orders", F.to_json(F.struct(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % N_ASSIGN + 1).cast("int").alias("table_assignment_id"),
        _ts(F.lit(1) + (F.col("id") - start) % 3600).alias("order_time"),
        F.array(
            (F.col("id") % N_PIZZAS + 1).cast("int"),
            (F.col("id") * 7 % N_PIZZAS + 1).cast("int"),
            (F.col("id") * 13 % N_PIZZAS + 1).cast("int"),
        ).alias("pizzas"),
        _ts(F.lit(1) + (F.col("id") - start) % 3600).alias("event_time")))).alias("value"))


def gen_heartbeats(spark):
    rows = []
    hb = "2024-03-02 00:00:00"
    for t in ("clients", "tables", "table_assignment", "pizzas", "orders"):
        rows.append((json.dumps({"table": t, "op": "c", "data": json.dumps({"id": 999999, "event_time": hb})}),))
    return spark.createDataFrame(rows, "value string")


def write_batch(df, in_dir: str, i: int) -> int:
    tmp = tempfile.mkdtemp(prefix="sb_")
    df.coalesce(8).write.mode("overwrite").text(tmp)
    n = 0
    for j, part in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*")))):
        dst = os.path.join(in_dir, f"b{i:03d}_{j}.txt")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
        n += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def _digest(df):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    return tuple(table_digest(df, df.columns).collect()[0])


def _run_with_restart(spark, root, in_dir):
    """Kill the streaming query after a few applied micro-batches, then
    resume from the checkpoint with a fresh engine instance."""
    base = os.path.join(root, "engine_restart")
    engine = scenario6_engine(spark, base)
    stream = json_file_stream(spark, in_dir, ENVELOPE_SCHEMA, max_files_per_trigger=8)
    q = (
        stream.writeStream.foreachBatch(engine.foreach_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    killed_after = None
    t0 = time.time()
    while time.time() - t0 < 300:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 2:
            killed_after = p["batchId"]
            break
        time.sleep(0.2)
    q.stop()  # interrupt — the in-flight epoch may be partially applied
    q.awaitTermination(60)

    resumed = scenario6_engine(spark, base)  # "new process" over same state
    stream2 = json_file_stream(spark, in_dir, ENVELOPE_SCHEMA, max_files_per_trigger=8)
    q2 = (
        stream2.writeStream.foreachBatch(resumed.foreach_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(600)
    return resumed, killed_after


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _gen_stateful_inputs(spark, fact_dir, dim_dir, n_orders, n_batches, hot_pct=None):
    """Plain-JSON fact/dim streams for the state-store-backed as-of leg:
    orders (order_id, client_id, ts) in ``n_batches`` mtime-ordered
    files, a dim snapshot plus 10%-churn rename batches, and trailing
    far-future heartbeats that flush the last gated facts.

    ``hot_pct`` (VERDICT r8 #7): route that percentage of facts onto
    ONE key (client_id 1) — the Zipfian-CDC shape. All hot-key events
    funnel through a single state-grouping task, the worst case for
    the per-key stateful operator; the run must still drain with
    digest parity, it just shows the skew ceiling in events/s."""
    os.makedirs(fact_dir)
    os.makedirs(dim_dir)
    per = n_orders // n_batches
    snap = spark.range(N_CLIENTS).select(
        F.to_json(F.struct(
            F.col("id").cast("int").alias("client_id"),
            F.concat(F.lit("v0_"), F.col("id")).alias("name"),
            _fmt(F.lit(BASE_TS).cast("timestamp")).alias("dts"),
        )).alias("value")
    )
    write_batch(snap, dim_dir, 0)
    for b in range(1, n_batches + 1):
        churn = spark.range(N_CLIENTS // 10).select(
            F.to_json(F.struct(
                (F.col("id") * 10 % N_CLIENTS).cast("int").alias("client_id"),
                F.concat(F.lit(f"v{b}_"), F.col("id")).alias("name"),
                _ts(F.lit(b * 100 + 10)).alias("dts"),
            )).alias("value")
        )
        write_batch(churn, dim_dir, b)
        key_expr = (F.col("id") % N_CLIENTS).cast("int")
        if hot_pct:
            key_expr = (
                F.when(F.col("id") % 100 < hot_pct, F.lit(1))
                .otherwise(key_expr)
                .cast("int")
            )
        facts = spark.range((b - 1) * per + 1, b * per + 1).select(
            F.to_json(F.struct(
                F.col("id").alias("order_id"),
                key_expr.alias("client_id"),
                _ts(F.lit(b * 100 + 50)).alias("ts"),
            )).alias("value")
        )
        write_batch(facts, fact_dir, b)
    hb_f = spark.createDataFrame(
        [(json.dumps({"order_id": -1, "client_id": -1, "ts": "2030-01-01 00:00:00"}),)],
        "value string",
    )
    hb_d = spark.createDataFrame(
        [(json.dumps({"client_id": -1, "name": "hb", "dts": "2030-01-01 00:00:00"}),)],
        "value string",
    )
    write_batch(hb_f, fact_dir, n_batches + 1)
    write_batch(hb_d, dim_dir, n_batches + 1)
    return n_orders + N_CLIENTS + n_batches * (N_CLIENTS // 10) + 2


def _run_rocksdb_stateful(spark, root, n_orders, n_batches, idle_ttl=None, hot_pct=None):
    """Scenario-6's state-store-backed leg (streaming as-of enrichment,
    applyInPandasWithState) at stress scale UNDER RocksDB with changelog
    checkpointing: straight run for throughput + mid-stream-kill restart
    for exactly-once recovery evidence (VERDICT r5 item 3). The
    foreachBatch engine keeps its own state off the store, so this is
    the leg where the provider actually executes.

    ``idle_ttl`` (VERDICT r7 #6) drives the manual event-time idle-key
    expiry path at stress scale: with a TTL far above the batch spacing
    the mid-stream output is unchanged, and the trailing far-future
    heartbeat advances the watermark past every key's idle horizon, so
    ALL keys take the timer-expiry path before the run drains —
    exercised under RocksDB, digest-compared against the kill/restart
    run like the base leg."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming import streaming_asof_join

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true"
    )
    fact_dir, dim_dir = os.path.join(root, "rs_fact"), os.path.join(root, "rs_dim")
    n_events = _gen_stateful_inputs(
        spark, fact_dir, dim_dir, n_orders, n_batches, hot_pct=hot_pct
    )

    def joined():
        return streaming_asof_join(
            json_file_stream(spark, fact_dir, "order_id long, client_id int, ts timestamp",
                             max_files_per_trigger=8),
            json_file_stream(spark, dim_dir, "client_id int, name string, dts timestamp",
                             max_files_per_trigger=8),
            key="client_id", fact_ts="ts", dim_ts="dts", how="left",
            idle_ttl=idle_ttl,
        )

    def out_df(out):
        return spark.read.parquet(out).where(F.col("order_id") >= 0)

    # straight run: throughput baseline
    out1 = os.path.join(root, "rs_out1")
    t0 = time.time()
    q = (
        joined().writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", os.path.join(root, "rs_ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    wall = time.time() - t0
    base = out_df(out1)
    base_digest = _digest(base)

    # kill mid-stream, resume from the RocksDB changelog checkpoint
    out2 = os.path.join(root, "rs_out2")
    ckpt2 = os.path.join(root, "rs_ckpt2")
    q2 = (
        joined().writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(processingTime="1 seconds")
        .start()
    )
    killed_after = None
    t1 = time.time()
    while time.time() - t1 < 600:
        p = q2.lastProgress
        if p is not None and p["batchId"] >= 2:
            killed_after = p["batchId"]
            break
        time.sleep(0.2)
    q2.stop()
    q2.awaitTermination(60)
    t2 = time.time()
    q3 = (
        joined().writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(1800)
    recovery_wall = time.time() - t2
    restarted = out_df(out2)
    result = {
        "state_store": "rocksdb+changelog",
        "idle_ttl": idle_ttl,
        "hot_key_pct": hot_pct,
        "n_orders": n_orders,
        "n_events": n_events,
        "n_batches": n_batches,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(n_events / wall),
        "output_rows": base.count(),
        "restart_killed_after_batch": killed_after,
        "restart_recovery_wall_sec": round(recovery_wall, 2),
        "restart_output_rows": restarted.count(),
        "restart_one_row_per_order": restarted.count()
        == restarted.select("order_id").distinct().count(),
        "exactly_once_digest_match": _digest(restarted) == base_digest,
        "restart_was_mid_stream_kill": killed_after is not None,
    }
    if killed_after is None:
        print(
            "WARNING: streaming query drained before the kill point — "
            "raise n_orders/n_batches",
            file=sys.stderr,
        )
    print(json.dumps(result))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    restart = "--restart" in sys.argv
    rocksdb = "--rocksdb" in sys.argv
    idle_ttl = None
    hot_pct = None
    for a in sys.argv[1:]:
        if a.startswith("--idle-ttl="):
            idle_ttl = a.split("=", 1)[1]
        if a.startswith("--hot-pct="):
            hot_pct = int(a.split("=", 1)[1])
    if rocksdb:
        n_orders = int(args[0]) if args else 100_000
        n_batches = int(args[1]) if len(args) > 1 else 8
        spark = get_spark("stream-bench-rocksdb", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        spark.sparkContext.setLogLevel("ERROR")
        root = tempfile.mkdtemp(prefix="dpe_sbench_rdb_")
        try:
            _run_rocksdb_stateful(
                spark, root, n_orders, n_batches, idle_ttl=idle_ttl, hot_pct=hot_pct
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return
    n_orders = int(args[0]) if args else 100_000
    n_batches = int(args[1]) if len(args) > 1 else 4
    spark = get_spark("stream-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dpe_sbench_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    write_batch(gen_dims(spark), in_dir, 0)
    per = n_orders // n_batches
    for b in range(n_batches):
        write_batch(gen_orders(spark, b * per + 1, per), in_dir, b + 1)
    write_batch(gen_heartbeats(spark), in_dir, n_batches + 1)
    n_events = n_orders + N_CLIENTS + N_TABLES + N_ASSIGN + N_PIZZAS + 5

    engine = scenario6_engine(spark, os.path.join(root, "engine"))
    # several files per trigger: one micro-batch per logical batch, not per part file
    stream = json_file_stream(spark, in_dir, ENVELOPE_SCHEMA, max_files_per_trigger=8)
    t0 = time.time()
    engine.run_available_now(stream)
    wall = time.time() - t0
    out_rows = engine.output().count()

    result = {
        "n_orders": n_orders,
        "n_events": n_events,
        "n_batches": n_batches,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(n_events / wall),
        "output_rows": out_rows,
    }

    if restart:
        t1 = time.time()
        resumed, killed_after = _run_with_restart(spark, root, in_dir)
        r_wall = time.time() - t1
        r_out = resumed.output()
        base_digest = _digest(engine.output())
        restart_digest = _digest(r_out)
        n_rows = r_out.count()
        n_orders_out = r_out.select("order_id").distinct().count()
        result.update({
            "restart_wall_sec": round(r_wall, 2),
            "restart_killed_after_batch": killed_after,
            "restart_output_rows": n_rows,
            "restart_distinct_orders": n_orders_out,
            "restart_one_row_per_order": n_rows == n_orders_out,
            "exactly_once_digest_match": base_digest == restart_digest,
            # a digest match only evidences exactly-once RECOVERY if the
            # first run was actually interrupted mid-stream; with a tiny
            # n_orders/n_batches the query can drain before batchId>=2
            # and the "restart" degenerates to a clean rerun
            "restart_was_mid_stream_kill": killed_after is not None,
        })
        if killed_after is None:
            print(
                "WARNING: streaming query drained before the kill point — "
                "exactly_once_digest_match is NOT mid-stream-kill evidence "
                "for this run; raise n_orders/n_batches",
                file=sys.stderr,
            )

    print(json.dumps(result))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
