"""Scenarios 3-5 — CDC streaming: Debezium envelope decode, stream-static
lookup join via a SQL application spec, keyed upsert sink with tombstones.

Run: python examples/02_streaming_cdc.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.app import ApplicationSpec, run_streaming_application
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream
from data_pipeline_evolution_batch_streaming_apache_flink_spark.tables import TableSpec

from pyspark.sql import functions as F


def main() -> None:
    spark = eng.get_spark("example-cdc", cpus=8)
    work = tempfile.mkdtemp(prefix="dpe_example_")

    # replayed Debezium change events (op c/u/d, before/after images)
    events = [
        {"op": "c", "after": {"id": 1, "client_id": 10, "total": 20}, "before": None,
         "source": {"ts_ms": 1000, "txId": 1, "lsn": 1}, "ts_ms": 1000},
        {"op": "u", "after": {"id": 1, "client_id": 20, "total": 25}, "before": {"id": 1, "client_id": 10, "total": 20},
         "source": {"ts_ms": 2000, "txId": 2, "lsn": 2}, "ts_ms": 2000},
        {"op": "c", "after": {"id": 2, "client_id": 10, "total": 7}, "before": None,
         "source": {"ts_ms": 2000, "txId": 3, "lsn": 3}, "ts_ms": 2000},
    ]
    in_dir = os.path.join(work, "cdc")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "events.json"), "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")

    raw = json_file_stream(
        spark, in_dir,
        "before struct<id:int,client_id:int,total:int>, after struct<id:int,client_id:int,total:int>, "
        "op string, ts_ms long, source struct<ts_ms:long,txId:long,lsn:long>",
    ).select(F.to_json(F.struct("*")).alias("value"))
    orders_cdc = decode_debezium(raw, "id int, client_id int, total int")

    clients = spark.createDataFrame([(10, "ann"), (20, "bob")], "client_id int, client_name string")

    spec = ApplicationSpec(
        sources=[TableSpec(name="orders_cdc", primary_key=("id",)), TableSpec(name="clients")],
        statement="""
            SELECT o.id AS order_id, o.total, o.ts_ms, o.op, c.client_name
            FROM orders_cdc o JOIN clients c ON o.client_id = c.client_id
        """,
    )
    sink, q = run_streaming_application(
        spark, spec, dataframes={"orders_cdc": orders_cdc, "clients": clients},
        sink_keys="order_id", sink_order_by=["ts_ms"], op_col="op",
        checkpoint_dir=os.path.join(work, "run"),
    )
    q.awaitTermination(120)
    print("upsert sink state (latest per order, reassignment applied):")
    state_df = sink.current_state(spark)
    state_df.orderBy("order_id").show()

    # smoke oracle: the replayed c/u/c envelopes compact to exactly this
    state = {(r.order_id, r.total, r.client_name) for r in state_df.collect()}
    assert state == {(1, 25, "bob"), (2, 7, "ann")}, state
    print("PASS: upsert sink holds the post-reassignment latest image per order")


if __name__ == "__main__":
    main()
