"""Replay of a vendored, captured-style Debezium-Postgres fixture
(tests/fixtures/debezium_orders_capture.jsonl) through the full CDC path:
JsonConverter schemas.enable=true envelopes → decode_debezium →
precise-mode decimal decode → tombstone-aware temporal join.

The fixture pins the wire details a synthesized envelope can miss:
snapshot reads (op 'r', snapshot first/last, ``sequence`` = [null, lsn]),
streaming ``sequence`` as a stringified two-LSN JSON array, REPLICA
IDENTITY FULL before-images, delete + post-delete Kafka tombstone, and
``org.apache.kafka.connect.data.Decimal`` base64 unscaled-bytes numerics
(positive, negative, and NULL)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import debezium_decimal
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import asof_join
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "debezium_orders_capture.jsonl")
ROW_SCHEMA = "id int, client_name string, table_id int, price string, discount string"
T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def capture(spark):
    with open(FIXTURE) as f:
        recs = [json.loads(line) for line in f]
    df = spark.createDataFrame([(r["key"], r["value"]) for r in recs], "key string, value string")
    return decode_debezium(df, ROW_SCHEMA).withColumn(
        "price", debezium_decimal("price", 2)
    ).withColumn("discount", debezium_decimal("discount", 2))


def test_capture_envelope_fidelity(capture):
    rows = sorted(capture.collect(), key=lambda r: (r["lsn"], r["id"]))
    # tombstone dropped: 6 fixture records -> 5 change events
    assert [r["op"] for r in rows] == ["r", "r", "c", "u", "d"]
    snap1, snap2, ins, upd, dele = rows
    # snapshot reads surface the after image with the snapshot lsn
    assert (snap1["id"], snap1["client_name"], snap1["lsn"]) == (1, "mark", 36972496)
    assert (snap2["id"], snap2["client_name"]) == (2, "elena")
    # REPLICA IDENTITY FULL: the delete carries the full before image
    assert (dele["id"], dele["client_name"], dele["table_id"]) == (2, "elena", 5)
    assert dele["txId"] == 764 and dele["lsn"] == 36972800
    # event time from source.ts_ms, not envelope ts_ms (+3 in the fixture)
    assert upd["event_time"].timestamp() * 1000 == T0 + 2000


def test_capture_sequence_encoding(spark):
    """``source.sequence`` is a STRING holding a JSON array of two LSN
    strings ([null, lsn] during snapshot) — pin that we can extract the
    commit LSN from it without schema changes."""
    with open(FIXTURE) as f:
        recs = [json.loads(line) for line in f if json.loads(line)["value"]]
    df = spark.createDataFrame([(r["value"],) for r in recs], "value string")
    seqs = (
        df.select(
            F.from_json(F.get_json_object("value", "$.payload.source.sequence"), "array<string>").alias("seq"),
            F.get_json_object("value", "$.payload.source.snapshot").alias("snap"),
        )
        .select(F.element_at("seq", 1).alias("lo"), F.element_at("seq", 2).alias("hi"), "snap")
        .collect()
    )
    for r in seqs:
        assert r["hi"] is not None  # commit LSN always present
        if r["snap"] in ("first", "last", "true"):
            assert r["lo"] is None  # snapshot events: no previous LSN
        else:
            assert int(r["lo"]) < int(r["hi"])


def test_capture_decimal_handling(capture):
    from decimal import Decimal

    by_op = {(r["op"], r["id"]): r for r in capture.collect()}
    assert by_op[("r", 1)]["price"] == Decimal("12.50")
    assert by_op[("r", 2)]["price"] == Decimal("9.00")
    assert by_op[("c", 3)]["price"] == Decimal("5.00")
    assert by_op[("u", 1)]["price"] == Decimal("13.99")
    # negative unscaled bytes (two's complement), single- and two-byte
    assert by_op[("u", 1)]["discount"] == Decimal("-0.25")
    assert by_op[("c", 3)]["discount"] == Decimal("-1.25")
    # NULL decimal passes through
    assert by_op[("r", 1)]["discount"] is None


def test_decimal_over_8_bytes_decodes_null_not_garbage(spark):
    """conv() wraps past 8 bytes, so a 9+-byte unscaled payload must
    decode to NULL — never a silently wrapped value."""
    import base64

    from decimal import Decimal

    v_big = 10 ** 20  # 9 bytes
    b9 = base64.b64encode(v_big.to_bytes(9, "big", signed=True)).decode()
    ok = base64.b64encode((1250).to_bytes(2, "big", signed=True)).decode()
    df = spark.createDataFrame([(b9,), (ok,), (None,)], "b string")
    got = [r[0] for r in df.select(debezium_decimal("b", 2)).collect()]
    assert got == [None, Decimal("12.50"), None]


def test_schema_drift_tolerance(spark):
    """Upstream schema drift must not break the decoder: a NEW upstream
    column (added after our row schema was written) is ignored, and a
    column MISSING from an old event decodes as NULL — the from_json
    contract that makes rolling CDC schema changes safe."""
    import json as _json

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import decode_debezium

    src = {"version": "2.5.0.Final", "connector": "postgresql", "name": "my_pg",
           "ts_ms": T0, "snapshot": "false", "db": "d", "sequence": None,
           "schema": "public", "table": "orders", "txId": 1, "lsn": 10, "xmin": None}
    events = [
        # new upstream column `extra` our schema does not know
        _json.dumps({"before": None,
                     "after": {"id": 1, "client_name": "ann", "extra": "surprise"},
                     "source": src, "op": "c", "ts_ms": T0}),
        # old event missing `client_name`
        _json.dumps({"before": None, "after": {"id": 2},
                     "source": {**src, "txId": 2}, "op": "c", "ts_ms": T0}),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    out = {r["id"]: r for r in decode_debezium(df, "id int, client_name string").collect()}
    assert out[1]["client_name"] == "ann" and "extra" not in out[1].asDict()
    assert out[2]["client_name"] is None


def test_capture_replay_through_temporal_join(spark, capture):
    """The decoded changelog drives the tombstone-aware AS-OF join exactly
    like a live CDC dim table: facts see the version valid at their event
    time, and facts after the delete see NULL (key 2 is gone)."""
    dim = capture.select(
        "id", "client_name", "price", "op", F.col("event_time").alias("dim_ts")
    )
    facts = spark.createDataFrame(
        [
            (101, 1, T0 + 500),    # before the update -> price 12.50
            (102, 1, T0 + 2500),   # after the update  -> price 13.99
            (103, 2, T0 + 1500),   # before the delete -> elena
            (104, 2, T0 + 3500),   # after the delete  -> tombstoned
            (105, 3, T0 + 1500),   # inserted mid-stream -> paolo
        ],
        "event_id int, id int, fts long",
    ).withColumn("fts", F.timestamp_millis("fts"))
    out = {
        r["event_id"]: r
        for r in asof_join(
            facts, dim, key="id", fact_ts="fts", dim_ts="dim_ts", how="left", dim_op="op"
        ).collect()
    }
    from decimal import Decimal

    assert out[101]["price"] == Decimal("12.50")
    assert out[102]["price"] == Decimal("13.99")
    assert out[103]["client_name"] == "elena"
    assert out[104]["client_name"] is None and out[104]["price"] is None
    assert out[105]["client_name"] == "paolo"
