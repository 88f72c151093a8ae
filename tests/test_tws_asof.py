"""Chainable transformWithStateInPandas as-of join (streaming/tws.py).

The TWS Python state client needs ``google.protobuf``, which this
container does not ship, so the full continuous-query run is gated by a
skip. What still runs everywhere:

- pure-Python unit tests of ``_AsOfProcessor`` (gating, inclusive version
  matching, pruning bound, inner/left, timer drain) against fake
  state/timer objects — the operator's entire decision logic;
- a plan-construction test: the two-join chain must ANALYZE as one
  streaming DataFrame (Spark 4 accepts chained TWS via
  ``eventTimeColumnName`` — verified against the planner; the sibling
  ``applyInPandasWithState`` raises ``Multiple applyInPandasWithStates
  are not supported`` for the same shape, which we pin as a regression
  guard so the two-implementation split stays justified).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming.tws import (
    EMIT_TS,
    _AsOfProcessor,
    asof_join_tws,
)


def _have_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# fakes for the TWS runtime surface the processor touches
# ---------------------------------------------------------------------------
class FakeValueState:
    def __init__(self):
        self.v = None

    def get(self):
        return self.v

    def update(self, t):
        self.v = t

    def clear(self):
        self.v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []
        self.ttl_ms = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        # Mirror real Spark: under timeMode='eventTime' any TTL config
        # throws (StatefulProcessorHandleImpl.validateTTLConfig ->
        # cannotProvideTTLConfigForTimeMode). The operator must NOT pass
        # ttlDurationMs — idle expiry is manual (ADVICE r6, high).
        if ttlDurationMs is not None:
            raise Exception(
                "CANNOT_PROVIDE_TTL_CONFIG_FOR_TIME_MODE: state TTL is "
                "ProcessingTime-only; this query runs in eventTime mode"
            )
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def listTimers(self):
        return list(self.timers)


class FakeTimerValues:
    def __init__(self, wm_ms):
        self.wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self.wm

    def getCurrentProcessingTimeInMs(self):
        return 0


class FakeExpiredTimer:
    def __init__(self, ts):
        self.ts = ts

    def getExpiryTimeInMs(self):
        return self.ts


def _pdf(rows):
    """rows: list of dicts with __ts/__ots/__is_fact/__f_*/__d_* keys."""
    return pd.DataFrame(rows)


def _fact_row(ts_ms, order_id):
    return {
        "__ts": pd.Timestamp(ts_ms, unit="ms"),
        "__ots": pd.Timestamp(ts_ms, unit="ms"),
        "__is_fact": 1,
        "__live": True,
        "__f_order_id": order_id,
        "__f_order_time": pd.Timestamp(ts_ms, unit="ms"),
        "__d_name": None,
    }


def _dim_row(ts_ms, name, live=True):
    return {
        "__ts": pd.Timestamp(ts_ms, unit="ms"),
        "__ots": pd.NaT,
        "__is_fact": 0,
        "__live": live,
        "__f_order_id": None,
        "__f_order_time": None,
        "__d_name": name,
    }


def _mk(gate=True, inner=False):
    p = _AsOfProcessor(["order_id", "order_time"], ["name"], gate, inner)
    p.init(FakeHandle())
    return p


def _run(p, rows, wm_ms):
    out = list(p.handleInputRows((1,), iter([_pdf(rows)]), FakeTimerValues(wm_ms)))
    return pd.concat(out) if out else pd.DataFrame(columns=p.out_cols)


def test_gated_fact_waits_for_watermark_then_matches_version():
    p = _mk(gate=True)
    # dim v1@1000, v2@5000; fact@3000 — watermark still at 0: nothing emits
    out = _run(p, [_dim_row(1000, "v1"), _dim_row(5000, "v2"), _fact_row(3000, 1)], 0)
    assert out.empty
    assert p.handle.timers == [3000]  # armed to drain at the fact's ts
    # watermark passes (timer fires): fact joins v1 (as-of 3000), not v2
    fired = list(
        p.handleExpiredTimer((1,), FakeTimerValues(4000), FakeExpiredTimer(3000))
    )
    got = pd.concat(fired)
    assert list(got["order_id"]) == [1] and list(got["name"]) == ["v1"]
    # emit_ts rides just past the watermark, keeping downstream rows fresh
    assert got[EMIT_TS].iloc[0] == pd.Timestamp(4001, unit="ms")


def test_inclusive_asof_and_left_null_padding():
    p = _mk(gate=True)
    # dim exactly AT the fact ts matches (inclusive); fact before any dim → NULL
    out = _run(p, [_dim_row(2000, "v"), _fact_row(2000, 1), _fact_row(500, 2)], 10_000)
    by_id = {r.order_id: r.name for r in out.itertuples()}
    assert by_id == {1: "v", 2: None}


def test_inner_drops_versionless_facts():
    p = _mk(gate=True, inner=True)
    out = _run(p, [_dim_row(2000, "v"), _fact_row(500, 2), _fact_row(2500, 1)], 10_000)
    assert list(out["order_id"]) == [1]


def test_ungated_fact_emits_immediately_against_state():
    p = _mk(gate=False)
    _run(p, [_dim_row(1000, "v1"), _dim_row(5000, "v2")], 0)  # dims land in state
    out = _run(p, [_fact_row(3000, 7)], 2000)  # wm irrelevant for emission
    assert list(out["order_id"]) == [7] and list(out["name"]) == ["v1"]


def test_same_batch_dims_processed_before_facts():
    p = _mk(gate=False)
    out = _run(p, [_fact_row(3000, 7), _dim_row(1000, "v1")], 2000)
    assert list(out["name"]) == ["v1"]


def test_pruning_keeps_latest_at_or_below_frontier():
    p = _mk(gate=False)
    _run(p, [_dim_row(t, f"v{t}") for t in (1000, 2000, 3000, 9000)], 5000)
    dims, _, _ = p._load()
    # v1000/v2000 can never match a future (post-gate) fact; v3000 is the
    # carried version at the frontier, v9000 is still ahead of it.
    assert [d[2][0] for d in dims] == ["v3000", "v9000"]


def test_gated_pending_fact_blocks_pruning():
    p = _mk(gate=True)
    _run(p, [_dim_row(1000, "a"), _dim_row(2000, "b"), _fact_row(1500, 1)], 0)
    dims, facts, _ = p._load()
    assert len(facts) == 1
    # frontier = pending fact ts (1500): version a must survive to serve it
    assert [d[2][0] for d in dims] == ["a", "b"]


# ---------------------------------------------------------------------------
# plan-level checks (no query start, no protobuf needed)
# ---------------------------------------------------------------------------
def _mini_streams(spark, tmp_path):
    import os

    d = str(tmp_path / "in")
    os.makedirs(d, exist_ok=True)
    env = spark.readStream.schema("table string, data string").json(d)
    orders = env.filter(F.col("table") == "orders").select(
        F.get_json_object("data", "$.id").cast("int").alias("order_id"),
        F.get_json_object("data", "$.client_id").cast("int").alias("client_id"),
        F.get_json_object("data", "$.table_id").cast("int").alias("table_id"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("order_time"),
    )
    clients = env.filter(F.col("table") == "clients").select(
        F.get_json_object("data", "$.id").cast("int").alias("client_id"),
        F.get_json_object("data", "$.name").alias("client_name"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("client_ts"),
    )
    tables = env.filter(F.col("table") == "tables").select(
        F.get_json_object("data", "$.id").cast("int").alias("table_id"),
        F.get_json_object("data", "$.name").alias("table_name"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("table_ts"),
    )
    return orders, clients, tables


def test_two_join_chain_analyzes_as_one_streaming_plan(spark, tmp_path):
    orders, clients, tables = _mini_streams(spark, tmp_path)
    j1 = asof_join_tws(orders, clients, "client_id", "order_time", "client_ts")
    j2 = asof_join_tws(j1, tables, "table_id", "order_time", "table_ts", gate=False)
    assert j2.isStreaming
    cols = set(j2.columns)
    assert {"order_id", "client_name", "table_name", EMIT_TS} <= cols
    # the unsupported-operation check runs at query START: the chained TWS
    # shape must pass it (the APWS twin below is rejected right there).
    # Execution itself needs protobuf, so stop immediately after starting.
    q = (
        j2.writeStream.format("memory")
        .queryName("tws_chain_plan")
        .option("checkpointLocation", str(tmp_path / "ckpt_plan"))
        .trigger(availableNow=True)
        .start()
    )
    q.stop()


def test_apws_still_rejects_chaining(spark, tmp_path):
    """Regression pin: if Spark ever allows chained applyInPandasWithState,
    streaming/__init__.py can drop the foreachBatch fallback — this test
    failing is the signal."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    orders, clients, _ = _mini_streams(spark, tmp_path)
    s = orders.withWatermark("order_time", "0 seconds")

    def passthru(key, pdfs, state):
        yield from pdfs

    schema = "order_id int, client_id int, table_id int, order_time timestamp"
    o1 = s.groupBy("client_id").applyInPandasWithState(
        passthru, schema, "s binary", "append", GroupStateTimeout.NoTimeout
    )
    o2 = (
        o1.withWatermark("order_time", "0 seconds")
        .groupBy("table_id")
        .applyInPandasWithState(
            passthru, schema, "s binary", "append", GroupStateTimeout.NoTimeout
        )
    )
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException, match="Multiple applyInPandasWithState"):
        o2.writeStream.format("memory").queryName("apws_chain_plan").option(
            "checkpointLocation", str(tmp_path / "ckpt_apws")
        ).trigger(availableNow=True).start()


def test_scenario6_tws_chain_four_joins_start(spark, tmp_path):
    """The full scenario-6 chain (UNNEST + 4 TWS as-of joins) passes the
    query-start stateful-operator check as one continuous query."""
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.pizzeria_streaming import (
        ENVELOPE_SCHEMA,
        scenario6_tws_chain,
    )

    d = str(tmp_path / "s6in")
    os.makedirs(d, exist_ok=True)
    env = spark.readStream.schema(ENVELOPE_SCHEMA).json(d)
    out = scenario6_tws_chain(env)
    assert out.isStreaming
    assert {"order_id", "client_name", "table_name", "pizza", "price"} <= set(out.columns)
    q = (
        out.writeStream.format("memory")
        .queryName("s6_tws_plan")
        .option("checkpointLocation", str(tmp_path / "s6ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.stop()


@pytest.mark.skipif(not _have_protobuf(), reason="TWS python worker needs google.protobuf")
def test_chained_asof_end_to_end(spark, tmp_path):
    """Full continuous-query run — executes only where protobuf exists
    (any real Spark 4 cluster; this container lacks it)."""
    import json
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.session import configure_streaming

    configure_streaming(
        spark,
        state_store_provider=(
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    batches = [
        [
            {"table": "clients", "data": json.dumps({"id": 1, "name": "ann", "ts": "2024-03-01 10:00:00"})},
            {"table": "tables", "data": json.dumps({"id": 1, "name": "corner", "ts": "2024-03-01 10:00:00"})},
        ],
        [{"table": "orders", "data": json.dumps({"id": 1, "client_id": 1, "table_id": 1, "ts": "2024-03-01 10:01:00"})}],
        [
            {"table": "clients", "data": json.dumps({"id": 1, "name": "ann2", "ts": "2024-03-01 10:05:00"})},
            {"table": "orders", "data": json.dumps({"id": 2, "client_id": 1, "table_id": 1, "ts": "2024-03-01 10:06:00"})},
        ],
        [
            {"table": t, "data": json.dumps({"id": 999, "client_id": 999, "table_id": 999, "name": "hb", "ts": "2024-03-01 12:00:00"})}
            for t in ("clients", "tables", "orders")
        ],
    ]
    for i, rows in enumerate(batches):
        p = os.path.join(in_dir, f"b{i:02d}.json")
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i * 10,) * 2)

    env = (
        spark.readStream.schema("table string, data string")
        .option("maxFilesPerTrigger", "1")
        .json(in_dir)
    )
    orders = env.filter(F.col("table") == "orders").select(
        F.get_json_object("data", "$.id").cast("int").alias("order_id"),
        F.get_json_object("data", "$.client_id").cast("int").alias("client_id"),
        F.get_json_object("data", "$.table_id").cast("int").alias("table_id"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("order_time"),
    )
    clients = env.filter(F.col("table") == "clients").select(
        F.get_json_object("data", "$.id").cast("int").alias("client_id"),
        F.get_json_object("data", "$.name").alias("client_name"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("client_ts"),
    )
    tables = env.filter(F.col("table") == "tables").select(
        F.get_json_object("data", "$.id").cast("int").alias("table_id"),
        F.get_json_object("data", "$.name").alias("table_name"),
        F.get_json_object("data", "$.ts").cast("timestamp").alias("table_ts"),
    )
    j1 = asof_join_tws(orders, clients, "client_id", "order_time", "client_ts")
    j2 = asof_join_tws(j1, tables, "table_id", "order_time", "table_ts", gate=False)
    q = (
        j2.drop(EMIT_TS)
        .writeStream.format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        r["order_id"]: (r["client_name"], r["table_name"])
        for r in spark.sql("select * from tws_out").collect()
    }
    assert rows == {1: ("ann", "corner"), 2: ("ann2", "corner"), 999: (None, None)}


def test_dim_delete_tombstone_shadows_versions():
    """A CDC delete (live=False) must stop facts at-or-after it from
    matching until the next live version — parity with the batch
    asof_join(dim_op=...) semantics (ADVICE r1, medium)."""
    p = _mk(gate=True)
    out = _run(
        p,
        [
            _dim_row(1000, "v1"),
            _dim_row(3000, "v1", live=False),  # delete carries before-image
            _dim_row(5000, "v2"),
            _fact_row(2000, 1),  # -> v1
            _fact_row(4000, 2),  # -> NULL (tombstoned)
            _fact_row(6000, 3),  # -> v2
        ],
        10_000,
    )
    by_id = {r.order_id: r.name for r in out.itertuples()}
    assert by_id == {1: "v1", 2: None, 3: "v2"}


def test_same_ts_null_payload_sorts_none_safely():
    """Equal-(key, ts) dim duplicates with a NULL payload column must not
    crash the sort (ADVICE r1) and the live max-image wins."""
    p = _mk(gate=True)
    out = _run(
        p,
        [
            _dim_row(1000, None),
            _dim_row(1000, "z"),
            _dim_row(1000, "a"),
            _fact_row(2000, 1),
        ],
        10_000,
    )
    assert list(out["name"]) == ["z"]


def test_idle_ttl_never_uses_builtin_ttl_config():
    """Regression pin (ADVICE r6, high): Spark's built-in state TTL is
    ProcessingTime-only, so passing ttlDurationMs under the eventTime
    mode this operator requires crashes at processor init. FakeHandle
    mirrors that throw — init with idle_ttl set must NOT trip it."""
    p = _AsOfProcessor(["order_id", "order_time"], ["name"], True, False, 60_000)
    p.init(FakeHandle())  # would raise if ttlDurationMs were passed
    assert p.ttl_ms == 60_000


def test_idle_ttl_registers_expiry_timer_and_clears_idle_key():
    """Manual event-time idle expiry: input arms a timer at
    last_activity + ttl; once the watermark passes it and no facts are
    buffered, the fired timer drops the whole blob."""
    p = _AsOfProcessor(["order_id", "order_time"], ["name"], True, False, 60_000)
    p.init(FakeHandle())
    # dim lands at wm=5000 -> last_activity = max(5000, 1000) = 5000
    _run(p, [_dim_row(1000, "v1")], 5000)
    assert p.state.get() is not None
    assert p.handle.timers == [65_000]  # expiry at last_activity + ttl
    # timer fires before the deadline passes (stale timer): no-op
    list(p.handleExpiredTimer((1,), FakeTimerValues(30_000), FakeExpiredTimer(30_000)))
    assert p.state.get() is not None
    # fresh activity resets the clock and replaces the timer
    _run(p, [_dim_row(40_000, "v2")], 50_000)
    assert p.handle.timers == [110_000]
    # watermark passes the deadline: key expires wholesale
    list(p.handleExpiredTimer((1,), FakeTimerValues(110_000), FakeExpiredTimer(110_000)))
    assert p.state.get() is None
    assert p.handle.timers == []

    # late fact after expiry: left -> NULL-padded, exactly "never seen"
    out = _run(p, [_fact_row(3000, 9)], 200_000)
    assert list(out["order_id"]) == [9] and list(out["name"]) == [None]

    # same under inner: dropped
    pi = _AsOfProcessor(["order_id", "order_time"], ["name"], True, True, 60_000)
    pi.init(FakeHandle())
    _run(pi, [_dim_row(1000, "v1")], 5000)
    list(pi.handleExpiredTimer((1,), FakeTimerValues(70_000), FakeExpiredTimer(65_000)))
    assert pi.state.get() is None
    out = _run(pi, [_fact_row(3000, 9)], 200_000)
    assert out.empty


def test_idle_ttl_spares_key_with_buffered_facts():
    """Expiry never fires while facts remain buffered: the fired timer
    first drains what the watermark allows, and keeps the key if
    anything is still pending."""
    p = _AsOfProcessor(["order_id", "order_time"], ["name"], True, False, 60_000)
    p.init(FakeHandle())
    # fact@100_000 buffered (wm=0); dim v1@1000 in state
    _run(p, [_dim_row(1000, "v1"), _fact_row(100_000, 1)], 0)
    # wm jumps far past last_activity + ttl, but the fact is not yet
    # passable (wm < 100_000): key must survive
    fired = list(
        p.handleExpiredTimer((1,), FakeTimerValues(99_000), FakeExpiredTimer(60_000 + 100_000))
    )
    assert fired == []
    assert p.state.get() is not None
    # once the watermark passes the fact, it drains WITH its version...
    fired = list(
        p.handleExpiredTimer((1,), FakeTimerValues(400_000), FakeExpiredTimer(100_001))
    )
    got = pd.concat(fired)
    assert list(got["order_id"]) == [1] and list(got["name"]) == ["v1"]
    # ...and the same firing then observes an expired, fact-free key
    assert p.state.get() is None


def test_no_ttl_means_no_expiry_timer():
    p = _mk(gate=True)
    _run(p, [_dim_row(1000, "v1")], 5000)
    assert p.handle.timers == []  # no pending facts, no ttl -> no timers


def test_idle_ttl_duration_string_parses():
    """asof_join_tws accepts a duration string for idle_ttl (parsed by
    the shared sessions._parse_gap_ms)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import _parse_gap_ms

    assert _parse_gap_ms("10 minutes") == 600_000
    assert _parse_gap_ms(1234) == 1234


# ---------------------------------------------------------------------------
# property: random batching/watermark schedules vs a literal batch as-of
# ---------------------------------------------------------------------------
def test_processor_matches_batch_asof_under_random_schedules():
    """Drive the gated processor through randomized arrival orders,
    batch splits, and watermark advances, dropping late rows (ts <= wm
    at arrival) exactly like Spark's pre-operator watermark filter does
    — the processor's input contract — then drain with a far-future
    timer. The emitted (fact, dim-version) assignment must equal the
    literal batch as-of reference OVER THE FED ROWS for every schedule
    — the invariant today's idle-expiry rewrite must preserve."""
    import random as _random

    for trial in range(25):
        rng = _random.Random(1000 + trial)
        n_dims = rng.randint(0, 8)
        n_facts = rng.randint(1, 10)
        dims = [(rng.randrange(0, 100) * 1000, f"v{i}") for i in range(n_dims)]
        facts = [(rng.randrange(0, 100) * 1000, i) for i in range(n_facts)]
        events = [("d", ts, name) for ts, name in dims] + [
            ("f", ts, fid) for ts, fid in facts
        ]
        # bounded-disorder arrival: sort by ts, then locally shuffle
        events.sort(key=lambda e: e[1])
        for i in range(0, len(events), 3):
            chunk = events[i : i + 3]
            rng.shuffle(chunk)
            events[i : i + 3] = chunk

        p = _mk(gate=True)
        out_rows = []
        fed_dims, fed_facts = [], []
        seen_max = 0
        i = 0
        while i < len(events):
            k = rng.randint(1, 3)
            batch = events[i : i + k]
            i += k
            wm = max(0, seen_max - 30_000)  # watermark delay 30s
            seen_max = max([seen_max] + [e[1] for e in batch])
            # Spark's watermark filter drops late rows BEFORE the
            # operator; chunk-shuffle bounds position (not time)
            # displacement, so genuinely late events can occur here
            kept = [e for e in batch if e[1] > wm]
            if not kept:
                continue
            for kind, ts, payload in kept:
                (fed_dims if kind == "d" else fed_facts).append((ts, payload))
            rows = [
                _dim_row(ts, name) if kind == "d" else _fact_row(ts, fid)
                for kind, ts, fid_or_name in kept
                for name, fid in [(fid_or_name, fid_or_name)]
            ]
            out_rows.append(_run(p, rows, wm))
        # drain everything still buffered
        fired = list(
            p.handleExpiredTimer((1,), FakeTimerValues(10_000_000), FakeExpiredTimer(0))
        )
        frames = [df for df in out_rows if len(df)] + [f for f in fired if len(f)]
        got = pd.concat(frames) if frames else pd.DataFrame(columns=p.out_cols)
        emitted = sorted(
            (int(r.order_id), r.name if isinstance(r.name, str) else None)
            for r in got.itertuples()
        )
        # literal reference OVER FED ROWS: latest fed dim at-or-before
        # each fed fact ts, with the processor's deterministic same-ts
        # tie-break (max payload wins)
        ref = []
        for fts, fid in fed_facts:
            best = None
            for dts, name in sorted(fed_dims):
                if dts <= fts:
                    best = name
                else:
                    break
            ref.append((fid, best))
        assert emitted == sorted(ref), f"trial {trial}: {emitted} != {sorted(ref)}"
