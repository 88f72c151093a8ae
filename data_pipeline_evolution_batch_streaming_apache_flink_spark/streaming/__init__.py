"""Stateful streaming operators (SURVEY §2.4 J5/J7, §2.8).

Two constructs the reference needs that Structured Streaming lacks as
built-ins:

- :func:`streaming_asof_join` — the event-time temporal join of scenario 6
  (``JOIN dim FOR SYSTEM_TIME AS OF fact.event_time ON key``, reference
  flink-applications/06-flink-cdc-temporal-join.json:30). Versioned dim
  state per key; facts buffer until the watermark passes their event time
  (emission gated exactly like Flink's temporal join, README.md:526-534).
- :func:`txid_complete_transactions` — the transaction-consistency pattern
  described at reference README.md:547-559: hold CDC events keyed by
  Debezium ``txId`` and release them only when the whole transaction has
  arrived.

Both are ``applyInPandasWithState`` operators: state lives in the state
store (RocksDB/HDFS-backed at scale, partitioned by key — no driver
state), compute is Arrow-batched. Everything else streaming-shaped
(stream-static lookup joins, windowed aggs, watermarks, upsert sinks) is
native Spark surface — see operators/joins.py, sinks/, tables.py.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ms(v) -> int:
    """pandas timestamp-ish -> epoch millis (truncating)."""
    return pd.Timestamp(v).value // 1_000_000


def _vkey(entry: tuple) -> tuple:
    """None-safe deterministic sort key for a dim version entry
    ``(ts_ms, live, payload_tuple)``: ts, then live (tombstone < live —
    matching the batch operator's __live-leading struct order), then the
    payload with NULLs first per field (Spark sorts struct fields
    nulls-first ascending; ``(v is not None, v)`` reproduces that without
    ever comparing None to a value — ADVICE r1)."""
    ts, live, payload = entry
    return (ts, live, tuple((v is not None, v) for v in payload))


def streaming_asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    fact_ts: str,
    dim_ts: str,
    delay: str = "0 seconds",
    how: str = "left",
    dim_op: str | None = None,
    idle_ttl: str | int | None = None,
) -> DataFrame:
    """Event-time AS-OF join on streaming inputs.

    Semantics match the batch ``operators.joins.asof_join``: each fact row
    joins the latest dim version with ``dim_ts <= fact_ts`` (inclusive) on
    the same key. A fact emits only once the watermark passes its event
    time — at that point no dim version at-or-before it can still arrive,
    so results are final (append mode; no retractions needed).

    ``dim_op`` (CDC changelog dims): a ``d`` event is kept as a TOMBSTONE
    version — facts at-or-after it match nothing until the next live
    version, exactly like the batch operator's ``dim_op`` and Flink's
    temporal join over a deleted key.

    Mechanics: both inputs are aligned onto one changelog, watermarked,
    and grouped by key into ``applyInPandasWithState``. Per-key state is
    (dim version list, pending fact list); an event-time timeout re-fires
    idle keys so buffered facts drain when the watermark advances without
    new data. Old versions are pruned to the single latest one at-or-below
    the emission frontier, bounding state per key. The reference's
    idle-source stall (README.md:526-544) applies: the union's watermark
    is the min across inputs, so an idle input stalls emission — same
    mitigation (heartbeats) as documented there. Rows arriving later than
    the watermark are dropped by Spark before the operator (one-batch-lag
    filter) — the reference's late-data semantics (W6, README.md:268-301).

    ``idle_ttl`` (duration string or millis int, default None = keep
    forever): EVENT-TIME (watermark-clock) idle expiry for whole keys —
    same manual mechanism and semantics as ``tws.asof_join_tws``
    (Spark's built-in state TTL config is ProcessingTime-only, and this
    operator's timeouts are event-time). The state blob carries a
    last-activity event time; with no pending facts, the key's timeout
    is armed at ``last_activity + idle_ttl`` and the firing removes the
    blob once the watermark has passed it. A fact arriving after its key
    expired sees no versions — NULL-pad under ``left``, dropped under
    ``inner`` — exactly "never seen". The clock resets on every input
    for the key, and expiry never fires while facts are buffered. Unlike
    the TWS twin this path EXECUTES on real Spark in this environment
    (no protobuf needed) — the expiry semantics are integration-tested
    end-to-end in tests/test_streaming.py.
    """
    keys = [key] if isinstance(key, str) else list(key)
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import _parse_gap_ms

    ttl_ms = _parse_gap_ms(idle_ttl) if idle_ttl is not None else None
    dim_payload = [c for c in dim.columns if c not in keys and c not in (dim_ts, dim_op)]
    fact_cols = list(fact.columns)

    out_fields = [fact.schema[c] for c in fact_cols] + [
        T.StructField(c, dim.schema[c].dataType, True) for c in dim_payload
    ]
    out_schema = T.StructType(out_fields)

    live = (~F.col(dim_op).isin("d", "D")) if dim_op else F.lit(True)
    f_side = fact.select(
        *keys,
        F.col(fact_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_fact"),
        F.lit(True).alias("__live"),
        *[F.col(c).alias(f"__f_{c}") for c in fact_cols],
        *[F.lit(None).cast(dim.schema[c].dataType).alias(f"__d_{c}") for c in dim_payload],
    )
    d_side = dim.select(
        *keys,
        F.col(dim_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_fact"),
        live.alias("__live"),
        *[F.lit(None).cast(fact.schema[c].dataType).alias(f"__f_{c}") for c in fact_cols],
        *[F.col(c).alias(f"__d_{c}") for c in dim_payload],
    )
    unioned = f_side.unionByName(d_side).withWatermark("__ts", delay)

    inner = how == "inner"
    null_version = tuple(None for _ in dim_payload)

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np

        if state.exists:
            blob = pickle.loads(state.get[0])
            # tolerate pre-r7 2-tuple blobs (no last-activity field)
            dims, facts, last_ms = blob if len(blob) == 3 else (blob[0], blob[1], None)
        else:
            dims, facts, last_ms = [], [], None
        acts = []
        for pdf in pdfs:
            for d in pdf.to_dict(orient="records"):
                ts_ms = _ms(d["__ts"])
                acts.append(ts_ms)
                if d["__is_fact"] == 1:
                    facts.append((ts_ms, tuple(d[f"__f_{c}"] for c in fact_cols)))
                else:
                    dims.append(
                        (ts_ms, bool(d["__live"]), tuple(d[f"__d_{c}"] for c in dim_payload))
                    )
        wm = state.getCurrentWatermarkMs()
        # idle-TTL clock: resets on every input for the key, measured on
        # the event-time axis the watermark follows (max(wm) keeps a key
        # that just received a straggler from being instantly expirable)
        if acts:
            last_ms = max(acts + [wm] + ([last_ms] if last_ms is not None else []))
        elif ttl_ms is not None and last_ms is None and (dims or facts):
            # pre-TTL (2-tuple) blob touched by a timeout: start its idle
            # clock NOW so the key joins the TTL regime instead of staying
            # unexpirable; keys with neither input nor an armed timeout
            # remain unreachable until input arrives (documented restore
            # semantics of retrofitting idle_ttl onto an old checkpoint)
            last_ms = wm
        # Full (ts, live, image) tie-break, None-safe — same deterministic
        # max-image winner at equal (key, ts) as the batch operator.
        dims.sort(key=_vkey)
        ready = sorted((fx for fx in facts if fx[0] <= wm), key=lambda x: x[0])
        pending = [fx for fx in facts if fx[0] > wm]

        out_rows = []
        if ready:
            # Vectorized merge: one binary search per ready fact over the
            # sorted dim timestamps (hot keys hold many versions — the
            # linear scan this replaces was O(facts x versions)).
            dts = np.fromiter((dv[0] for dv in dims), dtype=np.int64, count=len(dims))
            fts = np.fromiter((fx[0] for fx in ready), dtype=np.int64, count=len(ready))
            idx = np.searchsorted(dts, fts, side="right") - 1
            for (_ts, fvals), i in zip(ready, idx):
                if i < 0 or not dims[i][1]:  # no version yet, or tombstone
                    if inner:
                        continue
                    version = null_version
                else:
                    version = dims[i][2]
                out_rows.append(fvals + version)

        # prune: keep the latest version at-or-below the frontier plus all
        # newer ones — older versions can never match a future fact.
        frontier = min([wm] + [fx[0] for fx in pending])
        older = [i for i, dv in enumerate(dims) if dv[0] <= frontier]
        if len(older) > 1:
            dims = dims[older[-1]:]

        expired = (
            ttl_ms is not None
            and not pending
            and last_ms is not None
            and wm >= last_ms + ttl_ms
        )
        if (pending or dims) and not expired:
            state.update((pickle.dumps((dims, pending, last_ms)),))
            if pending:
                state.setTimeoutTimestamp(max(min(fx[0] for fx in pending), wm + 1))
            elif ttl_ms is not None and last_ms is not None:
                # arm the idle-expiry timeout; the firing re-enters this
                # fn with no input, finds the key idle past its deadline,
                # and removes the whole blob
                state.setTimeoutTimestamp(max(last_ms + ttl_ms, wm + 1))
        else:
            state.remove()

        if out_rows:
            yield pd.DataFrame(out_rows, columns=fact_cols + dim_payload)

    return unioned.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "state binary", "append", GroupStateTimeout.EventTimeTimeout
    )


def txid_complete_transactions(
    df: DataFrame,
    txid_col: str = "txId",
    count_col: str = "event_count",
    timeout: str | int | None = "10 minutes",
) -> DataFrame:
    """Release rows only when their whole transaction has arrived
    (reference README.md:547-559: group CDC events by Debezium txId +
    expected event count, emit complete transactions atomically).

    Keyed by ``txid_col``; every row carries the transaction's expected
    size in ``count_col``. Incomplete transactions are discarded after
    ``timeout`` processing time — a duration string or millis int
    (None = keep waiting forever — unbounded state, the reference's own
    "possibly large state" caveat).
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import _parse_gap_ms

    out_schema = df.schema
    cols = list(df.columns)
    timeout_ms = _parse_gap_ms(timeout) if timeout is not None else None
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    )

    def fn(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pickle.loads(state.get[0]) if state.exists else []
        expected = None
        for pdf in pdfs:
            for d in pdf.to_dict(orient="records"):
                expected = d[count_col]
                rows.append(tuple(d[c] for c in cols))
        if expected is None and rows:
            expected = rows[0][cols.index(count_col)]
        if expected is not None and len(rows) >= expected:
            state.remove()
            yield pd.DataFrame(rows, columns=cols)
        else:
            state.update((pickle.dumps(rows),))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return df.groupBy(txid_col).applyInPandasWithState(
        fn, out_schema, "state binary", "append", timeout_conf
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark_left: str = "10 seconds",
    watermark_right: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join (SURVEY §2.4 J6, streaming
    side) — unlike the as-of join this one IS native Structured
    Streaming surface: watermark both sides, then the identical
    key-equality + time-range predicate as the batch
    :func:`~..operators.joins.interval_join` (which this delegates to,
    so the predicate can never drift between the two).

    The watermarks plus the two-sided time bound are what let Spark
    evict state: each side's buffered rows are dropped once the other
    side's watermark passes the farthest instant that could still match
    them (right state lives ~``watermark_left + upper``, left state
    ~``watermark_right + lower``) — bounded state per key however long
    the streams run, exactly Flink's interval-join state contract
    (reference README.md:539). ``how='inner'`` emits as matches arrive;
    ``'left_outer'``/``'right_outer'`` additionally emit null-padded
    rows once the watermark proves no match can arrive (Spark requires
    the time bound for outer stream-stream joins — already present).
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import interval_join

    return interval_join(
        left.withWatermark(left_ts, watermark_left),
        right.withWatermark(right_ts, watermark_right),
        key, left_ts, right_ts, lower, upper, how,
    )


def streaming_rolling_agg(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    val_col: str,
    window_rows: int = 8,
    delay: str = "0 seconds",
    quantize: int = 100,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Flink-style OVER window on a stream: per key, each event emits
    ONE row carrying the aggregate of its trailing ``window_rows``
    events in EVENT-TIME order (``ROWS BETWEEN N-1 PRECEDING AND
    CURRENT ROW``) — the running-feature shape Flink's streaming OVER
    aggregation provides and Spark has no native operator for
    (stream windows in Spark are time-bucketed, not row-bounded).

    Emission is append-mode and FINAL: an event's aggregate fires only
    once the watermark passes its timestamp, at which point no earlier
    event can still arrive, so the trailing window is complete
    (in-order finality instead of Flink's eager emission + no
    retraction — same trade as ``streaming_asof_join``). Ties at equal
    timestamp order by ``tiebreak_cols`` — pass one (an id) whenever
    timestamps can collide, or cross-run order is undefined.

    Values are quantized to exact integers (``floor(v * quantize)``) so
    the sums are reproducible bit-for-bit against the batch window twin
    (``sum`` over a double frame is accumulation-order-dependent; cents
    aren't). NULL values are dropped at the input (document repair with
    ``interpolate_linear`` upstream if needed).

    State per key: the last ``window_rows - 1`` emitted cents plus
    events still above the watermark — bounded by window size + batch
    skew, never by stream length. An event-time timeout re-fires idle
    keys so buffered rows drain when the watermark advances without new
    data (same idle-source caveat as the as-of join).

    Returns the input columns + ``roll_n``, ``roll_sum_cents``,
    ``roll_min_cents``, ``roll_max_cents``.
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    keys = [key] if isinstance(key, str) else list(key)
    cols = list(df.columns)
    out_schema = T.StructType(
        [df.schema[c] for c in cols]
        + [
            T.StructField("roll_n", T.IntegerType(), False),
            T.StructField("roll_sum_cents", T.LongType(), False),
            T.StructField("roll_min_cents", T.LongType(), False),
            T.StructField("roll_max_cents", T.LongType(), False),
        ]
    )
    src = (
        df.where(F.col(val_col).isNotNull())
        .withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withColumn(
            "__cents", F.expr(f"CAST(floor({val_col} * {quantize}) AS BIGINT)")
        )
        .withWatermark("__ts", delay)
    )
    tb = list(tiebreak_cols)

    def fn(key_tuple, pdfs, state: GroupState):
        buf, pending = pickle.loads(state.get[0]) if state.exists else ([], [])
        for pdf in pdfs:
            for r in pdf.to_dict(orient="records"):
                pending.append(
                    (
                        _ms(r["__ts"]),
                        tuple(r[c] for c in tb),
                        int(r["__cents"]),
                        tuple(r[c] for c in cols),
                    )
                )
        wm = state.getCurrentWatermarkMs()
        pending.sort(key=lambda x: (x[0], x[1]))
        ready = [p for p in pending if p[0] <= wm]
        pending = [p for p in pending if p[0] > wm]

        out_rows = []
        for _ts, _tb, cents, row in ready:
            buf.append(cents)
            if len(buf) > window_rows:
                buf.pop(0)
            out_rows.append(
                row + (len(buf), sum(buf), min(buf), max(buf))
            )
        buf = buf[-(window_rows - 1):] if window_rows > 1 else []

        if pending or buf:
            state.update((pickle.dumps((buf, pending)),))
            if pending:
                state.setTimeoutTimestamp(
                    max(min(p[0] for p in pending), wm + 1)
                )
        else:
            state.remove()
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=cols
                + ["roll_n", "roll_sum_cents", "roll_min_cents", "roll_max_cents"],
            )

    return src.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "state binary", "append", GroupStateTimeout.EventTimeTimeout
    )


def streaming_cusum(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    val_col: str,
    ref_cents: int,
    threshold_cents: int,
    slack_cents: int = 0,
    delay: str = "0 seconds",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.cusum``: per-key
    two-sided CUSUM drift scores emitted per event, watermark-final in
    event-time order (same append-only finality trade as
    ``streaming_rolling_agg``).

    Where the batch form uses the prefix-sum closed form, the stream
    keeps the equivalent O(1) recurrence per key — the running prefix
    sums and their running extrema ``(P+, min P+, P-, max P-)`` — so
    state per key is FOUR integers plus the above-watermark buffer:
    bounded by batch skew, never by stream length. Batch parity is
    exact (bigint cents; pinned by test).

    NULL values are dropped at the input (the batch twin passes them
    through unscored; a stream has no place for unscored rows in an
    append sink). An event-time timeout drains buffered rows when the
    watermark advances without new data for the key.

    Returns the input columns + ``cusum_hi``, ``cusum_lo`` (bigint
    cents) and ``alert`` (boolean).
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = list(df.columns)
    out_schema = T.StructType(
        [df.schema[c] for c in cols]
        + [
            T.StructField("cusum_hi", T.LongType(), False),
            T.StructField("cusum_lo", T.LongType(), False),
            T.StructField("alert", T.BooleanType(), False),
        ]
    )
    src = (
        df.where(F.col(val_col).isNotNull())
        .withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withColumn("__cents", F.expr(f"CAST(floor({val_col} * 100) AS BIGINT)"))
        .withWatermark("__ts", delay)
    )
    tb = list(tiebreak_cols)
    d_hi = int(ref_cents) + int(slack_cents)
    d_lo = int(ref_cents) - int(slack_cents)

    def fn(key_tuple, pdfs, state: GroupState):
        if state.exists:
            p_hi, min_p, p_lo, max_p, pending = pickle.loads(state.get[0])
        else:
            p_hi, min_p, p_lo, max_p, pending = 0, 0, 0, 0, []
        for pdf in pdfs:
            for r in pdf.to_dict(orient="records"):
                pending.append(
                    (
                        _ms(r["__ts"]),
                        tuple(r[c] for c in tb),
                        int(r["__cents"]),
                        tuple(r[c] for c in cols),
                    )
                )
        wm = state.getCurrentWatermarkMs()
        pending.sort(key=lambda x: (x[0], x[1]))
        ready = [p for p in pending if p[0] <= wm]
        pending = [p for p in pending if p[0] > wm]

        out_rows = []
        for _ts, _tb, cents, row in ready:
            p_hi += cents - d_hi
            min_p = min(min_p, p_hi)
            p_lo += cents - d_lo
            max_p = max(max_p, p_lo)
            s_hi = p_hi - min_p
            s_lo = max_p - p_lo
            out_rows.append(
                row + (s_hi, s_lo,
                       bool(s_hi >= threshold_cents or s_lo >= threshold_cents))
            )

        if pending or ready or state.exists:
            state.update((pickle.dumps((p_hi, min_p, p_lo, max_p, pending)),))
            if pending:
                state.setTimeoutTimestamp(
                    max(min(p[0] for p in pending), wm + 1)
                )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=cols + ["cusum_hi", "cusum_lo", "alert"]
            )

    return src.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "state binary", "append", GroupStateTimeout.EventTimeTimeout
    )
