"""Gap-based sessionization.

The reference's secondary pipeline (users/sessions clickstream,
``scripts/datagen.py:21-96``, ``scripts/pipeline_evolution.md:1-12``)
counts sessions per user per hour. This operator builds the sessions
themselves from a raw event stream: a new session starts after
``gap`` of inactivity.

Scale shape: ONE shuffle on the user key; the lag flag and the running
session counter are two window passes over the same in-partition sort
(Spark reuses the sort — no second exchange), and the optional rollup
reuses the same hash partitioning. No self-join, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _parse_gap_ms(gap: str | int) -> int:
    if isinstance(gap, int):
        return gap
    qty, unit = gap.split()
    factor = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit.lower()]
    return int(qty) * factor


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    gap: str | int = "30 minutes",
    tiebreak_cols: tuple[str, ...] = (),
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    ``ts_ms_col`` must be epoch-millis (bigint) — callers convert
    timestamps explicitly so the cross-engine semantics stay exact.
    ``tiebreak_cols`` break ordering ties for events sharing a
    timestamp (pass a unique event id for determinism).
    """
    gap_ms = _parse_gap_ms(gap)
    w = Window.partitionBy(user_col).orderBy(ts_ms_col, *tiebreak_cols)
    prev: Column = F.lag(ts_ms_col).over(w)
    flagged = df.withColumn(
        "__new_sess",
        F.when(prev.isNull() | (F.col(ts_ms_col) - prev > gap_ms), 1).otherwise(0),
    )
    return flagged.withColumn(
        out_col,
        F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_sess")


def streaming_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str | None = "10 seconds",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Streaming twin of :func:`sessionize` on Spark's native
    ``session_window``: gap windows are merged in the state store per
    key and a session is emitted once the watermark passes its end
    (append mode) — state is bounded by the watermark, so an unbounded
    clickstream never accumulates closed sessions.

    Boundary semantics MATCH the batch operator at exact-gap ties:
    ``session_window`` merges an event landing exactly at the previous
    window end (merge condition ``next_start <= prev_end``, verified
    empirically — test_sessions pins it), so a new session starts only
    when the inter-event gap is strictly ``> gap``, same as the
    lag-based ``sessionize``.
    """
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    extra = aggs or []
    out = (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), *extra)
    )
    return (
        out.withColumn("session_start", F.col("session.start"))
        .withColumn("session_end", F.col("session.end"))
        .drop("session")
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    session_col: str = "session_seq",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Collapse sessionized events to one row per (user, session):
    event count, start/end millis, plus caller-supplied aggregates.
    Runs on the sessionize() output without re-shuffling (same keys)."""
    extra = aggs or []
    return sessions.groupBy(user_col, session_col).agg(
        F.count("*").alias("n_events"),
        F.min(ts_ms_col).alias("start_ms"),
        F.max(ts_ms_col).alias("end_ms"),
        *extra,
    )

