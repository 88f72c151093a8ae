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

    Rows with a NULL timestamp are dropped — they have no position in
    event order (review r7: NULLs sorted first and each seeded a
    phantom session, shifting every real session_seq for the user).
    Same contract as the CEP operators.
    """
    gap_ms = _parse_gap_ms(gap)
    df = df.filter(F.col(ts_ms_col).isNotNull())
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



def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (the cohort), tracked across subsequent periods — the
    standard activation/retention readout of an event stream.

    Two hash aggregations, no window, no self-join of the fact table:
    (1) first activity per user (map-side-combined min); (2) the fact
    rows REJOIN the per-user cohort on the user key (broadcast is wrong
    at scale — user count grows with the corpus) and distinct users
    count per (cohort_period, periods_since). ``retained_pct`` is exact
    integer basis points against the cohort's size.

    ``period``: 'week' | 'month' | 'day' (``date_trunc`` units — ANSI,
    both engines). Returns (cohort, periods_since, n_users,
    cohort_size, retained_bp).
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    ts = F.col(ts_col).cast("timestamp")
    firsts = (
        df.groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(F.date_trunc(period, ts)).alias("cohort"))
    )
    per_period = df.select(
        F.col(user_col).alias("__u"), F.date_trunc(period, ts).alias("__p")
    ).distinct()
    if period == "day":
        since = F.datediff(F.col("__p"), F.col("cohort"))
    elif period == "week":
        since = F.floor(F.datediff(F.col("__p"), F.col("cohort")) / 7)
    else:
        since = (F.year("__p") - F.year("cohort")) * 12 + (
            F.month("__p") - F.month("cohort")
        )
    activity = (
        per_period.join(firsts, "__u")
        .groupBy("cohort", since.cast("bigint").alias("periods_since"))
        .agg(F.count_distinct("__u").cast("bigint").alias("n_users"))
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        activity.join(sizes, "cohort")
        .withColumn(
            "retained_bp",
            # floor through the double division (suite determinism rule:
            # DuckDB CAST rounds, Spark truncates — floor agrees everywhere)
            F.floor(F.col("n_users") * 10000 / F.col("cohort_size")).cast("bigint"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences — the path-analysis readout ("after a view, what
    happens next?") and the generator behind funnel simulators and
    next-event baselines.

    One per-key window sort produces each event's successor state
    (``lead``); transitions then collapse in ONE counted shuffle with
    map-side combine. Probabilities are conditioned per source state —
    ``P(next|prev) = n(prev,next) / n(prev,*)`` — each ONE
    micro-rounded double ratio of exact bigints (house determinism
    policy). A key's last event has no successor and is counted in
    ``n_from`` of nothing (standard convention: transitions, not
    states, are the unit).

    NULL states are dropped before sequencing (a null can't name a
    matrix cell); keys with a single event contribute nothing.

    Returns ``(prev_state, next_state, n_trans, n_from, p_micro)`` —
    rows for observed transitions only (absent cells are structural
    zeros).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col), *[F.col(c) for c in tiebreak_cols]
    )
    seq = df.where(F.col(state_col).isNotNull()).select(
        F.col(state_col).alias("prev_state"),
        F.lead(state_col).over(w).alias("next_state"),
    )
    trans = (
        seq.where(F.col("next_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    from_tot = trans.groupBy("prev_state").agg(F.sum("n_trans").alias("n_from"))
    return (
        trans.join(F.broadcast(from_tot), "prev_state")
        .select(
            "prev_state", "next_state",
            F.col("n_trans").cast("long").alias("n_trans"),
            F.col("n_from").cast("long").alias("n_from"),
            F.round(
                F.col("n_trans").cast("double") * F.lit(1000000.0)
                / F.col("n_from").cast("double")
            ).cast("long").alias("p_micro"),
        )
    )
