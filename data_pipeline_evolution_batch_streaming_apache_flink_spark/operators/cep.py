"""Row-pattern recognition (complex event processing).

Flink ships CEP / SQL ``MATCH_RECOGNIZE`` as a headline feature; the
reference's stack advertises it even though none of the six scenarios
uses it (SURVEY §2.7 notes the reference itself contains no OVER()/
pattern SQL). Spark has no native equivalent, so this module provides
the two standard contiguity modes as first-class operators:

- :func:`match_strict` — STRICT contiguity (Flink CEP ``next()``,
  MATCH_RECOGNIZE with no gaps, AFTER MATCH SKIP TO NEXT ROW). Pure
  native window functions: step predicates become boolean columns
  (JVM codegen), a match is a conjunction over ``lead()`` of those
  flags. No Python in the plan, one shuffle on the key.
- :func:`match_pattern` — RELAXED contiguity (Flink CEP
  ``followedBy()``: unrelated events may sit between matched steps),
  greedy earliest-match semantics with AFTER MATCH SKIP PAST LAST ROW
  and an optional ``within`` timeout, exactly like Flink's
  ``Pattern.within()``. Implemented as ``applyInPandas`` per key —
  but the step predicates are still evaluated JVM-side BEFORE the
  shuffle, so the Python stage only scans boolean numpy arrays
  (searchsorted over precomputed true-index lists; no row-at-a-time
  predicate evaluation and no re-parsing of payload columns).

Scale shape: one shuffle on the partition key either way. State per
key in the Python stage is O(events for that key) — the same bound
Flink's CEP operator has for a keyed pattern; hot keys are the
caller's skew concern as with any keyed stateful op.

Greedy earliest-match is *complete*: step candidates are taken as the
earliest admissible event per step, and a later choice for step j-1
only pushes the step-j search window further right, so if the greedy
scan finds no match from a given start, no match from that start
exists. On timeout (``within`` exceeded) the scan restarts from the
event after the failed start; on success it resumes after the last
matched event (skip past last row), so matches never overlap.

The streaming twin (same semantics, watermark-driven, bounded state)
is :func:`..streaming.cep.streaming_match_pattern`.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


Step = tuple[str, "Column | str"]


def _as_col(pred: Column | str) -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def _check_steps(steps: Sequence[Step]) -> list[str]:
    names = [n for n, _ in steps]
    if len(names) != len(set(names)):
        raise ValueError(f"step names must be unique, got {names}")
    if len(names) < 2:
        raise ValueError("a pattern needs at least 2 steps")
    return names


def match_strict(
    df: DataFrame,
    steps: Sequence[Step],
    key_col: str = "user_id",
    order_col: str = "ts_ms",
    id_col: str | None = None,
    within: int | None = None,
) -> DataFrame:
    """All strictly-consecutive matches of ``steps`` per key.

    ``steps`` is ``[(name, predicate), ...]``; a match is ``len(steps)``
    consecutive events (in ``(order_col, id_col)`` order within the key)
    where event *j* satisfies predicate *j*. Matches may overlap
    (MATCH_RECOGNIZE ``AFTER MATCH SKIP TO NEXT ROW``). ``within``
    bounds ``last.order - first.order`` (same units as ``order_col``).

    Output: one row per match — ``key_col``, then per step
    ``{name}_{order_col}`` and (if ``id_col``) ``{name}_{id_col}``.
    Entirely native: predicates fold into the scan, the leads share one
    window sort, whole-stage codegen end to end.

    Rows with a NULL ``order_col`` are dropped — they have no position
    in event order (same contract as ``match_pattern``, review r7).
    """
    names = _check_steps(steps)
    k = len(steps)
    if within is not None and not isinstance(
        df.schema[order_col].dataType, (T.LongType, T.IntegerType, T.ShortType)
    ):
        raise TypeError(
            f"order_col {order_col!r} must be an integer event-time column "
            f"(epoch millis/micros) when within= is set, got "
            f"{df.schema[order_col].dataType.simpleString()}; cast "
            "timestamps explicitly so cross-engine semantics stay exact"
        )
    df = df.filter(F.col(order_col).isNotNull())
    order_cols = [order_col] + ([id_col] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])

    flagged = df
    for j, (_, pred) in enumerate(steps):
        flagged = flagged.withColumn(f"__p{j}", _as_col(pred).cast("boolean"))

    cond = F.col("__p0")
    for j in range(1, k):
        cond = cond & F.coalesce(F.lead(f"__p{j}", j).over(w), F.lit(False))
    if within is not None:
        cond = cond & (F.lead(order_col, k - 1).over(w) - F.col(order_col) <= within)

    # materialize the leads BEFORE filtering — a lead computed after the
    # filter would look at the next *matching* row, not the next event
    out_cols: list[Column] = [F.col(key_col)]
    out_names: list[str] = [key_col]
    for j, name in enumerate(names):
        src_ts = F.col(order_col) if j == 0 else F.lead(order_col, j).over(w)
        out_cols.append(src_ts.alias(f"{name}_{order_col}"))
        out_names.append(f"{name}_{order_col}")
        if id_col:
            src_id = F.col(id_col) if j == 0 else F.lead(id_col, j).over(w)
            out_cols.append(src_id.alias(f"{name}_{id_col}"))
            out_names.append(f"{name}_{id_col}")
    return (
        flagged.select(*out_cols, cond.alias("__match"))
        .where("__match")
        .select(*out_names)
    )


def _match_events(ts, preds, within, emit):
    """Greedy earliest-match scan over one key's events (already sorted).

    ``preds`` is a list of k sorted int arrays: indices where step j's
    predicate holds. The caller pre-sorts events by (ts, id) — the
    helper itself never needs ids. Returns a list of matches, each a list of k event
    indices. Shared by the batch operator and the streaming twin (which
    additionally needs to know the first index a future match could
    use — returned as the second element).
    """
    import numpy as np

    k = len(preds)
    matches: list[list[int]] = []
    start_ptr = 0  # position in preds[0] of the next start candidate
    scan_pos = 0  # first event index allowed in the next match
    while start_ptr < len(preds[0]):
        s = preds[0][start_ptr]
        if s < scan_pos:
            start_ptr += 1
            continue
        t0 = ts[s]
        cur = s
        picked = [s]
        dead = False
        exhausted = False
        for j in range(1, k):
            nxt = np.searchsorted(preds[j], cur + 1)
            if nxt == len(preds[j]):
                exhausted = True  # no step-j event after cur → none after any later start either
                break
            cand = preds[j][nxt]
            if within is not None and ts[cand] - t0 > within:
                dead = True  # earliest candidate already too late → this start can never match
                break
            cur = cand
            picked.append(cand)
        if exhausted:
            break
        if dead:
            start_ptr += 1
            continue
        matches.append(picked)
        scan_pos = picked[-1] + 1
        start_ptr += 1
        if emit == "first":
            break
    return matches, scan_pos


def match_pattern(
    df: DataFrame,
    steps: Sequence[Step],
    key_col: str = "user_id",
    order_col: str = "ts_ms",
    id_col: str | None = None,
    within: int | None = None,
    emit: str = "all",
) -> DataFrame:
    """Relaxed-contiguity pattern matches per key (Flink CEP
    ``followedBy`` + ``within`` + AFTER MATCH SKIP PAST LAST ROW).

    Events are ordered by ``(order_col, id_col)`` within each key;
    unrelated events may sit between matched steps. Matching is greedy
    earliest-completion (complete — see module docstring): each match
    takes the earliest admissible event per step, emits, and resumes
    after its last event, so matches never overlap. ``within`` bounds
    ``last.order - first.order``; a timed-out start is skipped and the
    scan restarts at the next start candidate. ``emit="first"`` keeps
    only the first match per key (funnel analytics).

    Output: ``key_col``, ``match_seq`` (1-based per key), then per step
    ``{name}_{order_col}`` and (if ``id_col``) ``{name}_{id_col}``.

    Step predicates are evaluated JVM-side before the shuffle; the
    Python stage sees only (order, id, k boolean flags). Pass
    ``id_col`` whenever ``order_col`` can tie — without it, the order
    of equal-time events (and hence matching) depends on partition
    layout.

    Execution (r14): one hash repartition on the key + a JVM sort by
    ``(key, order, id)`` feeding a single ``mapInPandas`` scan with
    cross-batch group carry-over — NOT ``groupBy().applyInPandas``,
    whose per-group Arrow/pandas framing dominates wall time when keys
    are many and small (the funnel shape: ~10 events/user). The scan
    slices each key's rows out of the whole sorted Arrow batch by
    boundary detection, so per-key overhead is two numpy slices; a key
    spanning a batch boundary is buffered and completed in the next
    batch (state = one key's rows, the same bound the grouped form
    had). The JVM sort replaces the per-group ``lexsort`` — identical
    ``(order, id)`` order within every key.
    """
    import numpy as np

    names = _check_steps(steps)
    k = len(steps)
    if emit not in ("all", "first"):
        raise ValueError(f"emit must be 'all' or 'first', got {emit!r}")

    key_type = df.schema[key_col].dataType
    order_type = df.schema[order_col].dataType
    if not isinstance(order_type, (T.LongType, T.IntegerType, T.ShortType)):
        raise TypeError(
            f"order_col {order_col!r} must be an integer event-time column "
            f"(epoch millis/micros), got {order_type.simpleString()}; cast "
            "timestamps explicitly so cross-engine semantics stay exact"
        )
    if id_col is not None and not isinstance(
        df.schema[id_col].dataType, (T.LongType, T.IntegerType, T.ShortType)
    ):
        # a blind cast('long') would NULL every non-numeric id and crash
        # the pandas stage with an opaque NaN error (review r7)
        raise TypeError(
            f"id_col {id_col!r} must be an integer column, got "
            f"{df.schema[id_col].dataType.simpleString()}; map string ids "
            "to a numeric surrogate (e.g. xxhash64) upstream"
        )

    proj = [F.col(key_col), F.col(order_col).cast("long").alias("__ts")]
    # NULL order (or id) rows have no position in event order: drop them
    # here rather than letting NaN crash to_numpy in the executor
    clean = df.filter(F.col(order_col).isNotNull())
    if id_col:
        proj.append(F.col(id_col).cast("long").alias("__id"))
        clean = clean.filter(F.col(id_col).isNotNull())
    slim = clean.select(
        *proj, *[_as_col(p).cast("boolean").alias(f"__p{j}") for j, (_, p) in enumerate(steps)]
    )

    fields = [T.StructField(key_col, key_type), T.StructField("match_seq", T.LongType())]
    for name in names:
        fields.append(T.StructField(f"{name}_{order_col}", T.LongType()))
        if id_col:
            fields.append(T.StructField(f"{name}_{id_col}", T.LongType()))
    out_schema = T.StructType(fields)
    out_names = [f.name for f in fields]

    def _scan_group(rows_out: list, key, ts, ids, flags, s: int, e: int) -> None:
        """Match one key's slice [s, e) of the sorted batch arrays and
        append its output rows. The slice is already in (ts, id) order
        (the JVM sort), so no per-group lexsort is needed."""
        gts = ts[s:e]
        preds = [np.flatnonzero(fl[s:e]) for fl in flags]
        matches, _ = _match_events(gts, preds, within, emit)
        if not matches:
            return
        gids = ids[s:e] if id_col else None
        for seq, picked in enumerate(matches, start=1):
            row = [key, seq]
            for i in picked:
                row.append(int(gts[i]))
                if id_col:
                    row.append(int(gids[i]))
            rows_out.append(row)

    def scan(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            # group boundaries in the sorted batch; factorize groups a
            # null key's rows under one code (groupBy parity)
            codes, _ = pd.factorize(pdf[key_col], use_na_sentinel=False)
            change = np.flatnonzero(np.diff(codes)) + 1
            # the last key may continue into the next Arrow batch —
            # hold its rows back and complete it there (or in the flush)
            last_start = int(change[-1]) if len(change) else 0
            carry = pdf.iloc[last_start:]
            if not last_start:
                continue
            keys = pdf[key_col]
            ts = pdf["__ts"].to_numpy(dtype="int64")
            ids = pdf["__id"].to_numpy(dtype="int64") if id_col else None
            flags = [
                pdf[f"__p{j}"].to_numpy(dtype="object") == True  # noqa: E712 (None-safe)
                for j in range(k)
            ]
            bounds = np.concatenate(([0], change))
            rows: list = []
            for gi in range(len(bounds) - 1):
                s, e = int(bounds[gi]), int(bounds[gi + 1])
                _scan_group(rows, keys.iloc[s], ts, ids, flags, s, e)
            if rows:
                yield pd.DataFrame(rows, columns=out_names)
        if carry is not None and len(carry):
            ts = carry["__ts"].to_numpy(dtype="int64")
            ids = carry["__id"].to_numpy(dtype="int64") if id_col else None
            flags = [
                carry[f"__p{j}"].to_numpy(dtype="object") == True  # noqa: E712
                for j in range(k)
            ]
            rows = []
            _scan_group(rows, carry[key_col].iloc[0], ts, ids, flags, 0, len(carry))
            if rows:
                yield pd.DataFrame(rows, columns=out_names)

    sort_cols = [key_col, "__ts"] + (["__id"] if id_col else [])
    return (
        slim.repartition(key_col)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(scan, out_schema)
    )
