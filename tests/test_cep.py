"""Row-pattern recognition (operators/cep.py).

The relaxed matcher is checked against a brute-force sequential
reference (same greedy earliest-match + skip-past-last-row semantics,
written independently as a per-event loop) on randomized streams; the
strict matcher against hand-computed windows.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep import match_pattern, match_strict


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, ts, i, t) for i, (u, ts, t) in enumerate(rows)],
        "user_id bigint, ts_ms bigint, event_id bigint, event_type string",
    )


STEPS = [
    ("a", "event_type = 'signup'"),
    ("b", "event_type = 'click'"),
    ("c", "event_type = 'purchase'"),
]


def _run(spark, rows, **kw):
    out = match_pattern(_events(spark, rows), STEPS, order_col="ts_ms", id_col="event_id", **kw)
    return sorted(
        (r.user_id, r.match_seq, r.a_ts_ms, r.b_ts_ms, r.c_ts_ms) for r in out.collect()
    )


def test_basic_relaxed_match(spark):
    rows = [
        (1, 10, "signup"), (1, 20, "error"), (1, 30, "click"),
        (1, 40, "view"), (1, 50, "purchase"),
        (2, 10, "click"), (2, 20, "purchase"),  # no signup -> no match
    ]
    assert _run(spark, rows) == [(1, 1, 10, 30, 50)]


def test_skip_past_last_row_non_overlapping(spark):
    rows = [
        (1, 10, "signup"), (1, 20, "signup"), (1, 30, "click"),
        (1, 40, "purchase"), (1, 50, "click"), (1, 60, "purchase"),
    ]
    # first match consumes (10,30,40); the signup at 20 precedes the
    # resume point, so the second signup can't start a new match
    assert _run(spark, rows) == [(1, 1, 10, 30, 40)]


def test_within_timeout_restarts_from_next_start(spark):
    rows = [
        (1, 10, "signup"),  # times out: purchase at 100 is > 50 away
        (1, 60, "signup"), (1, 70, "click"), (1, 100, "purchase"),
        (1, 20, "click"),
    ]
    assert _run(spark, rows, within=50) == [(1, 1, 60, 70, 100)]
    # without within, the earlier start wins
    assert _run(spark, rows) == [(1, 1, 10, 20, 100)]


def test_emit_first_per_key(spark):
    rows = [
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        (1, 40, "signup"), (1, 50, "click"), (1, 60, "purchase"),
    ]
    assert _run(spark, rows, emit="first") == [(1, 1, 10, 20, 30)]
    assert _run(spark, rows, emit="all") == [(1, 1, 10, 20, 30), (1, 2, 40, 50, 60)]


def test_tie_broken_by_id(spark):
    # two events at ts=10: event order is id order, so signup(id=0)
    # precedes click(id=1) and the pattern completes
    rows = [(1, 10, "signup"), (1, 10, "click"), (1, 20, "purchase")]
    assert _run(spark, rows) == [(1, 1, 10, 10, 20)]


def test_strict_consecutive(spark):
    rows = [
        (1, 10, "click"), (1, 20, "click"), (1, 30, "purchase"),  # match at 10
        (1, 40, "click"), (1, 50, "view"), (1, 60, "purchase"),  # gap -> no match
        (2, 10, "click"), (2, 20, "click"), (2, 30, "click"), (2, 40, "purchase"),
    ]
    steps = [
        ("x", F.col("event_type") == "click"),
        ("y", F.col("event_type") == "click"),
        ("z", F.col("event_type") == "purchase"),
    ]
    out = match_strict(_events(spark, rows), steps, order_col="ts_ms", id_col="event_id")
    got = sorted((r.user_id, r.x_ts_ms, r.y_ts_ms, r.z_ts_ms) for r in out.collect())
    # user 2: overlapping starts allowed (skip to next row) -> one match at 20
    assert got == [(1, 10, 20, 30), (2, 20, 30, 40)]


def test_strict_within(spark):
    rows = [(1, 10, "click"), (1, 20, "click"), (1, 500, "purchase")]
    steps = [
        ("x", F.col("event_type") == "click"),
        ("y", F.col("event_type") == "click"),
        ("z", F.col("event_type") == "purchase"),
    ]
    df = _events(spark, rows)
    assert match_strict(df, steps, order_col="ts_ms", within=1000).count() == 1
    assert match_strict(df, steps, order_col="ts_ms", within=100).count() == 0


def test_duplicate_step_names_rejected(spark):
    with pytest.raises(ValueError, match="unique"):
        match_pattern(_events(spark, []), [("a", F.lit(True)), ("a", F.lit(True))])


def test_timestamp_order_col_rejected(spark):
    df = spark.createDataFrame([(1,)], "user_id bigint").withColumn("ts", F.current_timestamp())
    with pytest.raises(TypeError, match="integer event-time"):
        match_pattern(df, STEPS, order_col="ts")


def _reference_matches(events, steps_types, within, emit):
    """Independent sequential reference: per-event loop, no numpy.

    events: list of (ts, id, type) for ONE key, arbitrary order.
    Greedy earliest-completion, timeout restarts at next start,
    skip past last row.
    """
    evs = sorted(events, key=lambda e: (e[0], e[1]))
    k = len(steps_types)
    matches = []
    scan_pos = 0
    start_search = 0
    while True:
        s = next(
            (i for i in range(max(scan_pos, start_search), len(evs)) if evs[i][2] == steps_types[0]),
            None,
        )
        if s is None:
            break
        t0 = evs[s][0]
        cur = s
        picked = [s]
        status = "ok"
        for j in range(1, k):
            cand = next((i for i in range(cur + 1, len(evs)) if evs[i][2] == steps_types[j]), None)
            if cand is None:
                status = "exhausted"
                break
            if within is not None and evs[cand][0] - t0 > within:
                status = "timeout"
                break
            cur = cand
            picked.append(cand)
        if status == "exhausted":
            break
        if status == "timeout":
            start_search = s + 1
            continue
        matches.append([(evs[i][0], evs[i][1]) for i in picked])
        scan_pos = picked[-1] + 1
        start_search = s + 1
        if emit == "first":
            break
    return matches


@pytest.mark.parametrize("within,emit", [(None, "all"), (40, "all"), (40, "first")])
def test_matches_sequential_reference(spark, within, emit):
    rng = random.Random(42)
    types = ["signup", "click", "purchase", "view", "error"]
    rows = []
    per_key = {}
    for i in range(600):
        u = rng.randrange(8)
        ts = rng.randrange(200)
        t = rng.choice(types)
        rows.append((u, ts, t))
    for i, (u, ts, t) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, i, t))

    got = _run(spark, rows, within=within, emit=emit)
    want = []
    for u, evs in per_key.items():
        for seq, m in enumerate(
            _reference_matches(evs, ["signup", "click", "purchase"], within, emit), start=1
        ):
            want.append((u, seq, m[0][0], m[1][0], m[2][0]))
    assert got == sorted(want)


def test_groups_spanning_arrow_batches(spark):
    """r14: the sorted-MapInPandas scan buffers a key whose rows cross
    an Arrow batch boundary and completes it in the next batch. Shrink
    the Arrow batch to 7 rows so most keys span batches (including one
    600-row key spanning dozens), and check the result against the
    sequential reference — byte-equal to what the grouped form gave."""
    rng = random.Random(7)
    types = ["signup", "click", "purchase", "view", "error"]
    rows = []
    # one dominant key (spans many batches) + many small keys
    for _ in range(600):
        rows.append((99, rng.randrange(500), rng.choice(types)))
    for _ in range(400):
        rows.append((rng.randrange(40), rng.randrange(200), rng.choice(types)))
    per_key: dict = {}
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", 7)
    try:
        got = _run(spark, rows, within=60, emit="all")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    for i, (u, ts, t) in enumerate(rows):
        per_key.setdefault(u, []).append((ts, i, t))
    want = []
    for u, evs in per_key.items():
        for seq, m in enumerate(
            _reference_matches(evs, ["signup", "click", "purchase"], 60, "all"), start=1
        ):
            want.append((u, seq, m[0][0], m[1][0], m[2][0]))
    assert got == sorted(want) and len(want) > 10


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_strict_plan_native_single_shuffle(spark, sf_dir):
    """match_strict must stay whole-stage-codegen: no Python eval
    operators, and exactly one shuffle (on the pattern key)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    plan = _plan(suite.QUERIES["cep_strict"](spark, sf_dir))
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_relaxed_plan_single_shuffle_preds_before_python(spark, sf_dir):
    """match_pattern: one key shuffle into the Arrow stage; the step
    predicates must be evaluated below it (in the scan-side project),
    not inside Python. r14: the Arrow stage is a single sorted
    MapInPandas scan (cross-batch group carry-over), not per-group
    FlatMapGroupsInPandas — per-group framing dominated wall time on
    many small keys."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    plan = _plan(suite.QUERIES["cep_funnel"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" not in plan
    # the scan feeds from a JVM sort on (key, order, id) — the order
    # the per-group lexsort used to establish in Python
    assert "Sort [user_id" in plan
    # the boolean step flags are computed by a JVM-side Project
    assert "__p0" in plan and "__p2" in plan
