"""Sessionization operator (operators/sessions.py) and the composed
training-prep pipeline suite query."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import session_stats, sessionize
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

MIN = 60_000  # ms


def test_sessionize_gap_boundaries(spark):
    # user 1: events at 0, 10, 45, 50 min with a 30-min gap -> sessions
    # {0,10} and {45,50}. Gap of exactly 30 min does NOT split (> only).
    rows = [
        (1, 100, 0 * MIN),
        (1, 101, 10 * MIN),
        (1, 102, 45 * MIN),
        (1, 103, 50 * MIN),
        (2, 200, 0 * MIN),
        (2, 201, 30 * MIN),  # exactly the gap: same session
        (2, 202, 61 * MIN),  # 31 min later: new session
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts_ms long")
    out = sessionize(df, "user_id", "ts_ms", "30 minutes", tiebreak_cols=("event_id",))
    got = {(r.user_id, r.event_id): r.session_seq for r in out.collect()}
    assert got[(1, 100)] == got[(1, 101)] == 1
    assert got[(1, 102)] == got[(1, 103)] == 2
    assert got[(2, 200)] == got[(2, 201)] == 1
    assert got[(2, 202)] == 2


def test_session_stats_rollup(spark):
    rows = [(1, 100, 0), (1, 101, 5 * MIN), (1, 102, 90 * MIN)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts_ms long")
    sess = sessionize(df, gap="30 minutes", tiebreak_cols=("event_id",))
    stats = {r.session_seq: r for r in session_stats(sess).collect()}
    assert stats[1].n_events == 2 and stats[1].start_ms == 0 and stats[1].end_ms == 5 * MIN
    assert stats[2].n_events == 1 and stats[2].start_ms == 90 * MIN


def test_sessionize_single_shuffle_plan(spark, sf_dir):
    """Both window passes and the stats rollup must share ONE exchange."""
    plan = suite.q_sessionize(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_training_prep_accounting(spark, sf_dir):
    """kept_docs per source must equal the distinct surviving texts, and
    every output row aggregates only quality>=0.6 'en' docs."""
    out = {r.source: r for r in suite.q_training_prep(spark, sf_dir).collect()}
    assert out, "pipeline kept nothing at sf0.001"
    docs = suite.load_tables(spark, sf_dir, ("documents",))["documents"]
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import text as TXT

    kept = (
        docs.select(
            "doc_id", "source", "text",
            TXT.lang_id("text").alias("lang_pred"),
            TXT.quality_score("text").alias("quality"),
        )
        .filter((F.col("quality") >= 0.6) & (F.col("lang_pred") == "en"))
    )
    # dedup winners: one row per distinct text, attributed to min doc_id's source
    winners = (
        kept.groupBy("text")
        .agg(F.min_by("source", "doc_id").alias("source"))
        .groupBy("source")
        .count()
    )
    expect = {r.source: r["count"] for r in winners.collect()}
    assert {s: r.kept_docs for s, r in out.items()} == expect


def test_rollup_revenue_totals(spark, sf_dir):
    """Grand-total row must equal the sum of the leaf rows."""
    rows = suite.q_rollup_revenue(spark, sf_dir).collect()
    leaves = [r for r in rows if r.region != "ALL" and r.nation != "ALL"]
    total = [r for r in rows if r.region == "ALL" and r.nation == "ALL"]
    assert len(total) == 1
    assert total[0].n_orders == sum(r.n_orders for r in leaves)
    assert total[0].revenue_cents == sum(r.revenue_cents for r in leaves)
    # region subtotals consistent too
    for region in {r.region for r in leaves}:
        sub = [r for r in rows if r.region == region and r.nation == "ALL"]
        assert sub[0].n_orders == sum(r.n_orders for r in leaves if r.region == region)


def test_streaming_session_window(spark, tmp_path):
    """Streaming twin (native session_window): sessions merge in state
    and emit when the watermark passes session end (append mode)."""
    import json as _json
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import streaming_sessionize
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream

    in_dir = str(tmp_path / "sess_in")
    os.makedirs(in_dir)
    batches = [
        [  # user 1: two events 10 min apart -> one session
            {"user_id": 1, "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "ts": "2024-01-01 10:10:00"},
            {"user_id": 2, "ts": "2024-01-01 10:00:00"},
        ],
        [  # user 1: 50 min after last -> second session
            {"user_id": 1, "ts": "2024-01-01 11:00:00"},
        ],
        [  # watermark pusher: closes every session above
            {"user_id": 9, "ts": "2024-01-01 14:00:00"},
        ],
    ]
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        p = os.path.join(in_dir, f"b{i}.json")
        with open(p, "w") as fh:
            fh.writelines(_json.dumps(r) + "\n" for r in rows)
        os.utime(p, (base + i * 10, base + i * 10))

    stream = json_file_stream(spark, in_dir, "user_id int, ts timestamp")
    sess = streaming_sessionize(stream, "user_id", "ts", gap="30 minutes")

    out_dir = str(tmp_path / "sess_out")
    q = (
        sess.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, "2024-01-01 10:00:00", 2) in got
    assert (1, "2024-01-01 11:00:00", 1) in got
    assert (2, "2024-01-01 10:00:00", 1) in got


def test_session_window_exact_gap_merges(spark):
    """Native session_window boundary semantics: an event landing at
    EXACTLY prev_ts + gap MERGES into the session (merge condition is
    next_start <= prev_end; a new session needs a strictly greater
    gap) — the SAME convention as the lag-based sessionize. Pins the
    merge rule the session_windows oracle encodes (> splits), and
    catches the inverse claim this test originally found in the
    streaming_sessionize docstring."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import streaming_sessionize

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:30:00"),   # gap == 30 min -> merges
        (1, "2024-01-01 11:00:01"),   # gap > 30 min -> NEW session
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = sorted(
        (str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in streaming_sessionize(
            df, "user_id", "ts", "30 minutes", watermark_delay=None
        ).collect()
    )
    assert out == [
        ("2024-01-01 10:00:00", "2024-01-01 11:00:00", 2),
        ("2024-01-01 11:00:01", "2024-01-01 11:30:01", 1),
    ]

    # the lag-based batch operator agrees: two sessions, split only at > gap
    ms = df.select("user_id", F.unix_millis("ts").alias("ts_ms"))
    batch = sessionize(ms, "user_id", "ts_ms", "30 minutes")
    assert sorted(r["session_seq"] for r in batch.collect()) == [1, 1, 2]


def test_cohort_retention_matrix(spark):
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import cohort_retention
    import pytest

    rows = [
        # cohort week of 2024-01-01: users 1,2 — user 1 returns week+1,
        # user 2 returns week+2; user 1 twice in week 0 (distinct-counted)
        (1, "2024-01-02 10:00:00"), (1, "2024-01-03 11:00:00"),
        (2, "2024-01-04 09:00:00"),
        (1, "2024-01-09 10:00:00"),
        (2, "2024-01-16 10:00:00"),
        # cohort week of 2024-01-15: user 3 only ever appears once
        (3, "2024-01-17 08:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string")
    got = {
        (r["cohort"].strftime("%Y-%m-%d"), r["periods_since"]): (
            r["n_users"], r["cohort_size"], r["retained_bp"]
        )
        for r in cohort_retention(df, "user_id", "ts", period="week").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 10000)
    assert got[("2024-01-01", 1)] == (1, 2, 5000)
    assert got[("2024-01-01", 2)] == (1, 2, 5000)
    assert got[("2024-01-15", 0)] == (1, 1, 10000)
    assert len(got) == 4

    with pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts", period="hour")


# ---------------------------------------------------------------------------
# transition_matrix (operators/sessions.py)
# ---------------------------------------------------------------------------

def test_transition_matrix_hand_computed(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import transition_matrix

    # user 1: a->b->a->c ; user 2: b->a  => from a: b,c (2), from b: a (2)
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            (2, 1, "b"), (2, 2, "a")]
    df = spark.createDataFrame(rows, "u int, seq int, s string")
    out = {(r.prev_state, r.next_state): r
           for r in transition_matrix(df, "u", "seq", "s").collect()}
    assert out[("a", "b")].n_trans == 1 and out[("a", "b")].n_from == 2
    assert out[("a", "b")].p_micro == 500000
    assert out[("a", "c")].p_micro == 500000
    assert out[("b", "a")].n_trans == 2 and out[("b", "a")].p_micro == 1000000
    # no cross-user leakage: (c, b) would need user-1's end joined to user-2
    assert ("c", "b") not in out
    # probabilities per source state sum to 1 (exact halves here)
    assert sum(r.p_micro for k, r in out.items() if k[0] == "a") == 1000000


def test_transition_matrix_null_states_and_singletons(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import transition_matrix

    rows = [(1, 1, "a"), (1, 2, None), (1, 3, "b"),  # null dropped: a->b
            (2, 1, "x")]                             # singleton: nothing
    df = spark.createDataFrame(rows, "u int, seq int, s string")
    out = {(r.prev_state, r.next_state): r.n_trans
           for r in transition_matrix(df, "u", "seq", "s").collect()}
    assert out == {("a", "b"): 1}

    big = spark.createDataFrame(
        [(u, i, "abc"[(u + i) % 3]) for u in range(20) for i in range(30)],
        "u int, seq int, s string",
    )
    a = sorted(map(str, transition_matrix(big, "u", "seq", "s").collect()))
    b = sorted(map(str, transition_matrix(big.repartition(7), "u", "seq", "s").collect()))
    assert a == b
