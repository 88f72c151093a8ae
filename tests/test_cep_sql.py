"""MATCH_RECOGNIZE front-end (operators/cep_sql.py)."""

from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep import match_pattern, match_strict
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep_sql import match_recognize


def _events(spark):
    rows = [
        (1, 10, 0, "signup", 5.0), (1, 20, 1, "click", 1.0), (1, 30, 2, "purchase", 9.0),
        (1, 40, 3, "click", 2.0), (1, 50, 4, "click", 0.5), (1, 60, 5, "purchase", 3.0),
        (2, 10, 6, "signup", 1.0), (2, 15, 7, "purchase", 2.0),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, ts_ms bigint, event_id bigint, event_type string, value double"
    )


CLAUSE_RELAXED = """
    PARTITION BY user_id
    ORDER BY ts_ms, event_id
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A -> B -> C)
    DEFINE
      A AS event_type = 'signup',
      B AS event_type = 'click',
      C AS event_type = 'purchase'
"""

STEPS = [
    ("A", "event_type = 'signup'"),
    ("B", "event_type = 'click'"),
    ("C", "event_type = 'purchase'"),
]


def test_relaxed_equals_direct_operator(spark):
    df = _events(spark)
    got = sorted(map(tuple, match_recognize(df, CLAUSE_RELAXED).collect()))
    want = sorted(
        map(
            tuple,
            match_pattern(df, STEPS, key_col="user_id", order_col="ts_ms", id_col="event_id").collect(),
        )
    )
    assert got == want and len(got) == 1


def test_strict_equals_direct_operator(spark):
    df = _events(spark)
    clause = """
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        PATTERN (X Y)
        WITHIN 15
        DEFINE X AS event_type = 'click', Y AS event_type = 'purchase'
    """
    got = sorted(map(tuple, match_recognize(df, clause).collect()))
    want = sorted(
        map(
            tuple,
            match_strict(
                df,
                [("X", "event_type = 'click'"), ("Y", "event_type = 'purchase'")],
                key_col="user_id", order_col="ts_ms", id_col="event_id", within=15,
            ).collect(),
        )
    )
    assert got == want and len(got) == 2  # (20,30) and (50,60); user2 pair isn't click-led


def test_undefined_variable_is_always_true(spark):
    clause = """
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        PATTERN (A ANY)
        DEFINE A AS event_type = 'signup'
    """
    got = match_recognize(_events(spark), clause).collect()
    # signup followed by any consecutive event: (10,20) for user1, (10,15) for user2
    assert len(got) == 2


def test_predicates_can_use_any_row_column(spark):
    clause = """
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        PATTERN (H L)
        DEFINE H AS value > 4.0, L AS value < 1.5
    """
    got = {(r.user_id, r.H_ts_ms, r.L_ts_ms) for r in match_recognize(_events(spark), clause).collect()}
    assert got == {(1, 10, 20)}


@pytest.mark.parametrize(
    "clause,err",
    [
        ("ORDER BY ts_ms PATTERN (A B)", "PARTITION"),
        ("PARTITION BY user_id ORDER BY ts_ms PATTERN (A+ B)", "quantifiers"),
        (
            "PARTITION BY user_id ORDER BY ts_ms AFTER MATCH SKIP TO NEXT ROW PATTERN (A -> B)",
            "PAST LAST ROW",
        ),
        (
            "PARTITION BY user_id ORDER BY ts_ms AFTER MATCH SKIP PAST LAST ROW PATTERN (A B)",
            "TO NEXT ROW",
        ),
        (
            "PARTITION BY user_id ORDER BY ts_ms PATTERN (A B) DEFINE A AS B.value > 1",
            "cross-variable",
        ),
        (
            "PARTITION BY user_id ORDER BY ts_ms PATTERN (A B) DEFINE Z AS value > 1",
            "unknown pattern variable",
        ),
    ],
)
def test_rejections(spark, clause, err):
    with pytest.raises(ValueError, match=err):
        match_recognize(_events(spark), clause)


def test_decimal_literals_not_mistaken_for_references(spark):
    clause = """
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        PATTERN (H L)
        DEFINE H AS value > 4.5, L AS value < 1.5
    """
    assert match_recognize(_events(spark), clause).count() == 1
