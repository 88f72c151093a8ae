"""Fellegi–Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import math

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.linkage import fellegi_sunter

ROWS = [
    (1, "nyc", "john smith", "a@x.com"),
    (2, "nyc", "jon smith", "a@x.com"),   # 1 edit + same email -> link
    (3, "nyc", "mary jones", None),       # null email -> no information
    (4, "sf", "john smith", "a@x.com"),   # other block: never meets 1
]
COMPS = [
    {"col": "name", "m_pm": 900, "u_pm": 50, "max_dist": 2},
    {"col": "email", "m_pm": 950, "u_pm": 10},
]


def _w(n: int, d: int) -> int:
    return round(math.log(n / d) * 1e6)


def test_scores_and_decisions_match_reference(spark):
    df = spark.createDataFrame(ROWS, "id int, city string, name string, email string")
    out = fellegi_sunter(df, "id", ["city"], COMPS, 3_000_000, 0).collect()
    got = {(r.id_a, r.id_b): (r.score_micro, r.decision) for r in out}
    assert got == {
        (1, 2): (_w(900, 50) + _w(950, 10), "link"),
        (1, 3): (_w(100, 950) + 0, "non_link"),
        (2, 3): (_w(100, 950) + 0, "non_link"),
    }


def test_blocking_is_load_bearing(spark):
    df = spark.createDataFrame(ROWS, "id int, city string, name string, email string")
    pairs = {
        (r.id_a, r.id_b)
        for r in fellegi_sunter(df, "id", ["city"], COMPS, 3_000_000, 0).collect()
    }
    assert (1, 4) not in pairs  # identical records, different block


def test_possible_band_between_thresholds(spark):
    df = spark.createDataFrame(ROWS, "id int, city string, name string, email string")
    score_12 = _w(900, 50) + _w(950, 10)
    out = fellegi_sunter(
        df, "id", ["city"], COMPS, upper_micro=score_12 + 1, lower_micro=0
    ).collect()
    got = {(r.id_a, r.id_b): r.decision for r in out}
    assert got[(1, 2)] == "possible"


def test_layout_independent(spark):
    df = spark.createDataFrame(ROWS * 5, "id int, city string, name string, email string")
    a = sorted(map(tuple, fellegi_sunter(df, "id", ["city"], COMPS, 1, 0).collect()))
    b = sorted(
        map(
            tuple,
            fellegi_sunter(
                df.repartition(9, "name"), "id", ["city"], COMPS, 1, 0
            ).collect(),
        )
    )
    assert a == b


def test_rejects_bad_config(spark):
    df = spark.createDataFrame(ROWS, "id int, city string, name string, email string")
    with pytest.raises(ValueError, match="block_cols"):
        fellegi_sunter(df, "id", [], COMPS, 1, 0)
    with pytest.raises(ValueError, match="comparison"):
        fellegi_sunter(df, "id", ["city"], [], 1, 0)
    with pytest.raises(ValueError, match="lower_micro"):
        fellegi_sunter(df, "id", ["city"], COMPS, 0, 1)
    with pytest.raises(ValueError, match="u_pm < m_pm"):
        fellegi_sunter(
            df, "id", ["city"],
            [{"col": "name", "m_pm": 50, "u_pm": 900}], 1, 0,
        )
