"""Oracle emission-type gate (r7 driver-red root cause).

The driver compares Spark results against DuckDB oracles through a
dataframe/Arrow fetch; the local mirror historically compared through
``fetchall()``.  The two disagree on any column whose DuckDB storage
type exceeds int64: ``sum(BIGINT)`` returns HUGEINT, which a dataframe
fetch converts to float64 — the value then canonicalizes as "123.0"
against Spark's "123" and flips the driver's hash while row counts and
schema still match.  That is exactly how ``rolling_features``,
``kmeans``, ``lm_scores`` and ``hist_quantiles`` went driver-red in
round 7 while staying mirror-green in every local configuration.

This test binds every oracle (no execution — DuckDB type inference
only) and asserts each emitted column is a dataframe-stable type, so
the class of bug cannot re-enter via a future oracle.  The runtime
twin lives in tools/check_oracle.py (the DFCANON dual-hash).
"""

from __future__ import annotations

import duckdb
import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Types a pandas/Arrow fetch maps onto the same dtype Spark's toPandas()
# produces for the matching Spark type.  Notably absent: HUGEINT /
# UHUGEINT / UBIGINT (exceed int64 -> float64) and DECIMAL (-> object
# of decimal.Decimal, whose str() carries trailing zeros).
SAFE_DUCK_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_oracle_emits_dataframe_stable_types(duck):
    offenders: list[str] = []
    for name, sql in suite.ORACLE.items():
        rel = duck.sql(f"SELECT * FROM ({sql})")
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if t not in SAFE_DUCK_TYPES
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "oracle emits a type a dataframe fetch reshapes (HUGEINT->float64 "
        "etc.) — CAST at emission:\n" + "\n".join(offenders)
    )


def test_r7_red_oracles_now_emit_bigint(duck):
    """The four r7 driver-red queries specifically: their previously
    HUGEINT columns must bind as BIGINT now."""
    expect = {
        "rolling_features": "sum_cents_1h",
        "kmeans": "dist_div",
        "lm_scores": "logp_micro_sum",
        "hist_quantiles": "total",
    }
    for name, col in expect.items():
        rel = duck.sql(f"SELECT * FROM ({suite.ORACLE[name]})")
        types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        assert types[col] == "BIGINT", (name, col, types[col])
    rel = duck.sql(f"SELECT * FROM ({suite.ORACLE['lm_scores']})")
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert types["avg_logp_micro"] == "BIGINT"
