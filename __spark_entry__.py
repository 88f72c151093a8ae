"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in
``data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.suite``;
this module is the thin driver-facing façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (scenario-1 enriched orders analogue) on sf0.001."""
    return suite.q_enriched_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for the declared queries — ``suite.ORACLE`` carries
    one SQL string per ``suite.QUERIES`` entry (approximate operators
    pin recall-1.0 configs so exact SQL twins apply), except two
    intentionally rows-only entries with no SQL twin: ``bpe_tokenize``
    (ordered data-dependent rewrite system; exactness pinned by
    tests/test_bpe.py against a sequential reference) and
    ``pca_project`` (eigendecomposition; determinism pinned by the
    numpy-parity and layout tests in tests/test_stats.py)."""
    return dict(suite.ORACLE)
