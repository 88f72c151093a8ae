"""JDBC source surface tests (SURVEY §2.1 S1/S2). No database in this
environment, so these cover the option contract and reader construction —
``.load()`` is the only step needing a driver jar."""

from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import (
    jdbc_options,
    jdbc_query_reader,
    jdbc_table_reader,
)

URL = "jdbc:postgresql://db:5432/pizzeria"


def test_jdbc_options_basic():
    opts = jdbc_options(URL, "orders", user="u", password="p")
    assert opts["url"] == URL
    assert opts["dbtable"] == "orders"
    assert opts["pushDownPredicate"] == "true"
    assert "partitionColumn" not in opts


def test_jdbc_options_partitioned_read():
    opts = jdbc_options(
        URL, "orders",
        partition_column="id", lower_bound=0, upper_bound=1_000_000, num_partitions=64,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "64"


def test_jdbc_options_partition_quartet_enforced():
    with pytest.raises(ValueError, match="partition"):
        jdbc_options(URL, "orders", partition_column="id", num_partitions=8)


def test_jdbc_readers_construct_without_driver(spark):
    """Building the reader must not require connectivity (S2 view-pushdown
    shape included: dbtable = (subquery) alias)."""
    jdbc_table_reader(spark, URL, "orders", user="u")
    jdbc_query_reader(
        spark, URL,
        "SELECT o.id, c.name FROM orders o JOIN clients c ON o.client_id = c.id",
    )
