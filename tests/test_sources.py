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


def test_datagen_users_sessions(spark):
    """S9: deterministic distributed generation — same inputs, same rows;
    schemas per reference scripts/datagen.py:39,64."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.datagen import sessions, users

    u = users(spark, n=50)
    assert u.columns == ["id", "username"]
    assert u.count() == 50

    s1 = sessions(spark, n=1000, n_users=50, partitions=4)
    s2 = sessions(spark, n=1000, n_users=50, partitions=8)
    assert s1.columns == ["user_id", "session_time", "ip_address", "browser"]
    # partition count must not change content (purely hash-derived rows)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    assert s1.select("user_id").distinct().count() <= 50

    # the secondary pipeline's hourly aggregation runs on it
    from pyspark.sql import functions as F

    hourly = s1.groupBy(F.date_trunc("hour", "session_time").alias("hour")).count()
    assert hourly.count() > 0


def test_live_sessions_stream_shape(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.datagen import live_sessions_stream

    stream = live_sessions_stream(spark, rows_per_second=5)
    assert stream.isStreaming
    assert stream.columns == ["user_id", "session_time", "ip_address", "browser"]


def test_jdbc_readers_construct_without_driver(spark):
    """Building the reader must not require connectivity (S2 view-pushdown
    shape included: dbtable = (subquery) alias)."""
    jdbc_table_reader(spark, URL, "orders", user="u")
    jdbc_query_reader(
        spark, URL,
        "SELECT o.id, c.name FROM orders o JOIN clients c ON o.client_id = c.id",
    )
