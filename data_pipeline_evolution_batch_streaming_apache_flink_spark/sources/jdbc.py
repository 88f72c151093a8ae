"""JDBC batch sources (SURVEY §2.1 S1/S2).

The reference maps PostgreSQL tables and views into bounded tables with
the Flink JDBC connector (reference ``flink-applications/01-basic-jdbc.json:4-22``)
and pushes a whole join into the database by scanning a view
(scenario 2, reference ``how-to-aiven/02-view-based-jdbc.md:8-33``).

Spark's JDBC source provides both natively — with predicate pushdown and
column pruning the reference explicitly lacks in scenario 1
(reference ``README.md:158``):

- :func:`jdbc_table_reader` — bounded scan of a table or view.
- :func:`jdbc_query_reader` — ``dbtable = (subquery) alias``: the whole
  statement (joins included) executes inside the database, which is the
  engine-level version of the reference's manual view creation.

Both build partitioned reads when bounds are given: ``partition_column``
+ ``num_partitions`` splits the scan into parallel range queries — the
difference between one connection streaming 100 TB and N executors each
reading a slice. Neither function touches the network at build time, so
environments without a JDBC driver jar can still construct and inspect
plans; ``.load()`` is where connectivity is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader


def jdbc_options(
    url: str,
    dbtable: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    push_down_predicate: bool = True,
    push_down_aggregate: bool = True,
) -> dict[str, str]:
    """Validated option map for a Spark JDBC read (pure function — unit
    testable without a database).

    Partitioned-read rules (Spark contract): ``partition_column``,
    ``lower_bound``, ``upper_bound`` and ``num_partitions`` come as a
    quartet; each executor then issues its own bounded range query.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": dbtable,
        "fetchsize": str(fetch_size),
        "pushDownPredicate": "true" if push_down_predicate else "false",
        "pushDownAggregate": "true" if push_down_aggregate else "false",
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    partition_parts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in partition_parts):
        if any(p is None for p in partition_parts):
            raise ValueError(
                "partitioned JDBC reads need all of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        opts["partitionColumn"] = str(partition_column)
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    return opts


def jdbc_table_reader(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrameReader:
    """Bounded JDBC scan of a table or view (S1). Returns the configured
    reader; call ``.load()`` to execute. Spark pushes filters and prunes
    columns into the generated SQL automatically."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader


def jdbc_query_reader(spark: SparkSession, url: str, query: str, alias: str = "pushed", **kwargs) -> DataFrameReader:
    """Join/aggregation pushdown into the source database (S1 scenario-2
    semantics): the query runs inside the DB and Spark scans its result —
    the engine-level equivalent of the reference's ``order_joining_view``
    (reference ``how-to-aiven/02-view-based-jdbc.md:11-33``) without
    needing DDL rights to create the view."""
    return jdbc_table_reader(spark, url, f"({query}) {alias}", **kwargs)


def read_jdbc(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """``jdbc_table_reader(...).load()`` convenience."""
    return jdbc_table_reader(spark, url, table, **kwargs).load()
