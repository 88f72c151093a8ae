"""The pizzeria order-enrichment pipeline — all six reference scenarios,
expressed Spark-first on DataFrames.

The flagship statement (reference ``flink-applications/01-basic-jdbc.json:30``)
is: orders CROSS JOIN UNNEST(pizzas) joined to table_assignment, clients,
tables, pizzas; optional previous-hour time filter; GROUP BY order/client/
table with JSON_ARRAYAGG(JSON_OBJECT('pizza',name,'price',price)).

Spark realization: ``explode`` (multiset-preserving, J3) + broadcast-able
equi-joins (J1, Catalyst auto-broadcasts the 4-row dims) + ``collect_list
(struct)`` JSON agg (A2/A3). At 100 TB the fact side (orders) partitions on
its key; dims broadcast, so the only shuffle is the final group-by on
order id — which is also the explode key, so AQE coalesces it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import ceil_to_hour, json_arrayagg, json_object


def previous_hour_bounds(now: Column) -> tuple[Column, Column]:
    """The reference's half-open previous-hour window
    (README.md:132,186-189): ``(CEIL(now TO HOUR)-1h, CEIL(now TO HOUR)]``."""
    hi = ceil_to_hour(now)
    lo = hi - F.expr("INTERVAL 1 HOUR")
    return lo, hi


def enriched_orders(
    orders: DataFrame,
    table_assignment: DataFrame,
    clients: DataFrame,
    tables: DataFrame,
    pizzas: DataFrame,
    time_lo: Column | None = None,
    time_hi: Column | None = None,
) -> DataFrame:
    """Scenario-1 flagship query. Returns (order_id, client_name,
    table_name, pizzas-json). Pass time bounds for the hourly-window
    variant; bounds are half-open ``(lo, hi]`` like the reference."""
    o = orders
    if time_lo is not None:
        o = o.filter(F.col("order_time") > time_lo)
    if time_hi is not None:
        o = o.filter(F.col("order_time") <= time_hi)
    exploded = o.select(
        F.col("id").alias("order_id"),
        "table_assignment_id",
        F.explode("pizzas").alias("pizza_id"),  # CROSS JOIN UNNEST, J3
    )
    joined = (
        exploded
        .join(F.broadcast(table_assignment.select(F.col("id").alias("ta_id"), "client_id", "table_id")),
              F.col("table_assignment_id") == F.col("ta_id"))
        .join(F.broadcast(clients.select(F.col("id").alias("c_id"), F.col("name").alias("client_name"))),
              F.col("client_id") == F.col("c_id"))
        .join(F.broadcast(tables.select(F.col("id").alias("t_id"), F.col("name").alias("table_name"))),
              F.col("table_id") == F.col("t_id"))
        .join(F.broadcast(pizzas.select(F.col("id").alias("p_id"), F.col("name").alias("pizza"), "price")),
              F.col("pizza_id") == F.col("p_id"))
    )
    return (
        joined.groupBy("order_id", "client_name", "table_name")
        .agg(json_arrayagg(json_object(pizza=F.col("pizza"), price=F.col("price"))).alias("pizzas"))
    )


def order_joining_view(
    orders: DataFrame,
    table_assignment: DataFrame,
    clients: DataFrame,
    tables: DataFrame,
    pizzas: DataFrame,
) -> DataFrame:
    """Scenario-2 "view pushdown" source (reference
    how-to-aiven/02-view-based-jdbc.md:11-33): same join, but exposed as a
    pre-joined relation carrying order_time so the hourly filter can be
    applied downstream (projection + time filter only)."""
    exploded = orders.select(
        F.col("id").alias("order_id"), "table_assignment_id", "order_time",
        F.explode("pizzas").alias("pizza_id"),
    )
    joined = (
        exploded
        .join(F.broadcast(table_assignment.select(F.col("id").alias("ta_id"), "client_id", "table_id")),
              F.col("table_assignment_id") == F.col("ta_id"))
        .join(F.broadcast(clients.select(F.col("id").alias("c_id"), F.col("name").alias("client_name"))),
              F.col("client_id") == F.col("c_id"))
        .join(F.broadcast(tables.select(F.col("id").alias("t_id"), F.col("name").alias("table_name"))),
              F.col("table_id") == F.col("t_id"))
        .join(F.broadcast(pizzas.select(F.col("id").alias("p_id"), F.col("name").alias("pizza"), "price")),
              F.col("pizza_id") == F.col("p_id"))
    )
    return (
        joined.groupBy("order_id", "client_name", "table_name", "order_time")
        .agg(json_arrayagg(json_object(pizza=F.col("pizza"), price=F.col("price"))).alias("json_agg"))
    )
