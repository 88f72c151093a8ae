"""Scenario 1/2 — the batch order-enrichment pipeline, two ways:
DataFrame composition and the ApplicationSpec SQL lifecycle.

Run: python examples/01_batch_pizzeria.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.app import ApplicationSpec, run_application
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.pizzeria import enriched_orders
from data_pipeline_evolution_batch_streaming_apache_flink_spark.tables import TableSpec
from tests.fixtures_pizzeria import load_pizzeria


def main() -> None:
    spark = eng.get_spark("example-batch", cpus=8)
    t = load_pizzeria(spark)

    # 1) DataFrame composition (explode + broadcast joins + sorted JSON agg)
    df_out = enriched_orders(
        t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"]
    )
    df_out.show(truncate=False)

    # 2) The same statement through the SQL application spec
    spec = ApplicationSpec(
        sources=[TableSpec(name=n) for n in t],
        statement="""
            SELECT o.id AS order_id, c.name AS client_name, t.name AS table_name,
                   count(*) AS n_pizzas, sum(p.price) AS total
            FROM (SELECT id, table_assignment_id, explode(pizzas) AS pizza_id FROM orders) o
            JOIN table_assignment ta ON o.table_assignment_id = ta.id
            JOIN clients c ON ta.client_id = c.id
            JOIN tables t ON ta.table_id = t.id
            JOIN pizzas p ON o.pizza_id = p.id
            GROUP BY o.id, c.name, t.name
            ORDER BY order_id
        """,
    )
    sql_out = run_application(spark, spec, dataframes=t)
    sql_out.show(truncate=False)

    # smoke oracle: the two paths must agree on the enriched key set
    df_keys = {(r.order_id, r.client_name, r.table_name) for r in df_out.collect()}
    sql_keys = {(r.order_id, r.client_name, r.table_name) for r in sql_out.collect()}
    assert df_keys and df_keys == sql_keys
    print(f"PASS: DataFrame and SQL-spec paths agree on {len(df_keys)} enriched orders")


if __name__ == "__main__":
    main()
