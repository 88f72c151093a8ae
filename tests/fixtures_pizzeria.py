"""Pizzeria seed fixture — the reference's hand-checkable correctness data.

Values mirror the seed rows in reference ``scripts/load_dims.sql:3-57``
(4 tables x 4 pizzas x 4 clients x 4 assignments x 5 orders). The duplicate
array elements ('{1,1,1,1}', '{1,1}') exercise multiset join/agg semantics
and order 5 sits in a different hour to exercise the window filter
(SURVEY.md §5). This is data (not code) re-typed for parity testing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

TS = dt.datetime  # shorthand


def load_pizzeria(spark: SparkSession) -> dict:
    tables = spark.createDataFrame(
        [(1, "Donatello", 2), (2, "Michelangelo", 4), (3, "Raffaello", 4), (4, "Leonardo", 8)],
        "id int, name string, seats int",
    )
    pizzas = spark.createDataFrame(
        [(1, "Master Splinter", 8), (2, "Shredder", 7), (3, "Krang", 5), (4, "Bebop and Rocksteady", 6)],
        "id int, name string, price int",
    )
    clients = spark.createDataFrame(
        [(1, "Medonna"), (2, "Duvid Beckham"), (3, "Wall Smith"), (4, "Josh Depp")],
        "id int, name string",
    )
    table_assignment = spark.createDataFrame(
        [
            (1, 1, 2, TS(2023, 9, 23, 20, 0), TS(2023, 9, 23, 21, 0)),
            (2, 2, 4, TS(2023, 9, 23, 21, 0), None),
            (3, 3, 2, TS(2023, 9, 23, 21, 0), None),
            (4, 4, 1, TS(2023, 9, 23, 22, 0), None),
        ],
        "id int, client_id int, table_id int, in_time timestamp, out_time timestamp",
    )
    orders = spark.createDataFrame(
        [
            (1, 1, TS(2023, 9, 23, 20, 5), [1, 3, 2]),
            (2, 3, TS(2023, 9, 23, 21, 4), [1, 1, 1, 1]),
            (3, 2, TS(2023, 9, 23, 21, 5), [2, 3, 4, 1, 1, 4]),
            (4, 2, TS(2023, 9, 23, 21, 7), [1, 1]),
            (5, 2, TS(2023, 9, 23, 20, 10), [3]),
        ],
        "id int, table_assignment_id int, order_time timestamp, pizzas array<int>",
    )
    out = {
        "tables": tables,
        "pizzas": pizzas,
        "clients": clients,
        "table_assignment": table_assignment,
        "orders": orders,
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out


# Golden flagship output (FIXTURES.md §4): order_id -> (client, table,
# multiset of (pizza, price)) — JSON arrays compared order-insensitively.
GOLDEN_ENRICHED = {
    1: ("Medonna", "Michelangelo", [("Krang", 5), ("Master Splinter", 8), ("Shredder", 7)]),
    2: ("Wall Smith", "Michelangelo", [("Master Splinter", 8)] * 4),
    3: (
        "Duvid Beckham",
        "Leonardo",
        [("Bebop and Rocksteady", 6)] * 2 + [("Krang", 5), ("Master Splinter", 8), ("Master Splinter", 8), ("Shredder", 7)],
    ),
    4: ("Duvid Beckham", "Leonardo", [("Master Splinter", 8)] * 2),
    5: ("Duvid Beckham", "Leonardo", [("Krang", 5)]),
}
