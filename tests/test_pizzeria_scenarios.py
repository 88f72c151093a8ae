"""Scenario parity tests against the hand-derived golden output
(FIXTURES.md §4, reference scripts/load_dims.sql seed)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.pizzeria import enriched_orders, order_joining_view
from tests.fixtures_pizzeria import GOLDEN_ENRICHED, load_pizzeria


def _check_golden(rows):
    assert len(rows) == len(GOLDEN_ENRICHED)
    for r in rows:
        client, table, pizzas = GOLDEN_ENRICHED[r["order_id"]]
        assert r["client_name"] == client
        assert r["table_name"] == table
        got = sorted((p["pizza"], p["price"]) for p in json.loads(r["pizzas"]))
        assert got == sorted(pizzas), f"order {r['order_id']}: {got}"


def test_flagship_enriched_orders(spark):
    t = load_pizzeria(spark)
    out = enriched_orders(t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"])
    _check_golden(out.collect())


def test_flagship_hour_filter(spark):
    """Half-open window (20:00, 21:00] keeps orders {1, 5}; (21:00, 22:00]
    keeps {2, 3, 4} (reference load_dims.sql:52-57)."""
    t = load_pizzeria(spark)
    lo, hi = F.lit("2023-09-23 20:00:00").cast("timestamp"), F.lit("2023-09-23 21:00:00").cast("timestamp")
    ids = {r["order_id"] for r in enriched_orders(
        t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"], lo, hi).collect()}
    assert ids == {1, 5}
    lo2, hi2 = hi, F.lit("2023-09-23 22:00:00").cast("timestamp")
    ids2 = {r["order_id"] for r in enriched_orders(
        t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"], lo2, hi2).collect()}
    assert ids2 == {2, 3, 4}


def test_view_scenario_matches_flagship(spark):
    """Scenario 2 (view + projection/filter) computes the same document as
    scenario 1 — the reference's own golden-oracle equivalence (SURVEY §5)."""
    t = load_pizzeria(spark)
    view = order_joining_view(t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"])
    projected = view.select("order_id", "client_name", "table_name", F.col("json_agg").alias("pizzas"))
    _check_golden(projected.collect())


def test_scenario1_from_real_jdbc_sources(spark, tmp_path):
    """Scenario 1 with its ACTUAL source tech: all five pizzeria tables
    live in a JDBC database (embedded Derby), the pipeline reads them
    through bounded JDBC scans (S1) and must produce the golden output.
    The integer[] pizzas column crosses the JDBC boundary as text and is
    rebuilt on read — the same text-boundary cast the reference applies
    at the PG edge (SURVEY §1.3, how-to-aiven/02-view-based-jdbc.md:38)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import read_jdbc

    url = f"jdbc:derby:{tmp_path}/pizzadb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    t = load_pizzeria(spark)

    def to_jdbc(name, df, col_types=None):
        w = (
            df.write.format("jdbc")
            .option("url", url).option("dbtable", name).option("driver", driver)
        )
        if col_types:
            w = w.option("createTableColumnTypes", col_types)
        w.mode("overwrite").save()

    to_jdbc("tables", t["tables"], "name VARCHAR(64)")
    to_jdbc("pizzas", t["pizzas"], "name VARCHAR(64)")
    to_jdbc("clients", t["clients"], "name VARCHAR(64)")
    to_jdbc("table_assignment", t["table_assignment"])
    to_jdbc(
        "orders",
        t["orders"].withColumn("pizzas", F.concat_ws(",", "pizzas")),
        "pizzas VARCHAR(128)",
    )

    j = {n: read_jdbc(spark, url, n, driver=driver) for n in
         ("tables", "pizzas", "clients", "table_assignment", "orders")}
    j["orders"] = j["orders"].withColumn(
        "pizzas", F.split("pizzas", ",").cast("array<int>")
    )
    out = enriched_orders(
        j["orders"], j["table_assignment"], j["clients"], j["tables"], j["pizzas"]
    )
    _check_golden(out.collect())


def test_scenario2_join_pushed_into_database(spark, tmp_path):
    """Scenario 2 on a JSON-less JDBC database: the 4-way dimensional
    join (orders x assignment x clients x tables) executes INSIDE the DB
    via a pushed subquery — the reference's order_joining_view pattern —
    while the array explode + pizza join + JSON aggregation run in
    Spark. Output must equal the all-DataFrame view."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import json_arrayagg, json_object
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.pizzeria import order_joining_view
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.jdbc import jdbc_query_reader

    url = f"jdbc:derby:{tmp_path}/viewdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    t = load_pizzeria(spark)

    def to_jdbc(name, df, col_types=None):
        w = (
            df.write.format("jdbc")
            .option("url", url).option("dbtable", name).option("driver", driver)
        )
        if col_types:
            w = w.option("createTableColumnTypes", col_types)
        w.mode("overwrite").save()

    to_jdbc("tables", t["tables"], "name VARCHAR(64)")
    to_jdbc("clients", t["clients"], "name VARCHAR(64)")
    to_jdbc("table_assignment", t["table_assignment"])
    to_jdbc("orders", t["orders"].withColumn("pizzas", F.concat_ws(",", "pizzas")),
            "pizzas VARCHAR(128)")

    pushed = jdbc_query_reader(
        spark,
        url,
        'SELECT o."id" AS order_id, o."order_time", o."pizzas" AS pizza_csv, '
        '       c."name" AS client_name, tb."name" AS table_name '
        'FROM orders o '
        'JOIN table_assignment ta ON o."table_assignment_id" = ta."id" '
        'JOIN clients c ON ta."client_id" = c."id" '
        'JOIN tables tb ON ta."table_id" = tb."id"',
        driver=driver,
    ).load()
    # no Spark-side join of the four pushed tables
    assert "Join" not in pushed._jdf.queryExecution().executedPlan().toString()

    exploded = pushed.select(
        "order_id", "client_name", "table_name", "order_time",
        F.explode(F.split("pizza_csv", ",").cast("array<int>")).alias("pizza_id"),
    )
    got_df = (
        exploded.join(
            F.broadcast(t["pizzas"].select(F.col("id").alias("p_id"),
                                           F.col("name").alias("pizza"), "price")),
            F.col("pizza_id") == F.col("p_id"),
        )
        .groupBy("order_id", "client_name", "table_name", "order_time")
        .agg(json_arrayagg(json_object(pizza=F.col("pizza"), price=F.col("price"))).alias("json_agg"))
    )
    expect_df = order_joining_view(
        t["orders"], t["table_assignment"], t["clients"], t["tables"], t["pizzas"]
    )
    key = lambda r: (r["order_id"], r["client_name"], r["table_name"], str(r["order_time"]), r["json_agg"])
    assert sorted(map(key, got_df.collect())) == sorted(map(key, expect_df.collect()))
