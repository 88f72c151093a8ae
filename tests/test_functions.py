"""Unit tests for the scalar/agg function layer (SURVEY §2.3/§2.6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import functions as EF


def test_ceil_to_hour(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2023, 9, 23, 20, 5),), (dt.datetime(2023, 9, 23, 21, 0),)],
        "ts timestamp",
    )
    got = [r[0] for r in df.select(EF.ceil_to_hour("ts")).collect()]
    # 20:05 rounds up to 21:00; exact boundary 21:00 stays (PG/Flink CEIL semantics)
    assert got == [dt.datetime(2023, 9, 23, 21, 0), dt.datetime(2023, 9, 23, 21, 0)]


def test_to_timestamp_ltz_millis(spark):
    df = spark.createDataFrame([(1695500700123,)], "ms bigint")
    got = df.select(EF.to_timestamp_ltz_millis("ms")).collect()[0][0]
    assert got == dt.datetime(2023, 9, 23, 20, 25, 0, 123000)


def test_json_arrayagg_multiset_and_sorted(spark):
    df = spark.createDataFrame([(1, "a", 8), (1, "a", 8), (1, "b", 5)], "k int, n string, p int")
    out = df.groupBy("k").agg(EF.json_arrayagg(EF.json_object(pizza=F.col("n"), price=F.col("p"))).alias("j"))
    assert out.collect()[0]["j"] == '[{"pizza":"a","price":8},{"pizza":"a","price":8},{"pizza":"b","price":5}]'


def test_json_value_and_query(spark):
    doc = '{"order_id": 7, "pizzas": [{"pizza": "Krang", "price": 5}]}'
    df = spark.createDataFrame([(doc,)], "d string")
    row = df.select(
        EF.json_value("d", "$.order_id", "int").alias("oid"),
        EF.json_query("d", "$.pizzas").alias("frag"),
    ).collect()[0]
    assert row["oid"] == 7
    assert row["frag"] == '[{"pizza":"Krang","price":5}]'


def test_from_base64_roundtrip(spark):
    df = spark.createDataFrame([("hello dpe",)], "s string")
    row = df.select(EF.from_base64_str(F.base64(F.col("s").cast("binary"))).alias("rt")).collect()[0]
    assert row["rt"] == "hello dpe"


def test_html_to_text_extraction(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions.text import html_to_text

    cases = [
        # script/style subtrees vanish, including markup inside them
        ('<style>p{}</style><script>a="<p>x</p>";</script><p>Hi</p>', "Hi"),
        # block tags separate lines; inline tags don't
        ("<h1>A</h1><p>b <b>c</b></p><div>d</div>", "A\nb c\nd"),
        # entity decode, &amp; LAST: &amp;lt; is a literal "&lt;", not "<"
        ("x &amp; y &lt;z&gt; &amp;lt;", 'x & y <z> &lt;'),
        # comments and leftover tags strip; whitespace collapses
        ("a<!-- no -->  b\t<span attr='v'>c</span>", "a b c"),
        # malformed markup degrades to whitespace, never eats content
        ("<p>open<p>again", "open\nagain"),
        ("", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
    got = [r["t"] for r in df.select(html_to_text("h").alias("t")).collect()]
    for (h, want), g in zip(cases, got):
        assert g == want, f"{h!r} -> {g!r}"
