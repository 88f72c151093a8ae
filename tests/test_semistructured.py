"""VARIANT shredding and XML decode (sources/semistructured.py)."""

from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.semistructured import (
    decode_xml,
    parse_variant,
    shred_variant,
)


def test_shred_typed_paths_and_drift(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 7, "b": {"c": [10, 20]}, "s": "hi"}'),
            (2, '{"a": "not-an-int", "b": {}}'),  # cast failure -> NULL
            (3, '{"unrelated": true}'),           # absent paths -> NULL
        ],
        "id int, j string",
    )
    out = shred_variant(
        df, "j",
        {"a": ("$.a", "int"), "c1": ("$.b.c[1]", "int"), "s": ("$.s", "string")},
    )
    rows = {r.id: (r.a, r.c1, r.s) for r in out.collect()}
    assert rows == {1: (7, 20, "hi"), 2: (None, None, None), 3: (None, None, None)}
    assert [f.name for f in out.schema.fields] == ["id", "a", "c1", "s"]


def test_shred_accepts_pre_parsed_variant_and_keeps_payload(spark):
    df = spark.createDataFrame([(1, '{"x": 5}')], "id int, j string")
    pre = df.select("id", parse_variant("j").alias("v"))
    out = shred_variant(pre, "v", {"x": ("$.x", "bigint")}, keep_variant=True)
    assert "v" in out.columns
    assert out.collect()[0].x == 5


def test_decode_xml_flattens_with_prefix(spark):
    df = spark.createDataFrame(
        [
            (1, "<r><status>OK</status><total>12.5</total></r>"),
            (2, "not xml at all"),
        ],
        "id int, x string",
    )
    out = decode_xml(df, "x", "status STRING, total DOUBLE", prefix="o_")
    rows = {r.id: (r.o_status, r.o_total) for r in out.collect()}
    assert rows[1] == ("OK", 12.5)
    assert rows[2] == (None, None)  # PERMISSIVE: unparseable -> NULL fields
    assert "x" not in out.columns


def test_parse_variant_rejects_malformed(spark):
    df = spark.createDataFrame([("{oops",)], "j string")
    with pytest.raises(Exception, match="MALFORMED|JSON|VARIANT"):
        df.select(parse_variant("j").alias("v")).selectExpr(
            "variant_get(v, '$.a', 'int')"
        ).collect()
