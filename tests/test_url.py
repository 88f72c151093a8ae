"""canonical_url / url_host edge cases (functions/url.py).

The suite oracle (url_dedup) proves the canonicalizer collapses the
derived variant classes at corpus scale; these tests pin the individual
rewrite rules and the contract corners the derivation doesn't reach
(schemeless passthrough, tracking-only query, non-default ports,
strip_www=False).
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions.url import (
    canonical_url,
    url_host,
)

CASES = [
    # (raw, canonical, host)
    (
        "HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "example.com",
    ),
    ("https://Example.com:443/", "https://example.com", "example.com"),
    ("https://example.com", "https://example.com", "example.com"),
    # non-default port survives
    ("https://example.com:8443/x", "https://example.com:8443/x", "example.com"),
    # tracking-only query -> no '?' at all
    ("http://example.com/?gclid=abc&fbclid=d", "http://example.com", "example.com"),
    # param sort is byte order; values untouched
    ("http://e.com/p?z=1&a=2&m=3", "http://e.com/p?a=2&m=3&z=1", "e.com"),
    # schemeless input passes through lowercase-trimmed
    ("  Example.com/Path  ", "example.com/path", "example.com"),
    # fragment dropped even with empty query
    ("https://e.com/p#x", "https://e.com/p", "e.com"),
    # ref is tracking; id is not
    ("https://e.com/p?ref=tw&id=5", "https://e.com/p?id=5", "e.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], ["u"])
    got = df.select(
        canonical_url("u").alias("c"), url_host("u").alias("h")
    ).collect()
    for (raw, want_c, want_h), row in zip(CASES, got):
        assert row["c"] == want_c, raw
        assert row["h"] == want_h, raw


def test_canonical_url_keeps_www_when_asked(spark):
    df = spark.createDataFrame([("https://www.E.com/p",)], ["u"])
    row = df.select(
        canonical_url("u", strip_www=False).alias("c"),
        url_host("u", strip_www=False).alias("h"),
    ).first()
    assert row["c"] == "https://www.e.com/p"
    assert row["h"] == "www.e.com"


def test_canonical_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u) — the defining property of a dedup key."""
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], ["u"])
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(F.col("c").alias("u")).select(canonical_url("u").alias("c"))
    assert once.collect() == twice.collect()


def test_canonical_url_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "u string")
    assert df.select(canonical_url("u").alias("c")).first()["c"] is None
