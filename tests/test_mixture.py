"""filter_by_percentile and temperature_resample (operators/curation.py):
quality gating and temperature mixture rebalancing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
    filter_by_percentile,
    sample_hash,
    temperature_resample,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_filter_by_percentile_grouped_matches_sequential(spark):
    df = _docs(spark).select("doc_id", "lang", "n_chars")
    got = {r["doc_id"] for r in filter_by_percentile(
        df, "n_chars", 0.5, partition_by="lang", tiebreak_col="doc_id"
    ).collect()}
    rows = df.collect()
    want = set()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r["n_chars"], r["doc_id"]))
        n = len(rs)
        for i, r in enumerate(rs, start=1):
            if i / n <= 0.5:
                want.add(r["doc_id"])
    assert got == want


def test_filter_by_percentile_ungrouped_matches_grouped_on_constant(spark):
    """The distributed global-rank path must keep the identical row set
    as the windowed path over a constant group."""
    df = _docs(spark).select("doc_id", "n_chars").withColumn("__g", F.lit(1))
    a = {r["doc_id"] for r in filter_by_percentile(
        df, "n_chars", 0.25, partition_by="__g", tiebreak_col="doc_id"
    ).collect()}
    b = {r["doc_id"] for r in filter_by_percentile(
        df.drop("__g"), "n_chars", 0.25, tiebreak_col="doc_id"
    ).collect()}
    assert a == b and len(a) > 0


def test_filter_by_percentile_ungrouped_no_single_partition_window(spark):
    """Scale shape: the ungrouped path must not contain a global
    (empty-partition-spec) window — partitions in the plan come from the
    range shuffle + __pid window."""
    df = _docs(spark).select("doc_id", "n_chars")
    plan = (
        filter_by_percentile(df, "n_chars", 0.5, tiebreak_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partitionBy: []" not in plan.replace(" ", "")
    assert "SinglePartition" not in plan


def test_filter_by_percentile_rejects_bad_frac(spark):
    df = _docs(spark)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            filter_by_percentile(df, "n_chars", bad)


def test_temperature_resample_extremes(spark):
    """alpha=1 keeps everything (natural distribution, budget = total);
    alpha->0 targets uniform: every stratum keeps ~n_min rows."""
    df = _docs(spark).select("doc_id", "lang")
    kept_a1 = temperature_resample(df, "lang", "doc_id", alpha=1.0).count()
    assert kept_a1 == df.count()

    counts = {r["lang"]: r["n"] for r in
              df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_min = min(counts.values())
    out0 = temperature_resample(df, "lang", "doc_id", alpha=0.0)
    got0 = {r["lang"]: r["n"] for r in
            out0.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # rate is exact n_min/n; hash thresholding keeps approximately that many
    for lang, n in counts.items():
        assert got0[lang] == pytest.approx(n_min, rel=0.5)
    # smallest stratum must be fully kept (rate exactly 1.0)
    smallest = min(counts, key=lambda s: counts[s])
    assert got0[smallest] == counts[smallest]


def test_temperature_resample_budget_path_deterministic(spark):
    df = _docs(spark).select("doc_id", "lang")
    a = {r["doc_id"] for r in temperature_resample(df, "lang", "doc_id", alpha=0.7, budget=200).collect()}
    b = {r["doc_id"] for r in temperature_resample(
        df.repartition(13), "lang", "doc_id", alpha=0.7, budget=200
    ).collect()}
    assert a == b and 0 < len(a) < df.count()


def test_temperature_resample_is_hash_threshold_subset(spark):
    """Resampling never invents rows and decides per-row by the shared
    deterministic hash: kept set is closed under the hash threshold."""
    df = _docs(spark).select("doc_id", "lang")
    out = temperature_resample(df, "lang", "doc_id", alpha=0.5)
    joined = out.join(df, ["doc_id", "lang"], "left_anti")
    assert joined.count() == 0
    # per language, kept ids are exactly those under the language's cut
    kept = out.withColumn("h", sample_hash("doc_id"))
    mx = {r["lang"]: r["m"] for r in kept.groupBy("lang").agg(F.max("h").alias("m")).collect()}
    allh = df.withColumn("h", sample_hash("doc_id"))
    for lang, cut in mx.items():
        below = allh.filter((F.col("lang") == lang) & (F.col("h") <= cut)).count()
        got = kept.filter(F.col("lang") == lang).count()
        assert got == below
