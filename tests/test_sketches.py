"""HLL distinct sketch (operators/sketches.py): accuracy vs exact
distinct, lossless mergeability, layout independence, and bit-exact
agreement with an independent numpy reference of the same algorithm."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import (
    approx_ndv,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, n, groups=1, dup=1):
    return (
        spark.range(n * dup)
        .select(
            (F.col("id") % groups).alias("g"),
            (F.col("id") % n).alias("v"),
        )
    )


def test_estimate_within_hll_error_bound(spark):
    # p=9 -> sigma ~4.6%; assert 3 sigma
    for true_n in (2_000, 20_000):
        out = approx_ndv(_df(spark, true_n, dup=3), ["g"], "v", p=9).collect()
        est = out[0].ndv_est
        assert abs(est - true_n) / true_n < 0.14, (true_n, est)


def test_small_range_linear_counting(spark):
    out = approx_ndv(_df(spark, 100), ["g"], "v", p=9).collect()
    est = out[0].ndv_est
    assert abs(est - 100) / 100 < 0.15, est


def test_merge_equals_union(spark):
    a = _df(spark, 5_000).where("v < 3000")
    b = _df(spark, 5_000).where("v >= 2000")  # overlapping
    u = a.unionByName(b)
    merged = hll_merge(hll_registers(a, ["g"], "v"), hll_registers(b, ["g"], "v"))
    direct = hll_registers(u, ["g"], "v")
    got_m = {(r.g, r.bucket, r.r) for r in merged.collect()}
    got_d = {(r.g, r.bucket, r.r) for r in direct.collect()}
    assert got_m == got_d
    est_m = hll_estimate(merged, ["g"]).collect()[0].ndv_est
    est_d = hll_estimate(direct, ["g"]).collect()[0].ndv_est
    assert est_m == est_d


def test_layout_independent(spark):
    df = _df(spark, 4_000, groups=3)
    a = approx_ndv(df, ["g"], "v", p=9)
    b = approx_ndv(df.repartition(17, "v"), ["g"], "v", p=9)
    assert sorted((r.g, r.ndv_est) for r in a.collect()) == sorted(
        (r.g, r.ndv_est) for r in b.collect()
    )


def test_registers_match_numpy_reference(spark):
    """Same algorithm in pure Python (md5 via hashlib) must produce the
    identical register state — pins the hash fold, bucketing, and rank
    computation bit-for-bit."""
    p, m, w = 9, 512, 51
    vals = [f"v{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {(r.bucket, r.r) for r in hll_registers(df.withColumn("g", F.lit(0)), ["g"], "s", p=p).select("bucket", "r").collect()}

    regs: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bucket = h % m
        rest = h // m
        if rest == 0:
            rho = w + 1
        else:
            rho = w - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    assert got == set(regs.items())


def test_null_values_ignored(spark):
    df = spark.createDataFrame([(1, "a"), (1, None), (1, "b")], "g int, s string")
    regs = hll_registers(df, ["g"], "s", p=9)
    assert regs.count() == 2


def test_bad_p_rejected(spark):
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(_df(spark, 10), ["g"], "v", p=2)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def _cms_ref_buckets(value: str, depth: int, width: int) -> list[int]:
    return [
        int(hashlib.md5(f"{d}|{value}".encode()).hexdigest()[:15], 16) % width
        for d in range(depth)
    ]


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import cms_lookup, cms_state

    rows = [(f"tok{i % 50}",) for i in range(5000)]  # each token 100x
    df = spark.createDataFrame(rows, "s string")
    state = cms_state(df, "s", depth=4, width=2048)
    q = spark.createDataFrame([(f"tok{i}",) for i in range(50)] + [("absent",)], "s string")
    got = {r.s: r.cms_est for r in cms_lookup(state, q, "s", depth=4, width=2048).collect()}
    assert all(got[f"tok{i}"] >= 100 for i in range(50))
    # wide sketch, few keys: collisions ~0 -> exact
    assert sum(got[f"tok{i}"] for i in range(50)) <= 5000 + 3 * 100
    assert got["absent"] >= 0


def test_cms_state_matches_reference_and_merge_is_sum(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import cms_lookup, cms_merge, cms_state

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "s string")
    b = spark.createDataFrame([("x",), ("z",)], "s string")
    depth, width = 3, 64
    sa = cms_state(a, "s", depth, width)
    expect = {}
    for v, n in (("x", 2), ("y", 1)):
        for d, bkt in enumerate(_cms_ref_buckets(v, depth, width)):
            expect[(d, bkt)] = expect.get((d, bkt), 0) + n
    got = {(r.row, r.bucket): r.cnt for r in sa.collect()}
    assert got == expect

    merged = cms_merge(sa, cms_state(b, "s", depth, width))
    q = spark.createDataFrame([("x",), ("y",), ("z",)], "s string")
    est = {r.s: r.cms_est for r in cms_lookup(merged, q, "s", depth, width).collect()}
    assert est == {"x": 3, "y": 1, "z": 1}


def test_cms_weighted(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import cms_lookup, cms_state

    df = spark.createDataFrame([("x", 10), ("x", 5), ("y", 2)], "s string, w int")
    state = cms_state(df, "s", depth=3, width=64, weight_col="w")
    q = spark.createDataFrame([("x",), ("y",)], "s string")
    est = {r.s: r.cms_est for r in cms_lookup(state, q, "s", 3, 64).collect()}
    assert est == {"x": 15, "y": 2}


def test_cms_bad_params(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import cms_state

    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="depth"):
        cms_state(df, "s", depth=0)


# ---------------------------------------------------------------------------
# hll_overlap (operators/sketches.py)
# ---------------------------------------------------------------------------

def test_hll_overlap_tracks_true_intersection(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import hll_overlap

    # A = 0..5999, B = 4000..9999 -> true inter 2000, union 10000
    a = spark.range(0, 6000).select(F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(F.col("id").alias("v"))
    row = hll_overlap(a, b, "v").collect()[0]
    assert abs(row.ndv_a - 6000) / 6000 < 0.15
    assert abs(row.ndv_union - 10000) / 10000 < 0.15
    assert abs(row.ndv_intersection - 2000) / 2000 < 0.5  # differenced error
    assert 0.05 < row.jaccard_est < 0.4                    # true 0.2

    again = hll_overlap(a.repartition(7), b.repartition(3), "v").collect()[0]
    assert again == row  # register states are layout-independent


def test_hll_overlap_disjoint_clamps_to_zero(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import hll_overlap

    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(100000, 103000).select(F.col("id").alias("v"))
    row = hll_overlap(a, b, "v").collect()[0]
    assert row.ndv_intersection >= 0.0          # clamp, never negative
    assert row.ndv_intersection / 3000 < 0.25   # near-zero overlap signal
    # identical corpora: intersection ~ either side, jaccard ~ 1
    same = hll_overlap(a, a, "v").collect()[0]
    assert same.ndv_a == same.ndv_b == same.ndv_union == same.ndv_intersection
    assert same.jaccard_est == 1.0


def test_approx_ndv_hop_pane_equals_naive(spark):
    """Pane decomposition must be BIT-identical to hash-after-expand:
    registers merge by associative max, so building per-pane state and
    max-merging into covering windows reproduces the naive plan's
    estimate exactly (not approximately)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import approx_ndv_hop
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.windows import hop_window

    ev = spark.range(5_000).select(
        F.timestamp_millis(
            F.lit(1_700_000_000_000) + (F.col("id") * 37_000) % 86_400_000
        ).alias("ts"),
        (F.col("id") % 700).alias("user_id"),
    )
    pane = approx_ndv_hop(ev, "ts", "user_id", "1 hour", "15 minutes", p=9)
    naive = approx_ndv(
        hop_window(ev, "ts", "1 hour", "15 minutes").select(
            F.unix_millis(F.col("window_start")).alias("window_start_ms"), "user_id"
        ),
        ["window_start_ms"], "user_id", p=9,
    )
    got = sorted((r.window_start_ms, r.ndv_est) for r in pane.collect())
    want = sorted((r.window_start_ms, r.ndv_est) for r in naive.collect())
    assert got == want and len(got) > 0


def test_approx_ndv_hop_rejects_nonmultiple(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import approx_ndv_hop

    ev = spark.range(10).select(
        F.timestamp_millis(F.col("id") * 1000).alias("ts"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError):
        approx_ndv_hop(ev, "ts", "v", "1 hour", "25 minutes")


def test_review_r7_sketch_edges(spark):
    """Round-7 review regressions: huge/infinite values clamp into edge
    bins (no ANSI cast overflow); empty HLL input estimates 0.0; a
    non-positive hop size raises."""
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import (
        approx_ndv,
        histogram_quantiles,
        hop_merge_estimate,
    )

    df = spark.createDataFrame([(1e10,), (0.5,), (float("inf"),)], "v double")
    rows = histogram_quantiles(df, "v", lo=0.0, hi=1.0, bins=256, qs_micro=(500000,)).collect()
    assert len(rows) == 1 and 0.0 <= rows[0]["est"] <= 1.0

    empty = spark.createDataFrame([], "v double")
    got = approx_ndv(empty, [], "v").collect()
    assert len(got) == 1 and got[0]["ndv_est"] == 0.0

    panes = spark.createDataFrame([], "__w long, bucket int, r int")
    with _pytest.raises(ValueError, match="positive"):
        hop_merge_estimate(panes, 0, 900000, pane_col="__w")


def test_hash60_conv_matches_original_fold(spark):
    """r10: hash60 / _hash60_sql / _salted_hash60 switched from the
    15-step locate-fold to conv(substring(md5, 1, 15), 16, 10) for ~4x
    throughput — every committed oracle (hashed_features, HLL, CMS)
    assumes the VALUE is unchanged, so pin fold == conv on a real
    column, including multi-byte input."""
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import hash60

    df = spark.createDataFrame(
        [("alpha",), ("",), ("Grüße 中文 🎉",), ("42",)], "v string"
    )
    fold = F.expr(
        "aggregate(transform(sequence(1, 15), i -> "
        "CAST(locate(substr(md5(CAST(v AS STRING)), i, 1), '0123456789abcdef') - 1 AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, d) -> acc * 16 + d)"
    )
    rows = df.select(hash60("v").alias("a"), fold.alias("b")).collect()
    assert all(r["a"] == r["b"] for r in rows)
    # and the hash range stays 60-bit non-negative
    assert all(0 <= r["a"] < (1 << 60) for r in rows)
