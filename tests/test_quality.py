"""Data-quality expectations: violation counts, FK semantics, gating."""

from __future__ import annotations

from pyspark.sql import functions as F
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import (
    expect_in_set,
    expect_not_null,
    expect_range,
    expect_regex,
    expect_unique,
    validate_expectations,
)


def _results(df):
    return {r["check"]: r.asDict() for r in df.collect()}


def test_expectations_count_violations_exactly(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -1.0),      # range violation
        (2, "c", 5.0),       # duplicate id
        (None, "a", 50.0),   # null id
        (4, "zz", None),     # set violation + null range violation
    ]
    df = spark.createDataFrame(rows, "id long, cat string, x double")
    out = validate_expectations(
        df,
        [
            expect_not_null("id"),
            expect_unique("id"),
            expect_range("x", 0.0, 100.0),
            expect_in_set("cat", ["a", "b", "c"]),
            expect_regex("cat", "^[a-c]$"),
        ],
    )
    r = _results(out)
    assert r["not_null_id"]["violations"] == 1
    # 5 rows, distinct id tuples = {1, 2, None, 4} -> 4; one excess row
    assert r["unique_id"]["violations"] == 1
    assert r["range_x"]["violations"] == 2  # -1.0 and NULL
    assert r["in_set_cat"]["violations"] == 1
    assert r["regex_cat"]["violations"] == 1
    assert all(v["total"] == 5 for v in r.values())
    assert not r["range_x"]["passed"] and not r["unique_id"]["passed"]


def test_fk_reference_nulls_pass_and_orphans_fail(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id long, fk int"
    )
    dim = spark.createDataFrame([(10,), (20,)], "k int")
    out = validate_expectations(
        fact, [expect_not_null("id")], references=[("fk", dim, "k")]
    )
    r = _results(out)
    # SQL FK semantics: NULL passes, 99 is the only orphan
    assert r["references_fk"]["violations"] == 1
    assert r["references_fk"]["total"] == 4
    assert r["references_fk"]["kind"] == "references"


def test_expectations_gate_composition(spark):
    """The result composes into a boolean batch gate without a report
    round-trip: failed-check count is just a filter+count."""
    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = validate_expectations(df, [expect_not_null("id"), expect_unique("id")])
    assert out.filter(~out.passed).count() == 0


def test_expectations_single_scan_for_row_checks(spark, sf_dir):
    """All row-local + uniqueness checks must compile into ONE aggregate
    over one scan: exactly one parquet scan in the plan when no FK checks
    are requested."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = validate_expectations(
        orders,
        [
            expect_not_null("o_orderkey"),
            expect_unique("o_orderkey"),
            expect_range("o_totalprice", 0.0, 1e6),
            expect_in_set("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_profile_columns_exact_stats(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k int, s string",
    )
    got = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_null"] == 1
    assert got["k"]["n_distinct"] == 2     # nulls excluded, {1, 2}
    assert got["k"]["min_str"] == "1" and got["k"]["max_str"] == "2"
    assert got["s"]["n_null"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"


def test_profile_columns_single_scan(spark):
    """All stats must come from ONE read of the table (one FileScan /
    LocalTableScan in the plan) — profiling a 100 TB table five times
    per column is the failure mode this pins out."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import profile_columns

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        profile_columns(df, ["event_id", "event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------

def test_psi_identical_distributions_zero(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift

    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    out = psi_drift(df, df, "x", 0.0, 100.0, bins=10).collect()
    assert all(r.psi_micro == 0 for r in out)
    assert {r.bucket for r in out} == set(range(10))


def test_psi_shift_detected_and_manual_value(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift
    import math

    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    b = spark.range(1000).select((F.col("id") % 100 + 50).cast("double").alias("x"))
    out = {r.bucket: r for r in psi_drift(a, b, "x", 0.0, 100.0, bins=2).collect()}
    # a: 500/500 in buckets 0,1; b: 500 in bucket 1, 500 overflow
    assert (out[0].n_a, out[0].n_b) == (500, 0)
    assert (out[1].n_a, out[1].n_b) == (500, 500)
    assert (out[2].n_a, out[2].n_b) == (0, 500)
    eps = 1e-6
    want0 = round((0.5 - eps) * math.log(0.5 / eps) * 1e6)
    assert out[0].psi_micro == want0
    assert out[1].psi_micro == 0
    total = sum(r.psi_micro for r in out.values()) / 1e6
    assert total > 0.25  # "action" territory for a half-range shift


def test_psi_nulls_and_out_of_range(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift

    a = spark.createDataFrame([(None,), (-5.0,), (500.0,), (50.0,)], "x double")
    out = {r.bucket: (r.n_a, r.n_b) for r in psi_drift(a, a, "x", 0.0, 100.0, bins=4).collect()}
    assert out == {-1: (1, 1), 4: (1, 1), 2: (1, 1)}  # null dropped


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

def test_mad_flags_only_extremes(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import mad_outliers

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 12, 10, 11, 12, 10, 11, 1000])]
    df = spark.createDataFrame(rows, "id bigint, g string, x double")
    out = {r.id: r.is_outlier for r in mad_outliers(df, "x", ["g"]).collect()}
    assert out[8] is True
    assert all(out[i] is False for i in range(8))


def test_mad_grouped_and_null_nan_passthrough(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import mad_outliers

    rows = [
        (1, "a", 1.0), (2, "a", 1.1), (3, "a", 0.9), (4, "a", 50.0),
        (5, "b", 100.0), (6, "b", 101.0), (7, "b", 99.0),
        (8, "b", None), (9, "b", float("nan")),
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, x double")
    out = {r.id: (r.is_outlier, r.group_median) for r in mad_outliers(df, "x", ["g"]).collect()}
    assert out[4][0] is True  # 50 vs {0.9, 1.0, 1.1}
    assert out[5][0] is False  # 100 is normal for group b
    assert out[8][0] is False and out[9][0] is False  # null/nan unflagged
    assert out[1][1] == 1.05 and out[5][1] == 100.0  # interpolated even-count median


def test_mad_zero_mad_flags_any_deviation(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import mad_outliers

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)] + [(6, 5.0001)], "id bigint, x double"
    )
    out = {r.id: r.is_outlier for r in mad_outliers(df, "x").collect()}
    assert out[6] is True and all(out[i] is False for i in range(6))


GOOD_DOC = (
    "The quick brown fox jumps over the lazy dog and then runs back home "
    "with plenty of ordinary words that keep the mean length sane today. "
) * 5  # ~130 words, stopword-rich, no symbols/bullets


def _gopher(spark, docs, **kw):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import gopher_rules

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {r.doc_id: r for r in gopher_rules(df, **kw).collect()}


def test_gopher_rules_each_rule_fires(spark):
    docs = [
        (0, GOOD_DOC),
        (1, "too short"),                                     # word count
        (2, " ".join(["a"] * 60)),                            # mean word len < 3
        (3, " ".join(["the of and"] + ["#tag"] * 57)),        # symbol ratio + alpha ok
        (4, "\n".join(["- item one two"] * 10)),              # bullet lines
        (5, "\n".join(["the end comes soon..."] * 10)),       # ellipsis lines
        (6, " ".join(["the", "of"] + ["12345"] * 58)),        # alpha words <= 80%
        (7, " ".join(["zebra", "quilt", "nomad"] * 20)),      # no stopwords
    ]
    out = _gopher(spark, docs, min_words=50)
    assert out[0].passes
    assert not out[1].r_word_count
    assert not out[2].r_mean_word_len
    assert not out[3].r_symbol_ratio
    assert not out[4].r_bullet_lines
    assert not out[5].r_ellipsis_lines
    assert not out[6].r_alpha_words
    assert not out[7].r_stopwords
    assert all(not out[i].passes for i in range(1, 8))


def test_gopher_rules_empty_and_boundary(spark):
    # empty doc: fails word count, divides nothing (no NaN/ANSI error);
    # boundary: exactly min_words with mean length exactly 3 passes both
    docs = [(0, ""), (1, " ".join(["abc"] * 50))]
    out = _gopher(spark, docs, min_words=50)
    assert out[0].n_words == 0 and not out[0].passes
    assert out[1].r_word_count and out[1].r_mean_word_len


def _ks_reference(xs, ys):
    """Sequential exact two-sample KS over the merged jump points."""
    grid = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best, best_at = -1, None
    for v in grid:
        d = abs(sum(x <= v for x in xs) * nb - sum(y <= v for y in ys) * na)
        if d > best:
            best, best_at = d, v
    return round(best / (na * nb), 6), best_at


def test_ks_drift_matches_sequential_reference(spark):
    import random

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import ks_drift

    rng = random.Random(11)
    xs = [round(rng.gauss(0.0, 1.0), 3) for _ in range(400)]
    ys = [round(rng.gauss(0.4, 1.3), 3) for _ in range(300)]
    a = spark.createDataFrame([(v,) for v in xs], "value double")
    b = spark.createDataFrame([(v,) for v in ys], "value double")
    row = ks_drift(a, b, "value").first()
    want_stat, want_at = _ks_reference(xs, ys)
    assert row["ks_stat"] == want_stat
    assert row["ks_at"] == want_at
    assert (row["n_a"], row["n_b"]) == (400, 300)

    # layout independence: same answer from a repartitioned copy
    row2 = ks_drift(a.repartition(13), b.coalesce(1), "value", num_partitions=5).first()
    assert (row2["ks_stat"], row2["ks_at"]) == (want_stat, want_at)


def test_ks_drift_extremes(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import ks_drift
    import pytest

    same = spark.createDataFrame([(float(i % 7),) for i in range(70)], "value double")
    assert ks_drift(same, same, "value").first()["ks_stat"] == 0.0

    lo = spark.createDataFrame([(float(i),) for i in range(10)], "value double")
    hi = spark.createDataFrame([(float(i + 100),) for i in range(10)], "value double")
    row = ks_drift(lo, hi, "value").first()
    assert row["ks_stat"] == 1.0
    assert row["ks_at"] == 9.0  # end of the low sample — first full separation

    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError):
        ks_drift(lo, empty, "value")


def test_k_anonymity_flags_small_groups(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import k_anonymity
    import pytest

    rows = (
        [(i, "US", "M") for i in range(5)]
        + [(10, "US", "F"), (11, "US", "F")]
        + [(20, None, "M")]
    )
    df = spark.createDataFrame(rows, "id int, country string, gender string")
    got = {r["id"]: (r["group_size"], r["at_risk"]) for r in k_anonymity(df, ["country", "gender"], k=3).collect()}
    for i in range(5):
        assert got[i] == (5, False)
    assert got[10] == (2, True) and got[11] == (2, True)
    assert got[20] == (1, True)  # NULL combination is itself identifying

    with pytest.raises(ValueError):
        k_anonymity(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity(df, ["country"], k=1)


# ---------------------------------------------------------------------------
# order-insensitive table digest
# ---------------------------------------------------------------------------

def test_table_digest_layout_and_order_independent(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    df = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(200)], "id int, s string"
    )
    d1 = tuple(table_digest(df, ["id", "s"]).collect()[0])
    d2 = tuple(table_digest(df.repartition(13, "s"), ["id", "s"]).collect()[0])
    d3 = tuple(
        table_digest(df.orderBy(F.col("id").desc()), ["id", "s"]).collect()[0]
    )
    assert d1 == d2 == d3


def test_table_digest_detects_single_row_change_and_null_vs_literal(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    base = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id int, s string")
    d = tuple(table_digest(base, ["id", "s"]).collect()[0])
    changed = spark.createDataFrame([(1, "a"), (2, None), (3, "C")], "id int, s string")
    assert tuple(table_digest(changed, ["id", "s"]).collect()[0]) != d
    # NULL must not collide with the string 'null'
    lit = spark.createDataFrame([(1, "a"), (2, "null"), (3, "c")], "id int, s string")
    assert tuple(table_digest(lit, ["id", "s"]).collect()[0]) != d


def test_table_digest_no_delimiter_or_sentinel_collisions(spark):
    # ADVICE r4: the old '|'-join rendering collided ('a|b','c') with
    # ('a','b|c'), and a literal '\x01null' with NULL. The
    # length-prefixed rendering must distinguish all of these.
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    ab_c = spark.createDataFrame([("a|b", "c")], "x string, y string")
    a_bc = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert (
        tuple(table_digest(ab_c, ["x", "y"]).collect()[0])
        != tuple(table_digest(a_bc, ["x", "y"]).collect()[0])
    )
    null_row = spark.createDataFrame([(1, None)], "id int, s string")
    sentinel = spark.createDataFrame([(1, "\x01null")], "id int, s string")
    assert (
        tuple(table_digest(null_row, ["id", "s"]).collect()[0])
        != tuple(table_digest(sentinel, ["id", "s"]).collect()[0])
    )
    # values containing the rendering's own tag/length characters
    tricky_a = spark.createDataFrame([("v1:x", "y")], "x string, y string")
    tricky_b = spark.createDataFrame([("v1:x|y", "")], "x string, y string")
    assert (
        tuple(table_digest(tricky_a, ["x", "y"]).collect()[0])
        != tuple(table_digest(tricky_b, ["x", "y"]).collect()[0])
    )


def test_table_digest_shard_merge(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    df = spark.createDataFrame([(i, str(i * 3)) for i in range(100)], "id int, s string")
    whole = table_digest(df, ["id", "s"]).collect()[0]
    a = table_digest(df.where("id < 40"), ["id", "s"]).collect()[0]
    b = table_digest(df.where("id >= 40"), ["id", "s"]).collect()[0]
    # the three reductions are all commutative-associative: shard
    # digests combine with (sum, xor, sum)
    assert (a.n_rows + b.n_rows, a.xor60 ^ b.xor60, a.sum31 + b.sum31) == (
        whole.n_rows, whole.xor60, whole.sum31,
    )


def test_table_digest_duplicate_rows_not_invisible(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    one = spark.createDataFrame([(1, "a")], "id int, s string")
    tri = spark.createDataFrame([(1, "a")] * 3, "id int, s string")
    d1, d3 = (tuple(table_digest(x, ["id", "s"]).collect()[0]) for x in (one, tri))
    # xor alone would cancel the pair; n_rows and sum31 still differ
    assert d1 != d3


def test_table_digest_rejects_empty_cols(spark):
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    df = spark.createDataFrame([(1,)], "id int")
    with _pytest.raises(ValueError, match="cols"):
        table_digest(df, [])


# ---------------------------------------------------------------------------
# fk_orphans
# ---------------------------------------------------------------------------

def test_fk_orphans_counts_violations_and_nulls(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import fk_orphans

    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (7,), (9,), (None,), (None,)], "fk bigint"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,), (2,)], "pk bigint")  # dup pk deduped
    row = fk_orphans(fact, dim, "fk", "pk", "fact->dim").collect()[0]
    assert row.relation == "fact->dim"
    assert row.n_rows == 7
    assert row.n_null_fk == 2            # NULL FK is not a violation
    assert row.n_orphans == 2            # 7 and 9
    assert row.n_orphan_keys == 2
    assert (row.min_orphan_key, row.max_orphan_key) == (7, 9)


def test_fk_orphans_clean_relation_reports_zeros(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import fk_orphans

    fact = spark.createDataFrame([(i % 3,) for i in range(30)], "fk int")
    dim = spark.createDataFrame([(0,), (1,), (2,)], "pk int")
    row = fk_orphans(fact, dim, "fk", "pk", "r").collect()[0]
    assert (row.n_rows, row.n_null_fk, row.n_orphans, row.n_orphan_keys) == (30, 0, 0, 0)
    assert row.min_orphan_key is None and row.max_orphan_key is None

    # duplicate orphan FK values count per-row but once per key
    fact2 = spark.createDataFrame([(5,), (5,), (5,)], "fk int")
    row2 = fk_orphans(fact2, dim, "fk", "pk", "r").collect()[0]
    assert (row2.n_orphans, row2.n_orphan_keys) == (3, 1)


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------

def test_benford_conforming_and_uniform_data(spark):
    import math
    import random as _r
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import benford_audit

    rng = _r.Random(31)
    # log-uniform magnitudes follow Benford closely
    conforming = [(10 ** rng.uniform(0, 5),) for _ in range(20000)]
    rows = {r.digit: r for r in benford_audit(
        spark.createDataFrame(conforming, "v double"), "v").collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        assert abs(rows[d].pct - math.log10(1 + 1 / d)) < 0.02, d
        assert rows[d].expected_pct == round(math.log10(1 + 1 / d), 6)
    assert rows[1].mad_micro < 15000          # conformity: MAD < 0.015

    # uniform data on one magnitude: flat digit mix, large MAD
    uniform = [(rng.uniform(1000, 9999),) for _ in range(20000)]
    urows = benford_audit(spark.createDataFrame(uniform, "v double"), "v").collect()
    assert urows[0].mad_micro > 40000
    assert len({r.mad_micro for r in urows}) == 1   # broadcast same on every row


def test_benford_string_digit_extraction_and_filters(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import benford_audit

    # 1000.00 -> cents 100000 -> digit 1 (the floor(log10) hazard case);
    # 0, negatives and NULL excluded; 0.05 -> cents 5 -> digit 5
    df = spark.createDataFrame(
        [(1000.0,), (0.05,), (-77.0,), (0.0,), (None,), (9.99,)], "v double"
    )
    rows = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert rows[1].n_obs == 1
    assert rows[5].n_obs == 1
    assert rows[9].n_obs == 1
    assert sum(r.n_obs for r in rows.values()) == 3
    # zero-count digits still present in the grid
    assert rows[2].n_obs == 0 and rows[2].pct == 0.0


# ---------------------------------------------------------------------------
# js_divergence
# ---------------------------------------------------------------------------


def test_js_divergence_reference_and_properties(spark):
    import math
    import random

    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import js_divergence

    rng = random.Random(31)
    xa = [rng.randint(0, 30) for _ in range(600)]
    xb = [rng.randint(15, 45) for _ in range(400)]
    a = spark.createDataFrame([(v,) for v in xa], "v bigint")
    b = spark.createDataFrame([(v,) for v in xb], "v bigint")
    r = js_divergence(a, b, "v").collect()[0]

    # sequential reference with the SAME micro-rounded integer terms
    from collections import Counter
    ca, cb = Counter(xa), Counter(xb)
    na, nb = len(xa), len(xb)
    suma = sum(
        c * round(1e6 * math.log(2 * c * nb / (c * nb + cb.get(v, 0) * na)))
        for v, c in ca.items()
    )
    sumb = sum(
        c * round(1e6 * math.log(2 * c * na / (ca.get(v, 0) * nb + c * na)))
        for v, c in cb.items()
    )
    want = round((suma / na + sumb / nb) / 2e6, 6)
    assert r.jsd_nats == pytest.approx(want, abs=2e-6)
    assert 0 < r.jsd_norm < 1 and (r.n_a, r.n_b) == (600, 400)

    # symmetry
    rev = js_divergence(b, a, "v").collect()[0]
    assert rev.jsd_nats == r.jsd_nats

    # identical distributions -> 0; disjoint supports -> ln 2 (norm 1.0)
    same = js_divergence(a, a, "v").collect()[0]
    assert same.jsd_nats == 0.0
    lo = spark.createDataFrame([(v,) for v in range(100)], "v bigint")
    hi = spark.createDataFrame([(v + 1000,) for v in range(100)], "v bigint")
    dis = js_divergence(lo, hi, "v").collect()[0]
    assert dis.jsd_norm == pytest.approx(1.0, abs=1e-5)

    # empty side -> NULL stats, zero count
    empty = spark.createDataFrame([], "v bigint")
    nul = js_divergence(a, empty, "v").collect()[0]
    assert nul.jsd_nats is None and nul.n_b == 0


def test_js_from_counts_equals_dataframe_form_and_null_counts(spark):
    import random

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import js_divergence, js_from_counts

    rng = random.Random(37)
    xa = [rng.randint(0, 20) for _ in range(300)]
    xb = [rng.randint(10, 30) for _ in range(200)]
    a = spark.createDataFrame([(v,) for v in xa], "v bigint")
    b = spark.createDataFrame([(v,) for v in xb], "v bigint")
    want = js_divergence(a, b, "v").collect()[0]

    # the streaming-monitor shape: full-outer merged histograms with
    # NULL counts where a value appears on one side only
    from pyspark.sql import functions as F
    ha = a.groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
    hb = b.groupBy("v").agg(F.count(F.lit(1)).alias("cb"))
    merged = ha.join(hb, "v", "full_outer")
    got = js_from_counts(merged, "v", "ca", "cb").collect()[0]
    assert got == want


def test_mad_outliers_null_groups_survive(spark):
    """Review r7: NULL-group rows must pass through (flagged normally),
    not silently vanish from a quality gate's output."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import mad_outliers

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 1.1), (3, None, 5.0), (4, None, 5.1), (5, "b", None)],
        "id long, g string, x double",
    )
    out = {r["id"]: r for r in mad_outliers(df, "x", ["g"]).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]
    assert out[3]["group_median"] is not None  # NULL group got real stats
    assert out[5]["is_outlier"] is False  # all-null group passes unflagged


def test_validate_expectations_fk_only(spark):
    """Review r7: an FK-only contract suite (no row-local checks) runs."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import validate_expectations

    fact = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    rows = validate_expectations(fact, [], references=[("fk", dim, "pk")]).collect()
    assert len(rows) == 1 and rows[0]["violations"] == 1 and not rows[0]["passed"]
