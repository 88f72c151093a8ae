"""Declarative data-quality validation (expectations suite).

A production ingest pipeline gates every batch on contract checks —
null-ness, key uniqueness, value ranges/sets/patterns, referential
integrity — before the data reaches training. The reference keeps its
contracts implicit in DDL column types (``flink-applications/*.json``);
at 100 TB the checks must be explicit, cheap and auditable.

Scale shape:

- every ROW-LOCAL check (not-null / range / set / regex) and every
  UNIQUENESS check compiles into ONE aggregate over ONE scan of the
  table: violations are ``sum(when(violation, 1))`` and uniqueness is
  ``count(*) - count(distinct struct(keys))`` — all map-side partial
  aggregation, one exchange of a single row.
- each REFERENTIAL check adds one broadcast anti-join count (dimension
  side deduplicated then broadcast — no fact shuffle).
- the result is a tiny DataFrame (one row per expectation), not a
  driver-side report: it composes into gates
  (``.filter(~passed).count() == 0``) or writes next to the batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "expect_not_null", "expect_range", "expect_in_set", "expect_regex",
    "expect_unique", "validate_expectations", "gopher_rules", "char_entropy",
    "table_digest",
]

#: the Gopher paper's "must contain 2 of" stop words (Rae et al. 2021,
#: table A1) — a fixed public list, part of the rule definition
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def expect_not_null(col: str, name: str | None = None) -> dict:
    return {"name": name or f"not_null_{col}", "kind": "not_null",
            "violation": F.col(col).isNull()}


def expect_range(col: str, lo, hi, name: str | None = None) -> dict:
    """Violated when the value is NULL or outside [lo, hi]."""
    c = F.col(col)
    return {"name": name or f"range_{col}", "kind": "range",
            "violation": c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))}


def expect_in_set(col: str, values, name: str | None = None) -> dict:
    """Violated when the value is NULL or not one of ``values``."""
    c = F.col(col)
    return {"name": name or f"in_set_{col}", "kind": "in_set",
            "violation": c.isNull() | ~c.isin(list(values))}


def expect_regex(col: str, pattern: str, name: str | None = None) -> dict:
    """Violated when the value is NULL or does not match ``pattern``
    (keep the pattern RE2-safe if an external oracle must agree)."""
    c = F.col(col)
    return {"name": name or f"regex_{col}", "kind": "regex",
            "violation": c.isNull() | ~c.rlike(pattern)}


def expect_unique(*cols: str, name: str | None = None) -> dict:
    """Violations = rows in excess of one per key tuple (0 when the key
    is unique). NULL keys participate as ordinary values (the struct
    wrapper keeps null-field tuples countable)."""
    return {"name": name or "unique_" + "_".join(cols), "kind": "unique",
            "cols": list(cols)}


def validate_expectations(
    df: DataFrame,
    checks: list[dict],
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate every expectation and return one row per check:
    ``(check, kind, violations, total, passed)``.

    ``checks`` come from the ``expect_*`` builders. ``references`` is a
    list of ``(fact_col, dim_df, dim_col)`` foreign-key checks —
    violated by non-NULL fact values with no match in the dimension
    (SQL FK semantics: NULLs pass). Row-local and uniqueness checks
    share one scan; each FK adds one broadcast anti-join.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(checks):
        if c["kind"] == "unique":
            agg = F.count(F.lit(1)) - F.count_distinct(F.struct(*c["cols"]))
        else:
            agg = F.sum(F.when(c["violation"], F.lit(1)).otherwise(F.lit(0)))
        aggs.append(agg.alias(f"__v{i}"))
    base = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(c["name"]).alias("check"),
            F.lit(c["kind"]).alias("kind"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias("violations"),
            F.col("__total").cast("long").alias("total"),
        )
        for i, c in enumerate(checks)
    ]
    if entries:
        out = base.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
    else:
        # FK-only contract suite (review r7: explode of an empty array
        # literal cannot star-expand) — start from an empty typed frame
        out = df.sparkSession.createDataFrame(
            [], "check string, kind string, violations long, total long"
        )

    for fact_col, dim_df, dim_col in references or []:
        dim_keys = F.broadcast(
            dim_df.select(F.col(dim_col).alias(fact_col)).distinct()
        )
        anti = (
            df.filter(F.col(fact_col).isNotNull())
            .join(dim_keys, fact_col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        row = (
            anti.crossJoin(base.select(F.col("__total").cast("long").alias("total")))
            .select(
                F.lit(f"references_{fact_col}").alias("check"),
                F.lit("references").alias("kind"),
                F.col("violations").cast("long").alias("violations"),
                "total",
            )
        )
        out = out.unionByName(row)

    return out.withColumn("passed", F.col("violations") == 0)


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact column profiling — the audit companion to
    :func:`validate_expectations`: per column, row count, null count,
    exact distinct count, and min/max (string form so heterogeneous
    column types stack into one long-form result).

    ONE scan: all statistics compile into a single aggregate (the
    multiple exact ``count(distinct)``s plan as one Expand — a
    row-multiplying but single-exchange strategy; for quick looks at
    petabyte tables swap in ``approx_count_distinct``, but a PROFILE
    that feeds contracts should be exact), then ``stack`` pivots the
    one result row to a row per column."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.extend([
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ])
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (col_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("__n").alias("n_rows"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift monitor for a continuously-refreshed
    training corpus (did this week's crawl shift the length/quality
    distribution?).

    Fixed equal-width bins over ``[lo, hi)`` plus underflow (-1) and
    overflow (``bins``) buckets; nulls are excluded. Per bucket:
    counts from both sides and the PSI contribution
    ``(pa - pb) * ln(pa / pb)`` with probabilities floored at
    ``epsilon``, emitted in exact micro-units
    (``psi_micro = round(contrib * 1e6)`` as bigint) so the total
    ``sum(psi_micro)/1e6`` is reproducible bit-for-bit on any engine.
    Rule of thumb: total < 0.1 stable, 0.1-0.25 moderate shift,
    > 0.25 action.

    Scale shape: each side collapses map-side to at most ``bins + 2``
    rows (one count agg — the only shuffle); the join and the
    unpartitioned total-window run on that tiny frame, never on data.
    """
    if hi <= lo:
        raise ValueError(f"psi_drift needs hi > lo, got lo={lo} hi={hi}")
    from pyspark.sql import Window

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        c = F.col(col).cast("double")
        b = (
            F.when(c < lo, F.lit(-1))
            .when(c >= hi, F.lit(bins))
            .otherwise(F.floor((c - lo) / (hi - lo) * bins).cast("int"))
        )
        return (
            # NaN would fall through every comparison into floor(NaN)
            # and error under ANSI int casts — exclude it like null
            df.where(c.isNotNull() & ~F.isnan(c))
            .select(b.cast("int").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    j = (
        bucketed(df_a, "__na")
        .join(bucketed(df_b, "__nb"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("__na", F.lit(0)).alias("n_a"),
            F.coalesce("__nb", F.lit(0)).alias("n_b"),
        )
    )
    w = Window.partitionBy()  # <= bins+2 rows by construction

    def prob(n: str) -> Column:
        total = F.sum(n).over(w)
        # an empty side floors to epsilon everywhere instead of 0/0
        frac = F.when(total > 0, F.col(n).cast("double") / total).otherwise(F.lit(0.0))
        return F.greatest(frac, F.lit(epsilon))

    pa = prob("n_a")
    pb = prob("n_b")
    contrib = (pa - pb) * F.log(pa / pb)
    return j.select(
        "bucket",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(contrib * 1e6).cast("bigint").alias("psi_micro"),
    )


def mad_outliers(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
) -> DataFrame:
    """Robust outlier flagging by median absolute deviation — the
    quality gate that survives the heavy-tailed distributions
    pretraining corpora actually have (z-scores break: mean and stddev
    are themselves dragged by the outliers being hunted).

    Per group: median m, MAD = median(|x - m|), and a row is an outlier
    when ``|x - m| > k * MAD`` (k=3.5 is the conventional consistency
    bound; with MAD = 0 — over half the group identical — only exact
    deviations from the median flag). Medians are Spark's exact
    ``percentile`` (interpolating, matching DuckDB), rounded to 6dp
    before the comparison so the flag is engine-stable.

    Two grouped aggregations (same key partitioning) broadcast back
    onto the rows; ungrouped inputs use a single-row broadcast, never a
    window over all data. Nulls/NaN pass through unflagged. NULL group
    keys form their own group via null-safe joins (review r7: the plain
    equi-joins silently DROPPED every NULL-group row from the output —
    same trap ``k_anonymity`` documents); a group whose values are all
    NULL/NaN keeps its rows with NULL median/MAD and ``is_outlier``
    False.
    """
    groups = group_cols or []
    c = F.col(col).cast("double")
    clean = df.where(c.isNotNull() & ~F.isnan(c))

    def nsj(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
        # rename the right side's group cols: both sides share lineage,
        # so dataframe-qualified references would be ambiguous
        r = right.select(
            *[F.col(g).alias(f"__g_{g}") for g in groups],
            *[c for c in right.columns if c not in groups],
        )
        cond = F.lit(True)
        for g in groups:
            cond = cond & F.col(g).eqNullSafe(F.col(f"__g_{g}"))
        return left.join(r, cond, how).drop(*[f"__g_{g}" for g in groups])

    med = clean.groupBy(*groups).agg(
        F.round(F.expr(f"percentile({col}, 0.5)"), 6).alias("__med")
    )
    j1 = nsj(clean, F.broadcast(med)) if groups else clean.crossJoin(F.broadcast(med))
    mad = (
        j1.withColumn("__adev", F.round(F.abs(c - F.col("__med")), 6))
        .groupBy(*groups)
        .agg(F.round(F.expr("percentile(__adev, 0.5)"), 6).alias("__mad"))
    )
    stats = nsj(med, mad) if groups else med.crossJoin(mad)
    out = (
        nsj(df, F.broadcast(stats), "left")
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    dev = F.round(F.abs(c - F.col("__med")), 6)
    return out.select(
        *df.columns,
        F.col("__med").alias("group_median"),
        F.col("__mad").alias("group_mad"),
        F.when(c.isNull() | F.isnan(c), F.lit(False))
        .otherwise(dev > F.round(F.lit(k) * F.col("__mad"), 6))
        .alias("is_outlier"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style rule-based document quality filter (Rae et al. 2021
    §A.1.1, "Quality filtering") — the standard auditable pre-training
    gate: instead of one opaque score, each document carries a boolean
    per rule plus the combined ``passes`` flag, so a corpus owner can
    see WHICH rule rejects a slice of the crawl.

    Rules (thresholds are the paper's):

    - ``r_word_count``     — word count in [min_words, max_words]
    - ``r_mean_word_len``  — mean word length in [3, 10] characters
    - ``r_symbol_ratio``   — (# '#' + # '...') / words  <  0.1
    - ``r_bullet_lines``   — lines starting with a bullet  <  90 %
    - ``r_ellipsis_lines`` — lines ending with an ellipsis <  30 %
    - ``r_alpha_words``    — words containing a letter     >  80 %
    - ``r_stopwords``      — ≥ ``min_stopwords`` distinct GOPHER_STOPWORDS

    Every ratio test is cross-multiplied into EXACT integer arithmetic
    (``10*symbols < n_words`` instead of ``symbols/n_words < 0.1``), so
    the flags are bit-identical on any engine/layout — no float
    division anywhere. Empty documents fail the word-count rule and
    divide nothing.

    Scale shape: pure row-local codegen'd expressions over one scan —
    no shuffle, no UDF, no state; composes with ``filter(F.col
    ("passes"))`` ahead of any expensive dedup stage so the 100 TB
    pipeline drops junk before it pays for shingling.
    """
    c = F.col(text_col)
    words = F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")
    lines = F.split(c, "\n")
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    n_symbols = (n_hash + n_ellipsis).cast("bigint")
    bullet = F.size(
        F.filter(lines, lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"))
    ).cast("bigint")
    ellipsis_end = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"))
    ).cast("bigint")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_stop = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("bigint")

    r_word_count = (n_words >= min_words) & (n_words <= max_words)
    r_mean_word_len = (total_word_chars >= 3 * n_words) & (total_word_chars <= 10 * n_words)
    r_symbol_ratio = n_symbols * 10 < n_words
    r_bullet_lines = bullet * 10 < n_lines * 9
    r_ellipsis_lines = ellipsis_end * 10 < n_lines * 3
    r_alpha_words = alpha_words * 5 > n_words * 4
    r_stopwords = n_stop >= min_stopwords
    rules = {
        "r_word_count": r_word_count,
        "r_mean_word_len": r_mean_word_len,
        "r_symbol_ratio": r_symbol_ratio,
        "r_bullet_lines": r_bullet_lines,
        "r_ellipsis_lines": r_ellipsis_lines,
        "r_alpha_words": r_alpha_words,
        "r_stopwords": r_stopwords,
    }
    passes = F.lit(True)
    for col in rules.values():
        passes = passes & col
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        *[col.alias(name) for name, col in rules.items()],
        passes.alias("passes"),
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int | None = None,
) -> DataFrame:
    """Character-distribution Shannon entropy per document, in exact
    micro-nats — the cheap gibberish/binary-spill/low-diversity signal
    (aaaa..., base64 blobs, single-char padding all sit far from the
    ~4.1-nat band natural language occupies).

    Entropy is decomposed so every accumulation is an exact bigint sum
    (house policy, same as ``lm.bigram_lm_scores``)::

        H = ln(n) - (1/n) * sum_c c*ln(c)
        entropy_micro = round(ln(n)*1e6) - (sum_c round(c*ln(c)*1e6)) div n

    with ``c`` the exact per-character count, so the result is
    bit-identical on any engine/partition layout (each term is one
    ``ln`` micro-rounded; the fold order over the SORTED distinct-char
    array is integer addition — order-free).

    Scale shape: zero shuffle, zero UDF — one row-local codegen'd
    expression per document. Per-row cost is O(distinct_chars x n) via
    ``replace``-based counting (distinct chars is alphabet-bounded,
    ~10^2 for natural text); ``max_chars`` truncates pathological
    documents first so the bound is hard. NULL/empty text yields NULL
    entropy. BMP-safe: counts are per UTF-16 code unit, identical to
    per-codepoint for all non-astral text.

    Returns ``(id_col, n_chars_used, n_unique_chars, entropy_micro)``.
    """
    t = (
        F.expr(f"substring({text_col}, 1, {int(max_chars)})")
        if max_chars is not None
        else F.col(text_col)
    )
    d = df.select(
        F.col(id_col),
        t.alias("__t"),
    ).select(
        id_col,
        "__t",
        F.length("__t").cast("bigint").alias("n_chars_used"),
        F.expr("array_sort(array_distinct(filter(split(__t, ''), x -> x <> '')))").alias("__cs"),
    )
    term_sum = (
        "aggregate(transform(__cs, ch -> CAST(round("
        "(n_chars_used - length(replace(__t, ch, ''))) * "
        "ln(n_chars_used - length(replace(__t, ch, ''))) * 1000000) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return d.select(
        id_col,
        F.coalesce("n_chars_used", F.lit(0).cast("bigint")).alias("n_chars_used"),
        F.coalesce(F.size("__cs"), F.lit(0)).cast("bigint").alias("n_unique_chars"),
        # term_sum >= 0 (c*ln(c) >= 0), so plain integer `div` is the floor
        F.expr(
            "CASE WHEN n_chars_used > 0 THEN "
            "CAST(round(ln(n_chars_used) * 1000000) AS BIGINT)"
            f" - ({term_sum}) div n_chars_used END"
        ).alias("entropy_micro"),
    )


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic at corpus scale.

    ``D = sup_x |F_a(x) - F_b(x)|`` — the sharpest standard drift test for
    a continuous feature between two corpus snapshots (PSI needs binning;
    KS does not). For step CDFs the sup is attained on the merged set of
    jump points, so the exact computation is: per-distinct-value counts
    (one hash shuffle with map-side combine), cumulative counts in value
    order via the two-pass distributed prefix sum (range shuffle over
    DISTINCT values + a <= num_partitions-row offsets collect — same
    machinery as ``curation.global_running_sum``, never a one-partition
    window), then a max over ``|cum_a*n_b - cum_b*n_a|`` in exact integer
    cross-multiplied units — overflow-safe while ``n_a * n_b < 2^63``
    (corpora to ~3e9 rows per side).

    Returns one row: ``ks_stat`` (double, 6dp), ``ks_at`` (the smallest
    value attaining the sup — deterministic under ties), ``n_a``, ``n_b``.
    NULL values are ignored on both sides.
    """
    from pyspark.sql import Window

    sa = a.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(1))
    sb = b.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(0))
    u = sa.union(sb).filter(F.col("__v").isNotNull())
    counts = u.groupBy("__v").agg(
        F.sum("__ia").cast("long").alias("__ca"),
        F.sum(1 - F.col("__ia")).cast("long").alias("__cb"),
    )
    return ks_from_counts(counts, "__v", "__ca", "__cb", num_partitions)


def ks_from_counts(
    counts: DataFrame,
    value_col: str,
    count_a_col: str,
    count_b_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`ks_drift` from pre-aggregated per-value counts — the form a
    STREAMING drift monitor needs: maintain a value histogram of the live
    stream (a native update-mode groupBy count, bounded state = distinct
    values), histogram the reference corpus once, full-outer the two on
    the value, and hand the merged counts here. Same exact integer
    cross-multiplied sup, same deterministic ``ks_at``. Missing counts
    (value seen on one side only) may be NULL — treated as zero."""
    from pyspark.sql import Window

    spark = counts.sparkSession
    counts = counts.select(
        F.col(value_col).alias("__v"),
        F.coalesce(F.col(count_a_col), F.lit(0)).cast("long").alias("__ca"),
        F.coalesce(F.col(count_b_col), F.lit(0)).cast("long").alias("__cb"),
    ).filter(F.col("__v").isNotNull())
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        counts.repartitionByRange(n, F.col("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # totals collect + final agg share one materialization
    )
    w = Window.partitionBy("__pid").orderBy("__v")
    local = ranged.withColumn("__la", F.sum("__ca").over(w)).withColumn(
        "__lb", F.sum("__cb").over(w)
    )
    totals = sorted(
        (r["__pid"], r["ta"], r["tb"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum("__ca").alias("ta"), F.sum("__cb").alias("tb"))
        .collect()
    )
    offsets, acc_a, acc_b = [], 0, 0
    for pid, ta, tb in totals:
        offsets.append((pid, acc_a, acc_b))
        acc_a += ta or 0
        acc_b += tb or 0
    na, nb = acc_a, acc_b
    if na == 0 or nb == 0:
        raise ValueError(f"ks_drift needs non-empty sides, got n_a={na}, n_b={nb}")
    off = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __oa long, __ob long")
    )
    scored = (
        local.join(off, "__pid")
        .select(
            "__v",
            F.abs(
                (F.col("__la") + F.col("__oa")) * F.lit(nb)
                - (F.col("__lb") + F.col("__ob")) * F.lit(na)
            ).alias("__d"),
        )
    )
    # one aggregate: max diff, and min value attaining it (max of -v)
    m = scored.agg(
        F.max(F.struct(F.col("__d").alias("d"), (-F.col("__v")).alias("nv"))).alias("m")
    )
    return m.select(
        F.round(F.col("m.d") / F.lit(float(na * nb)), 6).alias("ks_stat"),
        (-F.col("m.nv")).alias("ks_at"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: every row whose
    (quasi_cols) combination appears in fewer than ``k`` rows is a
    re-identification risk — the standard release gate before sharing a
    curated dataset (Sweeney 2002). NULL combinations group together
    (NULL is itself identifying).

    One hash aggregation with map-side combine (group sizes), broadcast
    back onto the rows is wrong at scale — group count can be huge — so
    the sizes REJOIN on the quasi key: one shuffle each side, AQE
    handles skewed combinations. Returns the input plus ``group_size``
    (bigint) and ``at_risk`` (group_size < k); aggregate downstream for
    the release decision (suite query reports the risky-group census).
    """
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    if k < 2:
        raise ValueError(f"k must be >= 2 to mean anything, got {k}")
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    # null-safe join keys (<=>): a plain equi-join would silently drop
    # every NULL-valued combination — exactly the rows most at risk.
    # EqualNullSafe still plans as a hash-partitioned equi-join.
    left, right = df.alias("__ka_l"), sizes.alias("__ka_r")
    cond = None
    for c in quasi_cols:
        clause = F.col(f"__ka_l.{c}").eqNullSafe(F.col(f"__ka_r.{c}"))
        cond = clause if cond is None else cond & clause
    return left.join(right, cond).select(
        *[F.col(f"__ka_l.{c}") for c in df.columns],
        F.col("__ka_r.group_size"),
        (F.col("__ka_r.group_size") < k).alias("at_risk"),
    )


def table_digest(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive content digest of a table slice — the
    cross-engine "did the rewrite change anything?" audit that pairs
    with ``layout.compact_files`` / ``layout.zorder_write`` /
    migrations: digest before, digest after, compare one row.

    Per row, the listed columns are rendered canonically and
    '|'-joined. The rendering is PREFIX-UNAMBIGUOUS: ``n`` for NULL,
    ``v<len>:<value>`` otherwise — the length prefix makes a delimiter
    inside a value harmless (``('a|b','c')`` vs ``('a','b|c')`` hash
    differently) and the tag byte makes NULL distinct from every
    literal string, including one spelled like a null sentinel. The
    joined row string is hashed with the house 60-bit md5 fold. Three
    commutative-associative reductions make the digest order- and
    layout-independent AND mergeable across shards (combine shard
    digests with xor / sum / sum):

    - ``n_rows``   exact count
    - ``xor60``    bit_xor of the row hashes (overflow-free; its known
      blind spot — duplicate rows cancelling in pairs — is covered by:)
    - ``sum31``    exact sum of ``hash mod 2^31`` (safe to ~4e12 rows)

    Contract: only use columns whose string rendering is engine-stable
    (ints, strings, exact decimals, booleans). Doubles and timestamps
    format differently across engines — derive an exact integer (floor
    cents, epoch micros) FIRST, as everywhere else in the house rules.

    Scale shape: map-side combine into ONE row; the shuffle carries one
    partial per task. Column pruning limits the scan to ``cols``.

    DIGEST FORMAT v2 (round 5): the prefix-unambiguous rendering above
    replaced a plain ``coalesce``-based format, so digests recorded
    under the old format differ for EVERY table — a before/after
    comparison across that upgrade reports a false mismatch. Treat the
    rendering as the digest's format version: when this function's
    rendering changes, re-record stored baselines instead of reading
    the mismatch as data drift (``n_rows`` stays comparable across
    versions; ``xor60``/``sum31`` do not).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    rendered = " || '|' || ".join(
        f"CASE WHEN {c} IS NULL THEN 'n' "
        f"ELSE 'v' || CAST(length(CAST({c} AS STRING)) AS STRING) || ':' "
        f"|| CAST({c} AS STRING) END"
        for c in cols
    )
    h = f"CAST(conv(substr(md5({rendered}), 1, 15), 16, 10) AS BIGINT)"
    return df.select(F.expr(h).alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__h)").cast("bigint").alias("xor60"),
        F.expr("sum(__h % 2147483648)").cast("bigint").alias("sum31"),
    )


def fk_orphans(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    pk_col: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity audit for one FK relation.

    The warehouse health check the engine's inner joins silently assume
    (FK-violating rows just vanish from join results — reference-parity
    behavior, but an audit should SEE them): counts fact rows whose FK
    has no match in the dimension's PK. ANSI FK semantics: a NULL FK is
    not a violation (reported separately as ``n_null_fk``).

    One column-pruned scan of each side: the deduped PK set left-joins
    onto the fact keys (Catalyst broadcasts a small dim, AQE handles a
    big one) and a single aggregation produces the audit row. Min/max
    orphan keys are included as actionable repro pointers.

    Returns one row: ``relation``, ``n_rows``, ``n_null_fk``,
    ``n_orphans``, ``n_orphan_keys``, ``min_orphan_key``,
    ``max_orphan_key``.
    """
    keys = dim.select(F.col(pk_col).alias("__pk")).where(
        F.col("__pk").isNotNull()
    ).distinct().withColumn("__hit", F.lit(1))
    j = fact.select(F.col(fk_col).alias("__fk")).join(
        keys, F.col("__fk") == F.col("__pk"), "left"
    )
    orphan = F.col("__fk").isNotNull() & F.col("__hit").isNull()
    return j.agg(
        F.lit(relation).alias("relation"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("__fk").isNull().cast("long")).cast("long").alias("n_null_fk"),
        F.sum(orphan.cast("long")).cast("long").alias("n_orphans"),
        F.count_distinct(F.when(orphan, F.col("__fk"))).cast("long").alias("n_orphan_keys"),
        F.min(F.when(orphan, F.col("__fk"))).alias("min_orphan_key"),
        F.max(F.when(orphan, F.col("__fk"))).alias("max_orphan_key"),
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law.

    The classic fabricated-data / broken-feed screen (Nigrini): natural
    multi-magnitude positive amounts follow ``P(d) = log10(1 + 1/d)``;
    uniform synthetic data, truncation bugs, and copy-paste rows do
    not. The audit reports the observed digit mix, the expected law,
    and the mean absolute deviation (MAD, Nigrini's statistic —
    > ~0.015 on amounts is "nonconformity").

    Exactness: the first digit comes from the DECIMAL STRING of the
    cent-quantized bigint (``floor(value*100)``) — never from
    ``floor(log10(x))``, whose float boundary at powers of ten
    misclassifies 1000.0 on some engines. Digits with zero observations
    still report (1..9 grid). Percentages are 6dp-rounded before the
    deviation arithmetic, deviations are exact micro-units, and the MAD
    is their bigint sum div 9 — engine- and layout-stable throughout.
    Non-positive and NULL values are excluded (Benford applies to
    positive amounts).

    One hash aggregation (9 groups) + broadcast total; nothing scales
    with input beyond the scan.

    Returns 9 rows: ``digit``, ``n_obs``, ``pct``, ``expected_pct``,
    ``dev_micro``, ``mad_micro`` (same on every row).
    """
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    pos = df.select(cents.alias("__c")).where(F.col("__c") > 0)
    counts = pos.groupBy(
        F.substring(F.col("__c").cast("string"), 1, 1).cast("int").alias("digit")
    ).agg(F.count(F.lit(1)).alias("__n"))
    spark = df.sparkSession
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    tot = counts.agg(F.sum("__n").alias("__nn"))
    full = (
        grid.join(counts, "digit", "left")
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    pct = F.round(F.col("__n").cast("double") / F.col("__nn").cast("double"), 6)
    expected = F.round(
        F.log10((F.col("digit") + 1).cast("double") / F.col("digit").cast("double")), 6
    )
    scored = full.select(
        "digit",
        F.col("__n").cast("long").alias("n_obs"),
        pct.alias("pct"),
        expected.alias("expected_pct"),
        F.round(F.abs(pct - expected) * F.lit(1000000.0)).cast("long").alias("dev_micro"),
    )
    mad = scored.agg(
        (F.sum("dev_micro") - F.sum("dev_micro") % 9).alias("__s")
    ).select((F.col("__s") / 9).cast("long").alias("mad_micro"))
    return scored.crossJoin(F.broadcast(mad))


def js_divergence(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact Jensen–Shannon divergence between two corpora's value
    distributions — the bounded, symmetric companion to :func:`psi_drift`
    (PSI explodes on empty bins; JSD is finite by construction, in
    [0, ln 2]) and to :func:`ks_drift` (KS sees only the worst CDF gap;
    JSD weighs the whole distribution).

    The key identity keeping it integer-exact: with per-value counts
    ``ca, cb`` and totals ``na, nb``, the likelihood ratios are pure
    integer ratios ``P/M = 2*ca*nb / (ca*nb + cb*na)`` (and mirrored
    for Q/M), so each value's log term is ONE micro-rounded ln of
    bigints (house PMI policy) weighted by the exact count::

        sum_a = Σ_v ca * round(1e6 * ln(2*ca*nb / (ca*nb + cb*na)))
        JSD   = (sum_a/na + sum_b/nb) / 2e6        -- nats

    Zero-count values contribute nothing on their zero side (0·ln 0 = 0)
    and are exact on the other — no smoothing needed. Overflow bound:
    ``ca * nb < 2^63`` (≈3e9 rows per side, the KS/MW bound); the
    count-weighted micro sums stay under 2^63 for any such corpus
    because ``Σ ca * 1e6 * ln2 ≤ na * 7e5``.

    Scale shape: one value-hash aggregation with map-side combine
    (state = distinct values) + a one-row final aggregate — the same
    streamable-from-a-histogram profile as the other drift gates.

    Returns one row: ``(jsd_nats, jsd_norm, n_a, n_b)`` where
    ``jsd_norm = jsd/ln 2 ∈ [0, 1]``; both NULL when either side is
    empty (an all-NULL or empty corpus has no distribution to compare).
    """
    sa = a.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(1))
    sb = b.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(0))
    u = sa.union(sb).filter(F.col("__v").isNotNull())
    counts = u.groupBy("__v").agg(
        F.sum("__ia").cast("long").alias("__ca"),
        F.sum(1 - F.col("__ia")).cast("long").alias("__cb"),
    )
    return js_from_counts(counts, "__v", "__ca", "__cb")


def js_from_counts(
    counts: DataFrame,
    value_col: str,
    count_a_col: str,
    count_b_col: str,
) -> DataFrame:
    """:func:`js_divergence` from pre-aggregated per-value counts — the
    form a STREAMING drift monitor needs, exactly like
    :func:`ks_from_counts` / :func:`...stats.mannwhitney_from_counts`:
    maintain a value histogram of the live stream (native update-mode
    groupBy count, bounded state = distinct values), histogram the
    reference once, full-outer the two on the value, and hand the
    merged counts here. Missing counts (value on one side only) may be
    NULL — treated as zero. Same exact micro-ln integers, same
    NULL-on-empty-side contract."""
    counts = counts.select(
        F.col(value_col).alias("__v"),
        F.coalesce(F.col(count_a_col), F.lit(0)).cast("long").alias("__ca"),
        F.coalesce(F.col(count_b_col), F.lit(0)).cast("long").alias("__cb"),
    ).filter(F.col("__v").isNotNull())
    tot = counts.agg(
        F.sum("__ca").cast("long").alias("na"), F.sum("__cb").cast("long").alias("nb")
    )
    j = counts.crossJoin(F.broadcast(tot))
    den = F.col("__ca") * F.col("nb") + F.col("__cb") * F.col("na")
    # try_divide: with an EMPTY opposite side the denominator is 0 for
    # every value; the NULL rides through sum -> the ok-guard NULLs the
    # output (ANSI / would raise inside the taken ca>0 branch)
    lmicro = lambda num: F.round(
        F.lit(1_000_000.0)
        * F.log(F.try_divide(num.cast("double"), den.cast("double"))),
        0,
    ).cast("bigint")
    agg = j.agg(
        F.sum(
            F.when(F.col("__ca") > 0, F.col("__ca") * lmicro(2 * F.col("__ca") * F.col("nb")))
            .otherwise(F.lit(0))
        ).alias("__suma"),
        F.sum(
            F.when(F.col("__cb") > 0, F.col("__cb") * lmicro(2 * F.col("__cb") * F.col("na")))
            .otherwise(F.lit(0))
        ).alias("__sumb"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
    )
    jsd = (
        F.col("__suma").cast("double") / F.col("n_a").cast("double")
        + F.col("__sumb").cast("double") / F.col("n_b").cast("double")
    ) / F.lit(2_000_000.0)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        F.when(ok, F.round(jsd, 6)).alias("jsd_nats"),
        F.when(ok, F.round(jsd / F.log(F.lit(2.0)), 6)).alias("jsd_norm"),
        F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
    )
