"""Exact distributed statistics.

``corr_matrix`` computes Pearson correlations whose results do not
depend on partition layout or engine: float sums are accumulation-
order-dependent (Spark's built-in ``corr`` can drift in the last few
ulps between runs), so values are quantized to scaled integers and
ALL moment sums run exact (decimal(38) on Spark, HUGEINT in the SQL
oracle). The float finish — the textbook
``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))`` — starts
from bit-identical integers, applies the identical expression, and
rounds to 6dp.

One aggregate over one scan computes every pairwise moment (p sums +
p(p+1)/2 product sums + the row count); output is one row per pair.
Rows with a null in ANY selected column are dropped (listwise
deletion) so every pair sees the same n.

The ``scale`` trades quantization error (values round to 1/scale)
against headroom: per-product magnitude is ``(scale*|x|max)^2``, and
the exact decimal sums never overflow below 1e38 total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _null_safe_left_join(left: DataFrame, right: DataFrame, cols: list[str]) -> DataFrame:
    """Left join with eqNullSafe keys: NULL group keys match their own
    group's aggregate row (review r7: the plain USING-columns equality
    silently left every NULL stratum without stats). The right side's
    key columns are renamed to avoid self-lineage ambiguity and dropped
    after the join."""
    r = right.select(
        *[F.col(g).alias(f"__g_{g}") for g in cols],
        *[c for c in right.columns if c not in cols],
    )
    cond = F.lit(True)
    for g in cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__g_{g}"))
    return left.join(r, cond, "left").drop(*[f"__g_{g}" for g in cols])

def corr_matrix(df: DataFrame, cols: list[str], scale: int = 100) -> DataFrame:
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols}")
    clean = df
    for c in cols:
        cc = F.col(c).cast("double")
        clean = clean.where(cc.isNotNull() & ~F.isnan(cc))
    q = {
        c: F.round(F.col(c).cast("double") * scale).cast("decimal(18,0)") for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"__s_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    for a, b in pairs:
        aggs.append(F.sum(q[a] * q[b]).alias(f"__p_{a}_{b}"))
    one = clean.agg(*aggs)

    entries = []
    for a, b in pairs:
        if a == b:
            continue
        n = F.col("__n").cast("double")
        sx = F.col(f"__s_{a}").cast("double")
        sy = F.col(f"__s_{b}").cast("double")
        sxy = F.col(f"__p_{a}_{b}").cast("double")
        sxx = F.col(f"__p_{a}_{a}").cast("double")
        syy = F.col(f"__p_{b}_{b}").cast("double")
        denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = F.when(denom == 0, F.lit(None)).otherwise(
            F.round((n * sxy - sx * sy) / denom, 6)
        )
        entries.append(
            F.struct(
                F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                corr.alias("corr"), F.col("__n").alias("n"),
            )
        )
    return one.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def standardize(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    scale: int = 100,
    clip: float | None = None,
) -> DataFrame:
    """Per-group z-score standardization, layout/engine-exact: the
    feature-normalization step of a training pipeline (per-source
    length/quality normalization before mixing corpora).

    Same determinism policy as :func:`corr_matrix`: values quantize to
    ``v = round(x*scale)`` integers; per group the exact sums
    ``n, s=Σv, p=Σv²`` (decimal(38)) feed the identity

        z = (n·v − s) / sqrt(n·p − s²)

    — pure integers inside one double expression, rounded to 6dp, so
    the score is bit-identical on any partition layout and in the SQL
    oracle. Zero-variance groups emit NULL; null/NaN rows pass through
    with NULL z. ``clip`` winsorizes to ±clip after rounding (the usual
    outlier guard before feeding a model).

    Scale shape: ONE grouped aggregation (map-side partial) broadcast
    back onto the rows — no window over the data, no second shuffle of
    the fact table; ungrouped inputs use a single-row broadcast.
    """
    groups = group_cols or []
    c = F.col(col).cast("double")
    v = F.round(c * scale).cast("decimal(18,0)")
    clean = df.where(c.isNotNull() & ~F.isnan(c))
    stats = clean.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__p"),
    )
    # null-safe left join: a NULL group key matches its own stats row
    # (review r7), and a group whose values are ALL null/NaN has no
    # stats row — its rows still pass through with NULL z
    out = (
        _null_safe_left_join(df, F.broadcast(stats), groups)
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    p = F.col("__p").cast("double")
    denom = F.sqrt(n * p - s * s)
    z = F.when(
        c.isNull() | F.isnan(c) | (denom == 0), F.lit(None)
    ).otherwise(F.round((n * v.cast("double") - s) / denom, 6))
    if clip is not None:
        # greatest/least IGNORE nulls (both engines) — clip only real scores
        z = F.when(z.isNotNull(), F.least(F.greatest(z, F.lit(-clip)), F.lit(clip)))
    return out.select(*df.columns, z.alias("z"))


def pca_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    scale: int = 10**6,
) -> dict:
    """Exact-moment distributed PCA fit for an embedding column.

    The only scale-relevant work — the d×d second-moment matrix — is one
    ``mapInPandas`` pass emitting ONE partial row per partition (count,
    component sums, outer-product sums), all in ARBITRARY-PRECISION
    integers over ``scale``-quantized values, serialized as decimal
    strings. The driver combines ≤ num_partitions such rows, forms the
    covariance from exact integer numerators
    ``n*O_ij - S_i*S_j`` (no float accumulation anywhere), and runs the
    d×d eigendecomposition locally (d is the embedding width — always
    driver-sized; the CORPUS never leaves the cluster).

    Layout/engine independence: integer sums are order-insensitive, so
    the covariance handed to the eigensolver is bit-identical on any
    partitioning — re-runs and repartitioned inputs give the same
    components. Eigenvector sign is pinned: the largest-|x| entry of
    each component (first index on ties) is made positive.

    Returns ``{"mean", "components" (k×d, rows = top components by
    eigenvalue, descending), "explained_var", "n"}`` as numpy arrays.
    """
    import numpy as np

    part_schema = "n long, s array<string>, o array<string>"

    def _partials(batches):
        import pandas as pd

        # int64 matmul per Arrow batch (vectorized; safe while
        # (scale*|x|max)^2 * batch_rows < 2^63 — i.e. scale*|x|max up to
        # ~3e7 at the default 10k-row batches), accumulated into
        # arbitrary-precision object arrays BETWEEN batches so partition
        # size never overflows.
        n, s, o = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            q = np.rint(m.astype(np.float64) * scale).astype(np.int64)
            n += len(q)
            ps = q.sum(axis=0, dtype=np.int64).astype(object)
            po = (q.T @ q).ravel().astype(object)
            s = ps if s is None else s + ps
            o = po if o is None else o + po
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [[str(x) for x in s]], "o": [[str(x) for x in o]]}
        )

    rows = df.select(vec_col).mapInPandas(_partials, part_schema).collect()
    if not rows:
        raise ValueError("pca_fit on an empty DataFrame")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    S = [0] * d
    O = [0] * (d * d)
    for r in rows:
        for i, x in enumerate(r["s"]):
            S[i] += int(x)
        for i, x in enumerate(r["o"]):
            O[i] += int(x)
    # covariance in exact integer numerators over n^2 * scale^2
    denom = float(n) * float(n) * float(scale) * float(scale)
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(n * O[i * d + j] - S[i] * S[j]) / denom
    mean = np.array([float(x) for x in S], dtype=np.float64) / (n * scale)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for row in comps:
        pivot = int(np.argmax(np.abs(row)))
        if row[pivot] < 0:
            row *= -1.0
    return {
        "mean": mean,
        "components": comps,
        "explained_var": vals[order].copy(),
        "n": n,
    }


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: dict,
    out_col: str = "pca",
    round_dp: int = 6,
) -> DataFrame:
    """Project embeddings onto a :func:`pca_fit` model: ``(x - mean) @ Vᵀ``
    as an Arrow-batched numpy matmul (components broadcast with the
    closure — k×d floats, always tiny). Zero shuffle; rounds to
    ``round_dp`` so downstream comparisons are reproducible."""
    import numpy as np

    mean = model["mean"]
    comps = model["components"]
    out_schema = f"{id_col} {dict(df.dtypes)[id_col]}, {out_col} array<double>"

    def _proj(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = np.round((m - mean) @ comps.T, round_dp)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(p)})

    return df.select(id_col, vec_col).mapInPandas(_proj, out_schema)


def ntile_global(
    df: DataFrame,
    order_by: list,
    bins: int,
    out_col: str = "bin",
) -> DataFrame:
    """Exact global ``NTILE(bins)`` — equi-depth binning / feature
    discretization — without the one-partition window a keyless
    ``ntile() OVER (ORDER BY ...)`` plans.

    Global 0-based ranks come from the two-pass distributed prefix sum
    (:func:`...curation.assign_global_ids`: range shuffle + bounded
    offsets collect), then the bucket is ANSI NTILE's exact assignment
    computed arithmetically: with ``q = n div bins`` and ``r = n mod
    bins``, the first ``r`` buckets take ``q+1`` rows. ``order_by``
    must be a total order (append a unique tiebreaker) — that is also
    what makes ntile-over-ties deterministic enough to hash-compare
    across engines, which the SQL form alone does not guarantee.

    Returns the input plus ``out_col`` (1-based bucket, bigint).
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import assign_global_ids

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    ranked = assign_global_ids(df, order_by, "__rank")
    n = ranked.count()
    q, r = divmod(n, bins)
    if q == 0:  # fewer rows than bins: rank+1 IS the bucket (ANSI ntile)
        bucket = F.col("__rank") + 1
    else:
        cut = r * (q + 1)
        bucket = (
            F.when(F.col("__rank") < cut, F.floor(F.col("__rank") / (q + 1)))
            .otherwise(r + F.floor((F.col("__rank") - cut) / q))
            + 1
        )
    return ranked.withColumn(out_col, bucket.cast("bigint")).drop("__rank")


def mannwhitney_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Mann-Whitney U (Wilcoxon rank-sum) at corpus scale.

    The nonparametric companion to :func:`...quality.ks_drift`: KS is
    sharpest on shape changes, rank-sum on location shift — a streaming
    drift gate wants both. ``U_b = #{(x,y): x in A, y in B, x < y} +
    ties/2`` is computed EXACTLY in integers: per-distinct-value counts
    (one hash shuffle, map-side combine), cumulative A-counts in value
    order via the two-pass distributed prefix sum
    (:func:`...curation.global_running_sum` — range shuffle + bounded
    offsets collect, never a one-partition window), then one aggregate.
    Doubled units (``u2 = 2*U_b``) keep the half-tie term integral.

    Per-term bound ``sum(cb * cumA) <= n_a * n_b`` makes bigint safe to
    ~3e9 rows per side (same bound as KS); the tie-correction cubes run
    in decimal(38,0), safe to ~4.6e9 duplicates of one value.

    The normal-approximation z-score uses the tie-corrected variance
    ``n_a*n_b/12 * ((N+1) - sum(t^3-t)/(N(N-1)))`` and is evaluated with
    the same literal float expression the DuckDB oracle uses — both
    engines start from bit-identical integers, so 6dp rounding is
    engine-stable. All-values-tied degenerates to z = NULL.

    Returns one row: ``n_a``, ``n_b``, ``u2_b`` (doubled U of side B,
    bigint), ``z`` (6dp), ``rank_biserial`` (6dp effect size,
    ``2*U_b/(n_a*n_b) - 1``). NULLs ignored on both sides.
    """
    sa = a.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(1))
    sb = b.select(F.col(value_col).alias("__v")).withColumn("__ia", F.lit(0))
    u = sa.union(sb).filter(F.col("__v").isNotNull())
    counts = u.groupBy("__v").agg(
        F.sum("__ia").cast("long").alias("__ca"),
        F.sum(1 - F.col("__ia")).cast("long").alias("__cb"),
    )
    return mannwhitney_from_counts(counts, "__v", "__ca", "__cb", num_partitions)


def mannwhitney_from_counts(
    counts: DataFrame,
    value_col: str,
    count_a_col: str,
    count_b_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`mannwhitney_drift` from pre-aggregated per-value counts —
    the form a STREAMING drift monitor needs (exactly like
    :func:`...quality.ks_from_counts`): maintain a value histogram of
    the live stream (native update-mode groupBy count, bounded state =
    distinct values), histogram the reference once, full-outer the two
    on the value, and hand the merged counts here. Missing counts
    (value on one side only) may be NULL — treated as zero. Same exact
    doubled-rank integers, same tie-corrected z."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import global_running_sum

    counts = counts.select(
        F.col(value_col).alias("__v"),
        F.coalesce(F.col(count_a_col), F.lit(0)).cast("long").alias("__ca"),
        F.coalesce(F.col(count_b_col), F.lit(0)).cast("long").alias("__cb"),
    ).filter(F.col("__v").isNotNull())
    cum = global_running_sum(counts, "__v", F.col("__ca"), "__cuma", num_partitions)
    t = F.col("__ca") + F.col("__cb")
    agg = cum.agg(
        F.sum("__ca").alias("na"),
        F.sum("__cb").alias("nb"),
        F.sum(F.col("__cb") * (F.col("__cuma") - F.col("__ca"))).alias("below"),
        F.sum(F.col("__ca") * F.col("__cb")).alias("ties"),
        F.sum((t.cast("decimal(38,0)") * t * t) - t).alias("tcorr"),
    )
    # zero-row input: sum() is NULL but the true counts/U are 0 — a
    # drift monitor reading this row should see (0, 0, 0), not unknowns
    agg = agg.select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.coalesce("below", F.lit(0)).alias("below"),
        F.coalesce("ties", F.lit(0)).alias("ties"),
        F.coalesce("tcorr", F.lit(0).cast("decimal(38,0)")).alias("tcorr"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    nn = (F.col("na") + F.col("nb")).cast("double")
    u2 = (F.lit(2) * F.col("below") + F.col("ties")).cast("long")
    # tcorr/(N(N-1)) needs try_divide as well: the var_u expression is
    # evaluated for the `when` CONDITION below, so N <= 1 would divide
    # by zero before any branch short-circuiting can help.
    var_u = (
        na * nb / F.lit(12.0)
        * ((nn + F.lit(1.0)) - F.try_divide(F.col("tcorr").cast("double"), nn * (nn - F.lit(1.0))))
    )
    # try_divide, not bare /: under ANSI mode a double division by zero
    # throws DIVIDE_BY_ZERO, and an empty side (na*nb = 0) or an
    # all-tied sample (var_u = 0) is a realistic input for a streaming
    # drift monitor — those rows must degrade to NULL, not kill the job.
    # (The F.when(var_u > 0) wrapper alone does NOT protect: a CASE
    # branch's division evaluates eagerly even when the branch is not
    # taken — same ANSI trap as js_from_counts.)
    z = F.round(F.try_divide((u2.cast("double") - na * nb) / F.lit(2.0), F.sqrt(var_u)), 6)
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        u2.alias("u2_b"),
        F.when(var_u > 0, z).alias("z"),
        F.round(F.try_divide(u2.cast("double"), na * nb) - F.lit(1.0), 6).alias("rank_biserial"),
    )


def ols_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
    slope_unit: float = 1.0,
) -> DataFrame:
    """Per-group simple linear regression (OLS) with engine-stable values.

    The per-key trend extractor for feature pipelines ("is this user's
    spend drifting up?"): one hash aggregation computes the five exact
    integer moments (n, Sx, Sy, Sxx, Sxy, Syy) per group, then the
    closed-form finish

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) * slope_unit
        intercept = (Sy - slope_q * Sx) / n
        r2        = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))

    runs in doubles FROM the exact sums — same rationale as
    :func:`corr_matrix`: float accumulation order varies with partition
    layout, exact decimal(38,0) sums do not, and the identical literal
    float expression on bit-identical integers is reproducible across
    engines, so 6dp rounding hash-matches a SQL oracle.

    ``x_col``/``y_col`` must already be integer-valued expressions (the
    caller quantizes — e.g. epoch-millis offsets and cents); magnitudes
    to ~1e18 are accepted (decimal(18,0) inputs, decimal(37,0) products,
    decimal(38,0) sums: overflow-free to ~10 rows per key at the 1e18
    extreme, ~1e9 rows per key at 1e14 products). ``slope_unit``
    rescales the reported slope (e.g. 86400000.0 => per-day when x is
    milliseconds). Rows with a NULL in x or y are dropped (listwise).

    Degenerate groups keep exact semantics: constant x => slope,
    intercept, r2 all NULL; constant y under varying x => slope 0,
    r2 NULL (zero variance explained is undefined, not 1).

    Returns ``key_cols`` + ``n`` (bigint), ``slope``, ``intercept``,
    ``r2`` (doubles, 6dp).
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("decimal(18,0)")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("decimal(18,0)")
    clean = df.where(x.isNotNull() & y.isNotNull())
    agg = clean.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
        F.sum(y * y).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    det = nd * sxx - sx * sx
    num = nd * sxy - sx * sy
    deny = nd * syy - sy * sy
    return agg.select(
        *key_cols,
        F.col("n").cast("long").alias("n"),
        F.when(det > 0, F.round(num / det * F.lit(float(slope_unit)), 6)).alias("slope"),
        F.when(det > 0, F.round((sy - num / det * sx) / nd, 6)).alias("intercept"),
        F.when(det > 0, F.when(deny > 0, F.round(num * num / (det * deny), 6))).alias("r2"),
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence + Cramér's V.

    The categorical-association screen (feature-vs-label selection,
    segment-vs-outcome drift). Observed cells come from one hash
    aggregation; the missing-cell problem (absent (a,b) pairs still
    contribute ``e`` to the naive sum) is eliminated by the algebraic
    identity ``chi2 = sum_present(n^2 * N / (r_a * c_b)) - N``, so only
    present cells are ever touched.

    Layout independence without exact big-rationals: each cell term is
    evaluated in doubles FROM exact integers with one literal
    expression, micro-rounded to 1e-6, and summed as bigints (the
    engine's Naive-Bayes discipline) — float accumulation order can
    then never change the result, and the DuckDB oracle reproduces it
    bit-for-bit. Worst-case micro-rounding error is ``5e-7 * cells``.

    Scale shape: cells aggregate (one shuffle), marginals are two
    aggregations OF THE CELLS (already tiny), broadcast back — the raw
    table is scanned once. Assumes category cardinalities are
    broadcastable (thousands, not billions), the standard regime for a
    chi-squared test. NULL in either column drops the row (listwise).

    Returns one row: ``chi2`` (6dp), ``dof`` (bigint,
    ``(|A|-1)(|B|-1)``), ``n_obs`` (bigint), ``cramers_v`` (6dp, NULL
    when ``min(|A|,|B|) < 2``).
    """
    c = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    ra = c.groupBy(col_a).agg(F.sum("__n").alias("__ra"))
    cb = c.groupBy(col_b).agg(F.sum("__n").alias("__cb"))
    tot = c.agg(
        F.sum("__n").alias("__nn"),
        F.countDistinct(col_a).alias("__ka"),
        F.countDistinct(col_b).alias("__kb"),
    )
    nd = F.col("__nn").cast("double")
    term = (
        F.col("__n").cast("double") * F.col("__n").cast("double") * nd
        / (F.col("__ra").cast("double") * F.col("__cb").cast("double"))
    )
    cells = (
        c.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
    )
    agg = cells.agg(
        F.sum(F.round(term * F.lit(1000000.0)).cast("long")).alias("__micro"),
        F.first("__nn").alias("__nn"),
        F.first("__ka").alias("__ka"),
        F.first("__kb").alias("__kb"),
    )
    nd2 = F.col("__nn").cast("double")
    chi2 = F.greatest(
        F.lit(0.0), F.col("__micro").cast("double") / F.lit(1000000.0) - nd2
    )
    kmin = F.least(F.col("__ka"), F.col("__kb")) - 1
    return agg.select(
        F.round(chi2, 6).alias("chi2"),
        ((F.col("__ka") - 1) * (F.col("__kb") - 1)).cast("long").alias("dof"),
        F.col("__nn").cast("long").alias("n_obs"),
        F.when(
            kmin >= 1, F.round(F.sqrt(chi2 / (nd2 * kmin.cast("double"))), 6)
        ).alias("cramers_v"),
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower_micro: int = 50000,
    upper_micro: int = 950000,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip values at exact nearest-rank
    quantiles — the robust-feature step that tames heavy tails without
    deleting rows (unlike trimming) before standardization/regression.

    The bounds are ORDER STATISTICS, not interpolated quantiles: rank
    ``k = ceil(q * n)`` (1-based, computed in exact integers as
    ``(q_micro*n + 999999) div 1e6``), so the clip points are actual
    data values and the operator never invents a float — clipped output
    is pure comparison/selection, bit-identical on any engine.

    One per-group window sort ranks the non-null values; the two bound
    rows per group collapse to a #groups-row table that broadcasts back
    onto the data (no second full shuffle). NULLs pass through
    unclipped and don't count toward ``n``. Ties are safe: equal values
    are adjacent in rank order, so the rank-k VALUE is deterministic
    whatever the tie order.

    Returns the input plus ``out_col`` (clipped value), ``lo_bound``,
    ``hi_bound``, and ``clipped`` (boolean; NULL for NULL values).
    """
    if not 0 <= lower_micro <= upper_micro <= 1000000:
        raise ValueError(
            f"need 0 <= lower <= upper <= 1e6, got {lower_micro}, {upper_micro}"
        )
    out_col = out_col or f"{value_col}_winsorized"
    w = Window.partitionBy(*group_cols).orderBy(F.col("__v"))
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols)))
    )
    k_lo = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"CAST(({int(lower_micro)} * __n + 999999) div 1000000 AS BIGINT)"),
    )
    k_hi = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"CAST(({int(upper_micro)} * __n + 999999) div 1000000 AS BIGINT)"),
    )
    bounds = (
        ranked.withColumn("__klo", k_lo)
        .withColumn("__khi", k_hi)
        .groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__klo"), F.col("__v"))).alias("lo_bound"),
            F.min(F.when(F.col("__rn") == F.col("__khi"), F.col("__v"))).alias("hi_bound"),
        )
    )
    joined = _null_safe_left_join(df, F.broadcast(bounds), list(group_cols))
    v = F.col(value_col)
    clipped_v = F.least(F.greatest(v, F.col("lo_bound")), F.col("hi_bound"))
    return joined.withColumn(
        out_col, F.when(v.isNotNull(), clipped_v)
    ).withColumn(
        "clipped", F.when(v.isNotNull(), v != F.col(out_col))
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Map every group's value distribution onto the pooled global
    distribution — quantile normalization, the cross-source calibration
    step (microarray-famous, equally at home making per-source quality
    scores comparable before a corpus-wide quality gate): after it, a
    document at its source's median sits at the GLOBAL median, whatever
    its source's scale or skew was.

    Semantics, exact in integers end to end:

    - within each group, a distinct value's doubled midrank is
      ``2*cum - cnt + 1`` (cum = inclusive cumulative count in value
      order), the standard tie-averaged rank doubled to stay integral;
    - its target global index is ``clamp(((2*cum - cnt + 1) * N) div
      (2 * n_g), 1, N)`` — all bigint (bound: ``2*N^2 < 2^63`` means
      N up to ~2.1e9 pooled rows; normalize per shard past that);
    - the normalized value is the global order statistic at that index:
      an ACTUAL data value (nearest-rank discipline, like
      ``winsorize``) — the operator never invents a float.

    Scale shape: per-group cumulative counts ride one hash shuffle +
    in-partition window (partition size = distinct values per group,
    value-domain-bounded); the global cumulative uses the two-pass
    distributed prefix sum (:func:`...curation.global_running_sum`);
    the index lookup is a distributed AS-OF merge of the two DISTINCT-
    value tables: union tagged rows, range-repartition on the index
    axis, carry the last seen global value within each range partition,
    and stitch partition boundaries with a bounded (≤ num_partitions
    rows) offsets collect — never a single-partition window, never a
    quadratic range join.

    Rows with a NULL group key or NULL value are EXCLUDED from the
    mapping (documented contract, review r7): a NULL stratum has no
    quantile identity here — rename or impute it upstream if its rows
    must participate.

    Returns one row per ``(group, value)``: ``(group_col, value_col,
    cnt, normalized)`` — join it back on (group, value) to normalize
    row-level data.
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
        global_running_sum,
    )

    spark = df.sparkSession
    vals = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())

    src = vals.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.partitionBy("__g").orderBy("__v")
    w_all = Window.partitionBy("__g")
    srcw = src.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__ng", F.sum("__cnt").over(w_all)
    )

    glob = vals.groupBy("__v").agg(F.count(F.lit(1)).alias("__cg"))
    globw = global_running_sum(glob, "__v", "__cg", out_col="__hi")
    # a value occupies global ranks [__hi-__cg+1, __hi]; its interval
    # START is the as-of key (backward match from any index inside it)
    dim = globw.select(
        (F.col("__hi") - F.col("__cg") + 1).alias("__pos"),
        F.col("__v").alias("__norm"),
    )
    total = F.broadcast(glob.agg(F.sum("__cg").cast("bigint").alias("__n")))

    probe = srcw.crossJoin(total).withColumn(
        "__pos",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.least(
                F.col("__n"),
                F.call_function(
                    "div",
                    (2 * F.col("__cum") - F.col("__cnt") + 1) * F.col("__n"),
                    2 * F.col("__ng"),
                ),
            ),
        ),
    )

    # distributed AS-OF merge on __pos: dim rows sort before probe rows
    # at equal position (inclusive match), last dim value carries forward
    tagged = dim.select(
        "__pos", F.lit(0).alias("__tag"), "__norm",
        F.lit(None).cast(src.schema["__g"].dataType).alias("__g"),
        F.lit(None).cast(src.schema["__v"].dataType).alias("__v"),
        F.lit(None).cast("bigint").alias("__cnt"),
    ).unionByName(
        probe.select(
            "__pos", F.lit(1).alias("__tag"),
            F.lit(None).cast(dim.schema["__norm"].dataType).alias("__norm"),
            "__g", "__v", "__cnt",
        )
    )
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        tagged.repartitionByRange(n, F.col("__pos"), F.col("__tag"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # boundary collect + final share one run
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__pos", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__carry", F.last("__norm", ignorenulls=True).over(w))
    # per-partition LAST dim value (bounded collect), accumulated so a
    # partition whose prefix has no dim row inherits the previous one
    finals = sorted(
        (r["__pid"], r["m"])
        for r in ranged.filter(F.col("__tag") == 0)
        .groupBy("__pid")
        .agg(F.max(F.struct("__pos", "__norm")).alias("s"))
        .select("__pid", F.col("s.__norm").alias("m"))
        .collect()
    )
    final_by_pid = dict(finals)
    offsets, carry = [], None
    for pid in range(n):
        offsets.append((pid, carry))
        carry = final_by_pid.get(pid, carry)
    off = F.broadcast(
        spark.createDataFrame(
            offsets, f"__pid int, __prev {dim.schema['__norm'].dataType.simpleString()}"
        )
    )
    return (
        local.join(off, "__pid")
        .filter(F.col("__tag") == 1)
        .select(
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            F.col("__cnt").cast("bigint").alias("cnt"),
            F.coalesce(F.col("__carry"), F.col("__prev")).alias("normalized"),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC AUC of a score against a boolean label at corpus scale
    — the model-eval twin of :func:`mannwhitney_from_counts`, because
    AUC IS the rank-sum statistic: ``AUC = P(score_pos > score_neg) +
    P(tie)/2 = U_pos / (n_pos * n_neg)``. Ties get the standard half
    credit via the same doubled-rank integers, so the result is exact
    (no trapezoid approximation over thresholds, no sampling).

    ``label_col``: a column name or boolean Column marking POSITIVES.
    A named NUMERIC column is accepted in the sklearn 0/1 convention
    (any non-zero value is positive); a Column expression must be
    boolean. Rows with a NULL score or label are dropped.

    Scale shape: one hash shuffle to per-score counts (map-side
    combine; state = distinct scores), then the two-pass prefix sum —
    identical cost profile to the drift monitors, streamable from a
    maintained histogram the same way.

    Returns one row: ``(auc, n_pos, n_neg)``; ``auc`` NULL when either
    class is empty.
    """
    raw = F.col(label_col) if isinstance(label_col, str) else label_col
    label = raw
    if isinstance(label_col, str):
        from pyspark.sql.types import NumericType

        if isinstance(df.schema[label_col].dataType, NumericType):
            label = raw != 0
    counts = (
        df.filter(F.col(score_col).isNotNull() & raw.isNotNull())
        .groupBy(F.col(score_col).alias("__s"))
        .agg(
            F.sum(F.when(label, 1).otherwise(0)).alias("__pos"),
            F.sum(F.when(label, 0).otherwise(1)).alias("__neg"),
        )
    )
    mw = mannwhitney_from_counts(counts, "__s", "__neg", "__pos", num_partitions)
    return mw.select(
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("u2_b").cast("double")
                / (2.0 * F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ),
        ).alias("auc"),
        F.col("n_b").alias("n_pos"),
        F.col("n_a").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str | Column,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier — the
    calibration audit that complements :func:`roc_auc` (AUC measures
    RANKING; a quality/filter model whose probabilities feed weighted
    sampling or thresholds also needs its probabilities to MEAN what
    they say). Bins predictions into ``n_bins`` equal-width bins over
    [0, 1] and reports, per bin, the count, the exact mean predicted
    probability, and the observed positive rate — both in micro units
    (bigint), so the table is bit-identical on any engine/layout and
    ECE/MCE are one weighted fold downstream.

    Exactness: each probability is micro-rounded ONCE (round(p*1e6) —
    the same row-level quantization discipline as the drift monitors),
    then everything is integer arithmetic: bin = least(p_micro*B div
    1e6, B-1) (right-closed last bin), means are integer div. A
    probability outside [0, 1] raises at scan time (raise_error guard
    — silent clamping would hide a broken model head). NULL prob/label
    rows drop, as in :func:`roc_auc`.

    Scale shape: ONE hash aggregate with map-side combine and ≤ n_bins
    groups of state — streamable from a maintained histogram like the
    drift family. Returns (bin, n, mean_pred_micro, pos_rate_micro)
    with empty bins absent (an empty bin has no mean prediction).

    ``label_col``: column name (numeric: sklearn 0/1 convention) or a
    boolean Column marking positives."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    raw = F.col(label_col) if isinstance(label_col, str) else label_col
    label = raw
    if isinstance(label_col, str):
        from pyspark.sql.types import NumericType

        if isinstance(df.schema[label_col].dataType, NumericType):
            label = raw != 0
    pd_ = p.cast("double")
    pm = F.when(
        (pd_ < 0) | (pd_ > 1),
        F.raise_error(F.lit("calibration_bins: probability outside [0, 1]")),
    ).otherwise(F.round(pd_ * 1_000_000).cast("bigint"))
    binc = F.least(
        F.expr(f"__pm * {n_bins} div 1000000"), F.lit(n_bins - 1).cast("bigint")
    ).cast("int")
    return (
        df.filter(pd_.isNotNull() & raw.isNotNull())
        .select(pm.alias("__pm"), F.when(label, 1).otherwise(0).alias("__y"))
        .groupBy(binc.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(__pm) div count(1)").alias("mean_pred_micro"),
            F.expr("sum(__y) * 1000000 div count(1)").alias("pos_rate_micro"),
        )
    )


def cuped_adjust(
    units: DataFrame,
    x_col: str,
    y_col: str,
    out_col: str = "y_adjusted",
) -> DataFrame:
    """CUPED variance reduction (Deng et al., controlled-experiment
    practice at every large A/B platform): shrink a per-unit metric's
    variance with a pre-experiment covariate before computing lift,
    ``y' = y - theta * (x - mean(x))`` with ``theta = cov(x,y)/var(x)``
    — unbiased for any treatment split because only x, which predates
    assignment, enters the correction.

    Input is ONE ROW PER UNIT with integer-quantized ``x_col`` and
    ``y_col`` (cents/micros — the house exact-moment discipline).
    ``theta`` and ``mean(x)`` come from one exact decimal moment
    aggregate over all units (`corr_matrix`'s policy: float enters only
    in the final expression over bit-identical integers, rounded 6dp).
    A degenerate covariate (``var(x) == 0``) means no information:
    theta = 0 and the metric passes through unadjusted.

    Scale shape: one tiny moment aggregate broadcast back onto the
    units (crossJoin of a 1-row frame — no second shuffle, no driver
    collect). Rows with NULL x or y are excluded from the moments and
    get a NULL adjustment.

    Returns the input plus ``theta`` and ``out_col`` (both rounded
    doubles).
    """
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    ok = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    m = units.filter(ok).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    nd = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    var2 = nd * F.col("__sxx").cast("double") - sx * sx  # n^2 * var(x)
    cov2 = nd * F.col("__sxy").cast("double") - sx * sy  # n^2 * cov(x,y)
    theta = F.when(var2 > 0, cov2 / var2).otherwise(F.lit(0.0))
    mean_x = sx / nd
    out = units.crossJoin(F.broadcast(m))
    adj = F.col(y_col).cast("double") - theta * (F.col(x_col).cast("double") - mean_x)
    return out.select(
        *[F.col(c) for c in units.columns],
        F.round(theta, 6).alias("theta"),
        F.when(ok, F.round(adj, 6)).alias(out_col),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col,
    group_a,
    group_b,
    quantize: int = 100,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups at corpus
    scale — the experiment readout CUPED feeds: difference in means
    with a standard error that does not pretend the variances match.

    Values are quantized (``floor(value * quantize)``, the EWMA/house
    grid) so every moment is an exact bigint/decimal sum from ONE hash
    aggregation; the t statistic and Welch–Satterthwaite degrees of
    freedom are single deterministic float expressions over those
    integers (``corr_matrix`` discipline), 6dp-rounded. No p-value on
    purpose: the t CDF is not SQL-expressible, and downstream tooling
    thresholds on |t| anyway.

    Returns one row: ``(n_a, n_b, mean_a, mean_b, t_stat, df)``;
    ``t_stat``/``df`` NULL when either group has < 2 rows or both
    variances are zero. Means are in ORIGINAL units (cents/quantize).

    Scale shape: one map-side-combined aggregation, one output row.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    q = F.floor(value * quantize).cast("decimal(38,0)")
    is_a = F.col(group_col) == group_a
    is_b = F.col(group_col) == group_b
    base = df.filter(value.isNotNull() & (is_a | is_b))
    m = base.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("__na"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("__nb"),
        F.sum(F.when(is_a, q).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("__sa"),
        F.sum(F.when(is_b, q).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("__sb"),
        F.sum(F.when(is_a, q * q).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("__ssa"),
        F.sum(F.when(is_b, q * q).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("__ssb"),
    )
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    # sample variance via the exact moments: (n*ss - s^2) / (n*(n-1))
    va = (na * F.col("__ssa").cast("double") - sa * sa) / (na * (na - 1.0))
    vb = (nb * F.col("__ssb").cast("double") - sb * sb) / (nb * (nb - 1.0))
    se2 = va / na + vb / nb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0)
    )
    ok = (F.col("__na") >= 2) & (F.col("__nb") >= 2)
    qd = float(quantize)
    return m.select(
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        F.when(F.col("__na") > 0, F.round(sa / na / qd, 6)).alias("mean_a"),
        F.when(F.col("__nb") > 0, F.round(sb / nb / qd, 6)).alias("mean_b"),
        F.when(ok & (se2 > 0), F.round(t, 6)).alias("t_stat"),
        F.when(ok & (se2 > 0), F.round(dof, 6)).alias("df"),
    )
