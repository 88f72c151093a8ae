"""Time-series repair operators.

``interpolate_linear`` fills null gaps in a per-key series by linear
interpolation between the nearest non-null neighbors — the standard
sensor/metric repair step before feature extraction (the gap-fill twin
of the engine's ``hourly_spine_gapfill``, which fills MISSING rows;
this fills NULL values on existing rows).

Scale shape: one shuffle on the key; the backward- and forward-looking
neighbor windows share the same in-partition sort (Spark reuses the
sort — no extra exchange). No Python, no self-join: neighbor lookup is
``last(..., ignorenulls)`` / ``first(..., ignorenulls)`` over offset
row frames.

Edge semantics (pinned by tests, mirrored by the SQL oracle): a null
with neighbors on both sides interpolates; a null before the first
observation takes the next value (back-fill); a null after the last
observation takes the previous value (forward-fill); an all-null key
stays null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    out_col: str | None = None,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fill null ``val_col`` by linear interpolation along ``ts_col``
    (a numeric/epoch column) within each key. See module docstring for
    edge rules."""
    out_col = out_col or f"{val_col}_filled"
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    obs = F.when(
        F.col(val_col).isNotNull(),
        F.struct(F.col(ts_col).cast("double").alias("t"), F.col(val_col).cast("double").alias("v")),
    )
    prev = F.last(obs, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, -1))
    nxt = F.first(obs, ignorenulls=True).over(w.rowsBetween(1, Window.unboundedFollowing))

    t = F.col(ts_col).cast("double")
    interp: Column = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (nxt["t"] - prev["t"])
    filled = (
        F.when(F.col(val_col).isNotNull(), F.col(val_col).cast("double"))
        .when(prev.isNull() & nxt.isNull(), F.lit(None).cast("double"))
        .when(prev.isNull(), nxt["v"])
        .when(nxt.isNull(), prev["v"])
        # equal-timestamp neighbors (ts ties around the gap) would make
        # the interpolation 0/0 — take the earlier observation
        .when(nxt["t"] == prev["t"], prev["v"])
        .otherwise(interp)
    )
    return df.withColumn(out_col, filled)


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    window: int = 8,
    decay_num: int = 1,
    decay_den: int = 2,
    quantize: int = 100,
    out_scale: int = 10**4,
    out_col: str = "ewma_micro",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key — the
    smoothing feature under anomaly gates and trend monitors — in EXACT
    integer arithmetic (house determinism policy: bit-identical on any
    layout/engine, reproducible by a SQL twin).

    Over the last ``window`` observations (ordered by ``ts_col``,
    ties by ``tiebreak_cols``), with retention ``r = decay_num /
    decay_den`` (weight of an observation ``j`` steps back ∝ ``r^j``;
    the default 1/2 is the classic one-step half-decay)::

        x_t   = floor(value * quantize)            -- exact input grid
        n     = Σ_idx x_idx · decay_num^(s-1-idx) · decay_den^idx
        w     = Σ_idx       decay_num^(s-1-idx) · decay_den^idx
        ewma  = floor_div(n · out_scale, w)        -- integer output units

    (``idx`` ascending within the window, ``s ≤ window`` actual rows —
    leading rows use the shorter prefix, the standard ``adjust=True``
    truncated form). ``n``/``w`` build in ONE left-to-right ``aggregate``
    recurrence — ``n' = decay_num·n + p·x, w' = decay_num·w + p,
    p' = decay_den·p`` — so no floating pow anywhere; the final division
    is FLOOR division via ``(n - pmod(n, w)) div w`` (Spark ``div``
    truncates toward zero; DuckDB/Python floor — pmod reconciles them
    for negative inputs).

    Overflow bound: ``|n·out_scale| ≤ max|x| · window · decay_den^window
    · out_scale`` must stay under 2^63 — defaults support cent-quantized
    values up to ~$3.5e10 per observation; widen ``window`` or
    ``decay_den`` only with correspondingly smaller scales.

    Null contract (pinned by test): a NULL value is a MISSING
    observation — it contributes to no window (``collect_list`` skips
    nulls), and every row's EWMA covers the non-null values among its
    last ``window`` ROWS (row frame, not observation count), with the
    weight denominator matching exactly the values present. A row whose
    own value is null still gets the EWMA of its surviving frame (the
    natural "current smoothed estimate" semantics; pair with
    ``interpolate_linear`` first when repair is wanted instead). The
    suite oracle covers the null-free path; the null path is pinned by
    the unit reference.

    Scale shape: one key-hash shuffle + one in-partition sort (the
    window), then row-local HOF codegen — the ``collect_list`` frame
    holds ≤ ``window`` bigints per row, never the whole key history.

    Returns the input plus ``out_col`` (bigint, ``quantize·out_scale``
    units per input unit).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 0 < decay_num < decay_den:
        raise ValueError(
            f"need 0 < decay_num < decay_den, got {decay_num}/{decay_den}"
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *tiebreak_cols)
        .rowsBetween(-(window - 1), 0)
    )
    # NaN is a non-observation like NULL (review r7: floor(NaN*q)
    # silently coerced to 0 and entered the series as a real value)
    cents = F.expr(
        f"CASE WHEN isnan(CAST({val_col} AS DOUBLE)) THEN CAST(NULL AS BIGINT) "
        f"ELSE CAST(floor({val_col} * {quantize}) AS BIGINT) END"
    )
    xs = F.collect_list(cents).over(w)
    agg = (
        "aggregate(__xs, "
        "named_struct('n', CAST(0 AS BIGINT), 'w', CAST(0 AS BIGINT), "
        "'p', CAST(1 AS BIGINT)), "
        f"(acc, x) -> named_struct("
        f"'n', {decay_num} * acc.n + acc.p * x, "
        f"'w', {decay_num} * acc.w + acc.p, "
        f"'p', {decay_den} * acc.p), "
        # empty surviving frame (all-NULL/NaN window, e.g. a key whose
        # first reading is missing): weight 0 -> NULL, not a
        # REMAINDER_BY_ZERO job abort under ANSI (review r7)
        f"acc -> CASE WHEN acc.w = 0 THEN CAST(NULL AS BIGINT) "
        f"ELSE CAST((acc.n * {out_scale} - pmod(acc.n * {out_scale}, acc.w))"
        f" div acc.w AS BIGINT) END)"
    )
    return (
        df.withColumn("__xs", xs)
        .withColumn(out_col, F.expr(agg))
        .drop("__xs")
    )


def cusum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    ref_cents: int,
    threshold_cents: int,
    slack_cents: int = 0,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact two-sided CUSUM changepoint scores per key series.

    The classic recurrences
    ``s+_i = max(0, s+_{i-1} + (x_i - ref - slack))`` and
    ``s-_i = max(0, s-_{i-1} - (x_i - ref + slack))`` look inherently
    sequential, but both have a closed prefix-sum form:
    with ``P_i = sum_{t<=i} d_t`` (and ``P_0 = 0`` supplied by a
    ``least(0, ...)``/``greatest(0, ...)`` clamp),

        s+_i = P_i - min_{j <= i} P_j      (d = x - ref - slack)
        s-_i = max_{j <= i} P'_j - P'_i    (d' = x - ref + slack)

    so the whole detector is window functions — running sum plus
    running min/max over the SAME per-key sort (Spark reuses the sort:
    exactly one shuffle, no extra exchange, no Python, no iteration).
    Values are quantized to cents (``floor(value*100)``, the engine's
    EWMA convention) and everything stays bigint-exact — overflow-safe
    while ``n_per_key * max|d_cents|`` stays below 2^63 (a 1e12-row
    series of 1e6-cent deviations).

    ``alert`` fires when either side reaches ``threshold_cents``. The
    one-sided form is ``slack_cents > 0`` with only the matching side
    inspected; nulls pass through with null scores and no alert.

    Returns the key, order, and tiebreak columns plus ``cusum_hi``,
    ``cusum_lo`` (bigint cents) and ``alert`` (boolean).
    """
    order = [F.col(order_col)] + [F.col(c) for c in tiebreak_cols]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NaN is a non-observation like NULL (review r7)
    not_nan = ~F.isnan(F.col(value_col).cast("double"))
    cents = F.when(not_nan, F.floor(F.col(value_col) * 100).cast("bigint"))
    keep = [key_col, order_col, *tiebreak_cols]
    # staged: P first, then running min/max of P — both levels share the
    # identical partition/sort spec, so Spark plans ONE exchange + sort
    staged = df.select(
        *keep,
        (F.col(value_col).isNotNull() & not_nan).alias("__obs"),
        F.sum(cents - F.lit(int(ref_cents) + int(slack_cents))).over(w).alias("__p_hi"),
        F.sum(cents - F.lit(int(ref_cents) - int(slack_cents))).over(w).alias("__p_lo"),
    )
    zero = F.lit(0).cast("bigint")
    s_hi = F.col("__p_hi") - F.least(zero, F.min("__p_hi").over(w))
    s_lo = F.greatest(zero, F.max("__p_lo").over(w)) - F.col("__p_lo")
    scored = staged.select(
        *keep,
        F.when(F.col("__obs"), s_hi).alias("cusum_hi"),
        F.when(F.col("__obs"), s_lo).alias("cusum_lo"),
    )
    return scored.withColumn(
        "alert",
        F.when(
            F.col("cusum_hi").isNotNull(),
            (F.col("cusum_hi") >= threshold_cents)
            | (F.col("cusum_lo") >= threshold_cents),
        ),
    )


def acf(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 3,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key autocorrelation function at lags 1..max_lag.

    The seasonality/persistence probe that decides EWMA spans, CUSUM
    references, and feature lags. Definitional estimator with the
    full-series mean:

        r_l = (sum x_t*x_{t-l} - mu*(Sh_l + St_l) + m_l*mu^2)
              / (SS - n*mu^2),            mu = S/n

    where every sum on the right is EXACT (cents quantized, decimal(38)
    moments — the corr_matrix discipline) so the one float finish,
    evaluated with the identical literal expression in the DuckDB
    oracle, is layout- and engine-stable at 6dp.

    Scale shape: the lag columns come from ONE per-key window sort
    (all lags share it), stacked via posexplode — map-side after the
    single shuffle; the per-(key,lag) and per-key aggregations are hash
    aggs with map-side combine. No self-join, no Python.

    The series is the key's NON-NULL observations in
    ``(order_col, *tiebreak_cols)`` order (nulls are dropped before
    lagging, the standard listwise ACF). Keys with a constant series or
    fewer than ``lag + 1`` observations report NULL ``r`` at that lag.

    Returns ``(key, lag, n_pairs, r)``, ``max_lag`` rows per key.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    cents = F.floor(F.col(value_col) * 100).cast("decimal(18,0)")
    obs = df.where(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
    ).select(
        F.col(key_col).alias("__k"), F.col(order_col).alias("__o"),
        *[F.col(c) for c in tiebreak_cols], cents.alias("__x"),
    )
    w = Window.partitionBy("__k").orderBy(
        F.col("__o"), *[F.col(c) for c in tiebreak_cols]
    )
    staged = obs.select(
        "__k", "__x",
        *[F.lag("__x", lag).over(w).alias(f"__y{lag}") for lag in range(1, max_lag + 1)],
    )
    lags = staged.select(
        "__k", "__x",
        F.posexplode(
            F.array(*[F.col(f"__y{lag}") for lag in range(1, max_lag + 1)])
        ).alias("__l0", "__y"),
    ).withColumn("lag", F.col("__l0") + 1)
    pair = (
        lags.where(F.col("__y").isNotNull())
        .groupBy("__k", "lag")
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.sum(F.col("__x") * F.col("__y")).alias("__cross"),
            F.sum("__x").alias("__sh"),
            F.sum("__y").alias("__st"),
        )
    )
    tot = obs.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__ss"),
    )
    # every key emits all lags (grid join) so short series report NULL
    grid = tot.crossJoin(
        tot.sparkSession.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    )
    j = grid.join(pair, ["__k", "lag"], "left")
    nd = F.col("__n").cast("double")
    mu = F.col("__s").cast("double") / nd
    md = F.col("__m").cast("double")
    den = F.col("__ss").cast("double") - nd * mu * mu
    num = (
        F.col("__cross").cast("double")
        - mu * (F.col("__sh").cast("double") + F.col("__st").cast("double"))
        + md * mu * mu
    )
    return j.select(
        F.col("__k").alias(key_col),
        F.col("lag").cast("int").alias("lag"),
        F.coalesce(F.col("__m"), F.lit(0)).cast("long").alias("n_pairs"),
        F.when(F.col("__m").isNotNull() & (den > 0), F.round(num / den, 6)).alias("r"),
    )


def _int_div(n: Column, d: Column | int) -> Column:
    """Exact bigint division, truncating toward zero — verified to agree
    with DuckDB's integer ``//`` on negative numerators (both truncate:
    ``-7 div 2 == -7 // 2 == -3``), which detrended series produce
    constantly. Never float ``/`` (loses exactness past 2^53)."""
    d = F.lit(d) if isinstance(d, int) else d
    return F.call_function("div", n.cast("bigint"), d.cast("bigint"))


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    period: int = 24,
    scale: int = 1_000_000,
) -> DataFrame:
    """Classical additive seasonal decomposition of a per-key regular
    series (``y = trend + seasonal + remainder``) — the feature/QA step
    behind traffic baselines and anomaly triage ("is this hourly dip
    seasonal or real?").

    Input is one row per ``(key, t)`` with an INTEGER value (pre-bucket
    with an aggregation; pass cents/micros, not floats) and an integer
    time index ``t``. Semantics, pinned engine-exactly in scaled
    integers (only the three output columns are floats, each a final
    ``round(exact_int / scale, 6)``):

    - ``trend``: centered moving average over ``2*(period//2)+1`` ROWS
      (the odd-window variant of the classic 2xP MA), NULL at the first/
      last ``period//2`` points of each key where the window is partial.
      Row frames assume a gap-free series per key — gap-fill first (the
      ``hourly_spine_gapfill`` spine) if bucketing can skip periods.
    - ``seasonal``: per ``(key, phase = t mod period)`` truncated mean
      of the detrended points, centered by the truncated mean of the
      per-phase means so the component sums to ~0 over one period (the
      classic identifiability constraint).
    - ``remainder``: ``y - trend - seasonal`` where trend exists.

    All means are exact bigint sums integer-divided (:func:`_int_div`),
    so results are bit-stable across engines and partition layouts.
    Bigint bound: ``scale * sum(|y|)`` per window/phase group must stay
    under 2^63 — at the default micro scale, window sums to ~9.2e12
    value units.

    Scale shape: ONE shuffle on the key feeds the per-key window sort;
    the per-phase seasonal table (``keys x period`` rows) aggregates
    small and broadcasts back — no global window, no driver round-trip.
    Per-key partition size is the series LENGTH (time buckets), which
    grows with history, not corpus width.

    Returns ``(key, t, y, trend, seasonal, remainder)``.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    win = 2 * half + 1
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(t_col).cast("bigint").alias("__t"),
        F.col(value_col).cast("bigint").alias("__y"),
    ).filter(F.col("__t").isNotNull() & F.col("__y").isNotNull())

    frame = Window.partitionBy("__k").orderBy("__t").rowsBetween(-half, half)
    detr = (
        base.withColumn(
            "__tr_micro",
            F.when(
                F.count(F.lit(1)).over(frame) == win,
                _int_div(F.sum("__y").over(frame) * scale, win),
            ),
        )
        .withColumn("__phase", F.pmod(F.col("__t"), F.lit(period)))
        .withColumn("__d_micro", F.col("__y") * scale - F.col("__tr_micro"))
    )
    phase_means = (
        detr.filter(F.col("__d_micro").isNotNull())
        .groupBy("__k", "__phase")
        .agg(F.sum("__d_micro").alias("__ds"), F.count(F.lit(1)).alias("__dn"))
        .withColumn("__s_micro", _int_div(F.col("__ds"), F.col("__dn")))
    )
    centering = phase_means.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum("__s_micro").alias("__sp"),
    )
    seasonal = (
        phase_means.join(centering, "__k")
        .withColumn(
            "__c_micro",
            F.col("__s_micro") - _int_div(F.col("__sp"), F.col("__np")),
        )
        .select("__k", "__phase", "__c_micro")
    )
    # no broadcast hint: the seasonal table is n_keys * period rows —
    # unbounded in corpus width — so let AQE pick (review r7; same trap
    # k_anonymity documents). The join key is already hash-partitionable.
    out = detr.join(seasonal, ["__k", "__phase"], "left")
    sc = float(scale)
    return out.select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(t_col),
        F.col("__y").alias(value_col),
        F.round(F.col("__tr_micro") / sc, 6).alias("trend"),
        F.when(
            F.col("__tr_micro").isNotNull(), F.round(F.col("__c_micro") / sc, 6)
        ).alias("seasonal"),
        F.when(
            F.col("__tr_micro").isNotNull(),
            F.round((F.col("__d_micro") - F.col("__c_micro")) / sc, 6),
        ).alias("remainder"),
    )


def series_vectors(
    df: DataFrame,
    id_col: str,
    bucket_col: str | Column,
    n_buckets: int,
    value_col: str | Column | None = None,
    vec_col: str = "vec",
) -> DataFrame:
    """Dense integer vector per series: one ``array<bigint>`` of length
    ``n_buckets`` per ``id_col``, slot ``i`` holding the event COUNT
    (or the exact sum of integral ``value_col``) for bucket ``i``;
    buckets with no rows are zero. Rows whose bucket falls outside
    ``[0, n_buckets)`` raise — a silent drop would skew every
    similarity downstream.

    Shape: one counted shuffle on (id, bucket) with map-side combine,
    then one grouped sort-free array build per id (sort_array over
    (bucket, value) structs — deterministic under any layout). The
    dense-slot fill is arithmetic on the grouped result, NOT a spine
    join: state per series is bounded by ``n_buckets``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import is_exact_integral

    bc = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    # same integral contract as value_col (review r10): a fractional
    # bucket would be truncated toward zero per row (3.9 -> slot 3,
    # -0.5 -> slot 0), silently mis-bucketing every series. decimal(p, 0)
    # is exact-integral and passes (ADVICE r10).
    bt = df.select(bc.alias("__b")).schema[0].dataType
    if not is_exact_integral(bt):
        raise TypeError(
            f"series_vectors bucket_col must be exact-integral, got "
            f"{bt.simpleString()}: truncation would silently mis-bucket "
            "rows — floor/scale to an integer bucket id first"
        )
    # bucket stays in the WIDE type (bigint) through the range guard —
    # an early cast('int') would let a >= 2^31 bucket silently WRAP into
    # range on an ANSI-off cluster before the guard looks (review r11);
    # is_exact_integral caps decimals at p <= 18, so cast('bigint') is
    # itself loss-free. The int narrowing happens after the guard.
    b = bc.cast("bigint")
    if value_col is None:
        v = F.lit(1).cast("bigint")
    else:
        vc = F.col(value_col) if isinstance(value_col, str) else value_col
        vt = df.select(vc.alias("__v")).schema[0].dataType
        if not is_exact_integral(vt):
            raise TypeError(
                f"series_vectors value_col must be exact-integral, got "
                f"{vt.simpleString()}: the similarity downstream relies on "
                "exact integer sums (micro-scale floats first)"
            )
        v = vc.cast("bigint")
    cells = (
        df.select(F.col(id_col).alias("__id"), b.alias("__b"), v.alias("__v"))
        .groupBy("__id", "__b")
        .agg(F.sum("__v").alias("__v"))
    )
    # range guard rides the aggregate output (cheap: post-combine rows)
    guarded = cells.withColumn(
        "__v",
        F.when(
            (F.col("__b") >= 0) & (F.col("__b") < n_buckets), F.col("__v")
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"series_vectors: bucket out of [0, {n_buckets}): "),
            F.col("__b").cast("string"),
        ))),
    )
    # build the sparse map ONCE inside the aggregate (an Aggregate node
    # is a substitution boundary, so the later transform cannot inline
    # and rebuild it per slot — review r10: the withColumn form rebuilt
    # map_from_entries n_buckets times per series). Lookups are still
    # linear in the series' occupied buckets (Spark map access is a
    # scan), so the fill is O(n_buckets x occupied) interpreted work —
    # fine for the bounded n_buckets this operator contracts; truly
    # huge bucket domains want a spine join instead.
    # narrow to int ONLY after the guard proved the value in range
    pairs = guarded.withColumn("__b", F.col("__b").cast("int")).groupBy("__id").agg(
        F.expr("map_from_entries(array_sort(collect_list(struct(__b, __v))))").alias("__m")
    )
    dense = F.expr(
        f"transform(sequence(0, {n_buckets - 1}), i -> "
        # try_element_at, not element_at: ANSI mode reserves the right to
        # throw on missing map keys; try_ is NULL-on-missing by contract
        "coalesce(try_element_at(__m, i), CAST(0 AS BIGINT)))"
    )
    return pairs.select(F.col("__id").alias(id_col), dense.alias(vec_col))


def ts_correlation_topk(
    df: DataFrame,
    id_col: str,
    bucket_col: str | Column,
    n_buckets: int,
    k: int = 5,
    value_col: str | Column | None = None,
    query_filter: Column | None = None,
    max_query_rows: int | None = 100_000,
) -> DataFrame:
    """Time-series similarity search: top-k most CORRELATED series per
    query series — "which users/sensors/feeds behave like this one"
    (the distributed similarity-search shape of the streaming-TS
    literature, e.g. EDBT'19 time-series similarity for streams).

    Exactness trick: Pearson correlation IS cosine similarity of
    mean-centered vectors, and centering by ``w_i = n·v_i − Σv``
    (multiply through by n) keeps every coordinate an exact bigint
    while leaving cosine unchanged — so the whole house ANN stack
    (:func:`...similarity.cosine_topk`: corpus scanned once, query side
    broadcast, left-fold float parity, 6dp rounding, id tiebreak)
    computes exact Pearson with a plain-SQL twin and no float drift.

    Constant series (zero variance → correlation undefined) are
    DROPPED from both sides, deterministically. ``query_filter``
    selects the query series (default: all-vs-all, self excluded);
    ``cos`` in the output is the Pearson r.

    Scale: :func:`series_vectors` is one counted shuffle bounded at
    n_buckets state per series; the top-k pass inherits cosine_topk's
    contract (``max_query_rows`` caps the broadcast side)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import cosine_topk

    mat = _centered_series(df, id_col, bucket_col, n_buckets, value_col)
    queries = mat if query_filter is None else mat.where(query_filter)
    return cosine_topk(
        queries, mat, id_col, id_col, "__w", "__w",
        k=k, include_self=False, max_query_rows=max_query_rows,
    )


def _centered_series(
    df: DataFrame,
    id_col: str,
    bucket_col: str | Column,
    n_buckets: int,
    value_col: str | Column | None,
) -> DataFrame:
    """Exact-bigint mean-centered series matrix ``(id_col, __w)`` shared
    by :func:`ts_correlation_topk` and :func:`ts_lagged_topk`:
    ``w_i = n·v_i − Σv`` multiplies the centering through by n so every
    coordinate stays integral; constant series (all-equal ``w`` would be
    all-zero — correlation undefined) are dropped deterministically."""
    vecs = series_vectors(df, id_col, bucket_col, n_buckets, value_col)
    # hoist the row sum into its own projection: an inline
    # aggregate(vec) inside the transform lambda would re-sum the
    # vector PER ELEMENT (O(n_buckets^2) interpreted HOF work per row),
    # and the exists() filter below would alias-substitute the whole
    # centering a second time — measured 7.2 -> 0.9 s warm at sf0.1.
    return (
        vecs.withColumn(
            "__s", F.expr("aggregate(vec, CAST(0 AS BIGINT), (a, y) -> a + y)")
        )
        .select(
            id_col,
            F.expr(f"transform(vec, x -> x * CAST({n_buckets} AS BIGINT) - __s)").alias("__w"),
        )
        .where(F.expr("exists(__w, x -> x != 0)"))
        # one row per series, n_buckets ints each — materialize once so
        # the query-side collect and the corpus scan don't each rebuild
        # the vector pipeline (bounded: #series rows)
        .localCheckpoint(eager=True)
    )


def ts_lagged_topk(
    df: DataFrame,
    id_col: str,
    bucket_col: str | Column,
    n_buckets: int,
    k: int = 5,
    max_lag: int = 3,
    value_col: str | Column | None = None,
    query_filter: Column | None = None,
    max_query_rows: int | None = 100_000,
) -> DataFrame:
    """Lagged time-series similarity search: top-k series per query by
    the best Pearson correlation over a bounded CIRCULAR lag sweep —
    "who behaves like X, shifted by up to ``max_lag`` buckets" (lead/lag
    discovery: a series that tracks the query d days later surfaces
    with its lag).

    Semantics: ``r(q, c, ℓ) = Pearson(rot_ℓ(q), c)`` for
    ℓ ∈ [−max_lag, +max_lag], where ``rot_ℓ(q)[i] = q[(i+ℓ) mod n]`` —
    positive ℓ aligns the query's LATER buckets with the candidate's
    earlier ones (the candidate lags the query by ℓ). Rotation (not
    truncation) keeps the exact-integer centering trick of
    :func:`ts_correlation_topk` intact: a rotated centered vector is a
    permutation, so Σw, the norm, and integrality are all invariant and
    every lag's correlation is cosine of exact-bigint vectors. Callers
    who must not wrap can pad the bucket domain with ``max_lag`` empty
    slots. Reported per pair: the MAX r over the sweep and the SMALLEST
    lag attaining it. Self-pairs are excluded at every lag.

    Plan shape: candidate generation is ONE scan of the CHECKPOINTED
    series matrix (#series × n_buckets ints, far smaller than the raw
    event table): the query matrix is collected once, every lag's
    rotation is a numpy column permutation of it (bit-identical to the
    per-lag SQL rotation — same values, same fold order), and each
    corpus batch scores all 2·max_lag+1 rotated query matrices,
    emitting lag-tagged local top-k rows; a single (lag, query) window
    then ranks them exactly as a per-lag pass would (r13: previously
    one cosine_topk pass — query collect + corpus scan + window — PER
    lag). The union of per-lag top-k provably contains the global
    top-k under the shared (r desc, id asc) order.
    Candidates — ≤ |Q|·k·(2·max_lag+1) pairs — are then re-scored
    across ALL lags in one JVM pass (left-fold double aggregates, the
    same summation order as cosine_topk, so re-scored values equal the
    candidate-pass values bit-for-bit), which pins the min-lag tiebreak
    exactly even when a pair missed some lag's top-k.

    Returns ``({id_col}_q, {id_col}_c, cos, lag, rank)`` — ``cos`` is
    the best Pearson r (6dp), ``lag`` the smallest ℓ attaining it."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import _fold_matmul, _fold_norms
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
        _collect_query_vectors,
        _local_topk_frames,
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import fan_out

    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    if 2 * max_lag + 1 > n_buckets:
        raise ValueError(
            f"lag sweep wider than the bucket domain: 2*{max_lag}+1 > {n_buckets}"
        )
    mat = _centered_series(df, id_col, bucket_col, n_buckets, value_col)
    queries = mat if query_filter is None else mat.where(query_filter)
    n = n_buckets
    spark = mat.sparkSession
    # one query collect; every lag's rotated matrix is a column
    # permutation of it — identical values and identical left-fold
    # column ORDER to the per-lag SQL rotation, so scores are
    # bit-for-bit what a per-lag cosine_topk pass computes
    qdf = _collect_query_vectors(queries, id_col, "__w", max_query_rows)
    Q = np.stack(qdf["__qv"].to_numpy()).astype(np.float64)
    q_ids = qdf["qid"].to_numpy()
    lags = tuple(range(-max_lag, max_lag + 1))
    # Broadcast Q ONCE (ADVICE r13): each lag's rotated matrix is a
    # cheap column permutation, so shipping all 2·max_lag+1 copies (plus
    # per-lag norms) multiplied driver and executor memory by the lag
    # count for no work saved — the permutation and the norm fold now
    # run in the executor setup, on the identical arrays in the
    # identical order, and one rotated copy exists at a time.
    bc = spark.sparkContext.broadcast((q_ids, Q))
    id_type = mat.schema[id_col].dataType.simpleString()

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, Qbase = bc.value
        idx = np.arange(n)
        # per-lag query norms once per task: _fold_norms folds the
        # ROTATED column order, exactly as the per-lag SQL fold does
        nQs = {lag: _fold_norms(Qbase[:, (idx + lag) % n]) for lag in lags}
        for p in batches:
            if not len(p):
                continue
            C = np.stack(p["__cid_vec"].to_numpy()).astype(np.float64)
            ids_c = p["__cid"].to_numpy()
            nc = _fold_norms(C)
            for lag in lags:
                Qm = Qbase[:, (idx + lag) % n]
                cos = _fold_matmul(Qm, C) / (nQs[lag][:, None] * nc[None, :])
                cos = np.where(ids_q[:, None] == ids_c[None, :], -np.inf, cos)
                frames = _local_topk_frames(ids_q, ids_c, cos, k)
                if frames:
                    out = pd.concat(frames, ignore_index=True)
                    out["lag"] = np.int32(lag)
                    yield out

    c = fan_out(
        mat.select(F.col(id_col).alias("__cid"), F.col("__w").alias("__cid_vec"))
    )
    scored = (
        c.mapInPandas(_score, schema=f"qid {id_type}, cid {id_type}, cos double, lag int")
        .withColumn("cos", F.round("cos", 6))
    )
    # exact per-lag global top-k (cosine_topk's ranking, one window for
    # all lags), then the distinct pair union — identical to unioning
    # 2·max_lag+1 independent cosine_topk results
    wlag = Window.partitionBy("lag", "qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    cand = (
        scored.withColumn("__rk", F.row_number().over(wlag))
        .filter(F.col("__rk") <= k)
        .select("qid", "cid")
        .dropDuplicates(["qid", "cid"])
    )
    qside = mat.select(F.col(id_col).alias("qid"), F.col("__w").alias("__qw"))
    cside = mat.select(F.col(id_col).alias("cid"), F.col("__w").alias("__cw"))
    # all-lag exact re-score: per pair, 2·max_lag+1 left-fold double
    # dots over the two bigint vectors. The QUERY norm folds its squares
    # in ROTATED order — mathematically the same sum (a permutation),
    # but bit-for-bit what the candidate pass computed (cosine_topk
    # folds the rotated vector it was handed), so re-scored values
    # cannot drift a 6dp rounding step from the candidate cut at
    # 1-ulp boundaries (review r11; the oracle mirrors this fold).
    dots = F.expr(
        f"transform(sequence({-max_lag}, {max_lag}), l -> round("
        f"aggregate(sequence(0, {n - 1}), CAST(0.0 AS DOUBLE), (a, i) -> "
        f"a + CAST(element_at(__qw, pmod(i + l, {n}) + 1) AS DOUBLE)"
        f" * CAST(element_at(__cw, i + 1) AS DOUBLE))"
        f" / (sqrt(aggregate(sequence(0, {n - 1}), CAST(0.0 AS DOUBLE), (a, i) -> "
        f"a + CAST(element_at(__qw, pmod(i + l, {n}) + 1) AS DOUBLE)"
        f" * CAST(element_at(__qw, pmod(i + l, {n}) + 1) AS DOUBLE)))"
        f" * sqrt(aggregate(__cw, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6))"
    )
    # materialize the per-pair lag-score arrays BEFORE extracting
    # max/position: alias substitution would otherwise re-inline the
    # whole (2·max_lag+1)-fold aggregate once per consumer. Bounded:
    # candidate pairs x (2·max_lag+1) doubles.
    lagged = (
        cand.join(qside, "qid").join(cside, "cid")
        .select("qid", "cid", dots.alias("__coss"))
        .localCheckpoint(eager=True)
    )
    scored = lagged.select(
        "qid", "cid",
        F.array_max("__coss").alias("cos"),
        (F.array_position("__coss", F.array_max("__coss")) - 1 - max_lag)
        .cast("int").alias("lag"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(id_col + "_q"),
            F.col("cid").alias(id_col + "_c"),
            "cos", "lag", "rank",
        )
    )
