"""Mergeable distinct-count sketches (HyperLogLog) with exact
cross-engine semantics.

Spark's built-in ``approx_count_distinct`` is a black-box HLL++ whose
estimates can't be reproduced outside the JVM. This implementation is
deterministic down to the bit on ANY engine that has ``md5`` and basic
string ops, which is what makes it *oracle-checkable* and *portable*:

- hash: the first 15 hex chars of ``md5(value)`` folded into a 60-bit
  integer (exact bigint arithmetic — 16^15 < 2^63, no overflow, no
  engine-specific hash function).
- register index: ``h % m`` (m = 2^p registers); remainder ``h // m``
  has ``w = 60 - p`` bits; rank ``rho`` = leading zeros in those w bits
  + 1, computed as ``w - length(bin(rest)) + 1`` — string-exact, no
  floating log2 at bit boundaries.
- state: one ``(group, bucket, r=max(rho))`` row per occupied register
  — a standard mergeable HLL state: union-merge is ``max`` per bucket
  (:func:`hll_merge`), exactly how per-partition sketches combine on a
  1000-executor cluster (the groupBy(bucket).max IS the map-side
  combine; per-group state is at most m rows regardless of input size).
- estimate: Flajolet's alpha-corrected harmonic mean with the
  linear-counting small-range correction. The harmonic sum is kept
  EXACT as an integer (sum of 2^(w+1-rho); worst case m*2^w = 2^60
  fits a bigint), so the only floats are one division, one multiply,
  and (in the small range) one ln — all rounded to 6dp for
  cross-engine hash-stability.

Standard error ~= 1.04/sqrt(m): p=9 (512 registers) gives ~4.6%.

Portability note: the hash input is ``CAST(value AS STRING)``, so the
cross-engine guarantee holds for STRING and INTEGER values (identical
cast text everywhere). For doubles/dates/timestamps, engines may
render different cast strings — normalize to a canonical string column
first if those must hash identically off-Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Flajolet-et-al alpha_m bias constants (m >= 128 uses the asymptotic form)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hash60(col: str) -> F.Column:
    """60-bit integer hash: first 15 hex chars of md5 parsed base-16
    (conv is value-identical to the original locate-fold — pinned by
    test — and ~4x faster: one native call, no interpreted HOF)."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 9
) -> DataFrame:
    """Occupied-register HLL state per group: (group..., bucket, r).

    One shuffle on (group, bucket) with map-side max combine — at 100 TB
    the reduce side sees at most m rows per group however many input
    rows there are.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w = 60 - p
    h = hash60(value_col)
    slim = df.select(*group_cols, h.alias("__h")).where(F.col(value_col).isNotNull())
    rest = F.expr(f"__h div {m}")
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rest)) + 1
    )
    return (
        slim.select(
            *group_cols,
            (F.col("__h") % m).cast("int").alias("bucket"),
            rho.cast("int").alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("r"))
    )


def hll_merge(*states: DataFrame) -> DataFrame:
    """Union-merge HLL states (same group/bucket schema): max rank per
    register. This is the associative combine that makes the sketch
    shardable — per-day or per-partition states roll up losslessly."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "r"]
    return out.groupBy(*keys).agg(F.max("r").alias("r"))


def hll_estimate(state: DataFrame, group_cols: list[str], p: int = 9) -> DataFrame:
    """Distinct-count estimate per group from register state.

    Exact-integer harmonic sum (2^(w+1-r) per occupied register, where
    w+1 is the max rank, so the exponent is never negative and the
    worst-case sum m*2^w = 2^60 still fits a bigint), then the float
    finish rounded to 6dp: alpha*m^2/Z, or linear counting
    m*ln(m/zeros) when the raw estimate is <= 2.5m and empty registers
    remain.
    """
    m = 1 << p
    w = 60 - p
    alpha = _alpha(m)
    scaled = F.pow(F.lit(2.0), (w + 1) - F.col("r")).cast("bigint")
    agg = state.groupBy(*group_cols).agg(
        # coalesce: an EMPTY ungrouped state still emits one global row
        # (sum=NULL) — the estimate must be 0.0, not NULL (review r7)
        F.coalesce(F.sum(scaled), F.lit(0)).alias("__s"),
        F.count("*").alias("__occupied"),
    )
    zeros = F.lit(m) - F.col("__occupied")
    z = zeros.cast("double") + F.col("__s").cast("double") / F.lit(float(1 << (w + 1)))
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("ndv_est"))


def approx_ndv(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 9
) -> DataFrame:
    """groupBy(group).agg(approx distinct value_col) via the mergeable
    sketch above — one shuffle, bounded state, reproducible anywhere."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def approx_ndv_hop(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    size: str | int = "1 hour",
    slide: str | int = "15 minutes",
    p: int = 9,
    out_col: str = "window_start_ms",
) -> DataFrame:
    """Approximate distinct per sliding (HOP) window via PANE
    decomposition — the classical panes optimization (Li et al.,
    "No Pane, No Gain") applied to a mergeable sketch.

    The naive plan (``hop_window`` then :func:`approx_ndv`) replicates
    every event into its size/slide covering windows BEFORE hashing:
    the md5 fold and the first shuffle both pay the overlap factor.
    Here the register state is built once per non-overlapping ``slide``
    pane (each event hashed exactly once; one shuffle whose reduce
    state is <= m rows per pane), and only the tiny register rows are
    replicated into the k = size/slide covering windows and max-merged
    (:func:`hll_merge` semantics). Because register merge is an
    associative max, the per-window registers — and therefore the
    estimate — are bit-identical to the naive plan.

    At 100 TB the difference is the whole game: the naive plan
    shuffles O(events * k) rows, the pane plan O(panes * m * k)
    (panes * m is ~thousands), so the second shuffle is effectively
    free and the first is the minimal one-pass sketch build.

    Window assignment matches Spark's ``window(ts, size, slide)`` for
    epoch-aligned sizes: starts at ``floor(ts/slide)*slide - j*slide``
    for j in [0, k). ``size`` must be a multiple of ``slide``.
    Output: ``(out_col, ndv_est)`` per window, epoch millis.
    """
    panes = hop_pane_registers(df, ts_col, value_col, slide, p)
    return hop_merge_estimate(panes, size, slide, p, out_col=out_col)


def hop_pane_registers(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    slide: str | int = "15 minutes",
    p: int = 9,
) -> DataFrame:
    """HLL register state per non-overlapping ``slide`` pane:
    ``(__pane epoch-millis, bucket, r)``. Streaming-safe — it is one
    groupBy/max like :func:`hll_registers`, so Structured Streaming
    maintains it natively with state bounded at 2^p rows per LIVE pane
    (the pane decomposition is exactly what keeps hop-window sketch
    state from duplicating every event into k windows)."""
    from .windows import _interval_ms

    slide_ms = _interval_ms(slide)
    if slide_ms <= 0:
        raise ValueError(f"slide must be positive, got {slide}")
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    pane = (ts_ms - F.pmod(ts_ms, F.lit(slide_ms))).alias("__pane")
    return hll_registers(
        df.select(pane, F.col(value_col).alias("__v")), ["__pane"], "__v", p
    )


def hop_merge_estimate(
    panes: DataFrame,
    size: str | int = "1 hour",
    slide: str | int = "15 minutes",
    p: int = 9,
    pane_col: str = "__pane",
    out_col: str = "window_start_ms",
) -> DataFrame:
    """Merge per-pane registers (:func:`hop_pane_registers` output — or
    the state a streaming run of it accumulated) into the k = size/slide
    covering HOP windows and estimate: register merge is an associative
    max, so the result is bit-identical to sketching the expanded
    windows directly."""
    from .windows import _interval_ms

    size_ms = _interval_ms(size)
    slide_ms = _interval_ms(slide)
    if slide_ms <= 0 or size_ms <= 0 or size_ms % slide_ms != 0:
        raise ValueError(f"size must be a positive multiple of slide, got {size}/{slide}")
    k = size_ms // slide_ms
    expanded = panes.select(
        F.col(pane_col).alias("__pane"),
        "bucket",
        "r",
        F.explode(F.sequence(F.lit(0), F.lit(int(k - 1)))).alias("__j"),
    ).select(
        (F.col("__pane") - F.col("__j") * F.lit(slide_ms)).alias(out_col),
        "bucket",
        "r",
    )
    merged = expanded.groupBy(out_col, "bucket").agg(F.max("r").alias("r"))
    return hll_estimate(merged, [out_col], p)


def _salted_hash60(value: str, salt: int) -> F.Column:
    """Independent hash row: salt prefixes the value inside md5 (same
    conv form as :func:`hash60`, value-identical to the old fold)."""
    return F.expr(
        f"CAST(conv(substring(md5(CONCAT('{salt}|', CAST({value} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )


def cms_state(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan): ``depth``
    independent md5-salted hash rows of ``width`` counters, as rows
    ``(row, bucket, cnt)``. Same portability contract as the HLL:
    exact integer state, reproducible on any engine.

    One shuffle with map-side combine; reduce-side state is at most
    ``depth * width`` rows no matter how many input rows. Merge =
    union + sum (:func:`cms_merge`). ``weight_col`` accumulates a
    bigint weight instead of occurrence counts.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}, {width}")
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("__v"),
        w.alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    # one CASE over the row id so each salt's hash addresses its own row
    cases = None
    for d in range(depth):
        cond = (F.col("row") == d)
        h = (_salted_hash60("__v", d) % width).cast("int")
        cases = F.when(cond, h) if cases is None else cases.when(cond, h)
    return (
        rows.select("row", cases.alias("bucket"), "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*states: DataFrame) -> DataFrame:
    """Union-merge CMS states: counter-wise sum."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    state: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for the values in ``queries``: min over the
    depth rows of the addressed counters (missing counter = 0). The
    estimate never undercounts; it overcounts by at most eps*N with
    probability 1-delta for width=e/eps, depth=ln(1/delta).

    The query side is typically small (heavy-hitter candidates): it
    broadcasts into the join against the (<= depth*width row) state.
    """
    q = queries.select(F.col(value_col).alias("__qv")).distinct()
    probes = q.select(
        "__qv", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    cases = None
    for d in range(depth):
        h = (_salted_hash60("__qv", d) % width).cast("int")
        cases = F.when(F.col("row") == d, h) if cases is None else cases.when(F.col("row") == d, h)
    probes = probes.select("__qv", "row", cases.alias("bucket"))
    joined = probes.join(state, ["row", "bucket"], "left").select(
        "__qv", F.coalesce("cnt", F.lit(0)).alias("__c")
    )
    return joined.groupBy("__qv").agg(F.min("__c").alias("cms_est")).select(
        F.col("__qv").alias(value_col), "cms_est"
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    qs_micro: tuple[int, ...] = (500000, 900000, 990000),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate grouped quantiles from a fixed equal-width histogram
    — the bounded-state, MERGEABLE alternative to exact percentiles
    (the engine's ``median_metrics`` sorts whole groups; this reduces
    to at most ``bins`` counter rows per group, the same
    shuffle-then-tiny-frame discipline as the HLL/CMS sketches, and
    per-shard histograms sum losslessly).

    Quantile levels are micro-fractions (500000 = median) so rank
    thresholds stay exact integers: ``rank = ceil(total * q / 1e6)``
    in bigint arithmetic. The estimate interpolates linearly inside
    the bin that crosses the rank; error is bounded by the bin width.
    Out-of-range values clamp into the edge bins (the estimate never
    leaves [lo, hi]). Nulls are excluded.

    Returns one row per (group, q_micro): ``q_micro``, ``est``
    (rounded 6dp for cross-engine stability), ``total``.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if hi <= lo:
        raise ValueError(f"histogram_quantiles needs hi > lo, got lo={lo} hi={hi}")
    if not all(0 < q <= 1_000_000 for q in qs_micro):
        raise ValueError(f"qs_micro must be in (0, 1e6], got {qs_micro}")
    groups = group_cols or []
    c = F.col(value_col).cast("double")
    # clamp in DOUBLE space BEFORE the int cast (review r7): a far-out
    # value (or +Inf, which survives the NaN filter) makes floor(...)
    # exceed int32 — CAST_OVERFLOW under ANSI, garbage-bin counts
    # otherwise. Clamping the double keeps every value in [0, bins-1].
    raw = F.floor((c - lo) / (hi - lo) * bins)
    bucket = F.least(F.greatest(raw, F.lit(0.0)), F.lit(float(bins - 1))).cast("int")
    counts = (
        # NaN survives isNotNull and errors in the ANSI int cast of
        # floor(NaN) — exclude it like null
        df.where(c.isNotNull() & ~F.isnan(c))
        .select(*groups, bucket.alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
    wcum = wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    hist = counts.select(
        *groups, "bucket", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("total"),
    )
    qs = F.explode(F.array(*[F.lit(q).cast("bigint") for q in qs_micro])).alias("q_micro")
    width = (hi - lo) / bins
    rank = F.expr("(total * q_micro + 999999) div 1000000")
    est = F.lit(lo) + (
        F.col("bucket") + (rank - (F.col("cum") - F.col("cnt"))).cast("double") / F.col("cnt")
    ) * F.lit(width)
    return (
        hist.select(*groups, "bucket", "cnt", "cum", "total", qs)
        .where((F.col("cum") - F.col("cnt") < rank) & (rank <= F.col("cum")))
        .select(*groups, "q_micro", F.round(est, 6).alias("est"), "total")
    )


def hll_overlap(
    a: DataFrame, b: DataFrame, value_col: str, p: int = 9
) -> DataFrame:
    """Audience overlap between two corpora from HLL register states.

    ``|A ∩ B|`` by inclusion-exclusion — ``est(A) + est(B) -
    est(A ∪ B)`` — where the union estimate comes from the MAX-merge of
    the two register states (:func:`hll_merge`), the property that makes
    HLL overlap shardable: states computed per-partition/per-day union
    losslessly before a single tiny estimate step. The intersection
    inherits both sketches' error (~1.04/sqrt(m) each, amplified when
    the true overlap is small relative to the union — standard HLL
    caveat, documented not hidden).

    Same deterministic md5-fold registers as :func:`approx_ndv`, so a
    SQL oracle reproduces every number bit-for-bit; the three estimates
    are each 6dp-rounded BEFORE the inclusion-exclusion so the derived
    values stay engine-stable too.

    Scale shape: one bounded-state shuffle per side (≤ m register rows
    each), then 1-row crossJoins — no driver collect, nothing grows
    with input size.

    Returns one row: ``ndv_a``, ``ndv_b``, ``ndv_union``,
    ``ndv_intersection`` (clamped at 0), ``jaccard_est`` (NULL when the
    union estimate is 0).
    """
    sa = hll_registers(a, [], value_col, p)
    sb = hll_registers(b, [], value_col, p)
    su = hll_merge(sa, sb)
    ea = hll_estimate(sa, [], p).select(F.col("ndv_est").alias("ndv_a"))
    eb = hll_estimate(sb, [], p).select(F.col("ndv_est").alias("ndv_b"))
    eu = hll_estimate(su, [], p).select(F.col("ndv_est").alias("ndv_union"))
    one = ea.crossJoin(eb).crossJoin(eu)
    inter = F.greatest(
        F.lit(0.0), F.round(F.col("ndv_a") + F.col("ndv_b") - F.col("ndv_union"), 6)
    )
    return one.select(
        "ndv_a", "ndv_b", "ndv_union",
        inter.alias("ndv_intersection"),
        F.when(
            F.col("ndv_union") > 0, F.round(inter / F.col("ndv_union"), 6)
        ).alias("jaccard_est"),
    )
