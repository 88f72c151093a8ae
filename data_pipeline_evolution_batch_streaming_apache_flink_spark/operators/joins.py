"""Join operators beyond Spark's built-ins (SURVEY §2.4).

The reference exercises: multi-way equi-joins (J1, Catalyst-native),
array UNNEST joins (J3), processing-time lookup joins (J4), event-time
AS-OF temporal joins (J5) and interval joins (J6). J1 is plain
``df.join``; the rest live here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unnest_join(
    fact: DataFrame,
    dim: DataFrame,
    array_col: str,
    dim_key: str,
    fact_cols: list[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """``CROSS JOIN UNNEST(fact.array_col)`` + equi-join to ``dim``
    (reference flink-applications/01-basic-jdbc.json:30, J3).

    Multiset-preserving: duplicate array elements produce duplicate output
    rows. This is the scalable rewrite of the PG ``= ANY(array)`` theta
    join (J2) — the reference itself performs the same rewrite for Flink
    (README.md:144). explode keeps the fact's partitioning; the dim side
    broadcasts, so no shuffle is introduced at any scale.
    """
    cols = fact_cols or [c for c in fact.columns if c != array_col]
    exploded = fact.select(*cols, F.explode(array_col).alias("__elem"))
    d = F.broadcast(dim) if broadcast_dim else dim
    return exploded.join(d, exploded["__elem"] == d[dim_key]).drop("__elem")


def lookup_join(
    stream: DataFrame,
    lookup: DataFrame,
    on: Column | str | list[str],
    how: str = "inner",
    proctime_col: str | None = "proctime",
) -> DataFrame:
    """Processing-time lookup join — Flink ``JOIN t FOR SYSTEM_TIME AS OF
    t.proctime ON key`` (reference flink-applications/03-flink-cdc-jdbc.json:18).

    Spark realization: a stream-static join. Structured Streaming
    re-evaluates the static side every micro-batch, which IS
    "current state of the lookup table at processing time" — at per-batch
    rather than per-row granularity. The reference documents the same
    consistency window for its per-row lookups (README.md:268-301); ours is
    per-batch-snapshot, strictly more consistent within a batch.

    Works identically on batch DataFrames (one "batch" = the whole input).
    """
    out = stream.join(lookup, on=on, how=how)
    if proctime_col:
        out = out.withColumn(proctime_col, F.current_timestamp())
    return out


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    fact_ts: str,
    dim_ts: str,
    how: str = "left",
    tolerance: str | None = None,
    dim_op: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Event-time temporal join — Flink ``JOIN dim FOR SYSTEM_TIME AS OF
    fact.ts ON key`` (reference flink-applications/06-flink-cdc-temporal-join.json:30):
    each fact row joins the dim **version valid at the fact's event time**
    (latest dim row with ``dim_ts <= fact_ts`` per key).

    ``dim_op``: name of a CDC op column on the dim side (``c``/``u``/``d``).
    A delete event becomes a TOMBSTONE version: facts at-or-after it (until
    the next insert/update) match nothing — NULL image under ``left``,
    dropped under ``inner`` — matching Flink's temporal-join behavior for a
    deleted key (the reference's changelog dims, REPLICA IDENTITY FULL).
    Without ``dim_op`` every dim row is a live version (plain versioned
    table).

    Batch implementation (SURVEY §2.4 J5 strategy (a)): union the fact and
    dim changelog, one window over (key, ts) carrying the last non-null dim
    image forward. Exactly ONE shuffle (hash on key) + an in-partition sort —
    no O(n*versions) range join blowup, so it survives 100x fact growth;
    hot keys are handled by AQE skew splitting on the window's shuffle.
    Duplicate dim versions at the same (key, ts) need no pre-aggregation
    (that would be a second shuffle): the window ordering breaks the tie
    by the dim image itself, so last-in-frame = max struct — the same
    deterministic winner, folded into the one sort.

    ``tolerance``: optional max staleness (e.g. "1 hour") — dim versions
    older than ``fact_ts - tolerance`` do not match (merge_asof-style).
    Output: all fact columns + dim's non-key/non-ts columns (NULL when no
    version exists and ``how='left'``; rows dropped when ``how='inner'``).

    ``direction`` (pandas ``merge_asof`` surface; Flink only has backward):

    - ``backward`` — latest dim version with ``dim_ts <= fact_ts`` (default,
      the reference's temporal-join semantics).
    - ``forward`` — earliest dim version with ``dim_ts >= fact_ts`` (same
      one-shuffle plan, the in-partition sort reversed; tolerance bounds
      ``dim_ts <= fact_ts + tolerance``).
    - ``nearest`` — whichever of the two is closer in event time; exact
      ties prefer the backward match. Both candidates come off ONE key
      shuffle (two in-partition sorts share the exchange — no second
      Exchange appears in the plan).

    Equal-(key, ts) dim duplicates resolve to the same max-struct winner in
    every direction, so backward and forward agree on exactly-at-ts facts.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    dim_payload = [c for c in dim.columns if c not in keys and c not in (dim_ts, dim_op)]

    # Tag and align the two sides on a common layout:
    #   (keys..., __ts, __is_fact, __dim struct, fact columns...)
    # __dim leads with __live so a delete (live=false) is itself a carried
    # version; at equal (key, ts) the struct tie-break prefers live over
    # tombstone, then max image — deterministic either way.
    live = (~F.col(dim_op).isin("d", "D")) if dim_op else F.lit(True)
    dim_side = dim.select(
        *keys,
        F.col(dim_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_fact"),
        F.struct(live.alias("__live"), *[F.col(c) for c in dim_payload]).alias("__dim"),
        *[F.lit(None).cast(fact.schema[c].dataType).alias(f"__f_{c}") for c in fact.columns],
    )
    fact_side = fact.select(
        *keys,
        F.col(fact_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_fact"),
        F.lit(None).cast(dim_side.schema["__dim"].dataType).alias("__dim"),
        *[F.col(c).alias(f"__f_{c}") for c in fact.columns],
    )
    unioned = dim_side.unionByName(fact_side)

    # dim rows sort before fact rows at equal ts (__is_fact 0 < 1), giving
    # inclusive AS-OF semantics (version effective AT fact_ts matches);
    # equal-(ts,side) dim ties order by the image, making the carried
    # version the max struct (deterministic) without a dedup shuffle.
    # Forward direction = the same running-carry over the REVERSED sort
    # (desc ts); both sorts hash-partition on the same keys, so nearest
    # costs one Exchange + two in-partition sorts, never two shuffles.
    def _carried(reverse: bool) -> tuple[Column, Column]:
        ordering = [
            F.col("__ts").desc_nulls_first() if reverse else F.col("__ts").asc_nulls_first(),
            F.col("__is_fact").asc(),
            F.col("__dim").asc_nulls_first(),
        ]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*ordering)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ver = F.last("__dim", ignorenulls=True).over(w)
        vts = F.last(
            F.when(F.col("__is_fact") == 0, F.col("__ts")), ignorenulls=True
        ).over(w)
        if tolerance is not None:
            within = (
                vts <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
                if reverse
                else vts >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            )
            ver = F.when(within, ver)
            vts = F.when(within, vts)
        return ver, vts

    if direction == "nearest":
        bver, bts = _carried(False)
        fver, fts = _carried(True)
        staged = unioned.select(
            "*",
            bver.alias("__bver"), bts.alias("__bts"),
            fver.alias("__fver"), fts.alias("__fts"),
        )
        # ties (equidistant versions) prefer the backward match
        back_wins = F.col("__fver").isNull() | (
            F.col("__bver").isNotNull()
            & (
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__bts"))
                <= F.unix_micros(F.col("__fts")) - F.unix_micros(F.col("__ts"))
            )
        )
        carried = staged.withColumn(
            "__version", F.when(back_wins, F.col("__bver")).otherwise(F.col("__fver"))
        )
    else:
        ver, _ = _carried(direction == "forward")
        carried = unioned.withColumn("__version", ver)

    matched = F.col("__is_fact") == 1
    if how == "inner":
        matched = matched & F.coalesce(F.col("__version.__live"), F.lit(False))
    return carried.filter(matched).select(
        *[F.col(f"__f_{c}").alias(c) for c in fact.columns],
        *[
            F.when(F.col("__version.__live"), F.col(f"__version.{c}")).alias(c)
            for c in dim_payload
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join (reference README.md:539, J6):
    match rows with ``right_ts BETWEEN left_ts - lower AND left_ts + upper``
    on the same key.

    Batch: an equi-join on key plus a range predicate — Catalyst executes
    hash-join-then-filter, one shuffle per side. In streaming both sides
    need watermarks; Structured Streaming's stream-stream join supports the
    same predicate shape natively.
    """
    keys = [key] if isinstance(key, str) else list(key)
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (
        F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
    ) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
    )
    return l.join(r, cond, how)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
) -> DataFrame:
    """KEYLESS event-time range join — ``right_ts BETWEEN left_ts -
    lower_ms AND left_ts + upper_ms`` with no equi-key — executed as an
    equi-join via time binning instead of the BroadcastNestedLoopJoin
    Catalyst would otherwise plan (the Databricks "range join
    optimization" / binned-join technique, absent from OSS Spark).

    Bin width = the window length, so every right row lands in exactly
    one bin and every left row's window spans AT MOST TWO consecutive
    bins: the left side explodes to its (<= 2 distinct) candidate bins,
    both sides equi-join on the bin id — ONE hash shuffle per side —
    and the exact predicate filters bin-mates outside the window. Each
    qualifying pair is produced exactly once (the right row's bin is
    unique). The exact comparison is in MICROSECONDS (parquet timestamp
    precision), so boundary rows agree bit-for-bit with an engine
    comparing raw timestamps.

    Scale: shuffle volume is |left|*<=2 + |right| rows keyed by bin —
    never the |left|x|right| nested loop. Skew = hot bins (a traffic
    burst); mitigate by narrowing the window or pre-filtering, the
    standard bursty-data play. Inner semantics only (compose anti/outer
    from it); column names must be disjoint — rename before calling
    (this is usually a self-join).
    """
    if lower_ms < 0 or upper_ms < 0:
        raise ValueError(f"lower_ms/upper_ms must be >= 0, got {lower_ms}/{upper_ms}")
    overlap = sorted(set(left.columns) & set(right.columns))
    if overlap:
        raise ValueError(
            f"left and right share column names {overlap} — rename before range_join"
        )
    width_us = max((lower_ms + upper_ms) * 1000, 1)
    lo_us, up_us = lower_ms * 1000, upper_ms * 1000
    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l = left.withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lts - F.lit(lo_us)) / F.lit(width_us)),
                    F.floor((lts + F.lit(up_us)) / F.lit(width_us)),
                )
            )
        ),
    )
    r = right.withColumn("__bin", F.floor(rts / F.lit(width_us)))
    return (
        l.join(r, "__bin")
        .where((rts >= lts - F.lit(lo_us)) & (rts <= lts + F.lit(up_us)))
        .drop("__bin")
    )
