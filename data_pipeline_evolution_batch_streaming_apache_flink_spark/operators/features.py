"""Feature engineering for model-input pipelines.

``hashed_features`` is the hashing-trick bag-of-words vectorizer
(Weinberger et al. 2009): token -> hash -> fixed-dim sparse counts,
no vocabulary to build, ship, or keep consistent across a cluster —
the property that makes it the default text featurizer at 100 TB.

Design choices:
- The token hash is the same md5-fold used by operators/sketches.py —
  exact 60-bit integer arithmetic, reproducible on any engine (and in
  the DuckDB oracle), no JVM-private hash function.
- The whole vectorization is per-row higher-order-function codegen:
  tokenize, hash, and count WITHOUT exploding — zero shuffle, so
  featurizing N documents is embarrassingly parallel and the plan is
  a single map stage. Counting is O(tokens x distinct-buckets) per
  doc via filter/size, which beats an explode + two shuffles for
  real document lengths by a wide margin.
- ``signed=True`` adds the sign-bit variance correction from the
  hashing-trick paper: each token contributes +-1 by one extra hash
  bit, making collisions cancel in expectation (zero-mean noise
  instead of additive bias).

Output column ``features``: ``array<struct<idx int, cnt bigint>>``
sorted by idx (deterministic under any layout); zero-sum buckets are
dropped in signed mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash60_sql(v: str) -> str:
    """60-bit exact integer hash of a string expression: first 15 hex
    chars of md5 parsed base-16. ``conv`` is value-identical to the
    original 15-step locate-fold (pinned by test) and ~4x faster — one
    native call instead of an interpreted higher-order aggregate. The
    DuckDB twin is ``('0x' || substring(md5(v), 1, 15))::BIGINT`` (or
    the equivalent list fold the older oracles carry)."""
    return f"CAST(conv(substring(md5({v}), 1, 15), 16, 10) AS BIGINT)"


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = False,
    out_col: str = "features",
    portable: bool = True,
) -> DataFrame:
    """Hashing-trick sparse bag-of-words per document (see module
    docstring). Keeps all input columns and appends ``out_col``.

    ``portable=False`` swaps the md5 fold for Spark's native
    ``xxhash64`` — ~3-4x faster featurization (measured in the stress
    sweep; the md5 fold dominates the map stage) at the cost of
    engine-reproducibility: feature indexes then differ from the
    DuckDB oracle and from non-JVM engines. Use it when the features
    stay inside Spark (training-input pipelines); keep the default
    when feature indexes must be stable across systems.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")

    def h(v: str) -> str:
        # xxhash64 can be negative: pmod into the non-negative range
        return _hash60_sql(v) if portable else f"pmod(xxhash64({v}), {1 << 60})"

    sign = f"IF(({h('t')} div {dim}) % 2 = 0, CAST(1 AS BIGINT), CAST(-1 AS BIGINT))" if signed else "CAST(1 AS BIGINT)"
    pairs = (
        f"transform(split(trim({text_col}), '\\\\s+'), t -> "
        f"named_struct('idx', CAST({h('t')} % {dim} AS INT), 'sgn', {sign}))"
    )
    feats = (
        f"filter(transform(array_sort(array_distinct(transform(__pairs, p -> p.idx))), d -> "
        f"named_struct('idx', d, 'cnt', "
        f"aggregate(filter(__pairs, p -> p.idx = d), CAST(0 AS BIGINT), (a, p) -> a + p.sgn))), "
        f"s -> s.cnt != 0)"
    )
    return (
        df.withColumn("__pairs", F.expr(pairs))
        .withColumn(out_col, F.expr(feats))
        .drop("__pairs")
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str | Column,
    smoothing: bool = True,
) -> DataFrame:
    """Weight of Evidence / Information Value per category of a feature.

    The classic supervised categorical-feature screen (credit-scoring
    lineage, equally standard for "does `source` predict quality-label"
    questions in corpus curation): per category ``WOE = ln((good_i/G) /
    (bad_i/B))`` and ``IV_i = (good_i/G - bad_i/B) * WOE_i``; the
    feature's IV is the sum. Rule of thumb: IV < 0.02 useless,
    > 0.5 suspicious.

    Engine-stable numerics: with the standard +0.5 zero-cell smoothing
    applied to cells only, ``WOE = ln((2*good_i+1)*B / ((2*bad_i+1)*G))``
    — ONE micro-rounded natural log of an exact integer ratio per
    category (the NB discipline), so no float accumulates anywhere.
    Each category's IV term is likewise one micro-rounded literal
    expression; the total IV is an exact bigint sum of those terms,
    broadcast back onto every row (1-row crossJoin, no driver collect).

    ``label_col`` must evaluate to a boolean ("bad"/positive = true).
    NULL feature categories form their own bucket (missingness is
    signal); NULL labels are dropped. One hash aggregation over the
    fact table; everything after runs on the tiny category table.

    Returns one row per category: ``category`` (string, NULL kept),
    ``n_good``, ``n_bad``, ``woe_micro`` (bigint, 1e-6 units),
    ``iv_micro`` (bigint), ``iv_total_micro`` (bigint, same on every
    row).
    """
    lab = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    base = df.select(
        F.col(feature_col).cast("string").alias("category"), lab.alias("__bad")
    ).where(F.col("__bad").isNotNull())
    cells = base.groupBy("category").agg(
        F.sum((~F.col("__bad")).cast("long")).alias("n_good"),
        F.sum(F.col("__bad").cast("long")).alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("__g"), F.sum("n_bad").alias("__b")
    )
    j = cells.crossJoin(F.broadcast(tot))
    if smoothing:
        gi = 2 * F.col("n_good") + 1
        bi = 2 * F.col("n_bad") + 1
        gt = 2 * F.col("__g")
        bt = 2 * F.col("__b")
    else:
        gi, bi = F.col("n_good"), F.col("n_bad")
        gt, bt = F.col("__g"), F.col("__b")
    woe = F.round(
        F.log(
            gi.cast("double") * bt.cast("double")
            / (bi.cast("double") * gt.cast("double"))
        )
        * F.lit(1000000.0)
    ).cast("long")
    diff = (
        gi.cast("double") / gt.cast("double") - bi.cast("double") / bt.cast("double")
    )
    scored = j.select(
        "category",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        woe.alias("woe_micro"),
        F.round(diff * woe.cast("double")).cast("long").alias("iv_micro"),
    )
    total = scored.agg(F.sum("iv_micro").alias("iv_total_micro"))
    return scored.crossJoin(F.broadcast(total)).withColumn(
        "iv_total_micro", F.col("iv_total_micro").cast("long")
    )
