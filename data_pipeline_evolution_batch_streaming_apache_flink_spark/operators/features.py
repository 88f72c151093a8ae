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

_HEX = "0123456789abcdef"


def _hash60_sql(v: str) -> str:
    """60-bit exact integer hash of a string expression (first 15 hex
    chars of md5 folded in bigint arithmetic)."""
    return (
        f"aggregate(transform(sequence(1, 15), i -> "
        f"CAST(locate(substr(md5({v}), i, 1), '{_HEX}') - 1 AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, d) -> acc * 16 + d)"
    )


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
