"""Portable Bloom-filter join pruning.

The scale pattern behind Spark's own runtime row-group skipping
(InjectRuntimeFilter) and Flink's dynamic filtering, re-expressed with
an ENGINE-PORTABLE filter so the pruning decision is reproducible (and
oracle-checkable) anywhere: a probe-side pre-filter that drops most
non-matching fact rows BEFORE the join shuffle. At 100 TB the win is
shuffle-volume: a semi-join must exchange every fact row on the key; a
Bloom pre-filter broadcasts a few KB of bits and kills non-members at
the scan, so only (matches + a bounded false-positive fraction) ever
reach the exchange.

Hashing is md5-derived like the house ``sketches.hash60``, but CHEAP
on the probe's hot path: ONE md5 digest serves THREE hash functions
(hash ``i`` reads the 10-hex-char chunk ``i % 3`` of digest ``i // 3``
— 40 exact bits each, the chunked-digest variant of
Kirsch-Mitzenmacher double hashing), and the hex→int fold is Spark's
codegen'd ``conv(hex, 16, 10)`` instead of a lambda fold — identical
integers (Σ dᵢ·16^(9-i) IS base conversion), reproducible by a digit
fold on any engine with md5 + string ops. The filter "bits" are kept
as the SORTED array of set positions — at most ``m`` ints, mergeable
by union (:func:`bloom_merge`); the probe expands them to a dense
boolean array once so membership is O(1) ``element_at`` per function.
Determinism: everything is integer md5 arithmetic — zero floats — so
pass/fail per row is bit-identical across engines, false positives
included.

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k; m=8192, k=3 at
n=1000 keys gives ~2%. Build shuffles only ``k*n`` position ints; the
probe side is a row-local filter after a one-row broadcast — no
shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_build", "bloom_prune", "bloom_merge"]

def _position(col: str, i: int, m: int) -> Column:
    """Set-bit position for hash function ``i``: a 10-hex-char (40-bit)
    chunk of the salted digest, base-converted and reduced mod m (the
    value is non-negative, so ``%`` == pmod on every engine). Hashes
    come in groups of three per digest — one md5 per row covers the
    default k=3."""
    grp, off = divmod(i, 3)
    start = 1 + 10 * off
    return F.expr(
        f"CAST(CAST(conv(substr(md5(CONCAT('b{grp}|', CAST({col} AS STRING))), "
        f"{start}, 10), 16, 10) AS BIGINT) % {m} AS INT)"
    )


def bloom_build(df: DataFrame, key_col: str, m: int = 8192, k: int = 3) -> DataFrame:
    """Build the filter from the build (dimension) side: ONE row
    ``(bits: array<int> sorted, m, k)``.

    Shape: k row-local position columns -> explode -> distinct (the one
    shuffle, at most ``m`` survivors) -> single-row array collect. The
    ``m``/``k`` columns ride along so :func:`bloom_prune` can refuse a
    mismatched filter instead of silently dropping everything.
    """
    if m <= 0 or k <= 0:
        raise ValueError(f"m and k must be positive, got m={m} k={k}")
    positions = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.explode(F.array(*[_position(key_col, i, m) for i in range(k)])).alias("__pos")
        )
        .distinct()
    )
    return positions.agg(
        F.array_sort(F.collect_list("__pos")).alias("bits"),
        F.lit(m).alias("m"),
        F.lit(k).alias("k"),
    )


def bloom_prune(df: DataFrame, key_col: str, bloom: DataFrame, m: int = 8192, k: int = 3) -> DataFrame:
    """Keep probe rows whose key MIGHT be in the build set (all ``k``
    positions set); definite non-members are dropped at the scan.
    NULL keys are dropped (they can never equi-join anyway).

    The filter row is materialized here — ONE bounded driver round-trip
    of at most ``m`` ints (``m`` is the user-chosen filter width; the
    bound is structural, same discipline as the IVF probed-cell
    collect) — so the build job runs exactly once, the (m, k) contract
    is validated with an actionable error BEFORE any probe work, and
    the sparse position list expands to a DENSE length-``m`` boolean
    array before re-broadcast: each of the k probes is then an O(1)
    ``element_at``, not an O(set-bits) ``array_contains`` linear scan —
    at 150k probe rows x k=3 x thousands of set bits the linear scan
    was the entire runtime. No shuffle, no UDF. Downstream still does
    the real join: Bloom passes false positives (bounded by the sizing
    formula), never false negatives.
    """
    row = bloom.first()
    if row is None or row["bits"] is None:
        raise ValueError("bloom filter DataFrame is empty — build it with bloom_build")
    if (row["m"], row["k"]) != (m, k):
        raise ValueError(
            f"bloom filter was built with (m={row['m']}, k={row['k']}) "
            f"but probed with (m={m}, k={k})"
        )
    present = [False] * m
    for p in row["bits"]:
        present[p] = True
    b = df.sparkSession.createDataFrame(
        [(present,)], "__bloom_bits array<boolean>"
    )
    member = F.lit(True)
    for i in range(k):
        member = member & F.element_at(
            F.col("__bloom_bits"), _position(key_col, i, m) + F.lit(1)
        )
    return (
        df.where(F.col(key_col).isNotNull())
        .crossJoin(F.broadcast(b))
        .where(member)
        .drop("__bloom_bits")
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union-merge Bloom filters built with the same (m, k): the merged
    filter's bit set is the union of position sets — exactly how
    per-shard/per-day filters roll up losslessly (a key is in the
    union's maybe-set iff it was in some shard's), the same associative
    combine contract as ``sketches.hll_merge``/``cms_merge``. The (m, k)
    agreement is enforced at probe time by :func:`bloom_prune`; merging
    mismatched widths fails there, not silently here."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one filter")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.select(
        F.explode("bits").alias("__pos"), "m", "k"
    ).groupBy("m", "k").agg(
        F.array_sort(F.collect_set("__pos")).alias("bits")
    ).select("bits", "m", "k")
