"""Fuzzy (edit-distance) matching: q-gram-blocked Levenshtein join.

Entity resolution / record linkage for a training-data pipeline: find
string pairs within a bounded edit distance without the quadratic
all-pairs scan. Not in the reference (its joins are all equality /
temporal — ``flink-applications/*.json``); this is part of the
driver-mandated large-scale curation surface.

Scale design (the count-filtering bound of Gravano et al., "Approximate
String Joins in a Database (Almost) for Free", VLDB 2001):

- a string of length ``L`` has ``L - q + 1`` positional q-grams and one
  edit destroys at most ``q`` of them, so two strings within distance
  ``d`` share at least ``L - q + 1 - q*d`` q-grams. Whenever
  ``L >= q*(d+1)`` that bound is >= 1, so candidate generation by
  "share at least one q-gram" (inverted q-gram index + equi-join, the
  same shape as ``ngram_jaccard_pairs``) is LOSSLESS for long strings.
- pairs with at least one member shorter than ``q*(d+1)`` can share
  zero q-grams; since the length filter ``|len(a) - len(b)| <= d`` is
  necessary, BOTH members of such a pair are shorter than
  ``q*(d+1) + d``. All strings under that cap go through a second,
  length-banded block (equi-join on ``floor(len / (d+1))``, each string
  also probing the successor band, so any pair within ``d`` lands in a
  shared band). Short strings are by construction bounded-length, so
  band populations are vocabulary-sized, not corpus-sized.
- both paths prune with the length filter before verification, and
  verify with the built-in ``levenshtein(a, b, d)`` (JVM codegen,
  early-exit banded DP — returns -1 above the threshold, so no full DP
  matrix on far pairs).

Everything is DataFrame-native: one explode + one equi-join shuffle for
candidates, no UDF, no cartesian product (plan-pinned in
``tests/test_scale.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fuzzy_self_join"]


def _qgrams(col: Column, q: int) -> Column:
    """Distinct q-gram contents of a string (set semantics — enough for
    the >=1-shared-gram block)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - q + 1, F.lit(1))),
            lambda i: col.substr(i, F.lit(q)),
        )
    )


def _verified(cand: DataFrame, max_dist: int) -> DataFrame:
    dist = F.levenshtein("text_a", "text_b", max_dist)
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    max_dist: int,
    q: int = 2,
    id_col: str | None = None,
) -> DataFrame:
    """All pairs of distinct rows whose ``text_col`` values are within
    Levenshtein distance ``max_dist``. Orientation is ``id_a < id_b`` on
    ``id_col`` when given (else on the string value itself), so each
    pair appears exactly once.

    Returns ``(id_a, id_b, text_a, text_b, dist)``.

    ``q`` is the gram width for the lossless candidate block (see module
    docstring). Exactness versus the brute-force quadratic join is
    property-tested in ``tests/test_fuzzy.py``.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    min_long = q * (max_dist + 1)

    s = df.select(
        (F.col(id_col) if id_col else F.col(text_col)).alias("__id"),
        F.col(text_col).alias("__t"),
    ).withColumn("__len", F.length("__t"))

    # -- long strings: inverted q-gram index; >=1 shared gram is lossless
    # for pairs where both members have len >= q*(d+1).
    inv = s.filter(F.col("__len") >= min_long).withColumn(
        "__g", F.explode(_qgrams(F.col("__t"), q))
    )
    long_cand = (
        inv.select(F.col("__id").alias("id_a"), F.col("__t").alias("text_a"),
                   F.col("__len").alias("len_a"), "__g")
        .join(
            inv.select(F.col("__id").alias("id_b"), F.col("__t").alias("text_b"),
                       F.col("__len").alias("len_b"), "__g"),
            "__g",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        )
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )

    # -- pairs with a short member: both strings are then < q*(d+1) + d
    # long (length filter), so band everything under that cap by
    # floor(len / (d+1)); |len(a)-len(b)| <= d implies same or adjacent
    # band, so side A also probes its successor band. Still an equi-join.
    shortish = s.filter(F.col("__len") < min_long + max_dist)
    band = F.floor(F.col("__len") / (max_dist + 1))
    # NOTE: the probe is asymmetric (side A reaches its own band and the
    # NEXT one), so a pair is only guaranteed to meet with its lower-band
    # member on side A — the id orientation is decided AFTER the join by
    # canonicalizing, never by filtering the join output (an id_a < id_b
    # filter would silently drop pairs whose band order disagrees with
    # their id order).
    swapped = F.col("id_a") < F.col("id_b")
    short_cand = (
        shortish.select(
            F.col("__id").alias("id_a"), F.col("__t").alias("text_a"),
            F.col("__len").alias("len_a"),
            F.explode(F.array(band.cast("long"), band.cast("long") + 1)).alias("__band"),
        )
        .join(
            shortish.select(
                F.col("__id").alias("id_b"), F.col("__t").alias("text_b"),
                F.col("__len").alias("len_b"), band.cast("long").alias("__band"),
            ),
            "__band",
        )
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        )
        .select(
            F.when(swapped, F.col("id_a")).otherwise(F.col("id_b")).alias("id_a"),
            F.when(swapped, F.col("id_b")).otherwise(F.col("id_a")).alias("id_b"),
            F.when(swapped, F.col("text_a")).otherwise(F.col("text_b")).alias("text_a"),
            F.when(swapped, F.col("text_b")).otherwise(F.col("text_a")).alias("text_b"),
        )
        .distinct()
    )

    cand = long_cand.unionByName(short_cand).distinct()
    return _verified(cand, max_dist)
