"""Market-basket co-occurrence statistics with exact PMI.

Co-occurrence mining is the same computation at two very different
layers of the stack: items bought together in the reference's order
stream (which pizzas share an order — `scripts/datagen.py` builds
multi-pizza orders), and token/document association scores (PMI) in a
pretraining corpus — word collocations, source-domain affinity,
benchmark leakage pairs. One operator serves both.

Determinism contract (house policy, same as ``lm.bigram_lm_scores`` /
``quality.psi_drift``): all counts are exact bigints; the ONLY float
per output row is one double division inside one ``ln``, immediately
rounded to micro-units —

    pmi_micro = round(ln((pair_count * n_baskets) /
                         (count_a * count_b)) * 1e6)

evaluated as ``double(bigint) / double(bigint)`` so any engine
reproduces it bit-for-bit.

Scale shape: the per-basket self-join is the only quadratic step and
it is bounded by basket size (k items -> k*(k-1)/2 pair rows), never
by corpus size; pairs then collapse in ONE counted shuffle with
map-side combine. A hot basket (one order with 10^5 items) is the
failure mode to guard — cap with ``max_basket`` exactly like the LSH
bucket guards cap posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cooccurrence_pmi", "association_rules"]


def cooccurrence_pmi(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Per unordered item pair: co-occurrence count and exact-integer
    PMI micro-score.

    Input rows are ``(basket, item)`` observations; duplicates within a
    basket collapse first (presence, not multiplicity — the standard
    market-basket/PMI convention). Pairs are canonical ``item_a <
    item_b``. ``min_pair_count`` prunes the long tail BEFORE the count
    joins (at corpus scale almost all mass is count-1 pairs; prune
    early, the PMI of a singleton pair is noise anyway).

    ``max_basket`` drops baskets with more distinct items than the cap
    (quadratic-blowup guard; dropped baskets also leave ``n_baskets``
    so probabilities stay consistent). ``None`` disables the guard.

    Returns ``(item_a, item_b, pair_count, count_a, count_b,
    n_baskets, pmi_micro)``.

    Shuffles: distinct (1), optional basket-size count reusing the same
    key partitioning, pair count (1), two item-keyed count joins (the
    item-count side is #items rows — broadcastable when the vocabulary
    is small, left to the optimizer/AQE otherwise).

    The ``(basket, item)`` distinct feeds FOUR consumers (pair join
    left/right, item counts, basket count); it is lazily
    ``localCheckpoint``-ed so all four share ONE materialization by RDD
    identity — AQE's canonical-plan stage reuse catches this only
    opportunistically (it races on stage submission order), and without
    either the input would be scanned and deduplicated four times.
    """
    b = (
        df.select(F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it"))
        # null baskets can never pair (null keys don't equi-join), so they
        # must not count toward n_baskets either
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    if max_basket is not None:
        sizes = b.groupBy("__bk").agg(F.count(F.lit(1)).alias("__sz"))
        b = b.join(sizes.where(F.col("__sz") <= max_basket).select("__bk"), "__bk")
    b = b.localCheckpoint(eager=False)
    n_baskets = b.select("__bk").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_counts = b.groupBy(F.col("__it")).agg(F.count(F.lit(1)).alias("__ic"))
    left = b.select(F.col("__bk"), F.col("__it").alias("item_a"))
    right = b.select(F.col("__bk"), F.col("__it").alias("item_b"))
    pairs = (
        left.join(right, "__bk")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    out = (
        pairs.join(
            item_counts.select(F.col("__it").alias("item_a"), F.col("__ic").alias("count_a")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("__it").alias("item_b"), F.col("__ic").alias("count_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        F.col("pair_count").cast("bigint").alias("pair_count"),
        F.col("count_a").cast("bigint").alias("count_a"),
        F.col("count_b").cast("bigint").alias("count_b"),
        F.col("n_baskets").cast("bigint").alias("n_baskets"),
        F.expr(
            "CAST(round(ln(CAST(pair_count * n_baskets AS DOUBLE)"
            " / CAST(count_a * count_b AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("pmi_micro"),
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int | None = None,
    min_confidence_micro: int = 0,
) -> DataFrame:
    """Directed association rules (antecedent => consequent) with
    support / confidence / lift — the Apriori readout for 2-itemsets,
    which in practice carries most of the recommendation/affinity
    signal (higher orders explode combinatorially for marginal lift).

    Built on :func:`cooccurrence_pmi`'s canonical pair counts (same
    dedup, same basket-size guard, same single pair shuffle): each
    unordered pair emits both directions, then per rule

        support_micro    = round(pair * 1e6 / n_baskets)
        confidence_micro = round(pair * 1e6 / count_antecedent)
        lift_micro       = round(pair * n_baskets * 1e6
                                 / (count_antecedent * count_consequent))

    — each ONE micro-rounded double expression over exact bigints
    (house determinism policy), so rules rank identically on any
    layout/engine. ``min_confidence_micro`` prunes weak rules after
    scoring (confidence is direction-specific, so pruning cannot happen
    at the undirected stage).

    Returns ``(antecedent, consequent, pair_count, support_micro,
    confidence_micro, lift_micro)``. Lift is symmetric; confidence is
    not — both directions of a pair appear unless pruned.
    """
    pmi = cooccurrence_pmi(
        df, basket_col, item_col,
        min_pair_count=min_pair_count, max_basket=max_basket,
    )
    fwd = pmi.select(
        F.col("item_a").alias("antecedent"), F.col("item_b").alias("consequent"),
        "pair_count", F.col("count_a").alias("__ante"),
        F.col("count_b").alias("__cons"), "n_baskets",
    )
    rev = pmi.select(
        F.col("item_b").alias("antecedent"), F.col("item_a").alias("consequent"),
        "pair_count", F.col("count_b").alias("__ante"),
        F.col("count_a").alias("__cons"), "n_baskets",
    )
    both = fwd.unionByName(rev)
    pc = F.col("pair_count").cast("double")
    nb = F.col("n_baskets").cast("double")
    ante = F.col("__ante").cast("double")
    cons = F.col("__cons").cast("double")
    scored = both.select(
        "antecedent", "consequent",
        F.col("pair_count").cast("long").alias("pair_count"),
        F.round(pc * F.lit(1000000.0) / nb).cast("long").alias("support_micro"),
        F.round(pc * F.lit(1000000.0) / ante).cast("long").alias("confidence_micro"),
        F.round(pc * nb * F.lit(1000000.0) / (ante * cons)).cast("long").alias("lift_micro"),
    )
    return scored.where(F.col("confidence_micro") >= min_confidence_micro)
