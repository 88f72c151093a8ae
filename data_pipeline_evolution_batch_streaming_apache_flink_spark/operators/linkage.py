"""Probabilistic record linkage: Fellegi–Sunter scoring.

Entity resolution beyond single-string fuzzy matching
(``operators/fuzzy.py``): score CANDIDATE RECORD PAIRS by how their
fields agree, with the classic Fellegi–Sunter (1969) log-likelihood
weights — the model behind Splink/dedupe-style master-data pipelines.
Deduplicating user/author/merchant records before training on their
content is the record-level twin of document dedup.

Per compared field with match/unmatch agreement probabilities ``m``
and ``u`` (given as integer per-mille, so the configuration itself is
exact)::

    agree     -> w = ln(m / u)                > 0
    disagree  -> w = ln((1000-m) / (1000-u))  < 0
    either side NULL -> w = 0   (missing data carries no information)

Weights enter as ONE double division inside ONE ``ln``, micro-rounded
(house PMI policy) — and both factors of that expression are integer
literals, so Spark and any oracle engine compute the identical bigint
weight; pair scores are exact sums of those bigints. ``m``/``u`` are
CONFIGURED, not EM-estimated: estimation is an offline concern (and
nondeterministic to reproduce); scoring at corpus scale is the
in-engine part.

Scale shape: candidate generation is a conjunctive-blocking equi-join
(pairs not sharing the block key never meet — same contract as every
house pair generator; pick blocks so the biggest block is bounded,
and salt/split hot blocks exactly like the skew playbook). Per-pair
comparisons are row-local codegen (equality or banded
``levenshtein(a, b, d)`` with early exit). One counted shuffle
nowhere — the join IS the only exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .util import cap_buckets

__all__ = ["fellegi_sunter"]


def _weight_expr(num: int, den: int) -> str:
    return (
        f"CAST(round(ln(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) * 1e6, 0)"
        " AS BIGINT)"
    )


def fellegi_sunter(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    comparisons: list[dict],
    upper_micro: int,
    lower_micro: int,
    max_block: int | None = None,
) -> DataFrame:
    """Score same-block record pairs with Fellegi–Sunter field weights.

    ``comparisons`` entries: ``{"col": name, "m_pm": int, "u_pm": int}``
    for exact-equality agreement, plus optional ``"max_dist": d`` to
    count a banded Levenshtein match (edit distance ≤ d) as agreement —
    the typo-tolerant comparator for name-like fields.

    Decisions: ``link`` for ``score_micro >= upper_micro``,
    ``non_link`` for ``<= lower_micro``, ``possible`` between (the
    clerical-review band of the original model).

    ``max_block`` enforces the docstring's blocking contract at runtime:
    records in blocks holding more than ``max_block`` rows are dropped
    BEFORE the self-join (same drop-accounting posture as the LSH
    ``max_bucket`` guards — an oversize block signals a bad blocking key
    and would otherwise cost |block|² comparisons). The window count
    pre-partitions on ``block_cols``, which the self-join reuses, so the
    guard adds no extra exchange. None disables the guard.

    Returns ``(id_a, id_b, score_micro, decision)`` with
    ``id_a < id_b`` — every blocked pair; filter on ``decision``
    downstream.
    """
    if not block_cols:
        raise ValueError("block_cols must be non-empty — unblocked linkage is all-pairs")
    if not comparisons:
        raise ValueError("need at least one comparison field")
    if lower_micro > upper_micro:
        raise ValueError(
            f"lower_micro ({lower_micro}) must be <= upper_micro ({upper_micro})"
        )
    for c in comparisons:
        if not 0 < c["u_pm"] < c["m_pm"] < 1000:
            raise ValueError(
                f"{c['col']}: need 0 < u_pm < m_pm < 1000, got "
                f"m={c['m_pm']} u={c['u_pm']}"
            )

    fields = [c["col"] for c in comparisons]
    sel = [F.col(id_col).alias("__id")] + [F.col(b) for b in block_cols] + [
        F.col(f) for f in fields
    ]
    base = cap_buckets(df.select(*sel), tuple(block_cols), max_block)
    a = base.select(
        F.col("__id").alias("id_a"),
        *[F.col(b) for b in block_cols],
        *[F.col(f).alias(f"__a_{f}") for f in fields],
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        *[F.col(bc) for bc in block_cols],
        *[F.col(f).alias(f"__b_{f}") for f in fields],
    )
    pairs = a.join(b, block_cols).filter(F.col("id_a") < F.col("id_b"))

    terms = []
    for c in comparisons:
        f, m, u = c["col"], c["m_pm"], c["u_pm"]
        if "max_dist" in c:
            agree = f"levenshtein(__a_{f}, __b_{f}, {int(c['max_dist'])}) >= 0"
        else:
            agree = f"__a_{f} = __b_{f}"
        terms.append(
            f"CASE WHEN __a_{f} IS NULL OR __b_{f} IS NULL THEN CAST(0 AS BIGINT) "
            f"WHEN {agree} THEN {_weight_expr(m, u)} "
            f"ELSE {_weight_expr(1000 - m, 1000 - u)} END"
        )
    score = " + ".join(terms)
    return pairs.select(
        "id_a",
        "id_b",
        F.expr(score).cast("bigint").alias("score_micro"),
    ).withColumn(
        "decision",
        F.expr(
            f"CASE WHEN score_micro >= {upper_micro} THEN 'link' "
            f"WHEN score_micro <= {lower_micro} THEN 'non_link' "
            "ELSE 'possible' END"
        ),
    )
