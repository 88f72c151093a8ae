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
weight; pair scores are exact sums of those bigints. ``m``/``u`` may
be CONFIGURED directly, or estimated from the candidate pairs with
:func:`fellegi_sunter_em` — the EM runs on the tiny agreement-pattern
histogram (≤ 3^k rows), never on the pairs, so estimation costs one
extra counted aggregation over the same blocked join.

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

__all__ = ["fellegi_sunter", "fellegi_sunter_em"]


def _weight_expr(num: int, den: int) -> str:
    return (
        f"CAST(round(ln(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) * 1e6, 0)"
        " AS BIGINT)"
    )


def _blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[str],
    max_block: int | None,
) -> DataFrame:
    """Same-block candidate pairs (``id_a < id_b``) carrying each
    comparison field twice (``__a_<f>``, ``__b_<f>``). The single
    exchange of the whole linkage family; ``max_block`` drops oversize
    blocks before the self-join (cap_buckets window pre-partitions on
    the block key the join reuses)."""
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
    return a.join(b, block_cols).filter(F.col("id_a") < F.col("id_b"))


def _agree_expr(c: dict) -> str:
    f = c["col"]
    if "max_dist" in c:
        return f"levenshtein(__a_{f}, __b_{f}, {int(c['max_dist'])}) >= 0"
    return f"__a_{f} = __b_{f}"


def fellegi_sunter_em(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    comparisons: list[dict],
    n_iter: int = 25,
    init_m_pm: int = 900,
    init_u_pm: int = 100,
    init_lambda_micro: int = 100_000,
    max_block: int | None = None,
) -> DataFrame:
    """Estimate per-field ``m``/``u`` (and the match prior λ) from the
    blocked candidate pairs with expectation–maximization — the
    unsupervised parameter-training step of the Fellegi–Sunter model
    (the Splink/dedupe approach, public since Winkler 1988).

    ``comparisons`` entries: ``{"col": name}`` for exact-equality
    agreement, optional ``"max_dist": d`` for banded-Levenshtein
    agreement — the SAME comparator spec :func:`fellegi_sunter` scores
    with, so the estimated per-milles feed straight back into it.

    Scale shape: the pairs are reduced to their AGREEMENT-PATTERN
    histogram (one counted aggregation; ≤ 3^k rows for k fields —
    agree / disagree / missing per field) and EM iterates driver-side
    over that tiny table in a fixed summation order. Corpus-size work
    is exactly one blocked join + one group-by, independent of
    ``n_iter``; the collect is bounded by the enforced ``k <= 8``.
    Deterministic: fixed init, fixed iteration count, ordered float64
    sums — layout-independent because the histogram is.

    Returns one row per field: ``(field, m_pm, u_pm, lambda_micro,
    n_pairs, n_dropped_rows)`` — per-milles rounded and clamped to
    ``(0, 1000)`` exclusive so they validate as :func:`fellegi_sunter`
    config. Rows are emitted in ``comparisons`` order.
    ``n_dropped_rows`` is the number of INPUT RECORDS excluded by the
    ``max_block`` oversize-block guard (0 when ``max_block`` is None)
    — truncation of the training sample is never silent: callers see
    exactly how many records the estimate did not observe and can
    deepen the block key when the fraction is material. Raises if the
    blocked pair set is empty (nothing to estimate from) or if EM
    degenerates to ``m <= u`` for some field (that field carries no
    match signal under this blocking — remove it or fix the blocks).
    """
    if not block_cols:
        raise ValueError("block_cols must be non-empty — unblocked linkage is all-pairs")
    if not 1 <= len(comparisons) <= 8:
        raise ValueError(
            f"need 1..8 comparison fields (3^k histogram must stay tiny), "
            f"got {len(comparisons)}"
        )
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < init_u_pm < init_m_pm < 1000:
        raise ValueError(
            f"need 0 < init_u_pm < init_m_pm < 1000, got "
            f"m={init_m_pm} u={init_u_pm}"
        )
    if not 0 < init_lambda_micro < 1_000_000:
        raise ValueError(f"init_lambda_micro must be in (0, 1e6), got {init_lambda_micro}")

    fields = [c["col"] for c in comparisons]
    # drop-accounting for the max_block guard: one tiny counted
    # aggregation over the block-size histogram (input-sized, narrow;
    # the pairs join below dominates), so a capped block can never
    # silently shrink the training sample.
    n_dropped = 0
    if max_block is not None:
        n_dropped = int(
            df.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_block)
            .agg(F.coalesce(F.sum("__bn"), F.lit(0)).alias("__d"))
            .collect()[0]["__d"]
        )
    pairs = _blocked_pairs(df, id_col, block_cols, fields, max_block)
    gammas = [
        F.expr(
            f"CASE WHEN __a_{c['col']} IS NULL OR __b_{c['col']} IS NULL THEN CAST(NULL AS INT) "
            f"WHEN {_agree_expr(c)} THEN 1 ELSE 0 END"
        ).alias(f"__g{i}")
        for i, c in enumerate(comparisons)
    ]
    gcols = [f"__g{i}" for i in range(len(comparisons))]
    hist = pairs.select(*gammas).groupBy(*gcols).agg(F.count(F.lit(1)).alias("__n")).collect()
    if not hist:
        raise ValueError("fellegi_sunter_em: no candidate pairs under this blocking")
    # fixed pattern order -> bit-stable float sums regardless of layout
    pats = sorted(
        ((tuple(r[g] for g in gcols), r["__n"]) for r in hist),
        key=lambda t: tuple(-1 if v is None else v for v in t[0]),
    )
    total = float(sum(n for _, n in pats))

    k = len(comparisons)
    eps = 1e-6
    lam = init_lambda_micro / 1e6
    m = [init_m_pm / 1000.0] * k
    u = [init_u_pm / 1000.0] * k
    for _ in range(n_iter):
        s_p = 0.0
        s_m = [0.0] * k
        s_mn = [0.0] * k
        s_u = [0.0] * k
        s_un = [0.0] * k
        for g, n in pats:
            pm = lam
            pu = 1.0 - lam
            for i in range(k):
                if g[i] is None:
                    continue  # missing field carries no information
                pm *= m[i] if g[i] == 1 else 1.0 - m[i]
                pu *= u[i] if g[i] == 1 else 1.0 - u[i]
            p = pm / (pm + pu) if pm + pu > 0 else 0.0
            s_p += n * p
            for i in range(k):
                if g[i] is None:
                    continue
                s_mn[i] += n * p
                s_un[i] += n * (1.0 - p)
                if g[i] == 1:
                    s_m[i] += n * p
                    s_u[i] += n * (1.0 - p)
        lam = min(max(s_p / total, eps), 1.0 - eps)
        for i in range(k):
            m[i] = min(max(s_m[i] / s_mn[i] if s_mn[i] > 0 else m[i], eps), 1.0 - eps)
            u[i] = min(max(s_u[i] / s_un[i] if s_un[i] > 0 else u[i], eps), 1.0 - eps)

    clamp_pm = lambda x: min(max(int(round(x * 1000)), 1), 999)
    rows = []
    for i, c in enumerate(comparisons):
        m_pm, u_pm = clamp_pm(m[i]), clamp_pm(u[i])
        if m_pm <= u_pm:
            raise ValueError(
                f"fellegi_sunter_em: field {c['col']!r} degenerated to "
                f"m_pm={m_pm} <= u_pm={u_pm} — no match signal under this "
                "blocking; drop the field or revisit the blocks"
            )
        rows.append((c["col"], m_pm, u_pm, int(round(lam * 1e6)), int(total), n_dropped))
    return df.sparkSession.createDataFrame(
        rows,
        "field string, m_pm int, u_pm int, lambda_micro bigint, "
        "n_pairs bigint, n_dropped_rows bigint",
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
    pairs = _blocked_pairs(df, id_col, block_cols, fields, max_block)

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
