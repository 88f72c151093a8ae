"""In-engine supervised text classification: multinomial Naive Bayes.

The workhorse corpus-labeling model that needs no external weights —
train on the labeled slice of the corpus, score the rest: language
routing, source/domain attribution, quality-tier propagation. The
self-trained complement of ``operators/lm.py`` (which scores
likelihood under ONE model; this discriminates between per-class
models).

Determinism contract (house policy, same as ``lm.bigram_lm_scores`` /
``basket.cooccurrence_pmi``): every count is an exact bigint; each
log-probability enters as ONE double division inside ONE ``ln``,
immediately rounded to micro-units —

    prior_micro(c)   = round(ln(n_c / N) * 1e6)
    term_micro(c, t) = round(ln((cnt(c,t) + 1) / (T_c + V)) * 1e6)

(add-one smoothing keeps both ratios of exact integers) — and document
scores are exact bigint sums ``prior + Σ cnt_d(t)·term``, so the
result is bit-identical on any layout and reproducible by a SQL twin
on any engine. Ties break to the lexically smallest label.

Scale shape: training is two counted shuffles with map-side combine
((label, token) and per-label totals); scoring joins the test token
counts to the conditional table on (label, token) after a broadcast
fan-out over the (small) label set, then one per-(doc, label) sum and
one per-doc argmax — the model never leaves the cluster and is never
collected. Vocabulary and per-class totals ride along as broadcast
1-row/cardinality-|C| tables.

Tokenization matches ``operators/lm.py``: whitespace split of the
trimmed text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["naive_bayes_classify"]


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.explode(toks).alias("__tok"))
        .groupBy("__id", "__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def naive_bayes_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Train add-one multinomial NB on ``train`` (``label_col``,
    ``text_col``) and classify ``test`` rows.

    Tokens unseen in training still discriminate through the per-class
    denominator ``T_c + V`` (an unseen token costs a long class more),
    which is the textbook behavior. Classes are exactly the labels
    present in ``train``.

    Returns ``(id, label, score_micro)`` — one row per test document:
    the argmax class and its integer micro-log-score (ties to the
    smallest label).
    """
    tr_tok = (
        _token_counts(train, id_col, text_col)
        .join(
            train.select(
                F.col(id_col).alias("__id"), F.col(label_col).alias("__label")
            ),
            "__id",
        )
    )
    # conditional counts, per-class totals, vocabulary, priors
    cond = tr_tok.groupBy("__label", "__tok").agg(F.sum("__cnt").alias("__c"))
    cls_tot = cond.groupBy("__label").agg(F.sum("__c").alias("__tc"))
    vocab = cond.select("__tok").distinct().agg(F.count(F.lit(1)).alias("__v"))
    n_docs = train.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__n")
    )
    priors = (
        train.where(F.col(text_col).isNotNull())
        .groupBy(F.col(label_col).alias("__label"))
        .agg(F.count(F.lit(1)).alias("__nc"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__label",
            F.expr(
                "CAST(round(ln(CAST(__nc AS DOUBLE) / CAST(__n AS DOUBLE)) * 1e6, 0)"
                " AS BIGINT)"
            ).alias("__prior"),
        )
    )
    classes = F.broadcast(
        cls_tot.crossJoin(F.broadcast(vocab)).join(priors, "__label")
    )
    te_tok = _token_counts(test, id_col, text_col)
    scored = (
        te_tok.crossJoin(classes)
        .join(cond, ["__label", "__tok"], "left")
        .select(
            "__id",
            "__label",
            "__prior",
            (
                F.col("__cnt")
                * F.expr(
                    "CAST(round(ln(CAST(coalesce(__c, 0) + 1 AS DOUBLE)"
                    " / CAST(__tc + __v AS DOUBLE)) * 1e6, 0) AS BIGINT)"
                )
            ).alias("__contrib"),
        )
        .groupBy("__id", "__label", "__prior")
        .agg(F.sum("__contrib").alias("__s"))
        .select(
            "__id",
            "__label",
            (F.col("__prior") + F.col("__s")).cast("bigint").alias("__score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("__id").orderBy(
            F.col("__score").desc(), F.col("__label").asc()
        )
    )
    return (
        scored.withColumn("__rn", rn)
        .where(F.col("__rn") == 1)
        .select(
            F.col("__id").alias("id"),
            F.col("__label").alias("label"),
            F.col("__score").alias("score_micro"),
        )
    )
