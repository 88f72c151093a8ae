"""Data Selection with Importance Resampling (DSIR) — score a raw
pretraining pool by how target-like each document's hashed-n-gram
profile is.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023, public): fit two add-one-smoothed
bag-of-hashed-(uni+bi)gram multinomials — one on a small TARGET corpus
(the distribution you want more of), one on the RAW pool — and weight
each raw document by the log-likelihood ratio of its features::

    log w(x) = Σ_b  c_b(x) · ( ln p̂_target(b) − ln p̂_raw(b) )

High-weight documents look like the target; selection is then a
downstream composition (``curation.budget_select`` under a token
budget, ``curation.filter_by_percentile`` for a fixed fraction,
``curation.weighted_sample`` for the paper's Gumbel resampling).

Engine discipline (same as ``operators/lm.py``): the only float per
BUCKET is two ``ln`` and one subtraction, immediately rounded to
micro-nats; per-document totals are exact bigint sums of those micro
units, so results are bit-stable across layouts and reproducible by a
plain-SQL twin.

Scale shape: both profiles are one counted shuffle each with map-side
combine onto ≤ ``n_buckets`` keys; the log-ratio table is ≤
``n_buckets`` rows and BROADCASTS to the scoring join, so the raw pool
is touched by exactly one explode + broadcast-join + per-doc sum — no
raw-sized shuffle except the final doc_id aggregation. The hashed
feature space (not a vocabulary) keeps the model size fixed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import _hash60_sql
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import explode_noinfer, fan_out

#: Unit-separator joins bigram halves; a token containing \x1f could
#: collide a unigram with a bigram — vanishingly rare in text, and a
#: collision only perturbs one hash bucket (the estimator is already
#: collision-tolerant by construction).
_SEP = 31


def _gram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, portable: bool
) -> DataFrame:
    """(id, b) with multiplicity: every unigram and bigram of the
    whitespace tokenization, hashed into ``n_buckets``. Docs tokenizing
    to < 2 tokens emit their unigrams only (the bigram branch is gated
    because Spark's ``sequence(0, -1)`` is a DESCENDING two-element
    array, not empty); NULL-text docs emit NO rows at all — the caller
    left-joins them back (``dsir_weights`` scores them (0, 0))."""
    h = _hash60_sql("g") if portable else f"pmod(xxhash64(g), {1 << 60})"
    # fan_out BEFORE the gram build: the md5 fold is expensive per-row
    # work (the hashed_features lesson), and small parquet inputs arrive
    # as one partition per row group — the narrow (id, text) shuffle
    # unlocks N-way hashing; a no-op at real scale.
    return (
        fan_out(df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")))
        .select(
            "__id",
            F.split(F.trim(F.col("__t")), r"\s+").alias("__toks"),
        )
        .select(
            "__id",
            F.expr(
                "concat(__toks, case when size(__toks) >= 2 then "
                "transform(sequence(0, size(__toks) - 2), "
                f"i -> concat(__toks[i], chr({_SEP}), __toks[i + 1])) "
                "else array() end)"
            ).alias("__grams"),
        )
        # explode_noinfer, NOT a bare-attribute explode: the inferred
        # size()>0 filter would alias-substitute the whole gram build
        # below fan_out's exchange and re-run it serially (measured 13x
        # on sf0.1 documents — the dedup._explode_shingles lesson)
        .select("__id", explode_noinfer("__grams").alias("g"))
        .select("__id", F.expr(f"CAST({h} % {n_buckets} AS INT)").alias("b"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    portable: bool = True,
) -> DataFrame:
    """Per-document DSIR importance weights of ``raw`` against
    ``target``: returns ``(id_col, n_grams, logw_micro)`` — the
    log-likelihood ratio in integer micro-nats (bigint) and the
    feature count (for optional length normalization; the paper's
    resampling uses the raw sum). One row per raw document; only
    NULL-text documents score 0 with ``n_grams`` 0 — an empty string
    tokenizes to a single ``''`` token and so contributes one unigram
    (``n_grams`` 1, both engines; pinned by
    ``test_dsir_null_and_empty_text``).

    Deliberately SLIM output (no text passthrough): at pool scale the
    caller joins the two columns back on ``id_col`` — or feeds them
    straight into ``budget_select``/``filter_by_percentile`` — rather
    than shuffling the full text through the scoring aggregation.

    ``portable=True`` uses the md5-fold hash shared with
    ``features.hashed_features`` (engine-reproducible, matches the SQL
    twin); ``portable=False`` swaps in ``xxhash64`` for ~3-4× faster
    featurization when the weights stay inside Spark.

    Smoothing: add-one over the ``n_buckets``-dim multinomial,
    ``p̂(b) = (c_b + 1) / (C + n_buckets)`` — every bucket keeps a
    finite ratio even when absent from the target. The log-ratio per
    bucket is rounded to micro-nats BEFORE the per-document sum, so
    document scores are exact integer sums (layout-independent, exactly
    reproducible in SQL)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    # lazy-pin the raw gram build: it feeds BOTH the r_prof profile and
    # the scoring join, and without the pin the explode + per-gram hash
    # over the whole pool executes once per consumer (review r10 — the
    # self_scored_bigram_lm / lsh_write_index house rule). Lazy, so a
    # single-consumer plan pays nothing extra; rows are narrow (id, int).
    r_grams = _gram_buckets(raw, id_col, text_col, n_buckets, portable).localCheckpoint(
        eager=False
    )
    t_prof = _gram_buckets(target, id_col, text_col, n_buckets, portable).groupBy(
        "b"
    ).agg(F.count(F.lit(1)).alias("ct"))
    r_prof = r_grams.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    # 1-row totals, broadcast via crossJoin (no driver round-trip)
    t_tot = t_prof.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("__CT"))
    r_tot = r_prof.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("__CR"))
    # domain = buckets present in the raw pool (a raw doc's buckets are
    # a subset by construction); target-only buckets never score a doc
    lr = (
        r_prof.join(t_prof, "b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "b",
            F.expr(
                "CAST(round((ln(coalesce(ct, 0) + 1.0) - ln(cr + 1.0)"
                f" + ln(__CR + {n_buckets} + 0.0) - ln(__CT + {n_buckets} + 0.0))"
                " * 1000000) AS BIGINT)"
            ).alias("lr_micro"),
        )
    )
    scores = (
        r_grams.join(F.broadcast(lr), "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_micro").alias("logw_micro"),
        )
    )
    return (
        raw.select(F.col(id_col))
        .join(scores, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("logw_micro", F.lit(0)).cast("bigint").alias("logw_micro"),
        )
    )
