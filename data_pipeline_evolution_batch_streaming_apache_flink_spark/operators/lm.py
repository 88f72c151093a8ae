"""Count-based n-gram language modeling, in-engine.

The classic corpus-quality signal that needs no external model: train
an add-one-smoothed bigram LM on the corpus itself and score each
document's average token log-likelihood. Low scores flag gibberish,
boilerplate soup, and wrong-language contamination; the CCNet/KenLM
pipeline uses exactly this shape (there with a pretrained 5-gram model
— here the LM is trained in the same engine pass, so the whole signal
is reproducible from the corpus alone).

Determinism: add-ONE smoothing keeps every probability a ratio of
exact integers ``(c2 + 1) / (c1 + V)``; the only float per bigram is
one division and one ``ln``, immediately rounded to micro-units, and
per-document totals are then exact bigint sums — the same
engine-portable discipline as the PSI and HLL operators.

Scale shape: training is two counted shuffles (bigram, unigram) with
map-side combine; scoring joins doc bigrams to the model on the bigram
key (reusing the count partitioning) then to unigram counts, then one
per-doc sum. No driver state — the "model" stays distributed, or can
be persisted as parquet and broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # The size>=2 doc gate lives INSIDE the generator (posexplode(NULL)
    # emits no rows): a .where(size(__toks) >= 2) would alias-substitute
    # into the scan stage and re-run the tokenizer once more per row
    # (see util.explode_noinfer). Deliberately NO fan_out here: a plain
    # split+transform is light per-row work, and the repartition would
    # shuffle the full text payload — same-session A/B at sf0.1 showed
    # the fan_out variant ~50% SLOWER (1.0 s -> 1.5 s warm); fan_out
    # pays off only when per-row work >> shuffle cost (e.g. the shingle
    # hashing in textops._token_grams, which keeps it). At real scale
    # the scan arrives multi-partition and parallelism is free anyway.
    return (
        df.select(
            id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks")
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    "case when size(__toks) >= 2 then "
                    "transform(sequence(0, size(__toks) - 2), "
                    "i -> named_struct('w1', __toks[i], 'w2', __toks[i + 1])) end"
                )
            ).alias("pos", "bg"),
        )
        .select(id_col, "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_lm(train: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: returns ``(bigram_counts(w1, w2, c2),
    unigram_counts(w1, c1), vocab_size (1-row DataFrame, column V))``.
    Unigram counts exclude each document's final token (they are
    next-token contexts, not raw frequencies) so that
    ``sum_w c2(w1, w) = c1(w1)`` holds exactly."""
    bg = _bigrams(train, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    toks = train.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    vocab = toks.agg(F.count_distinct("w").alias("V"))
    return c2, c1, vocab


def bigram_lm_scores(
    score: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under the trained LM: per doc, the number of
    bigrams and the exact-integer sum of per-bigram micro log
    likelihoods ``round(ln((c2+1)/(c1+V)) * 1e6)``. Unseen bigrams and
    contexts degrade gracefully to the smoothed floor (counts coalesce
    to 0). Documents with fewer than two tokens are absent (no
    bigrams to score). ``avg_logp_micro`` = floor of the per-bigram
    mean, for thresholding.

    Scale posture (VERDICT r10 #6): unlike DSIR's fixed-``n_buckets``
    gram tables (which always BROADCAST), ``c2``/``c1`` grow with the
    TRAINING corpus's vocabulary, so the scoring joins are
    shuffle-joins on (w1, w2)/(w1) whose build side scales with the
    target slice — measured flat-to-linear through 16x corpus growth
    with a mutating vocabulary (SCALE.md round-11: the pool-side
    bigram explode dominates; the c2 shuffle stays a minor term
    because bigram counts partial-aggregate map-side before the
    exchange). If the target slice itself reaches pool scale — c2 no
    longer executor-memory-sized even partitioned — switch to
    ``operators.dsir.dsir_weights``: its hashed gram profiles bound
    the model state at ``n_buckets`` regardless of vocabulary, the
    same signal family at fixed cost."""
    bg = _bigrams(score, id_col, text_col)
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("V")).cast("double")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__lp").alias("logp_micro_sum"),
    ).withColumn(
        "avg_logp_micro",
        F.expr("(logp_micro_sum - pmod(logp_micro_sum, n_bigrams)) div n_bigrams"),
    )


def self_scored_bigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train on the corpus and score the SAME corpus — the CCNet-style
    primary use — in one shared tokenization pass.

    ``bigram_lm`` + ``bigram_lm_scores`` compose generally (train here,
    score anything), but when the two corpora coincide the bigram
    explode would execute three times (the c2 groupBy, the c1 groupBy,
    and the scoring join each re-evaluate it above one reused
    exchange). Here the exploded bigram table is built once and pinned
    with a lazy ``localCheckpoint`` — the house rule for an
    intermediate whose consumers flow through DIFFERENT exchanges
    (same-session interleaved A/B at sf0.1, warm: two-step 0.95-1.00 s,
    fused 0.78-0.81 s). The pin materializes one row per corpus token (id, pos, w1,
    w2 — never the raw text), spillable MEMORY_AND_DISK; at cluster
    scale prefer persisting the same table as parquet when it is
    reused across jobs rather than stages. Results are bit-identical
    to the two-step path (test-pinned)."""
    bg = _bigrams(df, id_col, text_col).localCheckpoint(eager=False)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    vocab = toks.agg(F.count_distinct("w").alias("V"))
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("V")).cast("double")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__lp").alias("logp_micro_sum"),
    ).withColumn(
        "avg_logp_micro",
        F.expr("(logp_micro_sum - pmod(logp_micro_sum, n_bigrams)) div n_bigrams"),
    )


def excess_lm_scores(
    pool: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Excess-loss data selection signal (the RHO-1 / "Selective
    Language Modeling" criterion, Lin et al. 2024, reduced to the
    in-engine bigram LM): every pool document scored under BOTH a
    reference LM trained on the high-quality ``target`` slice and a
    self LM trained on the pool itself, with the per-document excess
    ``ref_logp − self_logp`` in exact micro-nats. Documents the
    reference model finds LIKELY but the pool model finds SURPRISING
    (large positive excess) are the underrepresented-but-high-quality
    ones selection should favor; boilerplate the pool already models
    well scores near zero or negative.

    Scale shape: the pool's bigram table is built ONCE and pinned
    (same lazy-checkpoint rationale as :func:`self_scored_bigram_lm` —
    it feeds the self counts AND the scoring join), then one join
    chain picks up both models' counts; the two 1-row vocab frames
    broadcast. Cost ≈ one cross_lm_scores plus the self counts —
    strictly cheaper than running the two scorers separately (which
    would tokenize the pool three times). The c2 growth caveat on
    :func:`bigram_lm_scores` applies to both models here, and DOUBLY:
    the SELF model's ``c2s`` scales with the POOL vocabulary (not the
    curated target's), so it is the first join build side to outgrow
    executor-memory partitioning. Measured flat-then-linear through
    16x pool growth with a mutating vocabulary (SCALE.md round-12:
    16x docs → 2.0x wall; map-side partial aggregation keeps both c2
    exchanges minor). If the pool vocabulary explodes beyond that,
    the fallback on ``bigram_lm_scores`` applies verbatim — switch to
    ``operators.dsir.dsir_weights``' hashed gram profiles, whose model
    state is bounded at ``n_buckets`` regardless of vocabulary.

    Returns ``(id_col, n_bigrams, ref_logp_micro, self_logp_micro,
    excess_micro, avg_excess_micro)`` — one row per pool document with
    >= 2 tokens; sums are exact bigint, the average is the same
    floor-division idiom as the other LM scorers."""
    bg = _bigrams(pool, id_col, text_col).localCheckpoint(eager=False)
    c2t, c1t, vt = bigram_lm(target, id_col, text_col)
    c2s = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2s"))
    c1s = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1s"))
    vs = pool.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).agg(F.count_distinct("w").alias("Vs"))

    def _lp(c2_col: str, c1_col: str, v_col: str):
        return F.round(
            F.log(
                (F.coalesce(F.col(c2_col), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col(c1_col), F.lit(0)) + F.col(v_col)).cast("double")
            )
            * 1e6
        ).cast("bigint")

    scored = (
        bg.join(c2t.withColumnRenamed("c2", "c2t"), ["w1", "w2"], "left")
        .join(c1t.withColumnRenamed("c1", "c1t"), "w1", "left")
        .join(c2s, ["w1", "w2"], "left")
        .join(c1s, "w1", "left")
        .crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vs))
        .select(
            id_col,
            _lp("c2t", "c1t", "V").alias("__ref"),
            _lp("c2s", "c1s", "Vs").alias("__self"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__ref").alias("ref_logp_micro"),
            F.sum("__self").alias("self_logp_micro"),
        )
        .withColumn("excess_micro", F.col("ref_logp_micro") - F.col("self_logp_micro"))
        .withColumn(
            "avg_excess_micro",
            F.expr("(excess_micro - pmod(excess_micro, n_bigrams)) div n_bigrams"),
        )
    )


def domain_mixture_weights(
    pool: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    smoothing_ppm: int = 0,
) -> DataFrame:
    """Domain mixture reweighting from per-domain excess loss — the
    DoReMi recipe (Xie et al. 2023) reduced to the engine's bigram-LM
    excess signal and EXACT integer arithmetic: aggregate
    :func:`excess_lm_scores` per domain, clip negative domains to zero,
    and normalize the clipped per-bigram excesses into parts-per-million
    sampling weights. Domains the reference model likes but the pool
    under-represents get upweighted; boilerplate-heavy domains the pool
    already models well fall toward the smoothing floor. (DoReMi proper
    iterates exponentiated-gradient updates against a reference model
    per round; this is the deterministic single-step variant — the
    linear normalization of the same clipped excess signal — chosen so
    every weight is a ratio of exact bigints and the whole operator
    unrolls into plain SQL. Callers wanting the iterative loop can
    re-run with the previous round's weights applied as sampling rates
    upstream.)

    ``smoothing_ppm`` mixes the excess-proportional weights with the
    uniform distribution (DoReMi's ``s``): final = ((1e6 − s) · clip)
    div total_clip + s div n_domains — the (1e6 − s) factor is folded
    into the normalization so only TWO floor divisions apply per
    weight (ADVICE r12: a separate raw-normalization floor stacked a
    third). Weight sums can therefore undershoot 1e6 by at most
    2·n_domains − 2 ppm (each term's floors lose < 1 ppm per domain),
    never overshoot. When every domain clips to zero (the pool already
    matches the target everywhere) the weights are uniform:
    1e6 div n_domains each, regardless of smoothing.

    Scale shape: one :func:`excess_lm_scores` pass (its cost model and
    c2-growth caveat apply verbatim), one id-keyed join to recover the
    domain column, one counted shuffle onto domain keys, and a 1-row
    totals frame broadcast back — per-domain state is four bigints, so
    the domain table is executor-trivial at any corpus size. Domains
    whose documents ALL have < 2 tokens contribute no bigrams and are
    absent from the output (no score exists to weight them).

    Returns ``(domain_col, n_docs, n_bigrams, excess_micro_sum,
    avg_excess_micro, weight_ppm)`` — ``avg_excess_micro`` the exact
    floor of the domain's per-bigram excess in micro-nats."""
    if not 0 <= smoothing_ppm <= 1_000_000:
        raise ValueError(
            f"smoothing_ppm must be in [0, 1000000], got {smoothing_ppm}"
        )
    ex = excess_lm_scores(pool, target, id_col, text_col)
    dom = pool.select(id_col, domain_col)
    per_dom = (
        ex.join(dom, id_col)
        .groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
            F.sum("excess_micro").alias("excess_micro_sum"),
        )
        .withColumn(
            "avg_excess_micro",
            F.expr(
                "(excess_micro_sum - pmod(excess_micro_sum, n_bigrams))"
                " div n_bigrams"
            ),
        )
        .withColumn("__clip", F.greatest("avg_excess_micro", F.lit(0).cast("bigint")))
        # pinned: the domain table feeds BOTH the totals aggregate and
        # the final weight join — without the pin the entire excess
        # pass upstream runs twice (house rule for an intermediate
        # consumed through different exchanges; lazy, so building the
        # plan stays execution-free). n_domains rows — storage-trivial.
        .localCheckpoint(eager=False)
    )
    totals = per_dom.agg(
        F.sum("__clip").alias("__tc"), F.count(F.lit(1)).alias("__nd")
    )
    s = int(smoothing_ppm)
    return (
        per_dom.crossJoin(F.broadcast(totals))
        .withColumn(
            "weight_ppm",
            F.when(
                F.col("__tc") > 0,
                F.expr(f"(({1_000_000 - s} * __clip) div __tc) + ({s} div __nd)"),
            ).otherwise(F.expr("1000000 div __nd")),
        )
        .select(
            domain_col, "n_docs", "n_bigrams", "excess_micro_sum",
            "avg_excess_micro", "weight_ppm",
        )
    )
