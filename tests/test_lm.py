"""Bigram LM scoring (operators/lm.py) vs a sequential reference."""

from __future__ import annotations

import math
from decimal import Decimal, ROUND_HALF_UP

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import bigram_lm, bigram_lm_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _reference(train_rows, score_rows):
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for _, text in train_rows:
        toks = text.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(vocab)
    out = {}
    for doc_id, text in score_rows:
        toks = text.split()
        if len(toks) < 2:
            continue
        lps = []
        for a, b in zip(toks, toks[1:]):
            p = (c2.get((a, b), 0) + 1) / (c1.get(a, 0) + V)
            lps.append(
                int(Decimal(repr(math.log(p) * 1e6)).quantize(0, rounding=ROUND_HALF_UP))
            )
        s = sum(lps)
        out[doc_id] = (len(lps), s, (s - s % len(lps) if s >= 0 else s - (s % len(lps))) // len(lps))
    return out


def test_matches_reference(spark):
    train = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog"),
    ]
    score = train + [(4, "the cat sat quietly"), (5, "zz qq unseen everything"), (6, "one")]
    c2, c1, v = bigram_lm(_docs(spark, train))
    got = {
        r.doc_id: (r.n_bigrams, r.logp_micro_sum, r.avg_logp_micro)
        for r in bigram_lm_scores(_docs(spark, score), c2, c1, v).collect()
    }
    want = _reference(train, score)
    assert got == want
    assert 6 not in got  # single-token doc has no bigrams
    # in-domain text scores higher than unseen-vocab text
    assert got[1][2] > got[5][2]


def test_next_token_context_identity(spark):
    """sum_w c2(w1, w) == c1(w1) exactly — the add-one probabilities
    then sum to (c1+distinct_successors)/(c1+V) <= 1 per context."""
    train = [(1, "a b a b a c"), (2, "b a b c")]
    c2, c1, _ = bigram_lm(_docs(spark, train))
    from pyspark.sql import functions as F

    joined = (
        c2.groupBy("w1").agg(F.sum("c2").alias("s"))
        .join(c1, "w1")
        .where(F.col("s") != F.col("c1"))
    )
    assert joined.count() == 0


def test_self_scored_matches_two_step_path(spark):
    """self_scored_bigram_lm (shared pinned tokenization) is
    bit-identical to bigram_lm + bigram_lm_scores on the same corpus."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import (
        bigram_lm_scores,
        self_scored_bigram_lm,
    )

    docs = _docs(
        spark,
        [(1, "a b a b a c"), (2, "b a b c"), (3, "x"), (4, ""), (5, "c c c c")],
    )
    c2, c1, vocab = bigram_lm(docs)
    two_step = sorted(map(tuple, bigram_lm_scores(docs, c2, c1, vocab).collect()))
    fused = sorted(map(tuple, self_scored_bigram_lm(docs).collect()))
    assert fused == two_step
    # layout independence of the fused path
    fused2 = sorted(
        map(tuple, self_scored_bigram_lm(docs.repartition(7)).collect())
    )
    assert fused2 == two_step


def test_cross_corpus_scoring_separates_target_from_offdist(spark):
    """r10 cross-LM shape (CCNet): train on a target slice, score the
    pool — in-distribution docs must average higher log-likelihood than
    off-distribution ones, and the target slice's own scores must match
    scoring it in isolation (the model is corpus-independent of the
    score side)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import bigram_lm, bigram_lm_scores

    target_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "the cat ran to the dog"),
    ]
    off_rows = [(4, "uno dos tres cuatro"), (5, "cinco seis siete ocho")]
    pool = spark.createDataFrame(target_rows + off_rows, "doc_id long, text string")
    target = pool.where("doc_id <= 3")
    c2, c1, v = bigram_lm(target)
    got = {r["doc_id"]: r["avg_logp_micro"]
           for r in bigram_lm_scores(pool, c2, c1, v).collect()}
    assert min(got[i] for i in (1, 2, 3)) > max(got[i] for i in (4, 5))
    alone = {r["doc_id"]: r["avg_logp_micro"]
             for r in bigram_lm_scores(target, c2, c1, v).collect()}
    assert alone == {i: got[i] for i in (1, 2, 3)}


def test_excess_lm_matches_two_scorer_composition(spark):
    """excess_lm_scores must be bit-identical to composing the two
    tested scorers (reference LM on the target slice + self-trained LM
    on the pool) and subtracting — the fused path only shares the
    tokenization, never changes a value. Sign sanity: documents the
    reference models well but the pool does not score positive excess;
    pool-boilerplate the reference never saw scores negative."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import (
        bigram_lm, bigram_lm_scores, excess_lm_scores, self_scored_bigram_lm,
    )

    target_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "the cat ran to the dog"),
    ]
    # doc 4 is reference-like but unique in the pool; 5/6 are pool
    # boilerplate (repeated) the reference never saw
    pool_rows = target_rows + [
        (4, "the dog ran to the mat"),
        (5, "uno dos tres cuatro uno dos"),
        (6, "uno dos tres cuatro uno dos"),
    ]
    pool = spark.createDataFrame(pool_rows, "doc_id long, text string")
    target = pool.where("doc_id <= 3")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ref_logp_micro"], r["self_logp_micro"],
                      r["excess_micro"], r["avg_excess_micro"])
        for r in excess_lm_scores(pool, target).collect()
    }
    c2, c1, v = bigram_lm(target)
    ref = {r["doc_id"]: (r["n_bigrams"], r["logp_micro_sum"])
           for r in bigram_lm_scores(pool, c2, c1, v).collect()}
    own = {r["doc_id"]: r["logp_micro_sum"]
           for r in self_scored_bigram_lm(pool).collect()}
    assert set(got) == set(ref) == set(own)
    for d, (n, r_sum, s_sum, ex, avg) in got.items():
        assert (n, r_sum) == ref[d]
        assert s_sum == own[d]
        assert ex == r_sum - s_sum
        assert avg == (ex - (((ex % n) + n) % n)) // n
    # selection story: ranking by excess puts the reference-like doc
    # above the pool boilerplate (absolute sign depends on the vocab
    # size asymmetry of the two smoothed models at toy scale — the
    # criterion is relative, as in the paper)
    assert got[4][4] > max(got[5][4], got[6][4])
    assert got[5][3] < 0 and got[6][3] < 0  # boilerplate: self >> ref
    # layout independence
    b = {
        r["doc_id"]: (r["n_bigrams"], r["ref_logp_micro"], r["self_logp_micro"],
                      r["excess_micro"], r["avg_excess_micro"])
        for r in excess_lm_scores(pool.repartition(7), target.repartition(3)).collect()
    }
    assert b == got
