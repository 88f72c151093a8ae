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


def test_domain_mixture_matches_excess_aggregation(spark):
    """domain_mixture_weights must equal aggregating the (tested)
    excess_lm_scores output per domain in exact integer arithmetic:
    floor per-bigram average, clip at zero, linear ppm normalization.
    Also pins the selection story: the under-represented-but-
    reference-like domain outweighs the boilerplate one."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import (
        domain_mixture_weights, excess_lm_scores,
    )

    rows = [
        (1, "the cat sat on the mat", "web"),
        (2, "the dog sat on the mat", "web"),
        (3, "the cat ran to the dog", "web"),
        # books: reference-identical text (clearly positive excess);
        # spam: pool boilerplate the reference never saw (negative)
        (4, "the cat sat on the mat", "books"),
        (5, "uno dos tres cuatro uno dos", "spam"),
        (6, "uno dos tres cuatro uno dos", "spam"),
    ]
    pool = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = pool.where("doc_id <= 3")
    got = {
        r["source"]: (r["n_docs"], r["n_bigrams"], r["excess_micro_sum"],
                      r["avg_excess_micro"], r["weight_ppm"])
        for r in domain_mixture_weights(pool, target).collect()
    }
    # reference: aggregate the tested per-doc signal in python ints
    ex = excess_lm_scores(pool, target).collect()
    dom_of = {i: s for i, _, s in rows}
    agg: dict[str, list[int]] = {}
    for r in ex:
        d = dom_of[r["doc_id"]]
        a = agg.setdefault(d, [0, 0, 0])
        a[0] += 1
        a[1] += r["n_bigrams"]
        a[2] += r["excess_micro"]
    want = {}
    for d, (nd, nb, exm) in agg.items():
        avg = (exm - (((exm % nb) + nb) % nb)) // nb
        want[d] = (nd, nb, exm, avg, max(avg, 0))
    tc = sum(c for *_, c in want.values())
    for d, (nd, nb, exm, avg, clip) in want.items():
        w = (clip * 1_000_000) // tc if tc > 0 else 1_000_000 // len(want)
        want[d] = (nd, nb, exm, avg, w)
    assert got == want
    assert got["books"][4] > got["spam"][4]
    assert sum(w for *_, w in got.values()) <= 1_000_000


def test_domain_mixture_smoothing_and_uniform_fallback(spark):
    """smoothing_ppm=1e6 forces the uniform distribution; a pool whose
    every domain clips to zero (pool == target: excess is identically
    0) falls back to uniform at any smoothing; out-of-range smoothing
    raises."""
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import domain_mixture_weights

    rows = [
        (1, "a b c d", "x"),
        (2, "e f g h", "y"),
        (3, "a b e f", "z"),
    ]
    pool = spark.createDataFrame(rows, "doc_id long, text string, source string")
    full = domain_mixture_weights(pool, pool, smoothing_ppm=1_000_000).collect()
    assert {r["weight_ppm"] for r in full} == {1_000_000 // 3}
    # pool == target: excess_micro = 0 everywhere -> uniform fallback
    zero = domain_mixture_weights(pool, pool).collect()
    assert {r["weight_ppm"] for r in zero} == {1_000_000 // 3}
    assert all(r["excess_micro_sum"] == 0 for r in zero)
    with pytest.raises(ValueError, match="smoothing_ppm"):
        domain_mixture_weights(pool, pool, smoothing_ppm=-1)


def test_domain_mixture_smoothing_undershoot_bound(spark):
    """ADVICE r12: with the (1e6 - s) factor folded into the clip
    normalization only two floor divisions apply per weight, so the
    weight mass undershoots 1e6 by at most 2*n_domains - 2 ppm and
    never overshoots. Three token-renamed (hence equal-clip) domains at
    s=500000 pin the worst case exactly: 333332 * 3 = 999996 (the old
    three-floor formula produced 999993 here)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import domain_mixture_weights

    # Pool and target are symmetric under the token renaming a->b->c->a,
    # so the three domains carry identical positive excess (equal clips).
    pool = spark.createDataFrame(
        [(1, "a a a a", "x"), (2, "b b b b", "y"), (3, "c c c c", "z")],
        "doc_id long, text string, source string",
    )
    target = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b b b b b b"), (3, "c c c c c c")],
        "doc_id long, text string",
    )
    rows = domain_mixture_weights(pool, target, smoothing_ppm=500_000).collect()
    assert all(r["excess_micro_sum"] > 0 for r in rows)  # clips positive
    weights = [r["weight_ppm"] for r in rows]
    assert len(set(weights)) == 1 and weights[0] == 333_332
    assert sum(weights) == 999_996  # undershoot 4 == 2*3 - 2, the bound

    for s in (0, 1, 123_457, 999_999, 1_000_000):
        tot = sum(
            r["weight_ppm"]
            for r in domain_mixture_weights(pool, target, smoothing_ppm=s).collect()
        )
        assert 1_000_000 - (2 * 3 - 2) <= tot <= 1_000_000, (s, tot)
