"""Multinomial Naive Bayes (operators/classify.py): exact-integer
scoring vs a sequential reference, tie/unseen-token semantics, layout
independence."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.classify import naive_bayes_classify

TRAIN = [
    (1, "le chat noir dort", "fr"),
    (2, "le chien mange bien", "fr"),
    (3, "the black cat sleeps", "en"),
    (4, "the dog eats well", "en"),
    (5, "el gato negro duerme", "es"),
]
TEST = [
    (10, "the cat sleeps well"),
    (11, "le chat mange"),
    (12, "el gato duerme"),
    (13, "zzz unseen tokens only"),
]


def _ref(train, test):
    cond = defaultdict(Counter)
    tot = Counter()
    prior_n = Counter()
    for _, t, l in train:
        toks = t.split()
        cond[l].update(toks)
        tot[l] += len(toks)
        prior_n[l] += 1
    vocab = {w for c in cond.values() for w in c}
    V, N = len(vocab), len(train)
    out = {}
    for i, t in test:
        best = None
        for l in sorted(prior_n):
            s = round(math.log(prior_n[l] / N) * 1e6)
            for w, cd in Counter(t.split()).items():
                s += cd * round(math.log((cond[l][w] + 1) / (tot[l] + V)) * 1e6)
            if best is None or s > best[1] or (s == best[1] and l < best[0]):
                best = (l, s)
        out[i] = best
    return out


def test_matches_sequential_reference(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id int, text string, lang string")
    te = spark.createDataFrame(TEST, "doc_id int, text string")
    got = {
        r.id: (r.label, r.score_micro)
        for r in naive_bayes_classify(tr, te, "lang", "text", "doc_id").collect()
    }
    assert got == _ref(TRAIN, TEST)
    # sanity on the intent, not just the arithmetic
    assert got[10][0] == "en" and got[11][0] == "fr" and got[12][0] == "es"


def test_all_unseen_tokens_pick_longest_denominator_class(spark):
    # doc 13: every token unseen -> per-class score is prior +
    # n_toks * ln(1/(T_c+V)); the winner is decided by class size,
    # still deterministically
    tr = spark.createDataFrame(TRAIN, "doc_id int, text string, lang string")
    te = spark.createDataFrame([TEST[3]], "doc_id int, text string")
    r = naive_bayes_classify(tr, te, "lang", "text", "doc_id").collect()[0]
    assert (r.label, r.score_micro) == _ref(TRAIN, [TEST[3]])[13]


def test_tie_breaks_to_smallest_label(spark):
    # two perfectly symmetric classes -> identical scores; 'aa' wins
    train = [(1, "x y", "aa"), (2, "x y", "bb")]
    te = spark.createDataFrame([(9, "x y")], "doc_id int, text string")
    tr = spark.createDataFrame(train, "doc_id int, text string, lang string")
    r = naive_bayes_classify(tr, te, "lang", "text", "doc_id").collect()[0]
    assert r.label == "aa"


def test_layout_independent(spark):
    tr = spark.createDataFrame(TRAIN * 10, "doc_id int, text string, lang string")
    te = spark.createDataFrame(TEST, "doc_id int, text string")
    a = sorted(
        map(tuple, naive_bayes_classify(tr, te, "lang", "text", "doc_id").collect())
    )
    b = sorted(
        map(
            tuple,
            naive_bayes_classify(
                tr.repartition(11, "text"), te.repartition(3), "lang", "text", "doc_id"
            ).collect(),
        )
    )
    assert a == b


def test_null_text_rows_ignored(spark):
    tr = spark.createDataFrame(
        TRAIN + [(99, None, "fr")], "doc_id int, text string, lang string"
    )
    te = spark.createDataFrame(TEST, "doc_id int, text string")
    got = {
        r.id: (r.label, r.score_micro)
        for r in naive_bayes_classify(tr, te, "lang", "text", "doc_id").collect()
    }
    assert got == _ref(TRAIN, TEST)
