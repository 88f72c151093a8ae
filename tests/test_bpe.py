"""BPE tokenizer (operators/bpe.py) vs an independent naive reference:
the incremental trainer must equal full-recount training, the
distributed encoder must equal the sequential greedy encoder, and
concatenating a word's subwords must reconstruct the word."""

from __future__ import annotations

from collections import Counter

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
    learn_merges,
    word_histogram,
)


def naive_learn(histogram, num_merges):
    """Textbook BPE: full pair recount every round (no index)."""
    words = {w: tuple(w) + (END,) for w, _ in histogram}
    freq = dict(histogram)
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += freq[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
]


def test_incremental_trainer_equals_naive():
    hist = Counter()
    for line in CORPUS:
        hist.update(line.split())
    hist = sorted(hist.items(), key=lambda t: (-t[1], t[0]))
    for n in (1, 5, 10, 40):
        assert learn_merges(list(hist), n) == naive_learn(list(hist), n)


def test_bpe_train_distributed_matches_local_and_is_layout_independent(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    hist = Counter()
    for line in CORPUS:
        hist.update(line.split())
    want = naive_learn(sorted(hist.items(), key=lambda t: (-t[1], t[0])), 12)
    assert bpe_train(df, num_merges=12) == want
    assert bpe_train(df.repartition(7), num_merges=12) == want


def test_histogram_cap_is_deterministic(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    a = sorted((r["word"], r["freq"]) for r in word_histogram(df, max_words=3).collect())
    b = sorted((r["word"], r["freq"]) for r in word_histogram(df.repartition(5), max_words=3).collect())
    assert a == b and len(a) == 3


def test_encode_matches_sequential_and_roundtrips(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = bpe_train(df, num_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
           for r in bpe_encode(df, merges).collect()}
    for i, line in enumerate(CORPUS):
        want = []
        for w in line.split():
            want.extend(encode_word(w, ranks))
        toks, n = out[i]
        assert toks == want
        assert n == len(want)
        # round trip: concatenation reconstructs the line's words
        rebuilt = "".join(toks).replace(END, " ").strip()
        assert rebuilt == " ".join(line.split())


def test_encode_compresses():
    """Merges genuinely shorten frequent words: 'newest' encodes to
    fewer symbols than characters once trained."""
    hist = [("newest", 50), ("widest", 30), ("low", 10)]
    merges = learn_merges(hist, 20)
    ranks = {p: i for i, p in enumerate(merges)}
    assert len(encode_word("newest", ranks)) < len("newest") + 1
    # unseen word still encodes (falls back toward characters)
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + END


def test_sql_oracle_parity_on_adversarial_corpus(spark, tmp_path):
    """The unrolled SQL twin (suite._bpe_oracle) must reproduce
    q_bpe_tokenize bit-for-bit on a corpus the testdata never
    exercises: repeat-run words (overlapping same-pair adjacency,
    where greedy left-to-right order matters), words that are
    prefixes of others, and single-char words."""
    import duckdb

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    docs = [
        (0, "aaaa aaa aa a"),
        (1, "abab ab a b aab abb"),
        (2, "banana bananas ban an ana nan"),
        (3, "xxxyyy xyxyxy xxx yyy"),
        (4, "aaaa abab banana banana aaaa"),
        (5, "mississippi missis sip pi ss ii"),
    ]
    sf_dir = str(tmp_path / "sf")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(sf_dir + "/documents.parquet")

    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["token_checksum"])
        for r in suite.QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        # Spark writes a directory of part files; DuckDB needs the glob
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = {
        d: (n, c) for d, n, c in con.execute(suite.ORACLE["bpe_tokenize"]).fetchall()
    }
    assert got == want
    assert all(n > 0 for n, _ in got.values())


def test_sql_oracle_parity_on_exotic_whitespace(spark, tmp_path):
    """ADVICE r8: the engines' \\s classes disagree (RE2 excludes VT;
    Python str.split() adds Unicode whitespace), so the whole BPE path
    splits on ONE explicit class (operators.bpe.WS). Pin the contract
    cross-engine: VT/FF are separators on both sides, NBSP and
    LINE SEPARATOR are word content on both sides."""
    import duckdb

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    docs = [
        (0, "alpha\x0bbeta gamma"),        # VT separates
        (1, "delta\x0cepsilon\tzeta"),     # FF + tab separate
        (2, "eta\xa0theta iota\xa0theta"), # NBSP is word content
        (3, "kappa lambda kappa"),    # U+2028 is word content
        (4, "  lead trail \r\n mu "),
        (5, "alpha beta eta\xa0theta"),
    ]
    sf_dir = str(tmp_path / "sf")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(sf_dir + "/documents.parquet")

    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["token_checksum"])
        for r in suite.QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = {
        d: (n, c) for d, n, c in con.execute(suite.ORACLE["bpe_tokenize"]).fetchall()
    }
    assert got == want
    # And the histogram itself treats NBSP-joined text as ONE word.
    words = {r["word"] for r in word_histogram(df).collect()}
    assert "eta\xa0theta" in words and "alpha" in words and "beta" in words
    assert "eta" not in words and "kappa lambda" in words


def test_merge_output_collision_raises():
    """ADVICE r8: the SQL twin's one-pass-per-rule equivalence needs
    every merge output to be a brand-new symbol string. A corpus over
    the marker charset can reconstruct an existing symbol via a second
    derivation — train must reject it loudly, not diverge silently.
    (Corpus found by brute-force search; the merge ('/w', '</w>')
    produces '/w</w>', already a symbol by then.)"""
    import pytest

    hist = sorted(
        {"/w": 16, "/w</w>": 20, "<///</": 16, "><": 18, "w<": 11}.items(),
        key=lambda t: (-t[1], t[0]),
    )
    with pytest.raises(ValueError, match="already"):
        learn_merges(hist, 15)
