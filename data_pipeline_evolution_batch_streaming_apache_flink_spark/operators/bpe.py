"""Byte-pair-encoding tokenizer over a documents table — the real-BPE
upgrade of the mandated "BPE-ish regex" token counting.

Factorized the way BPE training actually works (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): merges
are learned from the WORD FREQUENCY TABLE, not the raw corpus — so the
distributed part is one word histogram (explode → count, one shuffle,
map-side combine) capped to the top ``max_words`` types, and the merge
loop runs driver-side over that bounded table with an incremental
pair-count index (only words containing the merged pair are revisited).
At 100 TB the corpus never moves: the histogram is the only pass, and
its result is vocabulary-bounded (type count grows ~Heaps' law, and the
deterministic freq-desc/word-asc cap keeps the driver footprint fixed).

Encoding is Arrow-batched ``mapInPandas`` with per-batch word-level
memoization (corpora repeat words — each distinct word is encoded once
per batch), the merge table shipped in the task closure. Exactness is
pinned two ways: unit tests against an independent sequential reference
implementation (tests/test_bpe.py), and — since r8 — a full unrolled
SQL hash twin (``plans.suite._bpe_oracle``: every merge-learning round
and the rank-ordered encode replayed in DuckDB, with the
one-replace-pass-per-rule equivalence argument in its docstring).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import fan_out

#: End-of-word marker appended as a final symbol so merges can learn
#: word-final units ("ing</w>") distinct from word-internal ones.
END = "</w>"

#: The ONE whitespace definition for the whole BPE path (ADVICE r8).
#: An explicit ASCII class — space, tab, LF, VT, FF, CR — used
#: verbatim by the Spark histogram split (Java regex), the Arrow
#: encoder (Python re), and the DuckDB oracle twin (RE2), because the
#: engines' ``\s`` classes disagree at the edges: RE2 ``\s`` excludes
#: VT, Python ``str.split()`` additionally splits on Unicode
#: whitespace (NBSP, U+2028, ...). With this class, VT is a separator
#: everywhere and Unicode whitespace is word content everywhere.
WS = " \t\n\x0b\x0c\r"
WS_PATTERN = "[" + WS + "]+"  # literal chars in a class: same meaning in Java/RE2/re
_WS_SPLIT = re.compile(WS_PATTERN)


def word_histogram(df: DataFrame, text_col: str = "text", max_words: int | None = None) -> DataFrame:
    """Word frequency table (one counted shuffle). ``max_words`` caps to
    the most frequent types, freq-desc / word-asc deterministic.
    Words are split on the explicit ``WS`` class (empties filtered), so
    the histogram agrees byte-for-byte with the encoder and the SQL
    twin on any corpus."""
    counts = (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(F.split(F.col(text_col), WS_PATTERN)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if max_words is not None:
        counts = counts.orderBy(F.col("freq").desc(), F.col("word")).limit(max_words)
    return counts


def learn_merges(histogram: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table (pure
    Python, vocabulary-bounded). Ties on pair frequency break
    lexicographically so the merge list is fully deterministic.

    Incremental: pair counts and a pair→words index are maintained
    across merges, so each round touches only the words containing the
    merged pair — not the whole vocabulary."""
    words: dict[str, tuple[str, ...]] = {w: tuple(w) + (END,) for w, _ in histogram}
    freq = dict(histogram)
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    # Every symbol string ever in play (alphabet + END + merge outputs).
    # The SQL twin's one-replace-pass-per-rule equivalence argument
    # (plans/suite._bpe_oracle) requires each merge's OUTPUT string to
    # be a brand-new symbol — two rules producing the same string via
    # different derivations would let the rank-ordered Python encoder
    # and the sequential SQL replay diverge, so that corpus is rejected
    # loudly at train time (ADVICE r8).
    symbols: set[str] = {END}
    for w, syms in words.items():
        f = freq[w]
        symbols.update(syms)
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(w)

    def resegment(w: str, old: tuple[str, ...], new: tuple[str, ...]) -> None:
        f = freq[w]
        for p in zip(old, old[1:]):
            pair_counts[p] -= f
            if pair_counts[p] <= 0:
                del pair_counts[p]
            pair_words[p].discard(w)
        for p in zip(new, new[1:]):
            pair_counts[p] += f
            pair_words[p].add(w)
        words[w] = new

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merged = best[0] + best[1]
        if merged in symbols:
            raise ValueError(
                f"BPE merge {best!r} produces {merged!r}, a string already "
                "in the symbol table: the merge list would be ambiguous "
                "(two derivations of one token) and the SQL oracle's "
                "sequential replay could diverge from the rank-ordered "
                "encoder. Reduce num_merges or pre-filter the corpus."
            )
        symbols.add(merged)
        merges.append(best)
        for w in list(pair_words.get(best, ())):
            old = words[w]
            out: list[str] = []
            i = 0
            while i < len(old):
                if i + 1 < len(old) and (old[i], old[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(old[i])
                    i += 1
            resegment(w, old, tuple(out))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int | None = 50_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus: distributed word
    histogram (the only corpus pass) + driver-side merge loop over the
    bounded table."""
    hist = [
        (r["word"], r["freq"])
        for r in word_histogram(df, text_col, max_words).collect()
    ]
    hist.sort(key=lambda t: (-t[1], t[0]))  # layout-independent order
    return learn_merges(hist, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the canonical BPE
    encoder): repeatedly merge the best-ranked adjacent pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: Arrow-batched
    ``mapInPandas``, word-level memoization per batch (each distinct
    word in a batch is encoded once). Output: ``id_col``, ``out_col``
    (array of subword strings, word-final units carry ``</w>``) and
    ``n_bpe_tokens``."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = f"{id_col} long, {out_col} array<string>, n_bpe_tokens long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_text(text: str) -> list[str]:
            out: list[str] = []
            for w in _WS_SPLIT.split(text or ""):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc_text)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: toks,
                    "n_bpe_tokens": toks.map(len).astype("int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
