"""Winnowing fingerprints (operators/dedup.py winnow_*): the MOSS
local-fingerprint selection vs a sequential reference, the coverage
guarantee, short-document edges, and the max_df quadratic guard."""

from __future__ import annotations

import hashlib
import itertools

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 5, 4


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_fps(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Sequential robust winnowing: min of each window, rightmost ties."""
    if len(text) < k:
        return set()
    grams = [(_h(text[p - 1:p - 1 + k]), p) for p in range(1, len(text) - k + 2)]
    sels = set()
    for s in range(1, max(len(grams) - w + 1, 1) + 1):
        best = None
        for x in grams[s - 1:s - 1 + w]:
            if best is None or x[0] < best[0] or (x[0] == best[0] and x[1] > best[1]):
                best = x
        sels.add(best)
    return {(p, h) for h, p in sels}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "abc"),                # shorter than k -> no fingerprints
    (3, "abcde"),              # exactly one gram -> one truncated window
    (4, "aaaaaaaaaaaa"),       # identical hashes -> rightmost-tie rule
    (5, "the quick brown fox leaps over the lazy dog"),
]


def test_fingerprints_match_sequential_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=K, window=W).collect():
        got.setdefault(r.id, set()).add((r.pos, r.fp))
    for i, t in DOCS:
        assert got.get(i, set()) == _ref_fps(t), f"doc {i}"


def test_shared_substring_guarantees_shared_fingerprint(spark):
    # the winnowing guarantee: a common substring of length k+w-1 must
    # surface at least one common fingerprint, wherever it sits
    boiler = "SHARED-BOILERPLATE-SEGMENT"  # len 26 >= K+W-1
    docs = [(1, "x" * 40 + boiler + "y" * 40), (2, boiler + "z" * 70)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(df, "doc_id", "text", k=K, window=W).collect():
        fps[r.id].add(r.fp)
    assert fps[1] & fps[2]


def test_pairs_match_reference_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        (r.id_a, r.id_b): (r.shared_fps, r.fp_a, r.fp_b, r.overlap_micro)
        for r in winnow_pairs(df, "doc_id", "text", k=K, window=W, min_shared=1).collect()
    }
    fp_sets = {i: {h for _, h in _ref_fps(t)} for i, t in DOCS}
    exp = {}
    for a, b in itertools.combinations(sorted(fp_sets), 2):
        sh = len(fp_sets[a] & fp_sets[b])
        if sh >= 1:
            na, nb = len(fp_sets[a]), len(fp_sets[b])
            exp[(a, b)] = (sh, na, nb, sh * 1000000 // min(na, nb))
    assert got == exp


def test_max_df_drops_boilerplate_fingerprints(spark):
    # one fingerprint shared by ALL docs: max_df below the corpus size
    # removes it and with it every pair
    docs = [(i, f"{'pad%d' % i * 3}COMMON-CHUNK-ALL-DOCS") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    assert winnow_pairs(df, "doc_id", "text", k=K, window=W, min_shared=1).count() > 0
    only_rare = winnow_pairs(
        df, "doc_id", "text", k=K, window=W, min_shared=1, max_df=2
    )
    # shared chunk hits all 6 docs -> dropped; pads are unique -> no pairs
    assert only_rare.count() == 0


def test_layout_independent(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    a = sorted(
        map(tuple, winnow_fingerprints(df, "doc_id", "text", k=K, window=W).collect())
    )
    b = sorted(
        map(
            tuple,
            winnow_fingerprints(
                df.repartition(7, "text"), "doc_id", "text", k=K, window=W
            ).collect(),
        )
    )
    assert a == b


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_pairs(df, "doc_id", "text", min_shared=0)
