"""Substring-level dedup (operators/dedup.py duplicate_spans /
mask_duplicate_spans)."""

from __future__ import annotations

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import duplicate_spans, mask_duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_boilerplate_detected(spark):
    df = _docs(spark, [
        (1, "x1 x2 shared boiler plate text here x3"),
        (2, "y1 shared boiler plate text here y2 y3"),
        (3, "totally unrelated words only once ever"),
    ])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicate_spans(df, n=5).collect()
    }
    # "shared boiler plate text here" = one 5-gram in each doc
    assert got == {(1, 2, 6, 1), (2, 1, 5, 1)}


def test_overlapping_grams_merge_into_one_span(spark):
    df = _docs(spark, [
        (1, "a b c d e f tail1"),
        (2, "head a b c d e f"),
    ])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicate_spans(df, n=5).collect()
    }
    # grams "a b c d e" and "b c d e f" both duplicated -> merged span
    assert got == {(1, 0, 5, 2), (2, 1, 6, 2)}


def test_within_doc_repetition_counts(spark):
    df = _docs(spark, [(1, "p q r s t filler words go here p q r s t")])
    got = [(r.span_start, r.span_end) for r in duplicate_spans(df, n=5).collect()]
    assert sorted(got) == [(0, 4), (9, 13)]


def test_adjacent_spans_merge_separated_spans_dont(spark):
    # two dup grams at pos 0 and pos n (adjacent runs) merge; a gap > n separates
    df = _docs(spark, [
        (1, "a b c d e f g h i j zz yy xx ww vv k l m n o"),
        (2, "a b c d e f g h i j qq rr ss tt uu k l m n o"),
    ])
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, n=5).collect()
    }
    assert got == {(1, 0, 9), (1, 15, 19), (2, 0, 9), (2, 15, 19)}


def test_mask_removes_covered_tokens_only(spark):
    df = _docs(spark, [
        (1, "x1 x2 shared boiler plate text here x3"),
        (2, "y1 shared boiler plate text here y2 y3"),
        (3, "totally unrelated words only once ever"),
    ])
    got = {r.doc_id: r.text_dedup for r in mask_duplicate_spans(df, n=5).collect()}
    assert got[1] == "x1 x2 x3"
    assert got[2] == "y1 y2 y3"
    assert got[3] == "totally unrelated words only once ever"


def test_mask_fully_covered_doc_is_empty(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    got = {r.doc_id: r.text_dedup for r in mask_duplicate_spans(df, n=5).collect()}
    assert got == {1: "", 2: ""}
