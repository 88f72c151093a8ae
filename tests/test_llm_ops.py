"""Tests for the training-data-pipeline operators: dedup, similarity
search, text analysis, multimodal plumbing (build plan v6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import dedup as D
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import similarity as S
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import (
    attach_binary_payload,
    extract_image_features,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import analyze_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup(spark):
    df = spark.createDataFrame([(1, "a", 10), (2, "a", 10), (3, "b", 20)], "id int, txt string, x int")
    rows = D.exact_dedup(df, "txt", tiebreak="id").orderBy("txt").collect()
    assert [(r["txt"], r["id"]) for r in rows] == [("a", 1), ("b", 3)]


def test_minhash_matches_exact_jaccard(docs):
    """LSH(verified) must find the same >=0.7 pairs as the exact
    inverted-index jaccard on this corpus (recall ~1 by band design)."""
    exact = {(r["id_a"], r["id_b"]) for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", 5, 0.7).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs, "doc_id", "text", 5, 0.7).collect()}
    assert lsh == exact
    assert len(exact) > 0  # corpus contains seeded near-dups


def test_embedding_cosine_pairs(emb):
    pairs = D.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4).collect()
    assert all(r["cos"] >= 0.4 and r["id_a"] < r["id_b"] for r in pairs)
    assert len(pairs) > 0


def test_cosine_topk_self_neighbor(emb):
    """With include_self=True every query's rank-1 neighbor is itself (cos=1)."""
    q = emb.filter(F.col("vec_id") < 3)
    top = S.cosine_topk(q, emb, "vec_id", "vec_id", k=3, include_self=True).collect()
    r1 = {r["vec_id_q"]: (r["vec_id_c"], r["cos"]) for r in top if r["rank"] == 1}
    assert r1 == {0: (0, 1.0), 1: (1, 1.0), 2: (2, 1.0)}


def test_ivf_recall_vs_bruteforce(emb):
    """IVF with generous probes recovers most exact neighbors."""
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["vec_id_q"], r["vec_id_c"]) for r in S.cosine_topk(q, emb, "vec_id", "vec_id", k=3).collect()}
    approx = {(r["vec_id_q"], r["vec_id_c"])
              for r in S.ivf_cosine_topk(q, emb, "vec_id", "vec_id", k=3, n_cells=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_pq_recall_and_exact_rerank(emb):
    """PQ-ADC shortlist + exact re-rank: high recall vs brute force, and
    every reported score must equal the exact cosine (approximation may
    only affect WHICH rows surface, never their values)."""
    q = emb.filter(F.col("vec_id") < 20)
    exact_rows = S.cosine_topk(q, emb, "vec_id", "vec_id", k=3).collect()
    pq_rows = S.pq_cosine_topk(
        q, emb, "vec_id", "vec_id", k=3, m=16, n_centroids=32, refine=8
    ).collect()
    exact = {(r["vec_id_q"], r["vec_id_c"]) for r in exact_rows}
    approx = {(r["vec_id_q"], r["vec_id_c"]) for r in pq_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall too low: {recall}"
    exact_cos = {(r["vec_id_q"], r["vec_id_c"]): r["cos"] for r in exact_rows}
    for r in pq_rows:
        key = (r["vec_id_q"], r["vec_id_c"])
        if key in exact_cos:
            assert r["cos"] == exact_cos[key]


def test_pq_codes_are_m_bytes(emb):
    books = S.pq_fit_codebooks(emb, m=8, n_centroids=16)
    assert books.shape == (8, 16, 8)  # 64-dim vectors -> 8 subspaces of 8
    codes = S.pq_encode(emb, books, "vec_id").collect()
    assert len(codes) == emb.count()
    assert all(len(bytes(r["code"])) == 8 for r in codes)  # 8 bytes vs 256


def test_bucketed_cosine_recall(emb):
    exact = {(r["id_a"], r["id_b"]) for r in D.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.45).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in S.bucketed_cosine_pairs(emb, "vec_id", "embedding", 0.45, n_planes=6, n_tables=12).collect()}
    assert lsh <= exact  # verification step: no false positives
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.7


def test_bucketed_cosine_recall_one_config(emb):
    """The suite's similarity_lsh_pairs entry claims recall 1.0 at
    (3 planes, 16 tables) so the exact-pairs oracle applies — pin it."""
    exact = {(r["id_a"], r["id_b"]) for r in D.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.45).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in S.bucketed_cosine_pairs(emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16).collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_bucketed_cosine_persisted_buckets_parity(emb, tmp_path):
    """A bucket table persisted via lsh_hash_buckets and passed back as
    ``hashed=`` must reproduce the fresh run bit-for-bit (the suite's
    per-(process, sf) bucket memo relies on this)."""
    fresh = {(r["id_a"], r["id_b"], r["cos"])
             for r in S.bucketed_cosine_pairs(emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16).collect()}
    p = str(tmp_path / "buckets")
    S.lsh_hash_buckets(emb, "vec_id", "embedding", n_planes=3, n_tables=16).write.parquet(p)
    stored = emb.sparkSession.read.parquet(p)
    memo = {(r["id_a"], r["id_b"], r["cos"])
            for r in S.bucketed_cosine_pairs(emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16, hashed=stored).collect()}
    assert memo == fresh
    assert len(fresh) > 0
    # and the dense-regime per-bucket matmul verification is bit-identical
    # to the id-only pair expansion path (same left-fold scoring)
    dense = {(r["id_a"], r["id_b"], r["cos"])
             for r in S.bucketed_cosine_pairs(emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16, hashed=stored, verify="bucket").collect()}
    assert dense == fresh


def test_bucket_verify_grid_split_parity(emb, monkeypatch):
    """VERDICT r12 #5: the hot-bucket grid split of the dense verify
    path must be digest-identical to the unsplit path at ANY parts
    value — uniform int, parts exceeding bucket sizes, and the
    per-bucket auto sizing (forced on by shrinking the target)."""
    base = {(r["id_a"], r["id_b"], r["cos"])
            for r in S.bucketed_cosine_pairs(
                emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16,
                verify="bucket").collect()}
    assert len(base) > 0
    for parts in (3, 64):
        split = {(r["id_a"], r["id_b"], r["cos"])
                 for r in S.bucketed_cosine_pairs(
                     emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16,
                     verify="bucket", bucket_parts=parts).collect()}
        assert split == base, f"grid split diverges at parts={parts}"
    # auto (None): force every bucket hot so the window sizing engages
    monkeypatch.setattr(S, "_LSH_TARGET_BUCKET_ROWS", 2)
    auto = {(r["id_a"], r["id_b"], r["cos"])
            for r in S.bucketed_cosine_pairs(
                emb, "vec_id", "embedding", 0.45, n_planes=3, n_tables=16,
                verify="bucket", bucket_parts=None).collect()}
    assert auto == base
    import pytest

    with pytest.raises(ValueError, match="bucket_parts"):
        S.bucketed_cosine_pairs(
            emb, "vec_id", "embedding", 0.45, verify="bucket", bucket_parts=0)


def test_bucketed_cosine_zero_norm_pairs_dropped(spark):
    """Zero-norm contract (ADVICE r6): cosine with a zero vector is
    undefined and the pair is dropped — deterministically, not as a
    side effect of NaN-ordering differences between engines."""
    rows = [
        (1, [0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = S.bucketed_cosine_pairs(df, "vec_id", "embedding", threshold=0.0, n_planes=1, n_tables=8).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs == {(3, 4)}  # the zero-zero and zero-nonzero pairs drop
    assert all(r["cos"] == 1.0 for r in got)


def test_lsh_hash_buckets_null_vectors_dropped(spark):
    """NULL-vector contract (ADVICE r8): NULL embeddings drop from the
    index; a NULL in the FIRST row must not poison the plane dimension
    (size(NULL) = -1 previously built an empty plane matrix that hashed
    every row to bucket 0) and must not crash the np.stack stage."""
    rows = [
        (1, None),
        (2, [1.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),
        (4, [-1.0, 0.5, 0.2]),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    idx = S.lsh_hash_buckets(df, "vec_id", "embedding", n_planes=4, n_tables=2)
    got = idx.collect()
    assert {r["__id"] for r in got} == {2, 3, 4}
    # identical vectors share every bucket; planes are real (not all
    # rows collapsed to bucket 0)
    b2 = sorted((r["tbl"], r["bucket"]) for r in got if r["__id"] == 2)
    b3 = sorted((r["tbl"], r["bucket"]) for r in got if r["__id"] == 3)
    assert b2 == b3
    assert len({r["bucket"] for r in got}) > 1
    # the pair path composes: NULL rows simply never pair
    pairs = {(r["id_a"], r["id_b"])
             for r in S.bucketed_cosine_pairs(df, "vec_id", "embedding", 0.9,
                                              n_planes=2, n_tables=8).collect()}
    assert pairs == {(2, 3)}


def test_ivfpq_recall_one_config_matches_exact(emb):
    """IVF-PQ at probe-all + shortlist-covers-corpus reproduces exact
    brute-force top-k (the suite-oracle gate config), and an approximate
    config still recovers most of the true neighbors."""
    q = emb.filter("vec_id < 20")
    exact = {(r["vec_id_q"], r["vec_id_c"]) for r in S.cosine_topk(q, emb, "vec_id", "vec_id", k=5).collect()}
    full = {
        (r["vec_id_q"], r["vec_id_c"])
        for r in S.ivf_pq_topk(
            q, emb, "vec_id", "vec_id", k=5, n_cells=8, n_probe=8, m=16, n_centroids=32, refine=100
        ).collect()
    }
    assert full == exact
    approx = {
        (r["vec_id_q"], r["vec_id_c"])
        for r in S.ivf_pq_topk(
            q, emb, "vec_id", "vec_id", k=5, n_cells=8, n_probe=4, m=16, n_centroids=32, refine=8
        ).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.6


def test_simhash_pairs(docs):
    pairs = D.simhash_pairs(docs, "doc_id", "text", nbits=32, max_hamming=3, bands=4).collect()
    assert all(r["id_a"] < r["id_b"] and r["hamming"] <= 3 for r in pairs)
    # seeded near-dups should collide in simhash space too
    assert len(pairs) > 0


def test_dedup_lines_boilerplate_removal(spark):
    """Repeated lines keep only their first (doc, position) occurrence;
    in-doc repeats collapse too; line order is preserved; a doc made
    entirely of already-seen lines comes back empty."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "unique one\nshared footer\nunique one"),
            (2, "unique two\nshared footer"),
            (3, "shared footer"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, "doc_id", "text").collect()}
    assert out[1] == "unique one\nshared footer"  # in-doc repeat dropped
    assert out[2] == "unique two"                 # footer already seen in doc 1
    assert out[3] == ""                           # nothing new


def test_dedup_lines_literal_separator(spark):
    """A regex-metacharacter separator ('|') must behave as a literal:
    split and reassembly agree, no per-character explosion."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "alpha|shared|beta"), (2, "shared|gamma")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, "doc_id", "text", sep="|").collect()}
    assert out[1] == "alpha|shared|beta"
    assert out[2] == "gamma"


def test_sample_frames_audio_only_avi_raises(spark):
    """An AVI with no video chunks must error, not silently vanish from
    the output."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import sample_frames

    movi_body = b"movi" + b"00wb" + (4).to_bytes(4, "little") + b"AUDI"
    movi = b"LIST" + len(movi_body).to_bytes(4, "little") + movi_body
    riff_body = b"AVI " + movi
    avi = b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body
    df = spark.createDataFrame([(1, avi)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="no video stream chunks"):
        sample_frames(df, every_n=1).collect()


def test_contamination_and_decontaminate(spark):
    """A train doc containing a benchmark sentence verbatim is flagged
    (and dropped); clean docs survive untouched."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over the lazy dog end"),
            (2, "completely unrelated content about query engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = D.contamination_pairs(train, bench, "doc_id", "doc_id", n=3, min_shared=3).collect()
    assert {(r["doc_id_train"], r["doc_id_bench"]) for r in pairs} == {(1, 100)}
    kept = D.decontaminate(train, bench, "doc_id", "doc_id", n=3, min_shared=3).collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_repetition_stats_flags_degenerate_text(spark):
    """A looping document scores near-1 duplicate-ngram fractions and a
    dominant top-token share; varied text scores near zero."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "eight totally different words appear exactly once here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["dup_2gram_frac"] > 0.8 and out[1]["top_token_frac"] == 1.0
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["top_token_frac"] == 0.125


def test_bm25_scores_ranking(spark):
    """Higher tf in a shorter doc must outscore a single mention diluted
    in a long doc; docs with no query term are absent."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark " + "filler " * 50),
            (3, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["spark"], "doc_id", "text").collect()}
    assert set(rows) == {1, 2}
    assert rows[1] > rows[2] > 0


def test_analyze_documents(docs):
    out = analyze_documents(docs).collect()
    assert len(out) == docs.count()
    r = out[0]
    assert r["n_tokens"] > 0 and 0.0 <= r["quality"] <= 1.0
    assert 0 <= r["fingerprint"] < 2147483647
    assert r["lang_pred"] in {"en", "es", "fr", "de", "zh", "und"}


def test_multimodal_pipeline(docs):
    with_bin = attach_binary_payload(docs.limit(50), "text", mime="image/fake")
    feats = extract_image_features(with_bin, id_cols=("doc_id",)).collect()
    assert len(feats) == 50
    assert all(f["width"] >= 64 and f["height"] >= 64 and f["n_bytes"] > 0 for f in feats)


def test_multimodal_resize(docs):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import attach_binary_payload, resize_images

    resized = resize_images(attach_binary_payload(docs, "text"), 8, 4)
    rows = resized.collect()
    assert len(rows) == docs.count()
    assert all(len(bytes(r["payload"])) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)


def test_multimodal_frame_sampling(docs):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import attach_binary_payload, sample_frames

    frames = sample_frames(attach_binary_payload(docs, "text"), every_n=2, frame_size=16)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame"}
    # every doc emits at least one frame; indices step by every_n
    assert set(pdf["doc_id"]) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all(i % 2 == 0 for i in pdf["frame_idx"])


def _tiny_avi(frames: list[bytes]) -> bytes:
    """Minimal RIFF/AVI container: a LIST movi holding one 00db chunk per
    frame (word-aligned) — enough structure for any AVI demuxer."""
    movi_body = b"movi"
    for f in frames:
        movi_body += b"00db" + len(f).to_bytes(4, "little") + f + (b"\0" if len(f) & 1 else b"")
    movi = b"LIST" + len(movi_body).to_bytes(4, "little") + movi_body
    riff_body = b"AVI " + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def test_video_avi_real_frames(spark):
    """An actual AVI payload demuxes to its stored frames (pure Python,
    no codec), sampled every_n apart — not byte chunks."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import sample_frames

    stored = [bytes([i]) * (10 + i) for i in range(7)]
    df = spark.createDataFrame([(1, _tiny_avi(stored))], "doc_id long, payload binary")
    rows = sample_frames(df, every_n=3).orderBy("frame_idx").collect()
    assert [(r["frame_idx"], bytes(r["frame"])) for r in rows] == [
        (0, stored[0]), (3, stored[3]), (6, stored[6])
    ]


def test_video_container_without_codec_raises(spark):
    """A recognized non-AVI video container must error without PyAV, not
    silently emit byte-chunk garbage (with PyAV it errors on the truncated
    stream instead — either way no silent stand-in)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import sample_frames

    mp4ish = b"\x00\x00\x00\x18ftypisom" + b"\0" * 64
    df = spark.createDataFrame([(1, mp4ish)], "doc_id long, payload binary")
    with pytest.raises(Exception):
        sample_frames(df, every_n=1).collect()


def test_video_pyav_real_decode(spark):
    """With PyAV installed, a real encoded video decodes to RGB24 frames."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import sample_frames

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=24)
        stream.width, stream.height = 32, 16
        stream.pix_fmt = "yuv420p"
        for i in range(6):
            arr = np.full((16, 32, 3), i * 40, dtype=np.uint8)
            for packet in stream.encode(av.VideoFrame.from_ndarray(arr, format="rgb24")):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    df = spark.createDataFrame([(1, buf.getvalue())], "doc_id long, payload binary")
    rows = sample_frames(df, every_n=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(len(bytes(r["frame"])) == 32 * 16 * 3 for r in rows)


def test_multimodal_real_decoder_stubbed(docs):
    with_bin = attach_binary_payload(docs.limit(1), "text", mime="image/png")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        extract_image_features(with_bin, id_cols=("doc_id",)).collect()


def test_connected_components_chain_and_clusters(spark):
    """A path graph (1-2-3-4-5) needs multi-round label propagation; a
    separate triangle (10,11,12) and an isolated pair (20,21) must get
    their own components, labeled by their smallest member."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import connected_components, dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a int, id_b int",
    )
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    clusters = {r.component: r.n_members for r in dedup_clusters(pairs).collect()}
    assert clusters == {1: 5, 10: 3, 20: 2}


def test_connected_components_frees_per_round_checkpoints(spark):
    """VERDICT r12 #2: each propagation round unpersists the PRIOR
    round's label checkpoint once the new one materializes — storage
    must not grow by one (node, comp) frame per round (the leak class
    fixed in kcenter/graph in r11-r12). A 14-node path graph forces ~13
    rounds; allow the returned labels frame plus one transient on top
    of whatever was persisted before the call."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 14)], "id_a int, id_b int"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comp == {i: 1 for i in range(1, 15)}
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 2, (
        f"connected_components leaked {after - before} persistent RDDs"
    )


def test_near_dedup_drops_only_non_canonical(spark, sf_dir):
    """near_dedup must remove exactly the non-canonical members of each
    near-dup cluster: kept = total - (members - clusters)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        near_dedup,
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    total = docs.count()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comp = connected_components(pairs)
    n_members = comp.count()
    n_clusters = comp.select("comp").distinct().count()

    kept = near_dedup(docs, "doc_id", "text", n=3, threshold=0.5)
    assert kept.count() == total - (n_members - n_clusters)
    # canonical ids all survive
    canon = {r.comp for r in comp.select("comp").distinct().collect()}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert canon <= kept_ids


def test_multimodal_audio_features(spark, sf_dir):
    """Audio leg of the multimodal plumbing: binary payload + typed
    metadata -> Arrow-batched probe with an audio-shaped schema; real
    codecs stay stubbed behind NotImplementedError."""
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import (
        attach_binary_payload,
        extract_audio_features,
        real_audio_decode,
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").limit(20)
    with_payload = attach_binary_payload(docs, "text", mime="audio/fake")
    out = extract_audio_features(with_payload)
    rows = out.collect()
    assert len(rows) == 20
    assert set(out.columns) == {"doc_id", "duration_ms", "sample_rate", "n_channels", "n_bytes"}
    for r in rows:
        assert r.sample_rate in (8000, 16000, 44100, 48000)
        assert 1 <= r.n_channels <= 2
        assert r.duration_ms >= 1000

    with _pytest.raises(NotImplementedError):
        real_audio_decode(b"riff")


def test_ngram_prefix_filter_exactness(spark, sf_dir):
    """AllPairs/ppjoin-style prefix filtering must return EXACTLY the
    same pairs as the full inverted index, at several thresholds."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import ngram_jaccard_pairs
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    for t, n in ((0.3, 3), (0.5, 3), (0.7, 5)):
        base = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=n, threshold=t).collect()
        }
        pfx = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", n=n, threshold=t, prefix_filter=True
            ).collect()
        }
        assert base == pfx, f"t={t} n={n}"


def _tiny_png(width=3, height=2):
    """A real, spec-valid PNG built with stdlib only (zlib + crc32)."""
    import struct
    import zlib
    from binascii import crc32

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc32(tag + data))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_wav(n_frames=1600, rate=16000, channels=2):
    """A real WAV built with the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x01\x02" * channels * n_frames)
    return buf.getvalue()


def test_real_codecs_decode_real_media(spark):
    """VERDICT r1 item 7: the registry decodes REAL media — PNG dims via
    header parse (PIL when installed), WAV via stdlib wave — through the
    same Spark mapInPandas path as the fakes."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    png = _tiny_png(3, 2)
    img_df = spark.createDataFrame([(1, png)], "doc_id int, payload binary").withColumn(
        "media_meta", F.struct(F.lit("image/png").alias("mime"))
    )
    row = extract_image_features(img_df).collect()[0]
    assert (row["width"], row["height"], row["n_bytes"]) == (3, 2, len(png))

    wav = _tiny_wav(n_frames=1600, rate=16000, channels=2)
    aud_df = spark.createDataFrame([(1, wav)], "doc_id int, payload binary").withColumn(
        "media_meta", F.struct(F.lit("audio/wav").alias("mime"))
    )
    arow = extract_audio_features(aud_df).collect()[0]
    assert (arow["duration_ms"], arow["sample_rate"], arow["n_channels"]) == (100, 16000, 2)


def test_jpeg_header_parse():
    """Pure-Python SOF scan finds dimensions in a marker-valid JPEG."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import _jpeg_dims, real_image_decode

    # SOI + APP0(len 4) + SOF0: len=17, precision 8, h=480, w=640, 3 comps
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04\x4a\x46"
        + b"\xff\xc0\x00\x11\x08" + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    assert _jpeg_dims(jpeg) == (640, 480)
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        assert real_image_decode(jpeg)["width"] == 640


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None, reason="PIL not installed"
)
def test_pil_decode_when_available():
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import real_image_decode

    assert real_image_decode(_tiny_png(5, 4))["width"] == 5


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None, reason="PIL not installed"
)
def test_pil_real_resize_when_available(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import real_image_decode, resize_images

    df = spark.createDataFrame([(1, _tiny_png(6, 4))], "doc_id int, payload binary")
    row = resize_images(df, 3, 2).collect()[0]
    meta = real_image_decode(bytes(row["payload"]))
    assert (meta["width"], meta["height"]) == (3, 2)


def test_containment_finds_truncated_twin(spark):
    """A prefix-truncated copy is fully contained in its original
    (C = 1.0, directed sub -> super), while symmetric Jaccard at the
    same threshold misses it."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    long_words = [f"w{i}" for i in range(200)]
    rows = [
        (1, " ".join(long_words)),
        (2, " ".join(long_words[:20])),   # prefix twin: contained, tiny Jaccard
        (3, " ".join(f"x{i}" for i in range(50))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    }
    assert got == {(2, 1): 1.0}
    assert ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).count() == 0


def test_containment_matches_brute_force(spark):
    """Directed scores equal the set-arithmetic definition on a random
    small corpus (every pair, both directions, no threshold loss)."""
    import random

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import ngram_containment_pairs

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))) for i in range(25)]
    n = 2

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}

    want = {}
    for i, ti in rows:
        for j, tj in rows:
            if i == j:
                continue
            si, sj = shingles(ti), shingles(tj)
            c = round(len(si & sj) / len(si), 6)
            if c >= 0.5:
                want[(i, j)] = c

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in ngram_containment_pairs(df, "doc_id", "text", n=n, threshold=0.5).collect()
    }
    assert got == want


def test_containment_min_size_guard(spark):
    """min_size drops sub-threshold docs from BOTH roles (a one-shingle
    doc is contained everywhere — noise, and the guard's whole point)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import ngram_containment_pairs

    rows = [(1, "a b"), (2, "a b c d e f g h")]  # doc 1 has one 2-shingle
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert ngram_containment_pairs(df, "doc_id", "text", n=2, threshold=0.9).count() == 1
    assert (
        ngram_containment_pairs(df, "doc_id", "text", n=2, threshold=0.9, min_size=2).count() == 0
    )


# ---------------------------------------------------------------------------
# rake_keywords (operators/textops.py)
# ---------------------------------------------------------------------------

def test_rake_scores_hand_computed(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import rake_keywords

    # Classic RAKE toy: phrases "red apple pie", "red apple", "pie".
    # freq: red=2 apple=2 pie=2; deg: red=5 apple=5 pie=4
    # scores: red=apple=2.5, pie=2.0
    # => "red apple pie" = 7.0, "red apple" = 5.0, "pie" = 2.0
    df = spark.createDataFrame(
        [(1, "red apple pie and the red apple, of pie")], "doc_id int, text string"
    )
    rows = {r.keyword: r for r in rake_keywords(df, top_k=5).collect()}
    assert rows["red apple pie"].score_micro == 7_000_000
    assert rows["red apple"].score_micro == 5_000_000
    assert rows["pie"].score_micro == 2_000_000
    assert rows["red apple pie"].n_words == 3
    assert rows["pie"].occurrences == 1


def test_rake_top_k_ordering_ties_and_duplicates(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import rake_keywords

    # "x y" twice and "z w" once; all words freq=deg-balanced so the
    # duplicate phrase collapses with occurrences=2
    df = spark.createDataFrame(
        [(1, "x y and x y and z w")], "doc_id int, text string"
    )
    out = rake_keywords(df, top_k=2).collect()
    kws = {r.keyword: r.occurrences for r in out}
    assert kws == {"x y": 2, "z w": 1}

    # punctuation delimits phrases; empty docs yield nothing
    df2 = spark.createDataFrame([(1, "alpha, beta"), (2, "the of and")],
                                "doc_id int, text string")
    got = rake_keywords(df2, top_k=3).collect()
    assert {r.keyword for r in got} == {"alpha", "beta"}
    assert all(r.doc_id == 1 for r in got)


def test_rake_stopwords_with_regex_metacharacters(spark):
    # ADVICE r4: caller stopwords are data, not regex. 'c++' must not
    # corrupt the alternation ('c' followed by greedy +), and a dotted
    # stopword must not over-match ('u.s' must not delimit on 'uks').
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import rake_keywords

    df = spark.createDataFrame(
        [(1, "fast code in c++ kernels"), (2, "uks market report")],
        "doc_id int, text string",
    )
    out = rake_keywords(
        df, top_k=5, stopwords=("in", "c++", "u.s")
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.keyword)
    # 'c++' delimits doc 1 (the '+' chars also split as punctuation);
    # the important part: no regex error and 'in' still delimits
    assert "fast code" in by_doc[1]
    # 'u.s' treated literally: 'uks' is NOT split into 'uk'/'s'
    assert by_doc[2] == {"uks market report"}

    import pytest as _pt
    with _pt.raises(ValueError, match=r"\\E"):
        rake_keywords(df, stopwords=("ok", "bad\\Estop"))


def test_rake_max_words_filter_and_layout(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import rake_keywords

    long_run = " ".join(f"w{i}" for i in range(9))
    df = spark.createDataFrame(
        [(i, f"{long_run} and short phrase here") for i in range(20)],
        "doc_id int, text string",
    )
    out = rake_keywords(df, top_k=3, max_words=8).collect()
    # the 9-word run is dropped entirely; the 3-word phrase survives
    assert {r.keyword for r in out} == {"short phrase here"}
    a = sorted((r.doc_id, r.keyword, r.score_micro) for r in out)
    b = sorted(
        (r.doc_id, r.keyword, r.score_micro)
        for r in rake_keywords(df.repartition(7), top_k=3, max_words=8).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# lsh_write_index / lsh_probe_pairs (operators/dedup.py)
# ---------------------------------------------------------------------------

def _lsh_corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(0, 40, 2):   # corpus: even ids
        rows.append((i, f"{base} corpusdoc{i} filler{i} more{i} text{i} here{i}"))
    # 21 near-duplicates corpus doc 20's text with one token changed
    rows.append((20, f"{base} shared shared shared shared tail tail tail"))
    rows = [r for r in rows if r[0] != 20] + [(20, f"{base} shared shared shared shared tail tail tail")]
    new = [(21, f"{base} shared shared shared shared tail tail CHANGED"),
           (23, "totally different content nothing matches at all here folks")]
    return (spark.createDataFrame(rows, "doc_id bigint, text string"),
            spark.createDataFrame(new, "doc_id bigint, text string"))


def test_lsh_index_probe_matches_inmemory_cross_pairs(spark, tmp_path):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        lsh_probe_pairs, lsh_write_index, minhash_lsh_pairs,
    )

    corpus, new = _lsh_corpus(spark)
    path = str(tmp_path / "lshidx")
    lsh_write_index(corpus, path, "doc_id", "text", n=3)
    got = {(r.query_id, r.corpus_id, r.jaccard)
           for r in lsh_probe_pairs(new, path, "doc_id", "text",
                                    threshold=0.3, n=3).collect()}
    # in-memory operator over the union, restricted to cross pairs
    allpairs = minhash_lsh_pairs(corpus.unionByName(new), "doc_id", "text",
                                 n=3, threshold=0.3).collect()
    want = set()
    for r in allpairs:
        a_new, b_new = r.id_a % 2 == 1, r.id_b % 2 == 1
        if a_new != b_new:  # one side new, one side corpus
            q, c = (r.id_a, r.id_b) if a_new else (r.id_b, r.id_a)
            want.add((q, c, r.jaccard))
    assert got == want
    assert any(q == 21 and c == 20 for q, c, _ in got)   # the planted near-dup
    assert not any(q == 23 for q, c, _ in got)           # the novel doc admits


def test_lsh_probe_prunes_partitions(spark, tmp_path):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        banded_rows, lsh_write_index,
    )

    corpus, new = _lsh_corpus(spark)
    path = str(tmp_path / "lshidx2")
    lsh_write_index(corpus, path, "doc_id", "text", n=3, band_parts=16)
    probe_one = new.filter("doc_id = 23")   # novel doc: sparse band keys
    q = banded_rows(probe_one, "doc_id", "text", 3, 128, 64, 42)
    keys = sorted({r["band"] * 16 + r["bhash"] % 16
                   for r in q.select("band", "bhash").collect()})
    filtered = spark.read.parquet(path + "/buckets").filter(
        (F.col("band") * 16 + F.col("__bp")).isin(keys)
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # planning-time pruning: the arithmetic isin lands in PartitionFilters
    # (file skipping), NOT in DataFilters (row filtering after reading)
    assert "PartitionFilters: [((band" in plan
    assert "DataFilters: []" in plan
    # and the probe's key set genuinely excludes most of the index
    assert len(keys) <= 64                  # one prefix per band at most
    full_keys = {r["band"] * 16 + r["__bp"]
                 for r in spark.read.parquet(path + "/buckets")
                 .select("band", "__bp").distinct().collect()}
    assert len(set(keys) & full_keys) < len(full_keys)


def test_lsh_index_meta_layout_and_param_guard(spark, tmp_path):
    """r9 index meta: (1) auto band_parts sizes from the corpus — a small
    corpus writes bands x 1 directories, not the old fixed bands x 16;
    (2) the probe reads band_parts from meta/, so a caller passing a
    wrong band_parts still prunes against the real layout; (3) probing
    with mismatched SIGNATURE params fails fast instead of silently
    returning zero candidates."""
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        lsh_probe_pairs, lsh_write_index,
    )

    corpus, new = _lsh_corpus(spark)
    path = str(tmp_path / "lshidx3")
    lsh_write_index(corpus, path, "doc_id", "text", n=3)   # auto parts
    meta = spark.read.parquet(path + "/meta").head()
    assert meta["band_parts"] == 1 and meta["n"] == 3
    dirs = {r["__bp"] for r in spark.read.parquet(path + "/buckets")
            .select("__bp").distinct().collect()}
    assert dirs == {0}
    # stored layout overrides the caller's (wrong) band_parts
    got = {(r.query_id, r.corpus_id)
           for r in lsh_probe_pairs(new, path, "doc_id", "text",
                                    threshold=0.3, n=3, band_parts=999).collect()}
    assert (21, 20) in got and not any(q == 23 for q, _ in got)
    # mismatched shingle n: meaningless band hashes -> raise, not miss
    with pytest.raises(ValueError, match="do not match the index"):
        lsh_probe_pairs(new, path, "doc_id", "text", threshold=0.3, n=5)


def test_lsh_probe_rejects_empty_meta(spark, tmp_path):
    """ADVICE r10: an existing-but-EMPTY meta/ (interrupted write) must
    raise a corrupt-index error, not silently fall back to the caller's
    band_parts — the fallback would disable both the signature-param
    guard and the stored layout override."""
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        lsh_probe_pairs, lsh_write_index,
    )

    corpus, new = _lsh_corpus(spark)
    path = str(tmp_path / "lshidx4")
    lsh_write_index(corpus, path, "doc_id", "text", n=3)
    # simulate the interrupted write: meta/ exists, holds zero rows
    spark.read.parquet(path + "/meta").limit(0).write.mode(
        "overwrite"
    ).parquet(path + "/meta")
    with pytest.raises(ValueError, match="corrupt LSH index"):
        lsh_probe_pairs(new, path, "doc_id", "text", threshold=0.3, n=3)
    # review r10: an UNREADABLE meta/ (killed mid-write — dir exists,
    # no committed parquet) must also raise, not fall back to pre-meta
    import shutil

    path2 = str(tmp_path / "lshidx4b")
    lsh_write_index(corpus, path2, "doc_id", "text", n=3)
    shutil.rmtree(path2 + "/meta")
    import os

    os.makedirs(path2 + "/meta")  # exists, holds nothing readable
    with pytest.raises(ValueError, match="corrupt LSH index"):
        lsh_probe_pairs(new, path2, "doc_id", "text", threshold=0.3, n=3)


def test_lsh_write_index_evaluates_corpus_twice_not_thrice(spark, tmp_path):
    """ADVICE r10: with band_parts=None the sizing count must come from
    the (checkpointed) banded rows, not a third full evaluation of the
    corpus — costly when the corpus is an expensive derived pipeline.
    Each corpus row passes the tracked stage exactly twice: once feeding
    the signature pass, once for the docs/ write."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import lsh_write_index

    corpus, _ = _lsh_corpus(spark)
    n_rows = corpus.count()
    acc = spark.sparkContext.accumulator(0)

    def _tick(batches):
        for p in batches:
            acc.add(len(p))
            yield p

    tracked = corpus.mapInPandas(_tick, corpus.schema)
    lsh_write_index(tracked, str(tmp_path / "lshidx5"), "doc_id", "text", n=3)
    assert acc.value == 2 * n_rows, (
        f"corpus evaluated {acc.value / n_rows:g}x, expected exactly 2x "
        "(signature pass + docs write; sizing count must reuse the "
        "checkpointed banded rows)"
    )


def test_fit_cells_return_sample_contract(spark):
    """ADVICE r12: an in-call ivf_knn_join fit hands its sample to the
    cell-population estimator. The contract that reuse relies on: the
    returned matrix is unit-normalized (what _assign_cells needs) and
    the count is the FULL corpus row count (sample_frac=None), not the
    capped sample size."""
    import numpy as np

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import _fit_cells

    import random

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    _, _, X, n = _fit_cells(
        emb, "vec_id", "embedding", 4, 7, max_train_rows=25, return_sample=True
    )
    assert n == 40 and len(X) == 25
    assert np.allclose(np.linalg.norm(X, axis=1), 1.0)


def test_fit_cells_layout_independent_and_deterministic(spark):
    """The r9 coarse quantizer must yield bit-identical centroids and
    assignments regardless of the corpus' partitioning (content-hash
    sample order + seeded spherical k-means++), where the old
    pyspark.ml KMeans fit depended on partition layout."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import _fit_cells

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, c1 = _fit_cells(emb, "vec_id", "embedding", 4, 7)
    a2, c2 = _fit_cells(emb.repartition(13), "vec_id", "embedding", 4, 7)
    assert [r["centroid"] for r in c1.orderBy("cell").collect()] == \
           [r["centroid"] for r in c2.orderBy("cell").collect()]
    assign1 = {r["cid"]: r["__cell"] for r in a1.collect()}
    assign2 = {r["cid"]: r["__cell"] for r in a2.collect()}
    assert assign1 == assign2


def test_simhash_null_text_matches_bits_twin(spark):
    """Review r7: NULL text -> all-zero signature in BOTH simhash paths
    (the Arrow path previously hashed NULL as the empty string, pairing
    NULL docs with empty docs at hamming 0)."""
    sdf = spark.createDataFrame([(1, None), (2, ""), (3, "hello world")], "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(sdf, "doc_id", "text", nbits=8).collect()}
    packed = sdf.select(
        "doc_id",
        F.aggregate(F.reverse(D.simhash_bits("text", 8)), F.lit(0).cast("bigint"),
                    lambda acc, b: acc * 2 + b).alias("sig"),
    ).collect()
    bits = {r["doc_id"]: r["sig"] for r in packed}
    assert sigs == bits
    assert sigs[1] == 0 and sigs[1] != sigs[2]


def test_auto_band_parts_rule():
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import _auto_band_parts

    assert _auto_band_parts(0) == 1
    assert _auto_band_parts(50_000) == 1
    assert _auto_band_parts(50_001) == 2
    assert _auto_band_parts(500_000) == 10
    assert _auto_band_parts(10 ** 9) == 256   # clamp


def test_soft_dedup_weights(spark):
    """r10 soft dedup: an m-cluster's members each get 10^6 div m ppm,
    unpaired docs keep full weight, every input row survives, and the
    result is layout-independent."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    # components: {1,2,3} (chain), {4,5}; 6 unique
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["weight_ppm"]
           for r in soft_dedup_weights(docs, pairs, "doc_id").collect()}
    assert got == {1: 333333, 2: 333333, 3: 333333, 4: 500000, 5: 500000, 6: 1000000}
    again = {r["doc_id"]: r["weight_ppm"]
             for r in soft_dedup_weights(docs.repartition(5), pairs.repartition(3),
                                         "doc_id").collect()}
    assert again == got
    # expected training mass: each cluster ~1 doc, plus the unique doc
    assert abs(sum(got.values()) / 1e6 - 3.0) < 1e-4
    # empty pair set: everything is unique, full weight everywhere
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    alone = {r["doc_id"]: r["weight_ppm"]
             for r in soft_dedup_weights(docs, no_pairs, "doc_id").collect()}
    assert alone == {i: 1000000 for i in range(1, 7)}


def test_lsh_probe_without_jvm_bridge(spark, tmp_path, monkeypatch):
    """ADVICE r10: lsh_probe_pairs reached into spark._jvm/_jsc for the
    meta/ existence check, which does not exist under Spark Connect.
    With the bridge unavailable the probe must fall back to the read
    path and still distinguish absent (PATH_NOT_FOUND -> pre-meta
    fallback) from corrupt (anything else -> raise). Simulated by
    stubbing the FS-existence helper to the Connect answer (None) —
    nulling _jvm itself breaks classic pyspark's error-capture
    internals, so the helper is the seam."""
    import os
    import shutil

    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators import dedup as D
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        lsh_probe_pairs, lsh_write_index,
    )

    corpus, new = _lsh_corpus(spark)
    path = str(tmp_path / "lshidx_nojvm")
    lsh_write_index(corpus, path, "doc_id", "text", n=3)
    want = {(r.query_id, r.corpus_id)
            for r in lsh_probe_pairs(new, path, "doc_id", "text",
                                     threshold=0.3, n=3).collect()}

    monkeypatch.setattr(D, "_hadoop_path_exists", lambda s, p: None)
    # healthy index: meta read succeeds, same pairs as the jvm path
    got = {(r.query_id, r.corpus_id)
           for r in lsh_probe_pairs(new, path, "doc_id", "text",
                                    threshold=0.3, n=3).collect()}
    assert got == want and got  # non-empty: doc 21 matches 20
    # pre-meta index (meta/ absent): PATH_NOT_FOUND -> caller fallback
    path2 = str(tmp_path / "lshidx_nojvm_premeta")
    lsh_write_index(corpus, path2, "doc_id", "text", n=3)
    shutil.rmtree(path2 + "/meta")
    got2 = {(r.query_id, r.corpus_id)
            for r in lsh_probe_pairs(new, path2, "doc_id", "text",
                                     threshold=0.3, n=3).collect()}
    assert got2 == want
    # corrupt index (meta/ exists, nothing readable): must still raise
    path3 = str(tmp_path / "lshidx_nojvm_corrupt")
    lsh_write_index(corpus, path3, "doc_id", "text", n=3)
    shutil.rmtree(path3 + "/meta")
    os.makedirs(path3 + "/meta")
    with pytest.raises(ValueError, match="corrupt LSH index"):
        lsh_probe_pairs(new, path3, "doc_id", "text", threshold=0.3, n=3)
