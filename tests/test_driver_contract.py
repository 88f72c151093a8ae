"""Driver-contract guards: the queries()/oracle_sql() surface stays
consistent, and every declared query actually executes."""

from __future__ import annotations

import __spark_entry__ as E

# pca_project: driver-side eigensolver — no SQL twin (numpy-parity +
# layout tests in tests/test_stats.py). record_linkage_em: iterative EM
# fixpoint over comparison-pattern counts — no closed-form SQL twin
# (convergence and layout-independence pinned in tests/test_linkage.py;
# the SCORING it feeds stays oracle-checked via record_linkage).
# Everything else must have one. (bpe_tokenize left this list in r8:
# its 64 merge rounds + rank-ordered encode unroll into SQL the same
# way kmeans' Lloyd iterations do — suite._bpe_oracle.)
EXPECTED_ROWS_ONLY: set[str] = {"pca_project", "record_linkage_em"}

# §2-canonical witnesses that must NEVER leave the driver's 50-slot
# correctness window (one per SURVEY §2 operator family), plus the
# prompt-mandated LLM-pipeline families.  Mirrors __spark_entry__.PINNED
# independently so an accidental edit to either list fails loudly.
CANONICAL_IN_WINDOW: set[str] = {
    "pricing_summary", "enriched_orders", "view_projection",
    "time_functions", "hourly_counts", "region_revenue", "cube_revenue",
    "supplier_stats", "array_membership_join", "unnest_join",
    "lookup_join", "asof_join", "asof_tolerance", "interval_join",
    "changelog_compaction", "debezium_pipeline", "logical_decoding",
    "app_sql_pipeline", "top_orders", "set_ops", "semi_anti_join",
    "window_rank", "rollup_revenue", "distinct_agg_having",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine", "similarity_topk",
    "similarity_ivf_topk", "text_analysis", "multimodal_features",
}


def test_rotation_manifest():
    """The driver checks only the first 50 queries() entries; pin the
    ordering contract so refactors can't silently rotate a canonical
    query out of the window."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    # PINNED is exactly the committed canonical set, in slots 1-33.
    assert E.PINNED == sorted(E.PINNED, key=E.PINNED.index)  # no dupes via len check
    assert len(E.PINNED) == len(set(E.PINNED)) == 33
    assert set(E.PINNED) == CANONICAL_IN_WINDOW
    # PINNED + ROTATION is a permutation of the full suite.
    assert len(E.ROTATION) == len(set(E.ROTATION))
    assert set(E.PINNED) | set(E.ROTATION) == set(suite.QUERIES)
    assert not set(E.PINNED) & set(E.ROTATION)
    # The driver-facing order: slots 1-33 pinned, 34-50 this round's
    # retry lane + cohort, and the full dict covers every suite query.
    names = E.ordered_names()
    rnd = E.current_round()
    lane, cohort = E._window_plan(rnd)
    assert names[:33] == E.PINNED
    assert names[33:50] == lane + cohort
    assert len(lane) + len(cohort) == 17
    assert len(names) == len(set(names)) == len(suite.QUERIES)
    assert list(E.queries()) == names
    # Lane + cohort advance deterministically and cover all of ROTATION
    # (lane members are driver-checked via the lane; consumed wheel
    # positions are never re-served, so coverage is cohorts ∪ lanes).
    covered: set[str] = set()
    for r in range(6, 6 + 12):
        lane_r, cohort_r = E._window_plan(r)
        assert len(lane_r) + len(cohort_r) == 17
        covered |= set(cohort_r) | set(lane_r)
    assert covered == set(E.ROTATION)


def test_round8_retry_lane_is_the_r7_reds():
    """VERDICT r7 #2 'Done' criterion: the round-8 driver window is the
    33 pinned + the 4 driver-red queries + 13 cohort queries."""
    lane, cohort = E._window_plan(8)
    assert lane == ["rolling_features", "kmeans", "lm_scores", "hist_quantiles"]
    assert cohort == [
        "bm25_topk", "normalize_text", "mad_outliers", "key_skew",
        "corr_matrix", "gopher_quality", "asof_forward", "asof_nearest",
        "pagerank", "grouping_sets", "standardize", "cooccur_pmi",
        "triangle_census",
    ]
    # Rounds 6-7 predate the lane: the replay must reproduce the plain
    # 17-wide slices those rounds actually served.
    for r in (6, 7):
        lane_r, cohort_r = E._window_plan(r)
        assert lane_r == []
        assert cohort_r == (E.ROTATION + E.ROTATION)[(r - 6) * 17 :][:17]
    # A rows-only record (err == 'no_oracle') is not red.
    assert not E._is_red({"err": "no_oracle", "rows_match": None})
    assert E._is_red({"err": None, "rows_match": True, "schema_match": True,
                      "hash_match": False})


def test_round9_lane_is_the_contract_upgrade():
    """VERDICT r8 #2 'Done' criterion: bpe_tokenize's latest committed
    driver row is the r6 rows-only record, but the query gained a full
    SQL twin in r8 — the upgrade lane must serve it this round, and the
    cohort must resume the wheel exactly where round 8 left it."""
    lane, cohort = E._window_plan(9)
    assert lane == ["bpe_tokenize"]
    assert cohort == [
        "char_entropy", "bloom_prune", "window_distribution",
        "dataset_split", "range_join_pairs", "rrf_fusion",
        "hop_distinct_users", "hop_hll_users", "pagerank_weighted",
        "k_hop_reach", "pagerank_personalized", "hits_scores",
        "link_prediction", "url_dedup", "global_ids", "dedup_containment",
    ]
    # The gate keeps the pre-rule round-8 replay byte-identical even
    # though bpe_tokenize's oracle exists in the CURRENT code state.
    lane8, _ = E._window_plan(8)
    assert "bpe_tokenize" not in lane8


def test_round6_cohort_is_never_driver_checked():
    """Round-6 window slots 34-50 must all be queries absent from every
    committed CORRECTNESS_r01..r05 file (the rotation's whole point)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r0[1-5].json"))):
        seen |= set(json.load(open(path)))
    assert seen, "expected committed round 1-5 correctness artifacts"
    cohort = E.rotation_cohort(6)
    assert not set(cohort) & seen, set(cohort) & seen


def test_round_derivation_ignores_current_rounds_artifact(tmp_path, monkeypatch):
    """ADVICE r6 (medium): the artifact the CURRENT round's driver
    writes must not advance the rotation window mid-round. Simulate a
    repo dir holding committed artifacts for every round below
    FIRST_UNRECORDED_ROUND plus a driver-written current-round file:
    the derived round must not move."""
    import os

    cur = E.FIRST_UNRECORDED_ROUND
    for n in range(1, cur):
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text("{}")
    real_dirname = os.path.dirname

    def fake_dirname(path):
        return str(tmp_path) if path.endswith("__spark_entry__.py") else real_dirname(path)

    monkeypatch.setattr(E.os.path, "dirname", fake_dirname)
    assert E.current_round() == cur
    before = E.ordered_names()
    (tmp_path / f"CORRECTNESS_r{cur:02d}.json").write_text("{}")  # driver's mid-round write
    assert E.current_round() == cur
    assert E.ordered_names() == before


def test_first_unrecorded_round_tracks_committed_artifacts():
    """Fails loudly at the start of the NEXT round if the previous
    round's CORRECTNESS artifact got committed without bumping
    FIRST_UNRECORDED_ROUND — the nag that keeps the window advancing."""
    import os
    import re
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=here, capture_output=True, text=True, timeout=30, check=True,
        ).stdout
    except Exception:  # noqa: BLE001 - git unavailable: nothing to pin
        return
    rounds = [int(m.group(1)) for m in re.finditer(r"CORRECTNESS_r0*(\d+)\.json", out)]
    assert rounds, "expected committed correctness artifacts"
    assert E.FIRST_UNRECORDED_ROUND == max(rounds) + 1, (
        "a new CORRECTNESS artifact was committed: bump "
        "__spark_entry__.FIRST_UNRECORDED_ROUND to keep the rotation advancing"
    )
    # Review r9: the upgrade-lane test `q in suite.ORACLE` is mutable
    # code state, so every COMPLETED upgrade-era round's lane must be
    # frozen (FROZEN_UPGRADE_LANES) at the same moment the bump lands,
    # or a later oracle add/remove silently shifts the wheel replay.
    for r in range(E.UPGRADE_LANE_SINCE_ROUND, E.FIRST_UNRECORDED_ROUND):
        assert r in E.FROZEN_UPGRADE_LANES, (
            f"round {r} is committed but its upgrade-lane set is not frozen: "
            "add it to __spark_entry__.FROZEN_UPGRADE_LANES (freeze the "
            "dynamically computed set verbatim)"
        )


def test_bench_covers_every_suite_query():
    """bench.py must bench every suite query (array_membership_join is
    the single documented exclusion — its scale path IS unnest_join),
    with no stale or duplicate names."""
    import bench

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

    b = bench.BENCH_QUERIES
    assert len(b) == len(set(b)), "duplicate bench entries"
    assert set(b) <= set(suite.QUERIES), set(b) - set(suite.QUERIES)
    assert set(suite.QUERIES) - set(b) == {"array_membership_join"}


def test_oracle_keys_subset_of_queries():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query is dead weight"
    assert set(qs) - set(oracles) == EXPECTED_ROWS_ONLY, (
        "every query needs an oracle twin unless it is on the documented "
        "rows-only (approximate) list"
    )


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["order_id", "client_name", "parts"]


def test_every_query_executes_at_sf0001(spark):
    """Each queries() entry must build a valid plan and materialize at
    the smallest scale factor — catches any query broken by refactors
    before the driver's sf0.01 correctness gate does. Also pins that
    every driver-facing schema is atomic-only: the driver's pandas
    canonicalizer sorts/factorizes every column, and array/map cells
    arrive as unhashable ndarrays/dicts that crash even the rows-only
    check (VERDICT r10 #1, pca_project)."""
    from pyspark.sql.types import ArrayType, MapType

    failures = []
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, "/root/testdata/sf0.001")
            bad = [
                f.name for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType))
            ]
            if bad:
                failures.append(f"{name}: non-canonicalizable columns {bad}")
            df.limit(5).collect()
        except Exception as exc:  # noqa: BLE001 - collecting a report
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
