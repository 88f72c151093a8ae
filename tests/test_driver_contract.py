"""Driver-contract guards: the queries()/oracle_sql() surface stays
consistent, and every declared query actually executes."""

from __future__ import annotations

import __spark_entry__ as E

# bpe_tokenize: ordered data-dependent rewrite system — no SQL twin
# (exactness pinned in tests/test_bpe.py). pca_project: driver-side
# eigensolver — no SQL twin (numpy-parity + layout tests in
# tests/test_stats.py). record_linkage_em: iterative EM fixpoint over
# comparison-pattern counts — no closed-form SQL twin (convergence and
# layout-independence pinned in tests/test_linkage.py; the SCORING it
# feeds stays oracle-checked via record_linkage). Everything else must
# have one.
EXPECTED_ROWS_ONLY: set[str] = {"bpe_tokenize", "pca_project", "record_linkage_em"}


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
    before the driver's sf0.01 correctness gate does."""
    failures = []
    for name, fn in sorted(E.queries().items()):
        try:
            fn(spark, "/root/testdata/sf0.001").limit(5).collect()
        except Exception as exc:  # noqa: BLE001 - collecting a report
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
