"""Every oracle-backed registry query must hash-match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (run there at sf0.01) so
divergence is caught locally first.
"""

from __future__ import annotations

import pytest

from myrecommendsystem_spark.plans import registry
from tests.oracle_utils import compare_query_to_oracle

ORACLE_SPECS = [s for s in registry.REGISTRY if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in registry.REGISTRY if s.oracle is None]

# These four replays are dominated by DuckDB-side recursive-CTE work
# (rag 162 s, doc_chunk 99 s, doc_cdc 96 s, embedding_semantic 24 s —
# together ~38% of the r13 suite's 28-min wall, which outlived the
# driver's pytest window).  They stay in the opt-in profile
# (MRS_SLOW_TESTS=1 and every MRS_TEST_SF_DIR replay run) and the
# driver's own rotating CORRECTNESS window still hash-checks them
# independently; the default profile keeps parity for the other ~275
# gated queries.
SLOW_ORACLE_REPLAYS = {
    "rag_ingest_pipeline",
    "doc_chunk_dedup_docs",
    "doc_cdc_chunks",
    "embedding_semantic_survivors",
}
ORACLE_PARAMS = [
    pytest.param(s, marks=pytest.mark.slow)
    if s.name in SLOW_ORACLE_REPLAYS
    else s
    for s in ORACLE_SPECS
]


@pytest.mark.parametrize(
    "spec", ORACLE_PARAMS, ids=[s.name for s in ORACLE_SPECS]
)
def test_query_matches_oracle(spark, sf_dir, spec):
    # lazy (data-dependent) oracles resolve at the replay's own sf_dir —
    # both engines then train their inlined constants on the same rows
    compare_query_to_oracle(
        spark, sf_dir, spec.builder, registry.resolve_oracle(spec.oracle, sf_dir)
    )


@pytest.mark.parametrize(
    "spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS]
)
def test_rows_only_query_runs(spark, sf_dir, spec):
    """Driver's weaker check for non-SQL-expressible ops: runs, has rows
    and a stable schema — and the row COUNT is stable across runs, since
    the count is the one value the driver actually records for these
    (a seed leak in a sampler/quantizer would flake the contract row)."""
    df = spec.builder(spark, sf_dir)
    n = df.count()
    assert n > 0
    assert len(df.columns) > 0
    assert spec.builder(spark, sf_dir).count() == n


def test_all_queries_have_unique_names():
    names = [s.name for s in registry.REGISTRY]
    assert len(names) == len(set(names))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


@pytest.mark.slow
def test_no_gated_query_is_vacuous_at_driver_scale():
    """Every oracle must return >0 rows at the driver's sf0.01: an empty
    result hash-matches an empty result, so a vacuous query passes the
    gate while verifying nothing (q22/q11/duplicate_suspects regressed
    this way — the synthetic data never satisfied their literal
    predicates).  DuckDB-only, so the sweep costs seconds."""
    from tests.oracle_utils import duckdb_connection

    con = duckdb_connection("/root/testdata/sf0.01")
    empty = []
    for spec in registry.REGISTRY:
        if spec.oracle is None:
            continue
        sql = registry.resolve_oracle(spec.oracle, "/root/testdata/sf0.01")
        n = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        if n == 0:
            empty.append(spec.name)
    con.close()
    assert not empty, f"vacuous gated queries at sf0.01: {empty}"
