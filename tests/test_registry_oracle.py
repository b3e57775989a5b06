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


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_query_matches_oracle(spark, sf_dir, spec):
    compare_query_to_oracle(spark, sf_dir, spec.builder, spec.oracle)


@pytest.mark.parametrize(
    "spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS]
)
def test_rows_only_query_runs(spark, sf_dir, spec):
    """Driver's weaker check for non-SQL-expressible ops: runs, has rows
    and a stable schema."""
    df = spec.builder(spark, sf_dir)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_all_queries_have_unique_names():
    names = [s.name for s in registry.REGISTRY]
    assert len(names) == len(set(names))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
