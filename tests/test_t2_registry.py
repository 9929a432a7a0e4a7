"""Parametrized t2 mirror: every declared query vs its DuckDB oracle.

This is the same check the driver runs at sf0.01; we run it at
TEST_SF_DIR (default sf0.001) for speed. Rows-only queries are just
materialized (must not error, ≥0 rows)."""

from __future__ import annotations

import pytest

from glonassdatamining_spark import registry
from tests.conftest import run_t2


def _names() -> list[str]:
    return sorted(registry.all_queries())


@pytest.mark.parametrize("name", _names())
def test_declared_query(spark, name):
    run_t2(spark, name)


def test_smoke_empties_nonvacuous(spark):
    """The EMPTY_AT_SMOKE allowlist is only honest if those queries
    really do produce rows at the driver's judged scale — prove it at
    sf0.01 (full oracle compare, not just a count)."""
    from tests.conftest import EMPTY_AT_SMOKE

    for name in sorted(EMPTY_AT_SMOKE):
        run_t2(spark, name, sf_dir="/root/testdata/sf0.01")
