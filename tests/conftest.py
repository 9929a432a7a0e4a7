"""Shared test harness: one SparkSession, a DuckDB oracle runner, and a
comparator that mirrors the driver's t2 check (row count + schema +
order-insensitive value comparison after sorting columns by name)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from glonassdatamining_spark.session import get_spark
from glonassdatamining_spark.sources import TABLES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gdm-tests")
    yield s


def oracle_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Make list/array cells hashable-comparable.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cell_eq(a, b) -> bool:
    """Strict cell equality: floats bit-compare (NaN==NaN), everything
    else string-compares — so int-vs-float dtype skew between engines
    (e.g. DuckDB ceil()→DOUBLE vs Spark ceil()→BIGINT) FAILS here the
    way it may fail the driver's value hash."""
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    o_cols = sorted(c.lower() for c in oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != oracle {o_cols}"
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
    oracle_pdf.columns = [c.lower() for c in oracle_pdf.columns]
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _cell_eq(x, y)
        ][:5]
        assert not bad, f"{name}: column {col} mismatches (spark vs oracle): {bad}"


def run_t2(spark, name: str, sf_dir: str = SF_DIR) -> None:
    """Run one declared query against its oracle, assert equivalence."""
    from glonassdatamining_spark import registry

    d = registry.get(name)
    sdf = d.builder(spark, sf_dir).toPandas()
    if d.oracle is None:
        assert len(sdf) >= 0  # rows-only: just materialize
        return
    con = oracle_con(sf_dir)
    odf = con.execute(d.oracle).fetchdf()
    con.close()
    compare_frames(sdf, odf, name)
