"""Golden-file regression (SURVEY §5.4): the flagship query's sf0.001
output is committed as CSV; any drift in values — not just shape — is a
regression even if the DuckDB twin drifts identically (e.g. a shared
semantics change sneaking into both sides)."""

from __future__ import annotations

import os

import pandas as pd

from glonassdatamining_spark.plans.flagship import flagship

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "flagship_sf0001.csv")


def test_flagship_matches_golden(spark):
    got = flagship(spark, "/root/testdata/sf0.001").toPandas()
    want = pd.read_csv(GOLDEN)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for col in got.columns:
        for i, (g, w) in enumerate(zip(got[col].tolist(), want[col].tolist())):
            if isinstance(g, float):
                # CSV carries 10 significant digits.
                assert abs(g - w) <= abs(w) * 1e-9 + 1e-12, (col, i, g, w)
            else:
                assert str(g) == str(w), (col, i, g, w)
