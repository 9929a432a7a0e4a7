"""Global physical-plan audit: every declared query, every round.

A CartesianProduct anywhere, or a BroadcastNestedLoopJoin outside the
documented brute-force-twin allowlist, is an O(n²) plan that dies at
100 TB even if sf0.01 results stay correct — fail fast here.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from glonassdatamining_spark import registry
from tests.conftest import SF_DIR

# Documented-by-design nested-loop joins (each has a declared scale
# path or a constant-size side — see the op docstrings):
BNLJ_ALLOWED = {
    "c6_cross_join",          # constant 5×25 tables
    "c7_range_band_join",     # 4-row band dimension, broadcast
    "c12_knn_join",           # brute-force twin of j6 LSH
    "k2_ngram_jaccard_pairs", # brute-force twin of k2b MinHash-LSH
    "k10_simhash_neardup",    # brute-force twin (nibble-band at scale)
    "k12_embedding_neardup",  # brute-force twin of j6 LSH
    "i12_hotspot_zscore",     # 1-row global moments, broadcast
    "k22_unigram_loglik",     # 1-row vocab total, broadcast
    "l4_watermark_filter",    # 1-row scalar max, broadcast
    "d22_heavy_hitters",      # 1-row corpus token total, broadcast
    "d23_hll_set_ops",        # 5-row per-type sketch table × itself
    "k14_ivf_ann",            # 16-row centroid table, broadcast probe
    "h12_string_distance",    # 25-row dictionary, broadcast (band by
                              # length/prefix for dict×dict at scale)
}

# Python-boundary nodes allowed only where Python IS the point:
PY_ALLOWED = {
    "m1_scalar_pandas_udf",
    "m3_grouped_agg_udf",
    "m4b_python_udtf",     # the point: a true @udtf table function
    "m5_struct_arg_udf",
}


def _plan(spark, name: str) -> str:
    df = registry.get(name).builder(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


CARTESIAN_ALLOWED = {
    # MLlib's recommendForAllUsers IS a blocked factor-matrix cross
    # with per-block top-k pruning — the documented ALS serving plan,
    # not an accidental O(n^2) join.
    "j8_als_recommend",
}


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_plan_has_no_scale_hazard(spark, name):
    plan = _plan(spark, name)
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: undeclared nested-loop join"
        )
    if name not in PY_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
