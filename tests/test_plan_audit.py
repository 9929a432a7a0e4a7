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
    "k43_source_drift_tv",    # 1-row corpus-total scalar, broadcast
    "c18_skew_profile",       # 1-row global-moments scalar, broadcast
    "d37_decile_shares",      # 1-row revenue-total scalar, broadcast
    "n12_rich_club",          # 4-row threshold dim, broadcast (c7's band shape)
    "k45_shingle_df_profile", # 1-row posting-total scalar, broadcast
    "k46_freq_spectrum",      # 1-row vocab-size scalar, broadcast
    "l4_watermark_filter",    # 1-row scalar max, broadcast
    "d22_heavy_hitters",      # 1-row corpus token total, broadcast
    "d23_hll_set_ops",        # 5-row per-type sketch table × itself
    "k14_ivf_ann",            # 16-row centroid table, broadcast probe
    "k14b_ivf_ann_prebuilt",  # same 16-row centroid probe, read from
                              # the persisted index's manifest table
    "h12_string_distance",    # 25-row dictionary, broadcast (band by
                              # length/prefix for dict×dict at scale)
    "q22_global_sales_opportunity",  # 1-row scalar avg, broadcast
    "q15_top_supplier",       # 1-row scalar max, broadcast
    "e18_rfm_segments",       # 1-row quintile-cutoff struct, broadcast
    "k39_lm_quality_bands",   # 1-row corpus (mean, sd), broadcast (k22's shape)
    "i41_morans_i",           # constant 100-cell grid × itself (rook pairs) + 1-row moments
    "i55_geodesic_hotspot_z", # 1-row global moments, broadcast (i12's shape)
    "i56_spacetime_hotspot",  # 1-row global moments, broadcast (i12's shape)
    "d46_benjamini_hochberg", # 1-row status-totals scalar, broadcast (d28's shape)
    "d28_chi_square_independence",  # 1-row totals × the R×C cell table, broadcast
    "d38_cramers_v",          # same d28 shape: 1-row totals × R×C cells
    "d31_ks_two_sample",      # 1-row (n1, n2) totals, broadcast (d28's shape)
    "d32_benford_digits",     # 1-row total, broadcast (d28's shape)
    "i43_ripley_k",           # 3-row radii dim + 1-row n total, broadcast
    "b11_quantified_comparison",  # 1-row "< ANY" scalar max, broadcast
    "g10_scd2_asof_lookup",   # 3-row probe-instant dim, broadcast (n12's ladder shape)
    "n17_modularity",         # 1-row edge-count m scalar, broadcast
    "n18_label_propagation",  # same fold: 1-row m scalar, broadcast
    "i62_concave_overlay_join",      # bounded <=100-row district dim,
                                     # broadcast bbox theta-join (r11:
                                     # exact candidates; i59 keeps the
                                     # grid form for unbounded sides)
    "i62b_concave_overlay_general",  # same bounded broadcast bbox join
    "d44_kendall_tau_b",      # <=35-cell contingency table x itself
                              # (i41's constant-grid shape) + 1-row scalars
}

# Python-boundary nodes allowed only where Python IS the point:
PY_ALLOWED = {
    "m1_scalar_pandas_udf",
    "m3_grouped_agg_udf",
    "m4b_python_udtf",     # the point: a true @udtf table function
    "m9_python_udtf",      # multi-arg LATERAL @udtf — same declared point
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


# Known-bounded driver-side .collect() sites — each pulls a scalar, a
# constant-size dimension, or rides behind the driver_max_edges gate.
# Any NEW collect in the package must either be added here with a
# bounded-size justification or routed through a gated/distributed
# path (api.connected_components is the template).
COLLECT_ALLOWED = {
    ("sources/scans.py", "DESCRIBE EXTENDED"),   # catalog-stats rows (a12)
    ("sources/scans.py", 'load(spark, sf_dir, "nation")'),  # 25-row dim
    ("api.py", "oriented.limit(probe_cap).collect()"),  # ≤ gate+1 rows, gated
    ("api.py", 'sym.agg(F.min("_src"))'),        # 1-row scalar seed
    ("api.py", "1-row density-quantile scalar"),  # i53b radius derivation
    ("api.py", "1-row bounded cap-audit scalar"),  # band_df_cap drop metrics
    ("api.py", "bounded <= k_sources hash-picked pivot rows"),  # n22 pivots
    ("streaming/live.py", 'new_part.agg(F.max("event_id"))'),  # 1-row scalar
    ("streaming/live.py", 'raw.agg(F.max("event_id"))'),  # 1-row nudge scalar
    ("operators/ml_ops.py", 'li.select("l_returnflag").distinct()'),  # 3-row flag dim (j13)
    ("lakehouse.py", "1-row bounded scalar"),       # merge key-range probe
    ("operators/llm_ops.py", "bounded ≤ nlist (16) distinct probe ids"),  # ivf_query prune
    ("operators/llm_ops.py", "bounded <= _K55_MERGES (8) merge-table rows"),  # bpe_apply_merges
    ("operators/llm_ops.py", "1-row bounded argmax scalar"),  # k55 per-round top pair
    ("operators/llm_ops.py", "train on a sample (bounded _PQ_SAMPLE rows)"),  # k14c codebook sample
    ("operators/llm_ops.py", "bounded M*ksub (256) codebook rows"),  # k14c codebook read
    ("operators/llm_ops.py", "collectable/broadcastable to ~1e8 vectors"),  # k14c code table (16 B/vec; crossover documented)
    ("operators/sets.py", "1-row per-version rollup"),  # g11: 3 bounded reads
    ("operators/sets.py", "1-row per-step rollup"),     # g12: 3 bounded reads
}


def test_no_ungated_driver_collect():
    """Source-level sweep: every .collect() in the package must be in
    the bounded allowlist above — an unlisted one is a driver-side
    bottleneck waiting for 100 TB (the DBSCAN border merge was exactly
    this class until routed through connected_components)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "glonassdatamining_spark"
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        rel = str(py.relative_to(pkg))
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".collect()" not in line:
                continue
            ctx = "\n".join(
                py.read_text().splitlines()[max(0, i - 2): i]
            )
            if not any(
                rel == f and marker in ctx for f, marker in COLLECT_ALLOWED
            ):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "ungated .collect() outside the bounded allowlist:\n"
        + "\n".join(offenders)
    )


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
