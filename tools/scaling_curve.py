"""Record the sf0.1 → sf1 scaling curve for the bench headline set.

Runs every bench.py headline query at sf0.1 and at the synthesized
sf1 fixture (tools/make_sf1.py, 10x rows) in ONE session with the
same hot-table bench mode, and writes per-query seconds + the
sec(sf1)/sec(sf0.1) ratio to scale_curve.json (consumed by the
SCALE.md table). Near-linear operators should land well under ~12x;
declared-quadratic correctness twins (brute-force k3/c12) are
expected to exceed it and are documented as such in SCALE.md.

Run: python tools/scaling_curve.py   (~15-25 min, mostly sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

from bench import HEADLINE  # noqa: E402
from glonassdatamining_spark import registry  # noqa: E402
from glonassdatamining_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = "/root/repo/.scale/sf1"
REPS = 2

# Non-headline operators carried in the STANDARD curve (round-6 ask:
# their sf1 rows were measured ad-hoc post-freeze in round 6; from
# round 7 they ride the same artifact/procedure as the headline set),
# plus every round-7 addition.
EXTRAS = [
    # round-6 additions
    "i50_cell_speed_percentiles",
    "i51_anisotropy_ellipse",
    "i52_cell_flow_vectors",
    "e37_interval_coverage",
    "k50_contamination_positions",
    "k51_doc_chunking",
    "k52_priority_dedup",
    "k53_leakage_free_split",
    "d43_jarque_bera",
    "d44_kendall_tau_b",
    "d45_two_proportion_z",
    "n17_modularity",
    # round-7 additions
    "g15_lakehouse_merge_evolution",
    "i53_haversine_knn_join",
    "i54_geodesic_grid_bins",
    "i55_geodesic_hotspot_z",
    "i56_spacetime_hotspot",
    "i57_zone_overlay_area",
    "i58_buffered_poi_coverage",
    "k54_neardup_leakage_split",
    "d46_benjamini_hochberg",
    "a24_partitioned_scan",
    "h19_phonetic_join",
    "i59_polygon_overlay_join",
    # uncapped n16 left the bench headline in round 7 but its curve
    # row stays recorded (it pins n16b's densification comparison)
    "n16_two_hop_ball",
    # round-8 additions: the production/self-tuning scale variants
    # (their parent forms k54/i53 stay recorded for the comparison)
    "k54b_neardup_split_production",
    "i53b_haversine_knn_auto",
    "i62_concave_overlay_join",
    # round-9 additions: the last two density-retuned scale variants
    # (parents i6/i11 stay in the headline set for the comparison)
    "i6b_dbscan_auto",
    "i11b_trajectory_similarity_auto",
    # benched-nowhere iterative kernel (n2's class) — curve row only
    "n20_weighted_pagerank",
    # round-9 late additions (measured separately in round 9; they
    # ride this list from round 10 — i64/k55b are now in HEADLINE)
    "i65b_hausdorff_similarity_auto",
    # round-10 additions not in HEADLINE (iterative round-paced
    # kernels, n20's class — curve rows only)
    "n22_betweenness_sampled",
    "n5_kcore",
    "n23_harmonic_closeness_sampled",
    # round-11 additions not in HEADLINE
    "k14c_pq_ann_adc",
]


def main() -> None:
    spark = get_spark("gdm-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries] + [
        n for n in EXTRAS if n in queries
    ]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for sf_dir, key in ((SF_SMALL, "sf0.1"), (SF_BIG, "sf1")):
        # warm pass (untimed): JIT + bench-mode projection caches
        for name in names:
            materialize(queries[name](spark, sf_dir))
        best = {n: float("inf") for n in names}
        for _ in range(REPS):
            for name in names:  # interleaved, like bench.py
                t0 = time.perf_counter()
                materialize(queries[name](spark, sf_dir))
                best[name] = min(best[name], time.perf_counter() - t0)
        for name in names:
            results.setdefault(name, {})[key] = round(best[name], 3)
        print(f"== {key} done: {round(sum(best.values()), 1)} s total",
              flush=True)

    for name in names:
        r = results[name]
        r["ratio"] = round(r["sf1"] / r["sf0.1"], 2) if r["sf0.1"] > 0 else None

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "scale_curve.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
