"""§2.I — spatio-temporal operators (STARK surface, realized idiomatically).

The fixtures carry no lat/lon, so positions are deterministic numeric
proxies derived from event_id (SURVEY §2.I): exact integer arithmetic
then one double division — bit-identical across engines:

    x = (event_id * 7919  mod 100000) / 1000.0   ∈ [0, 100)
    y = (event_id * 104729 mod 100000) / 1000.0  ∈ [0, 100)

``fixes`` = (obj_id=user_id, event_id, ts, x, y): a GNSS-fix-shaped
table. All operators below are dimension-generic — swap (x, y) for
(lon, lat) + haversine and they are the STARK operator set.

Scale doctrine: every spatial op is grid-bucketed (SURVEY §4.3) — the
plane is cut into cells, points join/aggregate only within neighbor
cells, so candidate pairs are O(local density · n), never O(n²). This
is STARK's grid partitioner expressed as shuffle-compatible equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load
from glonassdatamining_spark.stable import EVENTS_CTE, dsum, o_dsum

FIXES_CTE = (
    EVENTS_CTE
    + ", fixes AS (SELECT user_id AS obj_id, event_id, ts, "
    "CAST(event_id * 7919 % 100000 AS DOUBLE) / 1000.0 AS x, "
    "CAST(event_id * 104729 % 100000 AS DOUBLE) / 1000.0 AS y "
    "FROM events)"
)


def fixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("obj_id"),
        "event_id",
        "ts",
        ((F.col("event_id") * 7919 % 100000).cast("double") / 1000.0).alias("x"),
        ((F.col("event_id") * 104729 % 100000).cast("double") / 1000.0).alias("y"),
    )


def _dist(x1, y1, x2, y2):
    return F.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))


@register(
    "i1_st_range_query",
    oracle=(
        FIXES_CTE + " SELECT obj_id, event_id, ts, x, y FROM fixes "
        "WHERE x >= 20.0 AND x < 60.0 AND y >= 10.0 AND y < 50.0 "
        "AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'"
    ),
    section="I1",
)
def i1_st_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal bbox+interval query — a conjunctive predicate
    Catalyst pushes into the scan (row-group pruning on ts at scale
    when data is time-sorted, which event stores are)."""
    f = fixes(spark, sf_dir)
    return f.filter(
        (F.col("x") >= 20.0) & (F.col("x") < 60.0)
        & (F.col("y") >= 10.0) & (F.col("y") < 50.0)
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    )


@register(
    "i2_within_distance",
    oracle=(
        FIXES_CTE + " SELECT obj_id, event_id, "
        "ROUND(sqrt((x-50.0)*(x-50.0) + (y-50.0)*(y-50.0)), 6) AS dist "
        "FROM fixes WHERE sqrt((x-50.0)*(x-50.0) + (y-50.0)*(y-50.0)) <= 15.0"
    ),
    section="I2",
)
def i2_within_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-ball filter around a query point (STARK withinDistance)."""
    f = fixes(spark, sf_dir)
    d = _dist(F.col("x"), F.col("y"), F.lit(50.0), F.lit(50.0))
    return f.filter(d <= 15.0).select("obj_id", "event_id", F.round(d, 6).alias("dist"))


_I3_EPS = 0.8


@register(
    "i3_distance_self_join",
    oracle=(
        FIXES_CTE + ", sub AS (SELECT * FROM fixes WHERE event_id % 3 = 0) "
        "SELECT a.event_id AS a_id, b.event_id AS b_id, "
        "ROUND(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 6) AS dist "
        "FROM sub a JOIN sub b ON a.event_id < b.event_id "
        f"WHERE sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) <= {_I3_EPS}"
    ),
    section="I3",
)
def i3_distance_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-distance self-join over fixes, grid-bucket form (cell = ε,
    probe side exploded to the 3×3 neighborhood, exact residual).
    The oracle is the brute-force O(n²) cross join on a 1/3 subset —
    equivalence proves the bucketing loses no pairs."""
    f = fixes(spark, sf_dir).filter(F.col("event_id") % 3 == 0).select("event_id", "x", "y")
    cx, cy = F.floor(F.col("x") / _I3_EPS), F.floor(F.col("y") / _I3_EPS)
    home = f.withColumn("cx", cx).withColumn("cy", cy)
    probe = (
        home.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("event_id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay"),
            (F.col("cx") + F.col("dx")).alias("cx"), (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    build = home.select(
        F.col("event_id").alias("b_id"), F.col("x").alias("bx"), F.col("y").alias("by"), "cx", "cy"
    )
    d = _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter((F.col("a_id") < F.col("b_id")) & (d <= _I3_EPS))
        .select("a_id", "b_id", F.round(d, 6).alias("dist"))
    )


@register(
    "i4_knn_point",
    oracle=(
        FIXES_CTE + " SELECT event_id, obj_id, "
        "ROUND(sqrt((x-50.0)*(x-50.0) + (y-50.0)*(y-50.0)), 6) AS dist "
        "FROM fixes ORDER BY sqrt((x-50.0)*(x-50.0) + (y-50.0)*(y-50.0)), event_id "
        "LIMIT 10"
    ),
    section="I4",
)
def i4_knn_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN for one query point — TakeOrderedAndProject: per-partition
    top-10 then a 10-row driver merge (identical doubles on both
    engines make the exact-distance ordering engine-stable)."""
    f = fixes(spark, sf_dir)
    d = _dist(F.col("x"), F.col("y"), F.lit(50.0), F.lit(50.0))
    return (
        f.select("event_id", "obj_id", d.alias("d"))
        .orderBy("d", "event_id")
        .limit(10)
        .select("event_id", "obj_id", F.round("d", 6).alias("dist"))
    )


@register(
    "i5_grid_hotspots",
    oracle=(
        FIXES_CTE + " SELECT CAST(floor(x / 10.0) AS INT) AS cell_x, "
        "CAST(floor(y / 10.0) AS INT) AS cell_y, COUNT(*) AS n_fixes, "
        "COUNT(DISTINCT obj_id) AS n_objects FROM fixes GROUP BY 1, 2"
    ),
    section="I5",
)
def i5_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid binning — STARK's partitioner made visible as a cell
    aggregate (density/hotspot map)."""
    f = fixes(spark, sf_dir)
    return (
        f.groupBy(
            F.floor(F.col("x") / 10.0).cast("int").alias("cell_x"),
            F.floor(F.col("y") / 10.0).cast("int").alias("cell_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_fixes"), F.countDistinct("obj_id").alias("n_objects"))
    )


_DB_EPS = 0.8
_DB_MINPTS = 5
# Cell width trades halo replication (shrinks with bigger cells)
# against the O(n_cell²) local kernels (shrink with smaller cells);
# must stay ≥ ε. 4.0 ≈ 5ε keeps replication < 2× while cutting local
# pairwise work ~3× vs 10.0 on uniform density.
_DB_CELL = 4.0


@register("i6_dbscan", oracle=None, section="I6")
def i6_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dbscan(spark, sf_dir, _DB_EPS, _DB_MINPTS, _DB_CELL)


def dbscan(
    spark: SparkSession,
    sf_dir: str,
    eps: float = _DB_EPS,
    min_pts: int = _DB_MINPTS,
    cell: float = _DB_CELL,
) -> DataFrame:
    """Distributed DBSCAN (STARK's integrated clustering, rebuilt on
    the DataFrame + applyInPandas stack):

    1. cut the plane into S×S cells; replicate each point into every
       neighbor cell whose ε-padded region contains it (halo);
    2. per-cell local DBSCAN in a pandas UDF (numpy BFS) — a home
       point's full ε-neighborhood is inside the padded cell, so home
       core flags are globally exact;
    3. cross-cell core-core ε-pairs (grid join) become cluster-merge
       edges; union-find over the edge list runs on the driver —
       state is O(#local clusters), NOT O(points), the one sanctioned
       driver-side structure (SURVEY §7.4).

    Returns (event_id, cluster, is_core); noise rows carry NULL.
    rows-only check: cluster ids aren't ANSI-SQL-expressible.
    """
    import pandas as pd

    f = fixes(spark, sf_dir).select("event_id", "x", "y")
    home = f.withColumn("cx", F.floor(F.col("x") / cell)).withColumn(
        "cy", F.floor(F.col("y") / cell)
    )
    padded = (
        home.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "event_id", "x", "y",
            (F.col("cx") + F.col("dx")).alias("tcx"),
            (F.col("cy") + F.col("dy")).alias("tcy"),
            ((F.col("dx") == 0) & (F.col("dy") == 0)).alias("is_home"),
        )
        # keep a replica only if the point sits inside the target
        # cell's ε-padded bounding box
        .filter(
            (F.col("x") >= F.col("tcx") * cell - eps)
            & (F.col("x") < (F.col("tcx") + 1) * cell + eps)
            & (F.col("y") >= F.col("tcy") * cell - eps)
            & (F.col("y") < (F.col("tcy") + 1) * cell + eps)
        )
    )

    def local_dbscan(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        xy = pdf[["x", "y"]].to_numpy()
        n = len(pdf)
        # pairwise ε-neighborhood (padded cell is small by construction)
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
        neigh = d2 <= eps * eps
        degree = neigh.sum(axis=1)  # includes self
        core = degree >= min_pts
        labels = np.full(n, -1, dtype=np.int64)
        cid = 0
        for i in range(n):
            if not core[i] or labels[i] != -1:
                continue
            # BFS through core points
            stack = [i]
            labels[i] = cid
            while stack:
                j = stack.pop()
                if not core[j]:
                    continue
                for k in np.nonzero(neigh[j])[0]:
                    if labels[k] == -1:
                        labels[k] = cid
                        stack.append(int(k))
            cid += 1
        kx, ky = key
        out = pdf[pdf["is_home"]].copy()
        idx = pdf.index.get_indexer(out.index)
        out_labels = labels[idx]
        out_core = core[idx]
        out["is_core"] = out_core
        out["local_cid"] = [
            f"{kx}:{ky}:{l}" if l >= 0 else None for l in out_labels
        ]
        return out[["event_id", "is_core", "local_cid"]]

    local = padded.groupBy("tcx", "tcy").applyInPandas(
        local_dbscan, "event_id BIGINT, is_core BOOLEAN, local_cid STRING"
    )

    # Cross-cell merge edges: ε-pairs of global cores in different cells.
    core_pts = local.filter(F.col("is_core")).join(f, "event_id").select(
        "event_id", "local_cid", "x", "y"
    )
    ecx, ecy = F.floor(F.col("x") / eps), F.floor(F.col("y") / eps)
    chome = core_pts.withColumn("ecx", ecx).withColumn("ecy", ecy)
    cprobe = (
        chome.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("event_id").alias("a_id"), F.col("local_cid").alias("cid_a"),
            F.col("x").alias("ax"), F.col("y").alias("ay"),
            (F.col("ecx") + F.col("dx")).alias("ecx"), (F.col("ecy") + F.col("dy")).alias("ecy"),
        )
    )
    cbuild = chome.select(
        F.col("event_id").alias("b_id"), F.col("local_cid").alias("cid_b"),
        F.col("x").alias("bx"), F.col("y").alias("by"), "ecx", "ecy",
    )
    d = _dist(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    edges = (
        cprobe.join(cbuild, ["ecx", "ecy"])
        .filter((F.col("a_id") < F.col("b_id")) & (d <= eps) & (F.col("cid_a") != F.col("cid_b")))
        .select("cid_a", "cid_b")
        .distinct()
    )

    # Driver union-find over the (tiny) cluster graph.
    parent: dict[str, str] = {}

    def find(u: str) -> str:
        while parent.setdefault(u, u) != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for ca, cb in edges.collect():
        ra, rb = find(ca), find(cb)
        if ra != rb:
            # deterministic: smaller string wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    roots = {c: find(c) for c in list(parent)}
    mapping = spark.createDataFrame(
        list(roots.items()) or [("__none__", "__none__")], "local_cid STRING, cluster STRING"
    )
    return (
        local.join(F.broadcast(mapping), "local_cid", "left")
        .withColumn("cluster", F.coalesce("cluster", "local_cid"))
        .select("event_id", "cluster", "is_core")
    )


@register(
    "i7_trajectory_stats",
    oracle=(
        FIXES_CTE + ", hops AS ("
        "  SELECT obj_id, ts, event_id, x, y, "
        "  lag(x) OVER w AS px, lag(y) OVER w AS py "
        "  FROM fixes WINDOW w AS (PARTITION BY obj_id ORDER BY ts, event_id)) "
        "SELECT obj_id, COUNT(*) AS n_fixes, MIN(ts) AS t_start, MAX(ts) AS t_end, "
        "min_by(x, event_id) AS start_x, "
        "ROUND(COALESCE(SUM(sqrt((x-px)*(x-px) + (y-py)*(y-py))), 0.0), 4) AS path_len "
        "FROM hops GROUP BY obj_id"
    ),
    section="I7",
)
def i7_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory construction: per-object time-ordered fix sequence
    (the Window/lag form — at scale this is one shuffle on obj_id and
    a within-partition sort, identical to the array-build form but
    streaming-friendly)."""
    f = fixes(spark, sf_dir)
    w = Window.partitionBy("obj_id").orderBy("ts", "event_id")
    hops = f.select(
        "obj_id", "ts", "event_id", "x", "y",
        F.lag("x").over(w).alias("px"), F.lag("y").over(w).alias("py"),
    )
    seg = _dist(F.col("x"), F.col("y"), F.col("px"), F.col("py"))
    return hops.groupBy("obj_id").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.expr("min_by(x, event_id)").alias("start_x"),
        F.round(F.coalesce(F.sum(seg), F.lit(0.0)), 4).alias("path_len"),
    )


_TRIP_JUMP = 5.0


@register(
    "i8_trip_segmentation",
    oracle=(
        FIXES_CTE + ", hops AS ("
        "  SELECT obj_id, ts, event_id, x, y, lag(x) OVER w AS px, lag(y) OVER w AS py "
        "  FROM fixes WINDOW w AS (PARTITION BY obj_id ORDER BY ts, event_id)), "
        "flagged AS ("
        "  SELECT *, CASE WHEN px IS NULL OR "
        f"  sqrt((x-px)*(x-px) + (y-py)*(y-py)) > {_TRIP_JUMP} THEN 1 ELSE 0 END AS new_trip "
        "  FROM hops), "
        "trips AS (SELECT obj_id, ts, event_id, x, y, "
        "  SUM(new_trip) OVER (PARTITION BY obj_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id FROM flagged) "
        "SELECT obj_id, CAST(trip_id AS BIGINT) AS trip_id, COUNT(*) AS n_fixes, "
        "MIN(ts) AS trip_start, MAX(ts) AS trip_end "
        "FROM trips GROUP BY obj_id, trip_id"
    ),
    section="I8",
)
def i8_trip_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop/trip segmentation: a spatial jump > τ between consecutive
    fixes starts a new trip (E8's sessionization pattern on distance
    instead of time — the STARK stop-detection shape)."""
    f = fixes(spark, sf_dir)
    w = Window.partitionBy("obj_id").orderBy("ts", "event_id")
    hops = f.select(
        "obj_id", "ts", "event_id", "x", "y",
        F.lag("x").over(w).alias("px"), F.lag("y").over(w).alias("py"),
    )
    jump = _dist(F.col("x"), F.col("y"), F.col("px"), F.col("py"))
    flagged = hops.withColumn(
        "new_trip", F.when(F.col("px").isNull() | (jump > _TRIP_JUMP), 1).otherwise(0)
    )
    trips = flagged.withColumn(
        "trip_id",
        F.sum("new_trip").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return trips.groupBy("obj_id", "trip_id").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.min("ts").alias("trip_start"),
        F.max("ts").alias("trip_end"),
    )


@register(
    "i9_speed_heading",
    oracle=(
        FIXES_CTE + ", hops AS ("
        "  SELECT obj_id, ts, event_id, x, y, "
        "  lag(x) OVER w AS px, lag(y) OVER w AS py, lag(ts) OVER w AS pts "
        "  FROM fixes WINDOW w AS (PARTITION BY obj_id ORDER BY ts, event_id)) "
        "SELECT obj_id, event_id, ts, "
        "CASE WHEN pts IS NOT NULL AND epoch_ms(ts) > epoch_ms(pts) THEN "
        "  ROUND(sqrt((x-px)*(x-px) + (y-py)*(y-py)) / "
        "        (CAST(epoch_ms(ts) - epoch_ms(pts) AS DOUBLE) / 1000.0), 6) END AS speed, "
        "CASE WHEN px IS NOT NULL THEN ROUND(atan2(y - py, x - px), 6) END AS heading "
        "FROM hops"
    ),
    section="I9",
)
def i9_speed_heading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fix speed (units/s over ms-precision Δt) and heading
    (atan2); NULL on the first fix or zero Δt — guarded identically on
    both engines."""
    f = fixes(spark, sf_dir)
    w = Window.partitionBy("obj_id").orderBy("ts", "event_id")
    hops = f.select(
        "obj_id", "event_id", "ts", "x", "y",
        F.lag("x").over(w).alias("px"), F.lag("y").over(w).alias("py"),
        F.lag("ts").over(w).alias("pts"),
    )
    dt_ms = (F.unix_millis("ts") - F.unix_millis("pts")).cast("double")
    speed = F.round(
        _dist(F.col("x"), F.col("y"), F.col("px"), F.col("py")) / (dt_ms / 1000.0), 6
    )
    return hops.select(
        "obj_id",
        "event_id",
        "ts",
        F.when(F.col("pts").isNotNull() & (dt_ms > 0), speed).alias("speed"),
        F.when(F.col("px").isNotNull(), F.round(F.atan2(F.col("y") - F.col("py"), F.col("x") - F.col("px")), 6)).alias("heading"),
    )


@register(
    "i10_od_matrix",
    oracle=(
        FIXES_CTE + ", hops AS ("
        "  SELECT obj_id, ts, event_id, x, y, lag(x) OVER w AS px, lag(y) OVER w AS py "
        "  FROM fixes WINDOW w AS (PARTITION BY obj_id ORDER BY ts, event_id)), "
        "flagged AS (SELECT *, CASE WHEN px IS NULL OR "
        f"  sqrt((x-px)*(x-px) + (y-py)*(y-py)) > {_TRIP_JUMP} THEN 1 ELSE 0 END AS new_trip FROM hops), "
        "trips AS (SELECT obj_id, ts, event_id, x, y, "
        "  SUM(new_trip) OVER (PARTITION BY obj_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id FROM flagged), "
        "od AS (SELECT obj_id, trip_id, "
        "  CAST(floor(min_by(x, event_id) / 20.0) AS INT) AS o_cell_x, "
        "  CAST(floor(min_by(y, event_id) / 20.0) AS INT) AS o_cell_y, "
        "  CAST(floor(max_by(x, event_id) / 20.0) AS INT) AS d_cell_x, "
        "  CAST(floor(max_by(y, event_id) / 20.0) AS INT) AS d_cell_y "
        "  FROM trips GROUP BY obj_id, trip_id) "
        "SELECT o_cell_x, o_cell_y, d_cell_x, d_cell_y, COUNT(*) AS n_trips "
        "FROM od GROUP BY 1, 2, 3, 4"
    ),
    section="I10",
)
def i10_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin–destination matrix: an endpoint fix per trip (I8) binned
    to 20-unit cells, counted per (O, D) pair. Endpoints are keyed by
    min/max of the unique event_id — deterministic on both engines
    (and temporally faithful when ids follow arrival order)."""
    f = fixes(spark, sf_dir)
    w = Window.partitionBy("obj_id").orderBy("ts", "event_id")
    hops = f.select(
        "obj_id", "ts", "event_id", "x", "y",
        F.lag("x").over(w).alias("px"), F.lag("y").over(w).alias("py"),
    )
    jump = _dist(F.col("x"), F.col("y"), F.col("px"), F.col("py"))
    trips = hops.withColumn(
        "new_trip", F.when(F.col("px").isNull() | (jump > _TRIP_JUMP), 1).otherwise(0)
    ).withColumn(
        "trip_id",
        F.sum("new_trip").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    od = trips.groupBy("obj_id", "trip_id").agg(
        F.floor(F.expr("min_by(x, event_id)") / 20.0).cast("int").alias("o_cell_x"),
        F.floor(F.expr("min_by(y, event_id)") / 20.0).cast("int").alias("o_cell_y"),
        F.floor(F.expr("max_by(x, event_id)") / 20.0).cast("int").alias("d_cell_x"),
        F.floor(F.expr("max_by(y, event_id)") / 20.0).cast("int").alias("d_cell_y"),
    )
    return od.groupBy("o_cell_x", "o_cell_y", "d_cell_x", "d_cell_y").agg(
        F.count(F.lit(1)).alias("n_trips")
    )


@register(
    "i11_trajectory_similarity",
    oracle=(
        FIXES_CTE + ", cells AS ("
        "  SELECT obj_id, list_sort(list_distinct(list(CAST(floor(x/2.0) AS BIGINT) * 100 "
        "    + CAST(floor(y/2.0) AS BIGINT)))) AS visited "
        "  FROM fixes GROUP BY obj_id) "
        "SELECT a.obj_id AS obj_a, b.obj_id AS obj_b, "
        "ROUND(CAST(len(list_intersect(a.visited, b.visited)) AS DOUBLE) / "
        "      len(list_distinct(flatten([a.visited, b.visited]))), 6) AS jaccard "
        "FROM cells a JOIN cells b ON a.obj_id <> b.obj_id "
        "WHERE len(list_intersect(a.visited, b.visited)) > 0 "
        "QUALIFY row_number() OVER (PARTITION BY a.obj_id ORDER BY jaccard DESC, b.obj_id) <= 3"
    ),
    section="I11",
)
def i11_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 similar trajectories per object by visited-cell Jaccard
    (jaccard > 0 — zero-overlap objects are not "similar"), via the
    INVERTED-INDEX set-similarity join: explode each trajectory's cell
    set, equi-join on cell, count co-visits per pair, then
    jaccard = inter / (|a| + |b| − inter). Candidate pairs are exactly
    the co-visiting ones — never the O(n²) all-pairs — and every step
    is a shuffle-compatible equi-join/groupBy, so it scales to millions
    of objects where a broadcast all-pairs cannot. The oracle is the
    brute-force all-pairs form, proving the index loses no pairs.
    At 100 TB: stop-cell skew (depots) is the hazard — cap or drop
    ultra-high-document-frequency cells (IDF pruning), or AQE skew
    splits the hot cell partitions."""
    f = fixes(spark, sf_dir)
    cell = (F.floor(F.col("x") / 2.0).cast("bigint") * 100 + F.floor(F.col("y") / 2.0).cast("bigint"))
    oc = f.select("obj_id", cell.alias("cell")).distinct()
    sizes = oc.groupBy("obj_id").agg(F.count(F.lit(1)).alias("sz"))
    # Undirected co-visit counts (a < b), symmetrized after the agg so
    # the heavy shuffle handles each pair once.
    half = (
        oc.alias("a")
        .join(oc.alias("b"), "cell")
        .filter(F.col("a.obj_id") < F.col("b.obj_id"))
        .groupBy(F.col("a.obj_id").alias("obj_a"), F.col("b.obj_id").alias("obj_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pairs = half.unionByName(
        half.select(
            F.col("obj_b").alias("obj_a"), F.col("obj_a").alias("obj_b"), "inter"
        )
    )
    sa = sizes.select(F.col("obj_id").alias("obj_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("obj_id").alias("obj_b"), F.col("sz").alias("szb"))
    jac = F.round(
        F.col("inter").cast("double") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
    )
    scored = (
        pairs.join(F.broadcast(sa), "obj_a")
        .join(F.broadcast(sb), "obj_b")
        .select("obj_a", "obj_b", jac.alias("jaccard"))
    )
    w = Window.partitionBy("obj_a").orderBy(F.col("jaccard").desc(), "obj_b")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")
