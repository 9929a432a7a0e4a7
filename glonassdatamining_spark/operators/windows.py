"""§2.E — window functions.

Every window shuffles once on its partition key then sorts within the
partition — the same cost model at any scale, provided partitions fit
in executor memory (events partition by user_id: fine; a global
no-partition window would NOT scale and none is declared except the
tiny E6 demo over customers — bounded by table size there).

Determinism: every ORDER BY carries a unique tie-break key
(SURVEY §5.3.3), so rank/offset/frame results can't depend on engine
sort stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load
from glonassdatamining_spark.stable import EVENTS_CTE, dec, ts_ms


@register(
    "e1_ranking",
    oracle=(
        "SELECT c_custkey, c_nationkey, "
        "row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn, "
        "rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk, "
        "dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk, "
        "ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile "
        "FROM customer"
    ),
    section="E1",
)
def e1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    unique_order = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    tie_order = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(unique_order).alias("rn"),
        F.rank().over(tie_order).alias("rnk"),
        F.dense_rank().over(tie_order).alias("drnk"),
        F.ntile(4).over(unique_order).alias("quartile"),
    )


@register(
    "e2_lag_lead",
    oracle=(
        EVENTS_CTE + " SELECT event_id, user_id, ts, value, "
        "lag(value) OVER w AS prev_value, "
        "lead(value, 1, -1.0) OVER w AS next_value "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    section="E2",
)
def e2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value", 1, -1.0).over(w).alias("next_value"),
    )


@register(
    "e3_running_agg",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend, "
        "COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders "
        "FROM orders"
    ),
    section="E3",
)
def e3_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregates (ROWS frame). Decimal-exact running sums:
    every prefix sum is exact, so the double projections match."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


@register(
    "e4_range_frame",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) "
        "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS orders_30d, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER ("
        "PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) "
        "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d "
        "FROM orders"
    ),
    section="E4",
)
def e4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day (value-range) frame over the epoch-seconds
    ordering column — the standard moving-window-by-time shape."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


@register(
    "e5_frame_positional",
    oracle=(
        "SELECT s_suppkey, s_nationkey, "
        "first_value(s_name) OVER w AS first_name, "
        "last_value(s_name) OVER w AS last_name, "
        "nth_value(s_name, 2) OVER w AS second_name "
        "FROM supplier WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    section="E5",
)
def e5_frame_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("first_name"),
        F.last("s_name").over(w).alias("last_name"),
        F.nth_value("s_name", 2).over(w).alias("second_name"),
    )


@register(
    "e6_distribution",
    oracle=(
        "SELECT c_custkey, "
        "ROUND(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 9) AS pr, "
        "ROUND(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 9) AS cd "
        "FROM customer"
    ),
    section="E6",
)
def e6_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-window demo (percent_rank/cume_dist). A partition-less
    window serializes into ONE task — acceptable only because customer
    is a dimension table; never declared over fact tables."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )


@register(
    "e7_topk_per_group",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) <= 3"
    ),
    section="E7",
)
def e7_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark pushes a per-partition rank
    limit (WindowGroupLimit) before the shuffle — near-map-side top-k."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


_GAP_S = 14400  # 4-hour inactivity gap → new session


@register(
    "e8_sessionization",
    oracle=(
        EVENTS_CTE + ", flagged AS ("
        "  SELECT user_id, ts, event_id, "
        "  CASE WHEN lag(ts) OVER w IS NULL "
        f"       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {_GAP_S * 1000} "
        "       THEN 1 ELSE 0 END AS new_session "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sessions AS ("
        "  SELECT user_id, ts, "
        "  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id "
        "  FROM flagged) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
        "COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end "
        "FROM sessions GROUP BY user_id, session_id"
    ),
    section="E8",
)
def e8_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (GLONASS stop/trip detection shape,
    LLM-pipeline user sessions): flag gap > τ via lag, running-sum the
    flags into session ids, aggregate per session. Two windows + one
    groupBy, all on the same user_id partitioning — Spark reuses the
    shuffle across all three (single exchange in the plan).
    Kernel: ``api.sessionize`` (the public parameterized form)."""
    from glonassdatamining_spark.api import sessionize

    ev = load(spark, sf_dir, "events")
    sessions = sessionize(ev, "user_id", "ts", _GAP_S, tiebreak=("event_id",))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "e9_funnel_detection",
    oracle=(
        EVENTS_CTE + ", w1 AS ("
        "  SELECT user_id, event_type, ts, "
        "  MIN(CASE WHEN event_type = 'signup' THEN ts END) "
        "    OVER (PARTITION BY user_id) AS s FROM events), "
        "w2 AS ("
        "  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > s THEN ts END) "
        "    OVER (PARTITION BY user_id) AS c FROM w1), "
        "w3 AS ("
        "  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END) "
        "    OVER (PARTITION BY user_id) AS p FROM w2) "
        "SELECT DISTINCT user_id, s AS signup_ts, c AS click_ts, p AS purchase_ts, "
        "CASE WHEN p IS NOT NULL THEN 3 WHEN c IS NOT NULL THEN 2 "
        "WHEN s IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth FROM w3"
    ),
    section="E9",
)
def e9_funnel_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel detection per user: first signup, first click
    AFTER that signup, first purchase AFTER that click (the sequel
    query MATCH_RECOGNIZE answers in other engines, here as three
    chained conditional-min windows). All three windows partition by
    user_id, so Spark plans ONE exchange with a WindowExec chain —
    funnel analysis at 100 TB costs a single shuffle of the events."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    df = ev.withColumn("s", s)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("s")), F.col("ts"))
    ).over(w)
    df = df.withColumn("c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c")), F.col("ts")
        )
    ).over(w)
    df = df.withColumn("p", p)
    return df.select(
        "user_id",
        F.col("s").alias("signup_ts"),
        F.col("c").alias("click_ts"),
        F.col("p").alias("purchase_ts"),
        F.when(F.col("p").isNotNull(), 3)
        .when(F.col("c").isNotNull(), 2)
        .when(F.col("s").isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_depth"),
    ).distinct()


@register(
    "e10_time_weighted_avg",
    oracle=(
        EVENTS_CTE + ", seg AS ("
        "  SELECT user_id, value, "
        "  epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) "
        "    - epoch_ms(ts) AS dt_ms FROM events) "
        "SELECT user_id, "
        "ROUND(CAST(SUM(CAST(value * dt_ms AS DECIMAL(28,6))) AS DOUBLE) "
        "  / SUM(dt_ms), 6) AS twa_value, "
        "CAST(SUM(dt_ms) AS BIGINT) AS total_ms "
        "FROM seg WHERE dt_ms IS NOT NULL GROUP BY user_id"
    ),
    section="E10",
)
def e10_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the timeseries-store ``time_weight``
    aggregate): each observation holds until the next one, so its
    weight is the segment duration — sum(value·dt)/sum(dt) per user.
    One user_id exchange total: the lead() window and the groupBy
    share the same partitioning, so Catalyst reuses the shuffle.
    Segment products go through exact DECIMAL (stable.dsum
    discipline) to make the sum order-insensitive."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias("dt_ms"),
    ).filter(F.col("dt_ms").isNotNull())
    return seg.groupBy("user_id").agg(
        F.round(
            F.sum(dec(F.col("value") * F.col("dt_ms"))).cast("double") / F.sum("dt_ms"), 6
        ).alias("twa_value"),
        F.sum("dt_ms").alias("total_ms"),
    )


@register("e11_ewma_smoothing", oracle=None, section="E11")
def e11_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of each user's value series (α=0.3) — the
    standard time-series denoise before anomaly thresholds. The
    recursion is sequential per key, so it runs as ONE grouped-map
    exchange on user_id (``api.ewma``); rows-only check (recursive FP
    fixpoint), recursion unit-tested in tests/test_api.py. Output
    rounded to 6dp for display stability."""
    from glonassdatamining_spark.api import ewma

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = ewma(ev, "user_id", "ts", "value", alpha=0.3, tiebreak="event_id")
    return out.select(
        "user_id", "event_id", F.round("ewma", 6).alias("ewma_value")
    )


@register(
    "e12_cumulative_uniques",
    oracle=(
        EVENTS_CTE + ", first AS ("
        "  SELECT user_id, MIN(date_trunc('day', ts)) AS first_day "
        "  FROM events GROUP BY user_id) "
        "SELECT first_day AS day, COUNT(*) AS new_users, "
        "CAST(SUM(COUNT(*)) OVER (ORDER BY first_day) AS BIGINT) AS cum_users "
        "FROM first GROUP BY first_day"
    ),
    section="E12",
)
def e12_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time (round-1 addition) — the
    growth-curve metric. COUNT(DISTINCT) OVER a running frame is
    unsupported (and quadratic) in both engines; the scalable identity
    is: distinct-so-far = Σ first-appearances — one agg to each
    user's first day, one agg per day, one tiny running window over
    the day series. At 100 TB the heavy shuffle is the per-user MIN;
    the day-level frames are calendar-sized."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    daily = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@register(
    "e13_ratio_to_report",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, "
        "o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) "
        "     OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS share_of_status, "
        "o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) "
        "     OVER () AS DOUBLE) AS share_of_all "
        "FROM orders WHERE o_orderkey % 50 = 0"
    ),
    section="E13",
)
def e13_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report (round-1 addition): each row's share of its
    group total and of the grand total — the BI percent-of-total
    window. Denominators are decimal-exact window sums (order-
    insensitive), the shares one decimal division cast to double —
    bit-identical across engines. Unbounded frames mean O(1) state;
    the empty-partition global window is the one scale hazard —
    at 100 TB compute the grand total as a scalar agg + broadcast
    instead (the l4 pattern)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    dec_price = F.col("o_totalprice").cast("decimal(28,6)")
    w_status = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    # Divide DOUBLES: decimal/decimal carries engine-specific result
    # scales (Spark truncates to the derived scale, DuckDB differs) —
    # double numerator / decimal-exact-sum-as-double is one IEEE op.
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") / F.sum(dec_price).over(w_status).cast("double")).alias("share_of_status"),
        (F.col("o_totalprice") / F.sum(dec_price).over(w_all).cast("double")).alias("share_of_all"),
    )


_E9B_STEPS = ("signup", "view", "click", "purchase")


def _e9b_oracle() -> str:
    """DuckDB CTE chain mirroring api.funnel's chained conditional-min
    windows, generated from the same step list (one source of truth)."""
    ctes, prev = [], None
    for i, step in enumerate(_E9B_STEPS):
        cond = f"event_type = '{step}'" + (f" AND ts > s{i}" if prev else "")
        src = f"w{i}" if prev else "events"
        ctes.append(
            f"w{i + 1} AS (SELECT *, MIN(CASE WHEN {cond} THEN ts END) "
            f"OVER (PARTITION BY user_id) AS s{i + 1} FROM {src})"
        )
        prev = f"s{i + 1}"
    n = len(_E9B_STEPS)
    depth = "CASE " + " ".join(
        f"WHEN s{i} IS NOT NULL THEN {i}" for i in range(n, 0, -1)
    ) + " ELSE 0 END"
    steps_sel = ", ".join(f"s{i + 1} AS step{i + 1}_ts" for i in range(n))
    return (
        EVENTS_CTE + ", " + ", ".join(ctes)
        + f" SELECT DISTINCT user_id, {steps_sel}, {depth} AS funnel_depth FROM w{n}"
    )


@register("e9b_funnel_pattern", oracle=_e9b_oracle(), section="E9b")
def e9b_funnel_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized N-step sequence-pattern funnel (round-2 addition:
    the MATCH_RECOGNIZE generalization of e9's hard-coded 3 steps) via
    the public ``api.funnel`` kernel — 4 ordered steps
    signup → view → click → purchase, still ONE shuffle on user_id
    regardless of step count (N chained conditional-min windows over
    the same partition key share one exchange)."""
    from glonassdatamining_spark.api import funnel

    ev = load(spark, sf_dir, "events")
    return funnel(ev, "user_id", "event_type", "ts", list(_E9B_STEPS))


_E14_PATTERN = "vc*p"  # view, any clicks, then purchase


@register(
    "e14_sequence_pattern",
    oracle=(
        EVENTS_CTE + ", seq AS ("
        "  SELECT user_id, COUNT(*) AS n_events, "
        "  string_agg(left(event_type, 1), '' ORDER BY ts, event_id) AS s "
        "  FROM events GROUP BY user_id) "
        "SELECT user_id, n_events, "
        f"CAST(len(regexp_extract_all(s, '{_E14_PATTERN}')) AS BIGINT) "
        "AS n_patterns "
        f"FROM seq WHERE len(regexp_extract_all(s, '{_E14_PATTERN}')) >= 1"
    ),
    section="E14",
)
def e14_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-over-rows sequence matching (round-2 addition) — the
    MATCH_RECOGNIZE generalization of e9/e9b: each user's time-ordered
    event-type initials collapse into one string, and an arbitrary
    REGULAR EXPRESSION counts non-overlapping behavioral patterns
    (here `vc*p`: view, any clicks, then purchase). Any
    MATCH_RECOGNIZE pattern over a bounded alphabet compiles to this
    shape. One shuffle on user_id (the sorted collect), then the scan
    is a codegen'd JVM regexp — no per-row state machine. Per-user
    sequences are memory-bounded by the group; at 100 TB sessionize
    first (e8) so strings stay short. Both engines use leftmost
    non-overlapping matching, and the collect order carries the unique
    (ts, event_id) tie-break, so counts are hash-identical."""
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                        )
                    ),
                    lambda s: s.getField("c"),
                ),
            ).alias("s"),
        )
    )
    n_pat = F.regexp_count("s", F.lit(_E14_PATTERN))
    return seq.filter(n_pat >= 1).select(
        "user_id", "n_events", n_pat.alias("n_patterns")
    )


_Z_WIN = 20


@register(
    "e15_rolling_zscore",
    oracle=(
        EVENTS_CTE + ", s AS ("
        "  SELECT user_id, event_id, value, "
        "  row_number() OVER w AS rn, "
        f" avg(value) OVER (w ROWS BETWEEN {_Z_WIN} PRECEDING AND 1 PRECEDING) AS mu, "
        f" stddev_samp(value) OVER (w ROWS BETWEEN {_Z_WIN} PRECEDING AND 1 PRECEDING) AS sd "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT user_id, event_id, "
        "ROUND((value - mu) / sd, 3) AS z "
        f"FROM s WHERE rn > {_Z_WIN} AND sd > 1e-9"
    ),
    section="E15",
)
def e15_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (round-2 addition) — the
    monitoring primitive: each event's value standardized against its
    OWN user's trailing-20-event window (strictly preceding, so the
    tested point never contaminates its baseline). Returns
    (user_id, event_id, z) for rows with a full window.

    One shuffle on user_id; all three frame aggregates (count proxy
    via row_number, mean, sample stddev) share the single sorted
    window family. The z quotient rounds to 3 dp — the d7 discipline:
    frame aggregation order is identical in both engines (same rows,
    same order), rounding grids out last-ulp noise. The sd floor
    avoids the 0/0 of constant windows."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-_Z_WIN, -1)
    s = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.avg("value").over(wf).alias("mu"),
        F.stddev_samp("value").over(wf).alias("sd"),
    )
    return (
        s.filter((F.col("rn") > _Z_WIN) & (F.col("sd") > 1e-9))
        .select(
            "user_id",
            "event_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 3).alias("z"),
        )
    )


@register(
    "e16_activity_streaks",
    oracle=(
        EVENTS_CTE
        + ", days AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d "
        "FROM events), "
        "isl AS (SELECT user_id, d, "
        "date_diff('day', DATE '1970-01-01', d) "
        "- row_number() OVER (PARTITION BY user_id ORDER BY d) AS island "
        "FROM days), "
        "runs AS (SELECT user_id, island, COUNT(*) AS len FROM isl "
        "GROUP BY user_id, island) "
        "SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak, "
        "CAST(SUM(len) AS BIGINT) AS n_active_days "
        "FROM runs GROUP BY user_id"
    ),
    section="E16",
)
def e16_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (round-3
    addition): the gaps-and-islands pattern — distinct active days,
    island key = epoch-day − row_number (constant within a consecutive
    run), run lengths, max per user. Retention analytics canon. One
    user_id window shuffle reused by the two follow-up aggregates;
    integer day arithmetic on both engines, no timezone hazard (UTC
    sessions, date_trunc to day)."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("n_active_days"),
    )


@register(
    "e17_retention_cohorts",
    oracle=(
        EVENTS_CTE
        + ", weeks AS (SELECT user_id, date_trunc('week', ts) AS wk "
        "FROM events), "
        "cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id) "
        "SELECT c.cohort_wk AS cohort_week, "
        "CAST(date_diff('day', c.cohort_wk, w.wk) / 7 AS BIGINT) AS week_offset, "
        "CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active "
        "FROM weeks w JOIN cohorts c USING (user_id) "
        "GROUP BY 1, 2"
    ),
    section="E17",
)
def e17_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix (round-3 addition): each user's
    cohort = the ISO week of their first event; cell (cohort_week,
    week_offset) counts distinct users from that cohort active that
    many weeks later — THE retention dashboard behind every product
    analytics tool. Two shuffles total: distinct (user, week) pairs,
    then the cohort week as a per-user window MIN (no join, no
    broadcast of a per-user table — users grow with the corpus); the
    final cell count is O(cohorts·weeks) regardless of event volume,
    so at 100 TB the heavy lifting is the first map-side-combinable
    distinct. Monday-start date_trunc('week') matches across both
    engines under the UTC session. Both sides emit the truncated
    week as a TIMESTAMP (never DATE) per the repo's date-bucketing
    discipline — DuckDB's fetchdf materializes DATE columns as
    datetime64, so a DATE output hash-mismatches by dtype alone."""
    ev = load(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id")
    return (
        weeks.withColumn("cohort_wk", F.min("wk").over(w))
        .groupBy(
            F.col("cohort_wk").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )


@register(
    "e18_rfm_segments",
    oracle=(
        "WITH cust AS (SELECT o_custkey, "
        "date_diff('day', max(o_orderdate), TIMESTAMP '2026-01-01') AS r, "
        "CAST(COUNT(*) AS DOUBLE) AS f, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m, "
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_dec "
        "FROM orders GROUP BY o_custkey), "
        "cuts AS (SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rc, "
        "quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fc, "
        "quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mc FROM cust), "
        "seg AS (SELECT "
        "1 + len(list_filter(c.rc, b -> cust.r > b)) AS r_quintile, "
        "1 + len(list_filter(c.fc, b -> cust.f > b)) AS f_quintile, "
        "1 + len(list_filter(c.mc, b -> cust.m > b)) AS m_quintile, "
        "cust.m_dec FROM cust, cuts c) "
        "SELECT CAST(r_quintile AS INT) AS r_quintile, "
        "CAST(f_quintile AS INT) AS f_quintile, "
        "CAST(m_quintile AS INT) AS m_quintile, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND(CAST(SUM(m_dec) AS DOUBLE), 2) AS monetary_total "
        "FROM seg GROUP BY 1, 2, 3"
    ),
    section="E18",
)
def e18_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (round-4 addition): per customer
    Recency (days from a fixed anchor past the data horizon),
    Frequency (order count), Monetary (decimal-exact total spend),
    each bucketed into quintiles — the classic CRM segmentation grid.

    Scale design: quintile assignment rides EXACT interpolated
    percentile cutoffs (one 4-value scalar row, broadcast) + a strict
    ``value > cutoff`` count — NOT a global ``ntile`` window, which
    would serialize every customer through a single task at 10⁸
    customers. Per-customer monetary sums ride DECIMAL(18,2) so
    cross-engine accumulation order can't skew a cent; the cutoffs are
    the standard (1−g)·x⌊i⌋ + g·x⌈i⌉ interpolation, bit-identical in
    both engines on identical sorted inputs."""
    o = load(spark, sf_dir, "orders")
    anchor = F.lit("2026-01-01").cast("timestamp")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max("o_orderdate")).cast("double").alias("r"),
        F.count(F.lit(1)).cast("double").alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m_dec"),
    ).withColumn("m", F.col("m_dec").cast("double"))
    probs = F.lit([0.2, 0.4, 0.6, 0.8])
    cuts = cust.agg(
        F.percentile("r", probs).alias("rc"),
        F.percentile("f", probs).alias("fc"),
        F.percentile("m", probs).alias("mc"),
    )

    def quintile(v: str, cutcol: str):
        return (
            F.lit(1)
            + F.size(F.filter(F.col(cutcol), lambda b: F.col(v) > b))
        ).cast("int")

    seg = cust.join(F.broadcast(cuts)).select(
        quintile("r", "rc").alias("r_quintile"),
        quintile("f", "fc").alias("f_quintile"),
        quintile("m", "mc").alias("m_quintile"),
        "m_dec",
    )
    return seg.groupBy("r_quintile", "f_quintile", "m_quintile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("m_dec").cast("double"), 2).alias("monetary_total"),
    )


# Shared by the E19–E22 time-series tier: the daily-count series per
# event type — ONE map-side-combinable rollup shuffle; every detector
# below runs over this tiny types×days frame.
_DAILY_SQL = (
    ", daily AS (SELECT event_type, date_trunc('day', ts) AS d, "
    "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2)"
)


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


@register(
    "e19_mean_shift_changepoint",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", "
        "cum AS (SELECT event_type, d, cnt, "
        "ROW_NUMBER() OVER w AS i, "
        "CAST(SUM(cnt) OVER w AS BIGINT) AS c, "
        "CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot, "
        "COUNT(*) OVER (PARTITION BY event_type) AS nd "
        "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)), "
        "shifts AS (SELECT event_type, d, "
        "abs(CAST(c AS DOUBLE) / CAST(i AS DOUBLE) "
        "- CAST(tot - c AS DOUBLE) / CAST(nd - i AS DOUBLE)) AS shift "
        "FROM cum WHERE i < nd) "
        "SELECT event_type, d AS change_day, shift "
        "FROM shifts QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY shift DESC, d) = 1"
    ),
    section="E19",
)
def e19_mean_shift_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection on each event type's daily-count series:
    the split day maximizing |mean(before) − mean(after)| — the
    binary-segmentation statistic (the non-recursive core of CUSUM
    methods, so unlike CUSUM itself it is plain-window expressible in
    BOTH engines and stays hash-checkable). Day-rollup shuffle, then
    two windows on the ~|types|×|days| series — the heavy lifting
    (daily counts) partial-aggregates map-side, and the window input
    is tiny at any corpus scale.

    All window state is exact integers; the two divisions and the
    subtract happen once per row in identical IEEE order."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    wp = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.row_number().over(w).alias("i"),
        F.sum("cnt").over(w).alias("c"),
        F.sum("cnt").over(wp).alias("tot"),
        F.count(F.lit(1)).over(wp).alias("nd"),
    ).filter(F.col("i") < F.col("nd"))
    shift = F.abs(
        F.col("c").cast("double") / F.col("i").cast("double")
        - (F.col("tot") - F.col("c")).cast("double")
        / (F.col("nd") - F.col("i")).cast("double")
    )
    ranked = cum.select(
        "event_type", F.col("d").alias("change_day"), shift.alias("shift")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.desc("shift"), F.asc("change_day")
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).drop("rn")


@register(
    "e20_lag1_autocorrelation",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", "
        "pairs AS (SELECT event_type, cnt AS y, "
        "lag(cnt) OVER (PARTITION BY event_type ORDER BY d) AS x FROM daily), "
        "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy, "
        "CAST(SUM(x * x) AS BIGINT) AS sx2, "
        "CAST(SUM(y * y) AS BIGINT) AS sy2 "
        "FROM pairs WHERE x IS NOT NULL GROUP BY 1) "
        "SELECT event_type, n AS n_pairs, "
        "CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0 THEN "
        "CAST(n * sxy - sx * sy AS DOUBLE) / "
        "sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) * CAST(n * sy2 - sy * sy AS DOUBLE)) "
        "ELSE NULL END AS lag1_autocorr FROM s"
    ),
    section="E20",
)
def e20_lag1_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily-count series —
    the burstiness/seasonality screen run before any forecasting model.
    Daily-rollup shuffle + one lag window + one scalar aggregate; the
    Pearson r over (cnt_t, cnt_{t-1}) pairs is assembled from six
    EXACT integer sums (counts are ints; their products fit BIGINT
    until ~10^9 events/type/day) so the final ratio is one identical
    IEEE expression on both engines — no tolerance, no rounding."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    pairs = daily.select(
        "event_type",
        F.col("cnt").alias("y"),
        F.lag("cnt").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    dx = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0),
            num / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("lag1_autocorr"),
    )


@register(
    "e21_seasonal_indices",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", "
        "dow AS (SELECT event_type, "
        "CAST(date_part('isodow', d) AS INT) AS dow, "
        "CAST(SUM(cnt) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS nd "
        "FROM daily GROUP BY 1, 2), "
        "ov AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS st, "
        "CAST(COUNT(*) AS BIGINT) AS nt FROM daily GROUP BY 1) "
        "SELECT dow.event_type, dow.dow, "
        "CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS dow_mean, "
        "(CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) / "
        "(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)) AS seasonal_index "
        "FROM dow JOIN ov ON dow.event_type = ov.event_type"
    ),
    section="E21",
)
def e21_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices per event type — the ratio-to-
    moving-average decomposition's seasonal component (classical
    multiplicative seasonality): mean daily count per ISO weekday ÷
    overall mean daily count. Two chained map-side-combinable
    aggregates over the tiny types×days series plus a broadcast-size
    join; the heavy shuffle is only the daily rollup.

    All state is exact integers (ISO weekday avoids the Spark-Sun=1 /
    DuckDB-Sun=0 dayofweek trap, SURVEY §5.3 #5); the two divisions
    and the final ratio run identically on both engines."""
    daily = _daily_counts(spark, sf_dir)
    dow = daily.groupBy(
        "event_type", (F.weekday("d") + 1).cast("int").alias("dow")
    ).agg(
        F.sum("cnt").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    ov = daily.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    dow_mean = F.col("s").cast("double") / F.col("nd").cast("double")
    ov_mean = F.col("st").cast("double") / F.col("nt").cast("double")
    return dow.join(F.broadcast(ov), "event_type").select(
        "event_type",
        "dow",
        dow_mean.alias("dow_mean"),
        (dow_mean / ov_mean).alias("seasonal_index"),
    )


@register(
    "e22_moving_median",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + " "
        "SELECT event_type, d, cnt, "
        "median(cnt) OVER (PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7 "
        "FROM daily"
    ),
    section="E22",
)
def e22_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day MOVING MEDIAN of each event type's daily counts —
    the robust smoother used where moving averages are wrecked by
    spikes. Spark has no windowed median, so the frame is materialized
    per row (``collect_list`` over ROWS BETWEEN 6 PRECEDING AND
    CURRENT), sorted in-JVM, and the lower/upper middles averaged —
    matching DuckDB's interpolated ``median() OVER``. The frame is a
    CONSTANT 7 elements, so per-row cost is O(7 log 7) and state never
    grows with history (a windowed percentile over an UNBOUNDED frame
    would not scale; this shape is why production moving-quantiles are
    frame-bounded or sketch-based, d8b's tier).

    Exactness: frame values are integers; odd frames index the middle
    directly, even frames average two integers — one IEEE division by
    2.0 on both engines."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("cnt").over(w))
    n = F.size(arr)
    mid = ((n + 1) / F.lit(2)).cast("int")
    lo = (n / F.lit(2)).cast("int")
    med = F.when(
        n % 2 == 1,
        F.element_at(arr, mid).cast("double"),
    ).otherwise(
        (F.element_at(arr, lo) + F.element_at(arr, lo + 1)).cast("double")
        / 2.0
    )
    return daily.select("event_type", "d", "cnt", med.alias("med7"))


_E23_TOP = 5  # alert budget: K most weekday-deviant days per type


@register(
    "e23_seasonal_anomaly_days",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", dow AS (SELECT event_type, "
        "CAST(date_part('isodow', d) AS INT) AS dow, "
        "CAST(SUM(cnt) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS nd "
        "FROM daily GROUP BY 1, 2), "
        "scored AS (SELECT daily.event_type, d, cnt, "
        "CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS expected, "
        "CAST(cnt AS DOUBLE) / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) AS ratio "
        "FROM daily JOIN dow ON daily.event_type = dow.event_type "
        "AND CAST(date_part('isodow', d) AS INT) = dow.dow) "
        "SELECT event_type, d, cnt, expected, ratio, "
        "CASE WHEN ratio >= 1.0 THEN 'high' ELSE 'low' END AS direction, "
        "CAST(ratio >= 1.2 OR ratio <= 0.8 AS INT) AS is_extreme "
        "FROM scored "
        "QUALIFY row_number() OVER (PARTITION BY event_type "
        f"ORDER BY abs(ratio - 1.0) DESC, d) <= {_E23_TOP}"
    ),
    section="E23",
)
def e23_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly days: each day's count compared to
    ITS OWN weekday's mean for that event type (E21's seasonal
    component used as the expectation), returning the K MOST DEVIANT
    days per type ranked by |ratio − 1| — the alert-budget form of
    daily-volume alerting ("page me on the K worst days"), which is
    NON-VACUOUS AT EVERY SCALE by construction (round-10 verdict ask
    #5: the previous fixed ±20% filter returned zero rows on the
    sf0.1 fixture's flatter daily profile, a silent empty-vs-empty
    hash pass). The fixed ±20% contract survives as the ``is_extreme``
    flag column; ``direction`` reads off which side of expectation
    the day fell. Composes the shared daily rollup with a
    broadcast-size (type × weekday) expectation join; all state exact
    integers, the ratio (and the |ratio−1| rank key) one identical
    IEEE chain on both engines, ties broken by day — fully
    deterministic."""
    daily = _daily_counts(spark, sf_dir)
    dow_of = (F.weekday("d") + 1).cast("int")
    dow = daily.groupBy(
        "event_type", dow_of.alias("dow")
    ).agg(
        F.sum("cnt").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    expected = F.col("s").cast("double") / F.col("nd").cast("double")
    ratio = F.col("cnt").cast("double") / expected
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("ratio") - 1.0).desc(), "d"
    )
    return (
        daily.withColumn("dow", dow_of)
        .join(F.broadcast(dow), ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            "cnt",
            expected.alias("expected"),
            ratio.alias("ratio"),
        )
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= _E23_TOP)
        .select(
            "event_type",
            "d",
            "cnt",
            "expected",
            "ratio",
            F.when(F.col("ratio") >= 1.0, "high")
            .otherwise("low")
            .alias("direction"),
            ((F.col("ratio") >= 1.2) | (F.col("ratio") <= 0.8))
            .cast("int")
            .alias("is_extreme"),
        )
    )


@register(
    "e24_mann_kendall_trend",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", "
        "s AS (SELECT a.event_type, "
        "CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1 WHEN b.cnt < a.cnt "
        "THEN -1 ELSE 0 END) AS BIGINT) AS s_stat "
        "FROM daily a JOIN daily b ON a.event_type = b.event_type "
        "AND a.d < b.d GROUP BY 1), "
        "nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily "
        "GROUP BY 1), "
        "ties AS (SELECT event_type, CAST(COALESCE(SUM(t * (t - 1) * "
        "(2 * t + 5)), 0) AS BIGINT) AS tie_corr FROM "
        "(SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS t FROM daily "
        "GROUP BY 1, 2) GROUP BY 1), "
        "v AS (SELECT s.event_type, s.s_stat, nd.n, "
        "CAST(n * (n - 1) * (2 * n + 5) - tie_corr AS DOUBLE) / 18.0 AS var_s "
        "FROM s JOIN nd USING (event_type) JOIN ties USING (event_type)) "
        "SELECT event_type, n AS n_days, s_stat, var_s, "
        "ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s) "
        "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) ELSE 0.0 END, 9) AS z "
        "FROM v"
    ),
    section="E24",
)
def e24_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type's daily-count
    series (Mann 1945; Kendall 1975) — the nonparametric trend screen
    completing the detection tier (E19 changepoint, E20 ACF, E23
    seasonal anomalies): S = Σ_{i<j} sgn(x_j − x_i), tie-corrected
    variance, continuity-corrected z. All-pairs runs WITHIN a series
    whose length is the day count — O(d²) per type on a ~90-row frame
    (the O(d log d) rank form is the lever if series reach millions of
    points); the join is equi on event_type so candidates never cross
    series. Everything is integer-exact until the single /18 and the
    final z division."""
    daily = _daily_counts(spark, sf_dir).localCheckpoint()
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
                .when(F.col("b.cnt") < F.col("a.cnt"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("bigint").alias("tie_corr")
        )
    )
    n = F.col("n")
    v = (
        s.join(nd, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type", "s_stat", n.alias("n"),
            (
                (n * (n - 1) * (2 * n + 5) - F.col("tie_corr")).cast("double")
                / 18.0
            ).alias("var_s"),
        )
    )
    sc = F.col("s_stat")
    return v.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        "var_s",
        F.round(
            F.when(sc > 0, (sc - 1) / F.sqrt(F.col("var_s")))
            .when(sc < 0, (sc + 1) / F.sqrt(F.col("var_s")))
            .otherwise(F.lit(0.0)), 9,
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# E25 — maximum drawdown (peak-to-trough decline vs the running peak)
# --------------------------------------------------------------------------
@register(
    "e25_max_drawdown",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", dd AS (SELECT event_type, d, cnt, "
        "CAST(MAX(cnt) OVER (PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS peak FROM daily), "
        "r AS (SELECT event_type, d, cnt, peak, peak - cnt AS draw, "
        "ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY peak - cnt DESC, d) AS rk FROM dd) "
        "SELECT event_type, d AS trough_date, peak AS peak_cnt, "
        "cnt AS trough_cnt, draw AS max_drawdown, "
        "ROUND(CAST(draw AS DOUBLE) / CAST(peak AS DOUBLE), 9) AS dd_frac "
        "FROM r WHERE rk = 1"
    ),
    section="E25",
)
def e25_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each event type's daily-count series — the
    worst peak-to-trough decline vs the running peak (the standard
    risk/stability summary from quantitative finance, here read as
    'how far did activity fall below its historical high'), beside
    E19's changepoint and E24's monotone-trend reads of the same
    series. Everything is INTEGER-exact (counts, running max,
    difference); the single trough row per series is picked by
    (drawdown DESC, day ASC) rank — a total order, so ties break
    identically in both engines — and only the final fraction is one
    double division, rounded. Scale shape: the shared daily rollup
    (one shuffle), ONE ordered window per series for the running
    peak, one rank window on the same partitioning (no extra
    exchange), then a one-row-per-type filter. The window key is
    event_type; for million-series cardinality the partition count
    rides the shuffle setting, and a skewed single series is the
    range-partitioned two-tier running-max rewrite documented in
    E3."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "event_type", "d", "cnt",
        F.max("cnt").over(w).cast("bigint").alias("peak"),
    ).withColumn("draw", F.col("peak") - F.col("cnt"))
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("draw"), F.asc("d"))
    )
    return (
        dd.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("trough_date"),
            F.col("peak").alias("peak_cnt"),
            F.col("cnt").alias("trough_cnt"),
            F.col("draw").alias("max_drawdown"),
            F.round(
                F.col("draw").cast("double") / F.col("peak").cast("double"), 9
            ).alias("dd_frac"),
        )
    )


# --------------------------------------------------------------------------
# E26 — Pareto concentration: smallest user set covering 80% of events
# --------------------------------------------------------------------------
@register(
    "e26_pareto_share",
    oracle=(
        EVENTS_CTE
        + ", uc AS (SELECT event_type, user_id, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
        "tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total, "
        "CAST(COUNT(*) AS BIGINT) AS n_users FROM uc GROUP BY 1), "
        "cum AS (SELECT event_type, cnt, "
        "CAST(SUM(cnt) OVER (PARTITION BY event_type "
        "ORDER BY cnt DESC, user_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS running, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY cnt DESC, user_id) AS BIGINT) AS rk FROM uc) "
        "SELECT cum.event_type, n_users, total AS n_events, "
        "MIN(rk) AS users_for_80pct, "
        "ROUND(CAST(MIN(rk) AS DOUBLE) / CAST(n_users AS DOUBLE), 9) "
        "AS user_share FROM cum JOIN tot ON tot.event_type = cum.event_type "
        "WHERE running * 10 >= total * 8 GROUP BY 1, 2, 3"
    ),
    section="E26",
)
def e26_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of activity: per event type, the SMALLEST
    number of users whose (descending) event counts cover at least
    80% of all events — the '80/20 rule' read directly off the Lorenz
    curve, beside D33/D34's scalar inequality summaries. Entirely
    INTEGER-exact: the 80% threshold is the cross-multiplied
    running·10 ≥ total·8 (no float share per row), the descending
    cumulative rides a (cnt DESC, user_id) total order so ties rank
    identically in both engines, and the single double division is
    the final user-share ratio, rounded. Scale shape: one
    (type, user) groupBy, one ordered window per type sharing its
    partitioning with the rank, a broadcast totals join, and a
    threshold-filtered MIN — one row per type out. Skewed single-type
    user counts ride E3's two-tier range-partitioned running-sum
    rewrite at extreme cardinality."""
    uc = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = uc.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    cum = uc.select(
        "event_type",
        F.sum("cnt").over(w).cast("bigint").alias("running"),
        F.row_number().over(rk).cast("bigint").alias("rk"),
    )
    return (
        cum.join(F.broadcast(tot), "event_type")
        .filter(F.col("running") * 10 >= F.col("total") * 8)
        .groupBy("event_type", "n_users", F.col("total").alias("n_events"))
        .agg(F.min("rk").alias("users_for_80pct"))
        .select(
            "event_type", "n_users", "n_events", "users_for_80pct",
            F.round(
                F.col("users_for_80pct").cast("double")
                / F.col("n_users").cast("double"),
                9,
            ).alias("user_share"),
        )
    )


# --------------------------------------------------------------------------
# E27 — CUSUM drift alarm (integer-scaled, fold-exact)
# --------------------------------------------------------------------------
_E27_H_MULT = 2  # alarm when scaled CUSUM exceeds H = 2·total


@register(
    "e27_cusum_alarm",
    oracle=(
        EVENTS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
        + _DAILY_SQL
        + ", idx AS (SELECT event_type, cnt, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) "
        "AS BIGINT) AS i FROM daily), "
        "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd, "
        "CAST(SUM(cnt) AS BIGINT) AS total FROM idx GROUP BY 1), "
        "rec(event_type, i, s, alarms, first_alarm, maxs) AS ("
        "  SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT), "
        "  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM g"
        "  UNION ALL"
        "  SELECT r.event_type, r.i + 1, "
        "  greatest(CAST(0 AS BIGINT), r.s + (x.cnt * g.nd - g.total)), "
        "  r.alarms + CASE WHEN greatest(CAST(0 AS BIGINT), "
        f"  r.s + (x.cnt * g.nd - g.total)) > {_E27_H_MULT} * g.total "
        "  THEN 1 ELSE 0 END, "
        "  CASE WHEN r.first_alarm = 0 AND greatest(CAST(0 AS BIGINT), "
        f"  r.s + (x.cnt * g.nd - g.total)) > {_E27_H_MULT} * g.total "
        "  THEN r.i + 1 ELSE r.first_alarm END, "
        "  greatest(r.maxs, greatest(CAST(0 AS BIGINT), "
        "  r.s + (x.cnt * g.nd - g.total))) "
        "  FROM rec r JOIN g ON g.event_type = r.event_type "
        "  JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1) "
        "SELECT r.event_type, g.nd AS n_days, r.alarms AS n_alarm_days, "
        "r.first_alarm AS first_alarm_day, r.maxs AS max_cusum_scaled "
        "FROM rec r JOIN g ON g.event_type = r.event_type WHERE r.i = g.nd"
    ),
    section="E27",
)
def e27_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift alarm per event type (Page 1954 — the
    sequential change detector that completes the detection tier:
    E19 finds the single best mean-shift in hindsight, E23 flags
    seasonal outlier days, E24 scores monotone trend; CUSUM is the
    ONLINE accumulate-and-alarm form). Everything is INTEGER-exact:
    residuals are cross-multiplied (cnt·n_days − total, D31's
    discipline — the daily mean never becomes a float), the
    recursion S_t = max(0, S_{t-1} + r_t) folds bigints, and the
    alarm threshold H = 2·total is integer too. The fold is
    inherently sequential per series — Spark replays it as ONE
    F.aggregate HOF over the day-ordered count array (codegen'd,
    no Python), the oracle as a recursive CTE stepping the identical
    fixpoint — two independent implementations of the same exact
    recursion. Scale shape: the shared daily rollup, then one
    groupBy collecting each series (day counts are bounded — ~90
    here; a years-long series is still thousands of elements, fine
    in one array); output one row per type."""
    daily = _daily_counts(spark, sf_dir)
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("cnt").cast("bigint").alias("total"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cnt"))),
            lambda x: x["cnt"].cast("bigint"),
        ).alias("cnts"),
    )
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        zero.alias("s"), zero.alias("alarms"), zero.alias("first"),
        zero.alias("idx"), zero.alias("maxs"),
    )

    def _step(acc, cnt):
        idx = acc["idx"] + 1
        s2 = F.greatest(zero, acc["s"] + (cnt * F.col("nd") - F.col("total")))
        alarm = s2 > _E27_H_MULT * F.col("total")
        return F.struct(
            s2.alias("s"),
            (acc["alarms"] + alarm.cast("bigint")).alias("alarms"),
            F.when((acc["first"] == zero) & alarm, idx)
            .otherwise(acc["first"]).alias("first"),
            idx.alias("idx"),
            F.greatest(acc["maxs"], s2).alias("maxs"),
        )

    folded = g.select(
        "event_type",
        F.col("nd").alias("n_days"),
        F.aggregate("cnts", init, _step).alias("acc"),
    )
    return folded.select(
        "event_type", "n_days",
        F.col("acc.alarms").alias("n_alarm_days"),
        F.col("acc.first").alias("first_alarm_day"),
        F.col("acc.maxs").alias("max_cusum_scaled"),
    )


# --------------------------------------------------------------------------
# E28 — inter-arrival gap profile (rank-exact percentiles)
# --------------------------------------------------------------------------
@register(
    "e28_interarrival_profile",
    oracle=(
        EVENTS_CTE
        + ", g AS (SELECT event_type, "
        "epoch_ms(ts) - lag(epoch_ms(ts)) OVER "
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap "
        "FROM events), "
        "gg AS (SELECT event_type, CAST(gap AS BIGINT) AS gap FROM g "
        "WHERE gap IS NOT NULL), "
        "r AS (SELECT event_type, gap, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap) "
        "AS BIGINT) AS rn, "
        "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
        "FROM gg) "
        "SELECT event_type, ANY_VALUE(n) AS n_gaps, "
        "CAST(MIN(gap) AS BIGINT) AS min_gap_ms, "
        "MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS p50_gap_ms, "
        "MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS p90_gap_ms, "
        "CAST(MAX(gap) AS BIGINT) AS max_gap_ms, "
        "ROUND(CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) / "
        "CAST(ANY_VALUE(n) AS DOUBLE), 6) AS mean_gap_ms "
        "FROM r GROUP BY 1"
    ),
    section="E28",
)
def e28_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile per event type: min / lower-median /
    p90 / max / mean of the millisecond gaps between a user's
    consecutive events of that type — the burstiness profile behind
    rate-limit sizing, session-timeout choice (E8's gap parameter is
    read off this table) and anomaly baselining, beside I18's
    per-user threshold gaps. Percentiles are RANK-EXACT (D36's
    interpolation-free discipline): the profile selects the element
    at integer rank (n+1)//2 and ⌈9n/10⌉ over a gap total order —
    equal gaps are interchangeable, so the selected VALUE is
    deterministic; gaps are exact integer ms (epoch diff on the
    ms-truncated ts both engines share), the mean is an exact
    DECIMAL sum with one rounded division. Scale shape: one
    (user,type) lag window, then one (type) rank window + the
    profile aggregate sharing its partitioning — two shuffles
    total; the E3 two-tier rewrite is the extreme-cardinality
    lever."""
    ev = load(spark, sf_dir, "events")
    ms = F.unix_millis(ts_ms("ts"))
    wl = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type", (ms - F.lag(ms).over(wl)).cast("bigint").alias("gap")
    ).filter(F.col("gap").isNotNull())
    wt = Window.partitionBy("event_type")
    r = g.select(
        "event_type", "gap",
        F.row_number().over(wt.orderBy("gap")).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n"),
    )
    med = F.floor((F.col("n") + 1) / 2)
    p90 = F.floor((9 * F.col("n") + 9) / 10)
    return r.groupBy("event_type").agg(
        F.first("n").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("min_gap_ms"),
        F.max(F.when(F.col("rn") == med, F.col("gap"))).alias("p50_gap_ms"),
        F.max(F.when(F.col("rn") == p90, F.col("gap"))).alias("p90_gap_ms"),
        F.max("gap").cast("bigint").alias("max_gap_ms"),
        F.round(
            F.sum(F.col("gap").cast("decimal(38,0)")).cast("double")
            / F.first("n").cast("double"),
            6,
        ).alias("mean_gap_ms"),
    )


# --------------------------------------------------------------------------
# E29 — series volatility profile (integer-exact roughness)
# --------------------------------------------------------------------------
@register(
    "e29_volatility_profile",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", ch AS (SELECT event_type, "
        "cnt - lag(cnt) OVER w AS d, "
        "sign(cnt - lag(cnt) OVER w) * sign(lag(cnt) OVER w - "
        "lag(cnt, 2) OVER w) AS flip "
        "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)) "
        "SELECT event_type, CAST(COUNT(d) AS BIGINT) AS n_changes, "
        "CAST(MAX(abs(d)) AS BIGINT) AS max_abs_change, "
        "ROUND(CAST(SUM(CAST(abs(d) AS DECIMAL(38,0))) AS DOUBLE) / "
        "CAST(COUNT(d) AS DOUBLE), 6) AS mean_abs_change, "
        "CAST(COALESCE(SUM(CASE WHEN flip < 0 THEN 1 END), 0) AS BIGINT) "
        "AS n_direction_flips FROM ch GROUP BY 1"
    ),
    section="E29",
)
def e29_volatility_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volatility of each event type's count series:
    change count, max and mean absolute change, and the number of
    direction flips (an up-move immediately followed by a down-move
    or vice versa — sign(Δ_t)·sign(Δ_{t−1}) < 0) — the roughness
    profile that separates a noisy-but-flat series from a trending
    one BEFORE pointing E19/E24/E27's detectors at it. Entirely
    INTEGER-exact (differences, signs, flips; the mean is an exact
    DECIMAL sum with one rounded division). Scale shape: the shared
    daily rollup + ONE ordered window per series computing both lags,
    then a map-side-combinable profile aggregate."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    ch = daily.select(
        "event_type",
        (F.col("cnt") - F.lag("cnt").over(w)).alias("dd"),
        (
            F.signum(F.col("cnt") - F.lag("cnt").over(w))
            * F.signum(F.lag("cnt").over(w) - F.lag("cnt", 2).over(w))
        ).alias("flip"),
    )
    return ch.groupBy("event_type").agg(
        F.count("dd").cast("bigint").alias("n_changes"),
        F.max(F.abs("dd")).cast("bigint").alias("max_abs_change"),
        F.round(
            F.sum(F.abs("dd").cast("decimal(38,0)")).cast("double")
            / F.count("dd").cast("double"),
            6,
        ).alias("mean_abs_change"),
        F.coalesce(
            F.sum(F.when(F.col("flip") < 0, 1)), F.lit(0)
        ).cast("bigint").alias("n_direction_flips"),
    )


# --------------------------------------------------------------------------
# E30 — record-breaking days (running high-water marks)
# --------------------------------------------------------------------------
@register(
    "e30_record_days",
    oracle=(
        EVENTS_CTE
        + _DAILY_SQL
        + ", r AS (SELECT event_type, d, cnt, "
        "MAX(cnt) OVER (PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_peak "
        "FROM daily), "
        "rec AS (SELECT event_type, d, cnt FROM r "
        "WHERE prev_peak IS NULL OR cnt > prev_peak) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_record_days, "
        "MAX(d) AS last_record_day, CAST(MAX(cnt) AS BIGINT) AS peak_cnt "
        "FROM rec GROUP BY 1"
    ),
    section="E30",
)
def e30_record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking days per event type: how often the daily count
    set a new all-time high, when the last record fell, and the
    standing peak — the growth-cadence summary dual to E25's
    drawdown (records cluster early in a flat series, keep coming in
    a growing one; streak analysis over record GAPS is E16's shape).
    INTEGER-exact: a day is a record iff its count strictly exceeds
    the running max over [start, t) (first day is a record by the
    NULL frame), all counts exact. Scale shape: the shared daily
    rollup + ONE ordered window per series with a 1-PRECEDING frame,
    then a filter and a 3-column aggregate."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = daily.select(
        "event_type", "d", "cnt", F.max("cnt").over(w).alias("prev_peak")
    )
    rec = r.filter(
        F.col("prev_peak").isNull() | (F.col("cnt") > F.col("prev_peak"))
    )
    return rec.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_record_days"),
        F.max("d").alias("last_record_day"),
        F.max("cnt").cast("bigint").alias("peak_cnt"),
    )


# --------------------------------------------------------------------------
# E31 — day-of-week × hour activity profile
# --------------------------------------------------------------------------
@register(
    "e31_dow_hour_profile",
    oracle=(
        EVENTS_CTE
        + ", g AS (SELECT event_type, "
        "CAST(date_part('isodow', ts) AS INT) AS dow, "
        "CAST(date_part('hour', ts) AS INT) AS hod, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2, 3), "
        "t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total "
        "FROM g GROUP BY 1) "
        "SELECT g.event_type, dow, hod, cnt, "
        "ROUND(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 9) AS share "
        "FROM g JOIN t ON t.event_type = g.event_type"
    ),
    section="E31",
)
def e31_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap per event type —
    the calendar fingerprint behind E21's dow-level seasonal indices
    (this is the full 7×24 matrix those indices marginalize; a
    workday type shows office-hours mass, a batch job shows one hot
    cell). INTEGER-exact counts keyed on ISO weekday + hour (both
    engines read the same ms-truncated UTC ts), one rounded share
    division against a broadcast per-type total. Scale shape: ONE
    map-side-combinable (type, dow, hour) groupBy — the output is
    bounded at types×168 rows at any input scale."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.dayofweek(F.col("ts")).alias("_dw"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday
    g = g.select(
        "event_type",
        ((F.col("_dw") + 5) % 7 + 1).cast("int").alias("dow"),
        "hod", "cnt",
    ).localCheckpoint()
    t = g.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    return g.join(F.broadcast(t), "event_type").select(
        "event_type", "dow", "hod", "cnt",
        F.round(
            F.col("cnt").cast("double") / F.col("total").cast("double"), 9
        ).alias("share"),
    )


# --------------------------------------------------------------------------
# E32 — longest strictly-increasing daily run (monotone momentum)
# --------------------------------------------------------------------------
@register(
    "e32_longest_increasing_run",
    oracle=(
        EVENTS_CTE + ", daily AS ("
        "  SELECT user_id, date_trunc('day', ts) AS d, "
        "  SUM(CAST(value AS DECIMAL(28,6))) AS v "
        "  FROM events GROUP BY 1, 2), "
        "flagged AS ("
        "  SELECT user_id, d, v, "
        "  CASE WHEN lag(v) OVER w IS NULL OR v <= lag(v) OVER w "
        "       THEN 1 ELSE 0 END AS brk "
        "  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)), "
        "runs AS ("
        "  SELECT user_id, d, "
        "  SUM(brk) OVER (PARTITION BY user_id ORDER BY d "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id "
        "  FROM flagged), "
        "lens AS (SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len "
        "  FROM runs GROUP BY 1, 2) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_runs, "
        "CAST(MAX(len) AS BIGINT) AS longest_run, "
        "CAST(SUM(len) AS BIGINT) AS n_days "
        "FROM lens GROUP BY user_id"
    ),
    section="E32",
)
def e32_longest_increasing_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing run of daily activity totals per
    user — the monotone-momentum read beside E16's presence streaks
    (presence ignores magnitude) and E30's record days (records
    compare to the all-time max, runs to YESTERDAY). Gaps-and-islands:
    break flag where the exact daily sum fails to increase, running
    sum of breaks numbers the runs, run lengths fold to max.

    Correctness discipline: the compared quantity is the DECIMAL
    daily sum — order-insensitive to aggregate and EXACT to compare,
    so the strict `>` at run boundaries can never flip on an
    engine's float summation order (the e15/e22 lesson applied to a
    comparison instead of a value). Scale shape: one shuffle on
    user_id, two within-partition window passes over day-grain rows
    (≤ 30 per user here; bounded by the calendar at any scale), one
    final fold."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(dec("value")).alias("v"))
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = daily.select(
        "user_id", "d", "v",
        F.when(
            F.lag("v").over(w).isNull() | (F.col("v") <= F.lag("v").over(w)),
            1,
        ).otherwise(0).alias("brk"),
    )
    runs = flagged.select(
        "user_id", "d",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    lens = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return lens.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("len").cast("bigint").alias("longest_run"),
        F.sum("len").cast("bigint").alias("n_days"),
    )


# --------------------------------------------------------------------------
# E33 — oscillation (sign-flip) count of daily deltas
# --------------------------------------------------------------------------
@register(
    "e33_oscillation_count",
    oracle=(
        EVENTS_CTE + ", daily AS ("
        "  SELECT user_id, date_trunc('day', ts) AS d, "
        "  SUM(CAST(value AS DECIMAL(28,6))) AS v "
        "  FROM events GROUP BY 1, 2), "
        "moves AS ("
        "  SELECT user_id, d, v - lag(v) OVER w AS delta "
        "  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)), "
        "nz AS ("
        "  SELECT user_id, d, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS s "
        "  FROM moves WHERE delta IS NOT NULL AND delta <> 0), "
        "flips AS ("
        "  SELECT user_id, CASE WHEN s <> lag(s) OVER w2 THEN 1 ELSE 0 END "
        "  AS flip FROM nz WINDOW w2 AS (PARTITION BY user_id ORDER BY d)) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_moves, "
        "CAST(SUM(flip) AS BIGINT) AS n_flips "
        "FROM flips GROUP BY user_id"
    ),
    section="E33",
)
def e33_oscillation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oscillation census per user: among nonzero day-over-day moves
    of the daily activity total, how many reverse direction — the
    zero-crossing/turning-point count that separates trending users
    (few flips, E24's Mann–Kendall agrees) from mean-reverting ones
    (E20's negative lag-1 autocorrelation, counted discretely). Same
    exactness spine as E32: deltas are differences of DECIMAL daily
    sums, so the sign of every move — and therefore every flip — is
    engine-exact; the output is pure integers. Scale shape: one
    user_id shuffle shared by both window passes (day-grain rows,
    calendar-bounded), one fold."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(dec("value")).alias("v"))
    w = Window.partitionBy("user_id").orderBy("d")
    moves = daily.select(
        "user_id", "d", (F.col("v") - F.lag("v").over(w)).alias("delta")
    )
    nz = moves.filter(
        F.col("delta").isNotNull() & (F.col("delta") != 0)
    ).select(
        "user_id", "d",
        F.when(F.col("delta") > 0, 1).otherwise(-1).alias("s"),
    )
    flips = nz.select(
        "user_id",
        F.when(F.col("s") != F.lag("s").over(w), 1).otherwise(0).alias("flip"),
    )
    return flips.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.sum("flip").cast("bigint").alias("n_flips"),
    )


# --------------------------------------------------------------------------
# E34 — top-k WITH TIES (rank semantics, E7's sibling)
# --------------------------------------------------------------------------
@register(
    "e34_topk_with_ties",
    oracle=(
        "SELECT o_orderpriority, o_orderkey, o_totalprice, "
        "CAST(rank() OVER w AS BIGINT) AS rnk "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) "
        "QUALIFY rank() OVER w <= 3"
    ),
    section="E34",
)
def e34_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order values per priority WITH TIES — ANSI
    ``FETCH FIRST k ROWS WITH TIES`` semantics via ``rank()``:
    where E7's ``row_number`` must invent a tie-break to cut at
    exactly k rows (and thereby silently drops equally-qualified
    rows), ``rank`` keeps every row tied with the k-th — the correct
    leaderboard/threshold semantics whenever the ORDER BY key is not
    unique. No tie-break column exists here BY DESIGN: the result
    set is tie-closed, so it is deterministic without one (the
    property E7 cannot have). Comparisons ride the raw parquet
    doubles — no arithmetic, bit-exact cross-engine. Scale shape:
    identical to E7 — one shuffle on the group key, one
    within-partition sort, rank stops scanning at the cut."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc()
    )
    return (
        o.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


# --------------------------------------------------------------------------
# E35 — year-over-year growth (calendar-aligned offset join)
# --------------------------------------------------------------------------
@register(
    "e35_yoy_growth",
    oracle=(
        "WITH m AS (SELECT o_orderpriority AS prio, "
        "  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, "
        "  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS rev "
        "  FROM orders GROUP BY 1, 2) "
        "SELECT c.prio AS o_orderpriority, c.month, c.rev AS revenue, "
        "p.rev AS prev_year_revenue, "
        "ROUND((c.rev - p.rev) / p.rev, 6) AS yoy_growth "
        "FROM m c JOIN m p ON p.prio = c.prio "
        "AND c.month = p.month + INTERVAL 12 MONTH"
    ),
    section="E35",
)
def e35_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per priority-month — the
    reporting staple E2's LAG cannot express safely: lag(12) silently
    compares against "12 rows back", which is only "a year ago" if
    every month exists; a CALENDAR-ALIGNED self-equi-join on
    (priority, month − 12 months) stays correct under gaps, the bug
    class that pollutes real dashboards. Inner join = only months
    with a comparable prior year surface (no NULL-growth rows to
    diverge on). Revenue rides dsum's decimal discipline; growth is
    one IEEE chain over two deterministic doubles, rounded.
    Month buckets emitted as TIMESTAMP on both engines (e17's dtype
    lesson). Scale shape: ONE month-rollup shuffle (tiny output),
    then an equi-join of the rollup against its shifted self —
    broadcast-able at any scale since its cardinality is
    priorities × months."""
    from glonassdatamining_spark.stable import dsum

    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(dsum("o_totalprice", "rev"))
        .localCheckpoint()
    )
    prev = m.select(
        "prio",
        F.add_months("month", 12).cast("timestamp").alias("month"),
        F.col("rev").alias("prev_rev"),
    )
    return (
        m.join(prev, ["prio", "month"])
        .select(
            F.col("prio").alias("o_orderpriority"),
            "month",
            F.col("rev").alias("revenue"),
            F.col("prev_rev").alias("prev_year_revenue"),
            F.round((F.col("rev") - F.col("prev_rev")) / F.col("prev_rev"), 6).alias(
                "yoy_growth"
            ),
        )
    )


# --------------------------------------------------------------------------
# E36 — Holt linear-trend smoothing (double exponential, EWMA's sibling)
# --------------------------------------------------------------------------
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3


@register("e36_holt_trend", oracle=None, section="E36")
def e36_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of each event type's daily
    value series (α=0.5, β=0.3): level lₜ = αyₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    trend bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, initialized l₁=y₁, b₁=y₂−y₁ —
    e11's EWMA extended with the trend state a forecast needs. Output:
    final (level, trend) and the 3-step-ahead linear forecast per key.

    The recursion is sequential per key but the state is O(1), so it
    runs as ONE day-level aggregate (decimal-exact daily sums) and
    then a per-key JVM ``aggregate`` HOF fold over the day-sorted
    array — no Python boundary at all (unlike e11's grouped-map,
    this form stays in Catalyst; both are valid shapes, this one
    shows the fold is expressible JVM-side). Rows-only (recursive
    fixpoint — no closed SQL form); the recursion itself is
    unit-tested against a Python replay in tests/test_api.py. At
    scale: state per key is (level, trend), the array is
    days-per-key long (bounded by the calendar), and the day rollup
    is an ordinary partial/final agg."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(dec("value")).cast("double").alias("y"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    a, b = F.lit(_HOLT_ALPHA), F.lit(_HOLT_BETA)
    init = F.struct(
        F.col("s")[0]["y"].alias("l"),
        (F.col("s")[1]["y"] - F.col("s")[0]["y"]).alias("b"),
    )
    new_l = lambda acc, x: a * x["y"] + (F.lit(1.0) - a) * (acc["l"] + acc["b"])  # noqa: E731
    # textbook init-then-loop: l₁=y₁, b₁=y₂−y₁, recursion over t=2..n
    # (y₂ participates in both the init slope and the first step)
    folded = F.aggregate(
        F.slice(F.col("s"), 2, F.size("s") - 1),
        init,
        lambda acc, x: F.struct(
            new_l(acc, x).alias("l"),
            (
                b * (new_l(acc, x) - acc["l"]) + (F.lit(1.0) - b) * acc["b"]
            ).alias("b"),
        ),
    )
    return (
        series.filter(F.size("s") >= 2)
        .select("event_type", F.size("s").alias("n_days"), folded.alias("f"))
        .select(
            "event_type",
            "n_days",
            F.round(F.col("f")["l"], 6).alias("level"),
            F.round(F.col("f")["b"], 6).alias("trend"),
            F.round(F.col("f")["l"] + 3 * F.col("f")["b"], 6).alias(
                "forecast_3"
            ),
        )
    )


# --------------------------------------------------------------------------
# E37 — interval-union coverage (gaps-and-islands over half-open spans)
# --------------------------------------------------------------------------
_E37_SPAN_MS = 300_000  # each event covers [ts, ts + 5 minutes)


@register(
    "e37_interval_coverage",
    oracle=(
        EVENTS_CTE + ", iv AS ("
        "  SELECT user_id, event_id, epoch_ms(ts) AS s, "
        f"  epoch_ms(ts) + {_E37_SPAN_MS} AS e FROM events), "
        "fl AS (SELECT user_id, event_id, s, e, "
        "  CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL "
        "  OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "  THEN 1 ELSE 0 END AS new_island FROM iv), "
        "isl AS (SELECT user_id, s, e, SUM(new_island) OVER ("
        "  PARTITION BY user_id ORDER BY s, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid FROM fl), "
        "agg AS (SELECT user_id, iid, MIN(s) AS st, MAX(e) AS en, "
        "  COUNT(*) AS n FROM isl GROUP BY 1, 2) "
        "SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, "
        "CAST(COUNT(*) AS BIGINT) AS n_islands, "
        "CAST(SUM(en - st) AS BIGINT) AS covered_ms "
        "FROM agg GROUP BY user_id"
    ),
    section="E37",
)
def e37_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of overlapping half-open activity spans per user
    (each event covers [ts, ts+5 min)) — the 'total distinct busy
    time' metric behind SLA coverage, sensor uptime, and exposure
    windows, where naive n×span double-counts every overlap. E16's
    gaps-and-islands machinery lifted from days to millisecond
    intervals: an island opens when a span starts strictly after the
    running max-end of everything before it (touching spans merge —
    half-open semantics), islands fold to (min start, max end), and
    coverage is Σ(end − start). ENTIRELY integer (epoch-ms + span),
    so the hash needs no tolerance. Two window passes + two
    aggregates, all on one user_id shuffle."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("s"),
        (F.unix_millis("ts") + _E37_SPAN_MS).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    fl = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    isl = fl.withColumn(
        "iid",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agg = isl.groupBy("user_id", "iid").agg(
        F.min("s").alias("st"), F.max("e").alias("en"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).cast("bigint").alias("covered_ms"),
    )
