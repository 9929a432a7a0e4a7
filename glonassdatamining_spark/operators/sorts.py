"""§2.F — sorts, limits, top-k, sampling.

The t2 hash is order-insensitive, but LIMIT changes the SET of rows, so
every declared limit sits on a total order with a unique key
(SURVEY §5.3.3). Spark fuses orderBy+limit into TakeOrderedAndProject —
per-partition top-k then a k-sized driver merge, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load


@register(
    "f1_multikey_sort",
    oracle=(
        "SELECT p_brand, p_size, p_partkey, p_retailprice FROM part "
        "ORDER BY p_brand ASC, p_size DESC, p_partkey ASC NULLS LAST"
    ),
    section="F1",
)
def f1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + local sort).
    The hash check is order-insensitive; the sort is still exercised."""
    return (
        load(spark, sf_dir, "part")
        .select("p_brand", "p_size", "p_partkey", "p_retailprice")
        .orderBy(F.col("p_brand").asc(), F.col("p_size").desc(), F.col("p_partkey").asc_nulls_last())
    )


@register(
    "f2_limit",
    oracle=(
        "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
        "ORDER BY o_orderdate, o_orderkey LIMIT 100"
    ),
    section="F2",
)
def f2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "f3_global_topk",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"
    ),
    section="F3",
)
def f3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — each task keeps its local
    top-25, the driver merges 25·numPartitions rows. O(n) scan, O(k)
    result at any scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "f4_sample",
    oracle=None,  # RNG streams differ across engines — rows-only
    section="F4",
)
def f4_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample — deterministic within Spark (same seed,
    same partitioning), but no cross-engine oracle exists."""
    return load(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "f5_offset_pagination",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40"
    ),
    section="F5",
)
def f5_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET pagination (round-1 addition): page 3 of a price-ranked
    listing via `offset(40).limit(20)` over a total order (unique
    tie-break key — SURVEY §5.3.3). Scale note: OFFSET still computes
    the first N+k rows (TakeOrdered with a bigger k) — fine for UI
    page depths; for deep scans use keyset pagination (WHERE
    (price, key) < last_seen ORDER BY ... LIMIT k), which is an
    indexed/pruned range predicate instead."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "f6_hash_sample",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE md5(CAST(o_orderkey AS VARCHAR)) < '19'"
    ),
    section="F6",
)
def f6_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold sample (~25/256 ≈ 9.8%): keep a
    row iff md5(key) sorts below a fixed hex prefix — the
    reproducible-pipeline complement of F4's seeded RNG sample. A
    hash sample is stable under repartitioning, re-runs, engine
    changes, AND incremental appends (a row's fate depends only on
    its key), which is why train/eval splits and A/B bucketing at
    100 TB are done this way rather than with RNG streams — and,
    unlike F4, it is exactly oracle-checkable because md5 and string
    comparison are engine-independent. Scale shape: a pure narrow
    filter fused into the scan stage — no shuffle, no state, no
    seed coordination across executors."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.md5(F.col("o_orderkey").cast("string")) < "19"
    ).select("o_orderkey", "o_totalprice")


@register(
    "f7_stratified_hash_sample",
    oracle=(
        "SELECT c_custkey, c_mktsegment, c_acctbal "
        "FROM customer "
        "WHERE md5(CAST(c_custkey AS VARCHAR)) < "
        "      CASE WHEN c_mktsegment = 'BUILDING' THEN '40' ELSE '10' END"
    ),
    section="F7",
)
def f7_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED deterministic hash sample — F6's reproducible
    hash-threshold gate with a PER-STRATUM rate (sampleBy's semantics
    without its RNG): BUILDING customers kept at ~25% (md5 < '40'),
    every other segment at ~6.25% (md5 < '10') — the class-rebalancing
    / eval-split primitive a 100 TB curation run uses so minority
    strata survive sampling. Same engine-independence argument as F6
    (md5 + string compare exist identically in both engines; a row's
    fate depends only on its key and stratum, so the sample is stable
    under repartitioning, re-runs, and appends). Scale shape: a pure
    narrow filter fused into the scan — the per-stratum threshold is
    a CASE expression, not a join, so there is still no shuffle, no
    seed coordination, no skew sensitivity."""
    c = load(spark, sf_dir, "customer")
    thr = F.when(F.col("c_mktsegment") == "BUILDING", "40").otherwise("10")
    return c.filter(
        F.md5(F.col("c_custkey").cast("string")) < thr
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


# --------------------------------------------------------------------------
# F7 is in this file above; F8 — weighted sample without replacement
# --------------------------------------------------------------------------
@register(
    "f8_weighted_sample",
    oracle=(
        "WITH pr AS (SELECT o_orderkey, o_totalprice, "
        "ROUND(ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))"
        "::BIGINT + 0.5) / 4294967296.0) / o_totalprice, 12) AS priority "
        "FROM orders) "
        "SELECT o_orderkey, o_totalprice, priority FROM pr "
        "ORDER BY priority DESC, o_orderkey LIMIT 20"
    ),
    section="F8",
)
def f8_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, top-20 by order value —
    Efraimidis–Spirakis (2006) A-Res: each row draws a deterministic
    uniform u from md5(key) (first 8 hex digits + 0.5, over 2³², so
    u is an EXACT double on both engines) and wins with priority
    ln(u)/w — taking the k largest priorities is provably a w-weighted
    sample without replacement. The F6 hash-sample's weighted sibling,
    and like it reproducible under repartitioning, re-runs, engine
    swaps, and incremental appends (a row's fate depends only on its
    key and weight) — which is exactly why 100 TB importance-sampling
    pipelines use hash-priority draws instead of RNG streams. FP
    discipline: ln quashed to 12 dp (libm-ulp), orderkey tie-break
    total-orders the cut. Scale shape: narrow per-row arithmetic
    fused into the scan + ONE TakeOrderedAndProject — no shuffle, no
    seed coordination; per-partition heaps carry k rows each."""
    o = load(spark, sf_dir, "orders")
    v = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    pr = F.round(F.log(u) / F.col("o_totalprice"), 12)
    return (
        o.select("o_orderkey", "o_totalprice", pr.alias("priority"))
        .orderBy(F.col("priority").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# F9 — SQL TABLESAMPLE surface (round-6 queue)
# --------------------------------------------------------------------------
@register("f9_tablesample", oracle=None, section="F9")
def f9_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TABLESAMPLE (10 PERCENT) REPEATABLE (42)`` — the SQL sampling
    surface beside the DataFrame forms already declared (F4 random,
    F6 deterministic hash, F7 stratified, F8 weighted): a Bernoulli
    row filter pushed INTO the scan (SampleExec directly over the
    FileScan — no shuffle, no materialization of the unsampled rows),
    seeded for repeatability. Rows-only by nature: membership depends
    on the seeded per-partition RNG stream, which no cross-engine
    oracle can replay; the properties that matter — same-seed
    determinism within a session, sample ⊆ source, fraction within
    Chernoff bounds — are asserted in tests/test_contract.py. For
    content-addressed (layout-independent) sampling the declared tool
    is F6's hash filter; TABLESAMPLE is the cheap-scan form."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    )
