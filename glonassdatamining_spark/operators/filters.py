"""§2.B — projection, filters, predicates, distinct.

All pure JVM column expressions — whole-stage-codegen'd, pushdown-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load


@register(
    "b1_project_compute",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS disc_price, "
        "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) AS charge, "
        "l_quantity AS qty "
        "FROM lineitem"
    ),
    section="B1",
)
def b1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + rename + computed columns. Per-row double arithmetic is
    IEEE-deterministic, so no decimal discipline needed (no aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "b2_filter_bool",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE (o_orderstatus = 'F' AND o_totalprice > 100000.0) "
        "OR (o_orderstatus = 'O' AND NOT o_totalprice > 50000.0)"
    ),
    section="B2",
)
def b2_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive/negated predicates."""
    o = load(spark, sf_dir, "orders")
    pred = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)) | (
        (F.col("o_orderstatus") == "O") & ~(F.col("o_totalprice") > 50000.0)
    )
    return o.filter(pred).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "b3_predicates",
    oracle=(
        "SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer "
        "WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') "
        "AND c_acctbal BETWEEN 0.0 AND 5000.0 "
        "AND c_name LIKE '%5%' "
        "AND c_nationkey IS NOT NULL"
    ),
    section="B3",
)
def b3_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NULL membership-range-pattern-null tests."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(0.0, 5000.0)
        & F.col("c_name").like("%5%")
        & F.col("c_nationkey").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "b4_conditional_projection",
    oracle=(
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice > 200000.0 THEN 'big' "
        "     WHEN o_totalprice > 100000.0 THEN 'mid' "
        "     ELSE 'small' END AS bucket, "
        "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label, "
        "LEAST(o_totalprice, 150000.0) AS capped, "
        "GREATEST(o_totalprice, 1000.0) AS floored "
        "FROM orders"
    ),
    section="B4",
)
def b4_conditional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p > 200000.0, "big").when(p > 100000.0, "mid").otherwise("small").alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_label"),
        F.least(p, F.lit(150000.0)).alias("capped"),
        F.greatest(p, F.lit(1000.0)).alias("floored"),
    )


@register(
    "b5_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    section="B5",
)
def b5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination — hash aggregate under the hood; partial
    (map-side) distinct keeps the shuffle tiny for low-cardinality keys."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "b6_null_safe_equality",
    oracle=(
        "SELECT a.event_id AS ev_a, b.event_id AS ev_b "
        "FROM (SELECT event_id, TRY_CAST(json_extract_string(props, '$.missing') AS INT) AS tag, "
        "      event_id % 100 AS grp FROM events) a "
        "JOIN (SELECT event_id, TRY_CAST(json_extract_string(props, '$.missing') AS INT) AS tag, "
        "      event_id % 100 AS grp FROM events) b "
        "ON a.grp = b.grp AND a.tag IS NOT DISTINCT FROM b.tag "
        "AND a.event_id < b.event_id WHERE a.grp = 7"
    ),
    section="B6",
)
def b6_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (`<=>` / IS NOT DISTINCT FROM; round-1
    addition): NULL keys MATCH each other instead of vanishing — the
    semantics CDC/merge pipelines need when join keys are nullable.
    Derived NULL tags (a JSON path that never exists) prove the
    NULL=NULL matches flow through a real join."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.missing') AS int)").alias("tag"),
        (F.col("event_id") % 100).alias("grp"),
    ).filter(F.col("grp") == 7)
    a = tagged.select(
        F.col("event_id").alias("ev_a"), F.col("tag").alias("tag_a"), "grp"
    )
    b = tagged.select(
        F.col("event_id").alias("ev_b"), F.col("tag").alias("tag_b"), "grp"
    )
    return (
        a.join(b, "grp")
        .filter(
            F.col("tag_a").eqNullSafe(F.col("tag_b"))
            & (F.col("ev_a") < F.col("ev_b"))
        )
        .select("ev_a", "ev_b")
    )


_B7_SQL = (
    "SELECT c_custkey, c_name, "
    "(SELECT COUNT(*) FROM orders o "
    " WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0) AS n_big "
    "FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
    "              AND o2.o_orderstatus = 'O') "
    "AND NOT EXISTS (SELECT 1 FROM orders o3 WHERE o3.o_custkey = c.c_custkey "
    "                AND o3.o_orderstatus = 'P')"
)


@register("b7_correlated_subquery", oracle=_B7_SQL, section="B7")
def b7_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries — EXISTS, NOT EXISTS, and a correlated
    scalar COUNT — written as SQL and left to Catalyst's decorrelation
    (RewriteCorrelatedScalarSubquery + RewritePredicateSubquery,
    SURVEY §4.1): the optimizer turns them into left-semi, left-anti,
    and aggregate-then-left-join plans — the same shapes C4/C5 build
    by hand. IDENTICAL SQL text runs on DuckDB (its own decorrelator).
    No per-row subquery execution survives in either engine."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_B7_SQL)


_B8_SQL = (
    "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice "
    "FROM customer c, LATERAL ("
    "  SELECT o_orderkey, o_totalprice FROM orders o "
    "  WHERE o.o_custkey = c.c_custkey "
    "  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t "
    "WHERE c.c_mktsegment = 'MACHINERY'"
)


@register("b8_lateral_join", oracle=_B8_SQL, section="B8")
def b8_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table — top-2 orders per MACHINERY
    customer. Spark 4 plans the correlated LATERAL ... LIMIT as a
    DomainJoin → window-ranked rewrite (its lateral decorrelation),
    i.e. the same single-shuffle rank-filter E7 builds by hand — no
    per-row re-execution. IDENTICAL SQL runs on DuckDB (its own
    lateral unnesting). The per-key LIMIT is deterministic via the
    (o_totalprice DESC, o_orderkey) total order."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_B8_SQL)


_B9_SQL = (
    "WITH RECURSIVE spine(m) AS ("
    "  SELECT TIMESTAMP '1995-01-01'"
    "  UNION ALL"
    "  SELECT m + INTERVAL 1 MONTH FROM spine "
    "WHERE m < TIMESTAMP '2001-08-01'), "
    "u AS (SELECT date_trunc('month', o_orderdate) AS m, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM orders "
    "WHERE o_orderpriority = '1-URGENT' GROUP BY 1) "
    "SELECT spine.m AS month, COALESCE(n, CAST(0 AS BIGINT)) AS n_urgent "
    "FROM spine LEFT JOIN u ON u.m = spine.m"
)


@register("b9_recursive_cte", oracle=_B9_SQL, section="B9")
def b9_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) generating the 80-month
    calendar spine over the orders range, LEFT-joined to monthly URGENT
    order counts — the canonical spine/gap-fill pattern: months with
    zero urgent orders surface as explicit 0 rows (three such months at
    sf0.001) instead of silently missing. ONE SQL string runs verbatim
    on both engines. Scale shape: the recursion builds only the
    constant-size spine (80 rows, well under Spark's default 100-level
    ``spark.sql.cteRecursionLevelLimit``; raise the knob for deeper
    spines), broadcast into the left join; the fact-side aggregate is
    one ordinary month-key groupBy."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_B9_SQL)


# --------------------------------------------------------------------------
# B10 — collation-aware comparison (Spark 4 collations)
# --------------------------------------------------------------------------
@register(
    "b10_collation_compare",
    oracle=(
        "WITH mixed AS (SELECT CASE WHEN doc_id % 2 = 1 "
        "THEN upper(substr(source, 1, 1)) || substr(source, 2) "
        "ELSE source END AS s FROM documents) "
        "SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_binary_distinct, "
        "CAST(COUNT(DISTINCT lower(s)) AS BIGINT) AS n_ci_distinct "
        "FROM mixed"
    ),
    section="B10",
)
def b10_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4's collation engine):
    the same distinct-count run under binary collation and under
    UTF8_LCASE — the declarative way to make grouping / joins /
    dedup case-insensitive WITHOUT wrapping every column in lower()
    (the collated comparison pushes into hash computation and
    codegen; a lower() wrapper blocks dictionary-encoding reuse and
    rewrites every predicate). Mixed case is synthesized
    deterministically (odd doc_ids title-cased) since the fixture is
    lowercase; the DuckDB oracle replays the lower() identity —
    UTF8_LCASE equality ≡ equality of lower() for ASCII — so the
    collated path is hash-checked, not just materialized. Scale
    shape: two distinct aggregates over one scan, both
    map-side-combinable."""
    mixed = load(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substr(source, 2)"),
            ),
        )
        .otherwise(F.col("source"))
        .alias("s")
    )
    return mixed.agg(
        F.countDistinct("s").cast("bigint").alias("n_binary_distinct"),
        F.countDistinct(F.collate(F.col("s"), "UTF8_LCASE"))
        .cast("bigint")
        .alias("n_ci_distinct"),
    )


# --------------------------------------------------------------------------
# B11 — quantified comparisons (>= ALL / < ANY)
# --------------------------------------------------------------------------
@register(
    "b11_quantified_comparison",
    oracle=(
        "SELECT a.p_brand, a.p_partkey, a.p_name, a.p_retailprice, "
        "CAST(a.p_retailprice < ANY (SELECT p_retailprice FROM part "
        "  WHERE p_type = 'PROMO') AS INT) AS below_some_promo "
        "FROM part a "
        "WHERE a.p_retailprice >= ALL (SELECT b.p_retailprice FROM part b "
        "  WHERE b.p_brand = a.p_brand)"
    ),
    section="B11",
)
def b11_quantified_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI quantified comparisons — brand champions via
    ``>= ALL (correlated)`` plus a ``< ANY (uncorrelated)`` flag.
    Spark SQL has no ALL/ANY quantifiers, so the operator is their
    relational identity, which is also the only formulation that
    SCALES: ``x >= ALL S`` ⇔ ``x >= max(S)`` (one window max per
    brand, no correlated re-scan per row) and ``x < ANY S`` ⇔
    ``x < max(S)`` (one 1-row broadcast scalar). The oracle runs
    DuckDB's NATIVE quantifiers against this rewrite — proving the
    identity, not assuming it. Comparisons stay on the parquet
    doubles themselves (no arithmetic), so cross-engine equality is
    bit-exact. Ties: every co-champion row surfaces (ALL-semantics
    keeps ties; no row_number tie-break to diverge on). Empty-set
    edge: SQL's ``x < ANY (empty)`` is FALSE while ``x < max(empty)``
    is NULL — the flag is coalesced to 0 so the identity holds even
    when no 'PROMO' rows exist (the fixture happens to have them,
    but the rewrite must not depend on that)."""
    p = load(spark, sf_dir, "part")
    brand_max = Window.partitionBy("p_brand")
    promo_max = p.filter(F.col("p_type") == "PROMO").agg(
        F.max("p_retailprice").alias("promo_max")
    )
    return (
        p.withColumn("_bmax", F.max("p_retailprice").over(brand_max))
        .filter(F.col("p_retailprice") >= F.col("_bmax"))
        .crossJoin(F.broadcast(promo_max))
        .select(
            "p_brand", "p_partkey", "p_name", "p_retailprice",
            F.coalesce(
                (F.col("p_retailprice") < F.col("promo_max")).cast("int"),
                F.lit(0),
            ).alias("below_some_promo"),
        )
    )


# --------------------------------------------------------------------------
# B12 — GROUP BY ALL / ORDER BY ALL (resolver-driven grouping)
# --------------------------------------------------------------------------
_B12_SQL = (
    "SELECT o_orderstatus, substr(o_orderpriority, 1, 1) AS prio, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue "
    "FROM orders GROUP BY ALL ORDER BY ALL"
)


@register("b12_group_by_all", oracle=_B12_SQL, section="B12")
def b12_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` (Spark 3.4+/4 resolver
    feature, same surface in DuckDB/Snowflake): the analyzer derives
    the grouping key as every non-aggregate SELECT item — here one
    raw column and one COMPUTED expression (substr of the priority),
    the case that actually exercises the resolver (it must group by
    the expression, not the underlying column). ONE SQL string runs
    verbatim on both engines, so what is hash-checked is the
    resolver's grouping-key inference itself. Revenue rides the
    stable.dsum decimal discipline. Scale shape: identical to an
    explicit-key hash aggregate — resolution is compile-time sugar,
    the physical plan is the same partial/final agg pair."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_B12_SQL)


# --------------------------------------------------------------------------
# B13 — VALUES inline table + UNPIVOT INCLUDE NULLS
# --------------------------------------------------------------------------
_B13_BODY = (
    "WITH quota (r_name, quota) AS (VALUES "
    "  ('AFRICA', CAST(100000 AS DOUBLE)), "
    "  ('ASIA', CAST(250000 AS DOUBLE)), "
    "  ('EUROPE', CAST(400000 AS DOUBLE))), "
    "rev AS (SELECT r.r_name, "
    "  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue "
    "  FROM region r "
    "  JOIN nation n ON n.n_regionkey = r.r_regionkey "
    "  JOIN customer c ON c.c_nationkey = n.n_nationkey "
    "  JOIN orders o ON o.o_custkey = c.c_custkey "
    "  GROUP BY r.r_name), "
    "j AS (SELECT rev.r_name, q.quota, rev.revenue "
    "  FROM rev LEFT JOIN quota q ON rev.r_name = q.r_name) "
)


@register(
    "b13_values_unpivot_nulls",
    oracle=(
        _B13_BODY
        + "SELECT r_name, 'quota' AS metric, quota AS amount FROM j "
        "UNION ALL "
        "SELECT r_name, 'revenue' AS metric, revenue AS amount FROM j"
    ),
    section="B13",
)
def b13_values_unpivot_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table (an aliased-column CTE, no createDataFrame
    round trip) joined under a regional revenue rollup, then SQL
    ``UNPIVOT INCLUDE NULLS`` — the variant whose whole point is the
    rows the DEFAULT unpivot would silently drop: regions with no
    quota row surface as (r_name, 'quota', NULL), so target-coverage
    reports can't lose the uncovered regions. The DuckDB oracle
    states unpivot's defining identity instead of its syntax — a
    UNION ALL of one SELECT per measure column — so what is
    hash-checked is Spark's unpivot semantics (including the NULL
    retention), not a shared parser. Revenue rides the stable.dsum
    decimal discipline; the VALUES literals are typed explicitly so
    both engines agree on DOUBLE. Scale shape: the inline table is a
    3-row broadcast; unpivot is a row-local expand (no shuffle)."""
    from glonassdatamining_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _B13_BODY
        + "SELECT r_name, metric, amount FROM j "
        "UNPIVOT INCLUDE NULLS (amount FOR metric IN (quota, revenue))"
    )
