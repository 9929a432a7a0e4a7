"""§2.G — set operations.

Declared over two customer-key subsets: BUILDING-segment customers (A)
vs customers holding an open ('O') order (B). Spark set ops map to
aggregate/join plans — UNION is a concat, the distinct variants add a
hash aggregate, INTERSECT/EXCEPT [ALL] become (counted) semi/anti
shapes — all shuffle once on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load

_A_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_B_SQL = (
    "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'"
)


def _a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "g1_union_all",
    oracle=f"{_A_SQL} UNION ALL {_B_SQL}",
    section="G1",
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by position — no shuffle at all (plan concatenation)."""
    return _a(spark, sf_dir).union(_b(spark, sf_dir))


@register(
    "g2_union_distinct",
    oracle=f"{_A_SQL} UNION {_B_SQL}",
    section="G2",
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _a(spark, sf_dir).union(_b(spark, sf_dir)).distinct()


@register(
    "g3_intersect_all",
    oracle=f"({_A_SQL}) INTERSECT ALL ({_B_SQL})",
    section="G3",
)
def g3_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — multiplicity = min(count_A, count_B)."""
    return _a(spark, sf_dir).intersectAll(_b(spark, sf_dir))


@register(
    "g4_except_all",
    oracle=f"({_B_SQL}) EXCEPT ALL ({_A_SQL})",
    section="G4",
)
def g4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — open-order custkey occurrences minus BUILDING
    membership count."""
    return _b(spark, sf_dir).exceptAll(_a(spark, sf_dir))


_G5_SRC_SQL = (
    # CDC-feed simulation: balance adjustments for existing accounts
    # (open-order revenue per custkey) plus a new-account feed
    # (finished-order custkeys shifted past the key space).
    "SELECT o_custkey AS custkey, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS delta "
    "FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey "
    "UNION ALL "
    "SELECT o_custkey + 10000000 AS custkey, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS delta "
    "FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey"
)


@register(
    "g5_merge_upsert",
    oracle=(
        f"WITH src AS ({_G5_SRC_SQL}) "
        "SELECT COALESCE(c.c_custkey, s.custkey) AS c_custkey, "
        "COALESCE(c.c_name, 'new-' || CAST(s.custkey AS VARCHAR)) AS c_name, "
        "ROUND(CASE WHEN c.c_custkey IS NOT NULL "
        "      THEN c.c_acctbal + COALESCE(s.delta, 0.0) ELSE s.delta END, 2) AS c_acctbal, "
        "CASE WHEN s.custkey IS NULL THEN 'unchanged' "
        "     WHEN c.c_custkey IS NULL THEN 'inserted' ELSE 'updated' END AS merge_action "
        "FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.custkey"
    ),
    section="G5",
)
def g5_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / upsert (the core ETL mutation), expressed as its
    relational identity: FULL OUTER JOIN target×source + per-branch
    projection — WHEN MATCHED THEN UPDATE (balance += delta), WHEN NOT
    MATCHED THEN INSERT (new account row), unmatched target rows pass
    through. Returns the merged table (a lakehouse MERGE materializes
    exactly this frame into the new table version).

    Scale shape: one shuffle on the merge key each side (SMJ); with a
    bucketed/Z-ordered target (A8) the join co-locates and Delta-style
    file pruning touches only matched files. The source aggregate is
    partial-aggregated before its shuffle (stable.dsum discipline)."""
    from glonassdatamining_spark.stable import dsum

    o = load(spark, sf_dir, "orders")
    adj = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(dsum("o_totalprice", "delta"))
    )
    new = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy((F.col("o_custkey") + 10000000).alias("custkey"))
        .agg(dsum("o_totalprice", "delta"))
    )
    src = adj.union(new)
    c = load(spark, sf_dir, "customer")
    j = c.join(src, c.c_custkey == src.custkey, "full_outer")
    return j.select(
        F.coalesce(c.c_custkey, src.custkey).alias("c_custkey"),
        F.coalesce(c.c_name, F.concat(F.lit("new-"), src.custkey.cast("string"))).alias(
            "c_name"
        ),
        F.round(
            F.when(
                c.c_custkey.isNotNull(),
                c.c_acctbal + F.coalesce(src.delta, F.lit(0.0)),
            ).otherwise(src.delta),
            2,
        ).alias("c_acctbal"),
        F.when(src.custkey.isNull(), "unchanged")
        .when(c.c_custkey.isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )
