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
