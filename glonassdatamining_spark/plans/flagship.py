"""Flagship query (SURVEY.md §7.2) — TPC-H-Q1-shaped pricing summary.

Exercises the full scan→filter→project→agg→sort spine on the largest
table with zero joins. Scale notes: single shuffle (the groupBy) over a
4-value composite key; partial aggregation collapses each map task's
output to ≤4 rows, so at 100 TB the shuffle moves kilobytes — the job
is scan-bound, which is the best you can do for a full-table summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glonassdatamining_spark.registry import register
from glonassdatamining_spark.sources import load
from glonassdatamining_spark.stable import davg, dsum, o_davg, o_dsum


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum('l_quantity', 'sum_qty')},
  {o_dsum('l_extendedprice', 'sum_base_price')},
  {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {o_davg('l_quantity', 'avg_qty')},
  {o_davg('l_extendedprice', 'avg_price')},
  {o_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register("q1_pricing_summary", oracle=FLAGSHIP_ORACLE, section="D1")(flagship)
