"""Hash-stability discipline (SURVEY.md §5.3).

The driver's t2 check is an ORDER-INSENSITIVE VALUE HASH of the Spark
result vs the DuckDB oracle result, compared after sorting columns by
name — so both sides must produce bit-identical values under matching
column names and pandas-compatible dtypes.

Probed hazards baked in here:

1. Float aggregation order: Spark's partial+final agg sums doubles in a
   different order than DuckDB. Fix: cast per-row to exact DECIMAL,
   SUM the decimals (associative, exact), cast the total back to DOUBLE.
   Both engines then convert the *same exact decimal* to the *same
   nearest double* → bit-identical. Averages become
   ``decimal_sum_as_double / count`` — one IEEE division of
   deterministic operands.
2. Decimal output dtype differs between Spark-toPandas (object/Decimal)
   and DuckDB-fetchdf → never OUTPUT a decimal column; always cast the
   final aggregate to DOUBLE.
3. ``events.ts`` is parquet timestamp[ns]; Spark truncates ns→µs on
   read → ``date_trunc('millisecond', …)`` on both sides before output.
4. Nondeterministic orders: ``collect_list`` needs ``array_sort``;
   ``first/last`` → ``min_by/max_by``; every LIMIT needs a total order
   with a unique tie-break key.
5. Divergent semantics we stay away from: Spark ``round`` half-up vs
   DuckDB half-even on exact .5 representables; ``dayofweek`` origin
   (Spark Sun=1, DuckDB Sun=0); Java-regex-only syntax (lookbehind).

Each Spark helper has an ``o_*`` twin emitting the equivalent DuckDB
SQL fragment, so declared queries compose both sides from one source
of truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact decimal: 6 fractional digits covers every fixture money grain
# (price 2dp × (1-disc) 2dp × (1+tax) 2dp = 6dp), 28 digits total keeps
# sf0.1-scale sums (≤ ~1e12) far from overflow.
DEC = "decimal(28,6)"
O_DEC = "DECIMAL(28,6)"


# Oracle-side twin of the loader's events.ts ns→ms truncation: prefix
# any oracle SQL touching events with this CTE (shadows the view).
EVENTS_CTE = (
    "WITH events AS (SELECT event_id, "
    "date_trunc('milliseconds', ts) AS ts, "
    "user_id, event_type, value, props FROM main.events)"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str) -> Column:
    """Per-row cast to exact decimal BEFORE aggregation."""
    return _c(col).cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive SUM: decimal-exact internally, DOUBLE out."""
    return F.sum(dec(col)).cast("double").alias(alias)


def o_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {O_DEC})) AS DOUBLE) AS {alias}"


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum / non-null count."""
    c = _c(col)
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def o_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {O_DEC})) AS DOUBLE) / COUNT({expr}) AS {alias}"


def ts_ms(col: Column | str, alias: str | None = None) -> Column:
    """Millisecond-truncated timestamp for stable output.

    Oracle twin: ``o_ts_ms``.
    """
    out = F.date_trunc("millisecond", _c(col))
    return out.alias(alias) if alias else out


def o_ts_ms(expr: str, alias: str | None = None) -> str:
    sql = f"date_trunc('milliseconds', {expr})"
    return f"{sql} AS {alias}" if alias else sql


def sorted_list(col: Column | str, alias: str) -> Column:
    """collect_list made deterministic.

    Oracle twin: ``list(x ORDER BY x)`` (DuckDB sorts NULLS LAST by
    default in ORDER BY; Spark ``array_sort`` also puts nulls last).
    """
    return F.array_sort(F.collect_list(_c(col))).alias(alias)


def rnd(col: Column | str, scale: int, alias: str | None = None) -> Column:
    """Round a post-aggregation double (quotients, stddevs) where the
    result is analytically noisy anyway; grid must be ≫ FP noise."""
    out = F.round(_c(col), scale)
    return out.alias(alias) if alias else out
