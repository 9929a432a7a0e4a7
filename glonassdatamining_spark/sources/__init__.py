"""Sources & sinks (SURVEY.md §2.A)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A1 Parquet scan — schema from footer, vectorized reader.

    Column pruning (A2) and predicate pushdown (A3) happen automatically
    when callers ``.select``/``.filter`` on the returned frame: Catalyst
    pushes both into this scan (verify via ``.explain`` →
    ``PushedFilters`` / ``ReadSchema``).

    ``events.ts`` has shipped as either parquet TIMESTAMP(NANOS) (read
    via the legacy nanos-as-long path) or TIMESTAMP(MICROS) → Spark
    TIMESTAMP_NTZ, depending on fixture generation. Either way the
    column is truncated to millisecond grain — the same truncation
    every oracle applies via ``stable.EVENTS_CTE`` — so both engines
    compute on identical ms-grain instants (SURVEY §5.3).
    """
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(raw.schema["ts"].dataType, LongType):
            return raw.withColumn("ts", F.timestamp_millis(F.expr("ts div 1000000")))
        return raw.withColumn("ts", F.date_trunc("millisecond", F.col("ts")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """SQL-string entry (SURVEY §3.2 E-3 / §3.3): register every corpus
    table as a temp view so ``spark.sql("SELECT ... FROM lineitem
    ...")`` works directly. Views go through :func:`load`, so the
    ``events`` ns→ms shim applies to SQL users too. Idempotent."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
