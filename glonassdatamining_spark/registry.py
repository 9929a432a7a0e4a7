"""Declared-query registry — the bridge to ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers itself here with a stable
name (the §2 ``ID`` lowercased, e.g. ``c9_asof_join``), a DataFrame
builder ``(spark, sf_dir) -> DataFrame``, and — when the semantics are
ANSI-SQL-expressible — the equivalent DuckDB oracle SQL string. The
driver hash-compares the two at sf=0.01 (row count + schema +
order-insensitive value hash), so builders must follow the stability
discipline in ``stable.py`` (SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Declared:
    name: str
    builder: QueryFn
    oracle: str | None  # None → driver records weaker rows-only check
    section: str  # SURVEY.md §2 row id, e.g. "C9"


_REGISTRY: dict[str, Declared] = {}


def register(name: str, oracle: str | None = None, section: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        _REGISTRY[name] = Declared(name, fn, oracle, section or name.split("_")[0].upper())
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: d.builder for n, d in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: d.oracle for n, d in sorted(_REGISTRY.items()) if d.oracle is not None}


def get(name: str) -> Declared:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are here (not module top) to avoid circulars: these modules
    # import ``register`` from us.
    from glonassdatamining_spark.sources import scans  # noqa: F401
    from glonassdatamining_spark.operators import (  # noqa: F401
        filters,
        joins,
        aggregates,
        windows,
        sorts,
        sets,
        spatiotemporal,
        llm_ops,
        ml_ops,
        udf_ops,
        graphs,
    )
    from glonassdatamining_spark.functions import scalars  # noqa: F401
    from glonassdatamining_spark.streaming import batch_twins  # noqa: F401
    from glonassdatamining_spark.plans import composites, flagship  # noqa: F401

    _LOADED = True
