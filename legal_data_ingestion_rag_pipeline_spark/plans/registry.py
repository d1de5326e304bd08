"""Query registry shared by all driver-facing query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views
    bench: bool = False  # part of bench.py's headline set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, doc)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing plans pulls in every module)."""
    from . import (  # noqa: F401
        driver_queries,
        driver_queries_analytics,
        driver_queries_multimodal,
        driver_queries_scale,
        driver_queries_similarity,
        driver_queries_streaming,
    )

    return dict(_REGISTRY)
