"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query at sf0.001 (smoke check).
- ``queries()``      — one callable per implemented operator from
                       SURVEY.md §2, each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``   — matching DuckDB SQL for the correctness gate.

All real logic lives in ``legal_data_ingestion_rag_pipeline_spark``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
# the driver runs the correctness gate (Spark vs oracle SQL) at sf0.01;
# callable oracles (data-derived literals) are rendered against it.
GATE_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the list_cases-analog top-k (scan -> broadcast dim join
    -> filter -> TakeOrderedAndProject), SURVEY §7.1's end-to-end spine."""
    reg = registry()
    return reg["list_topk_by_date"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in registry().items():
        sql = spec.oracle_sql(GATE_SF_DIR)
        if sql is not None:
            out[name] = sql
    return out
