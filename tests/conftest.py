from __future__ import annotations

import sys
from pathlib import Path

import pytest

from legal_data_ingestion_rag_pipeline_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", cpus=8, extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def built_queries(spark):
    """Every registered query built ONCE at sf0.001 under the
    machinery-coverage sys.setprofile trace.  Returns
    (dfs, calls, errors): query -> built DataFrame / traced
    operator-function call set / build-error string.

    The plan-invariant sweep, the streaming-source sweep, and the
    zero-dark-machinery test each used to build the full registry
    themselves — three ~3-4 min passes of the same eager plan
    construction (ingest batches, BSP loops, trainer collects) per
    test session.  One shared traced pass serves all three (r14
    test-wall fix; round-13 verdict ask #2)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import machinery_coverage as MC

    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    sf = "/root/testdata/sf0.001"
    dfs: dict = {}
    calls: dict = {}
    errors: dict = {}
    for name, spec in registry().items():
        try:
            hits, df = MC.trace_query_calls_df(spark, spec, sf)
            dfs[name] = df
            calls[name] = hits
        except Exception as e:  # noqa: BLE001 - collect, don't abort the sweep
            errors[name] = str(e)[:200]
    return dfs, calls, errors
