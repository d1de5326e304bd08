from __future__ import annotations

import pytest

from legal_data_ingestion_rag_pipeline_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", cpus=8, extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
