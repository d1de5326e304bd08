"""Registry hygiene: the driver contract every query must satisfy."""

from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry


def test_registry_contract():
    reg = registry()
    assert len(reg) >= 65
    for name, spec in reg.items():
        assert spec.name == name
        assert spec.doc, f"{name} has no doc"
        if spec.bench:
            assert spec.oracle is not None, f"bench query {name} must be oracled"
    rows_only = [n for n, s in reg.items() if s.oracle is None]
    # every query — including the approximate-but-deterministic IVF —
    # carries a full value-hash oracle
    assert rows_only == []


def test_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert set(o) == set(q)
