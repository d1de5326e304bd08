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


def test_gate_priority_spends_the_full_budget():
    """The driver gates the FIRST 50 registered queries; GATE_PRIORITY
    is that budget spent explicitly. Every listed name must exist (a
    typo would silently shift the window) and registry order must
    start with exactly the priority list."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import (
        GATE_PRIORITY,
        registry,
    )

    reg = registry()
    assert len(GATE_PRIORITY) == 50
    assert len(set(GATE_PRIORITY)) == 50
    missing = [n for n in GATE_PRIORITY if n not in reg]
    assert missing == []
    assert list(reg)[:50] == list(GATE_PRIORITY)


def test_registered_fn_matches_module_name():
    """A @register decorator directly above `def helper` silently
    registers the HELPER under the query's name (this bit round 9:
    the dbscan_srp refactor briefly pointed the registry at the
    edge-generator). For every registered name that also exists as a
    module-level attribute, the two must be the SAME function."""
    import importlib

    reg = registry()
    mismatches = []
    for name, spec in reg.items():
        mod = importlib.import_module(spec.spark.__module__)
        attr = getattr(mod, name, None)
        if attr is not None and callable(attr) and attr is not spec.spark:
            mismatches.append(name)
    assert not mismatches, f"registry/module divergence: {mismatches}"
