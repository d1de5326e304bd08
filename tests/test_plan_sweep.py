"""Global physical-plan invariants swept across EVERY registered
query (110+): the two plan shapes that are never acceptable at 100 TB
anywhere in the engine —

- CartesianProduct: an unkeyed n x m join of distributed relations;
  every intentional small-side cross join in the repo broadcasts
  (BroadcastNestedLoopJoin over a 1-row aggregate or literal pool),
  which is allowed.
- BatchEvalPython: a row-at-a-time Python UDF; every Python surface
  in the repo must be Arrow-batched (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas are allowed and parity-pinned elsewhere).

Streaming queries can't materialize an executedPlan without a sink,
so they are swept at the analyzed-plan level for the Python check and
skipped for the join check (their batch twins cover it).
"""

from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def test_no_cartesian_or_rowwise_python_anywhere(spark, built_queries):
    # plans come from the shared one-pass registry build (conftest
    # built_queries — r14); the checks below are unchanged
    dfs, _calls, errors = built_queries
    assert len(registry()) >= 110
    failures = [f"{n}: build error {e}" for n, e in errors.items()]
    for name, df in dfs.items():
        if df.isStreaming:
            plan = df._jdf.queryExecution().analyzed().toString()
            if "BatchEvalPython" in plan or "PythonUDF" in plan:
                failures.append(f"{name}: row-wise Python in streaming plan")
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF")
    assert not failures, "\n".join(failures)
