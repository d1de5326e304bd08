"""Per-query wall/driver-overhead profile: run a query with the noop
sink and report wall seconds, number of Spark jobs, stages, tasks, and
total task time — the meter for "is this row job-count-bound or
compute-bound?" (guide §1: measure first; §2.6: per-job scheduling
overhead).

A row whose (jobs x ~50ms driver round-trip) approaches its wall time
is bound by sequential job submission (eager localCheckpoints,
collect()s between phases), not by data work — the fix is fusing
materializations, not shuffling fewer bytes.

Usage:
    python tools/job_profile.py [--sf DIR] [--only a,b] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries import registry  # noqa: E402
from legal_data_ingestion_rag_pipeline_spark.session import build_session  # noqa: E402


def snapshot(spark):
    store = spark._jsparkSession.sparkContext().statusStore()
    jobs = store.jobsList(None)
    out = {}
    for i in range(jobs.size()):
        j = jobs.apply(i)
        out[j.jobId()] = (
            j.numCompletedStages(),
            j.numCompletedTasks(),
        )
    return out


def stage_tasktime(spark, min_stage: int) -> float:
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    lst = store.stageList(empty, *defaults)
    total = 0
    for i in range(lst.size()):
        s = lst.apply(i)
        if s.stageId() > min_stage:
            total += s.executorRunTime()
    return total / 1000.0


def max_stage(spark) -> int:
    store = spark._jsparkSession.sparkContext().statusStore()
    empty = spark._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    lst = store.stageList(empty, *defaults)
    m = -1
    for i in range(lst.size()):
        m = max(m, lst.apply(i).stageId())
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    spark = build_session("job_profile")
    # same warmups as bench.py
    from pyspark.sql import functions as F

    spark.range(100_000).repartition(8).groupBy((F.col("id") % 7).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    reg = registry()
    names = (
        [n.strip() for n in args.only.split(",")]
        if args.only
        else [n for n, s in reg.items() if s.bench]
    )
    bus = spark._jsc.sc().listenerBus()
    results = {}
    for name in names:
        spec = reg[name]
        rows = []
        for _ in range(args.repeat):
            bus.waitUntilEmpty()
            jobs0 = snapshot(spark)
            stage0 = max_stage(spark)
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(name)
            df = spec.spark(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            bus.waitUntilEmpty()
            jobs1 = snapshot(spark)
            new_jobs = {k: v for k, v in jobs1.items() if k not in jobs0}
            rows.append(
                {
                    "wall": round(wall, 3),
                    "jobs": len(new_jobs),
                    "stages": sum(v[0] for v in new_jobs.values()),
                    "tasks": sum(v[1] for v in new_jobs.values()),
                    "task_sec": round(stage_tasktime(spark, stage0), 3),
                }
            )
        results[name] = rows
        print(json.dumps({name: rows}), flush=True)
    print("== summary (last repeat) ==")
    for name, rows in sorted(results.items(), key=lambda kv: -kv[1][-1]["wall"]):
        r = rows[-1]
        print(
            f"{r['wall']:8.2f}s  jobs={r['jobs']:<4} stages={r['stages']:<5} "
            f"tasks={r['tasks']:<6} task_sec={r['task_sec']:<9} {name}"
        )


if __name__ == "__main__":
    main()
