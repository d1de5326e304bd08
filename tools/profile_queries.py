"""Measured shuffle/spill profile per query — evidence for the scale
claims, not assertions: run each bench query (or --only list), then
walk the EXECUTED adaptive plan and sum its SQL metrics.

Usage:
    python tools/profile_queries.py [--sf DIR] [--only a,b] [--md]

Caveats (also printed into PROFILE.md):
- Metrics cover the final executed plan. Eager pre-stages
  (localCheckpoint materializations: MinHash signatures, PageRank
  iterations, the duplicate-spans gram table) execute OUTSIDE that
  tree — their cost shows in wall time but not in these shuffle
  counters.
- Broadcast sizes appear as dataSize on BroadcastExchange nodes and
  are reported separately from shuffle bytes.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries import registry  # noqa: E402
from legal_data_ingestion_rag_pipeline_spark.session import build_session  # noqa: E402

SHUFFLE_KEYS = ("shuffleBytesWritten",)
SHUFFLE_REC_KEYS = ("shuffleRecordsWritten",)
SPILL_KEYS = ("spillSize",)
BROADCAST_BYTES = ("dataSize",)


def walk_metrics(node, tot: dict, broadcast: dict) -> None:
    cls = node.getClass().getSimpleName()
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        name, val = kv._1(), kv._2().value()
        if cls == "BroadcastExchangeExec" and name in BROADCAST_BYTES:
            broadcast[name] = broadcast.get(name, 0) + val
        else:
            tot[name] = tot.get(name, 0) + val
    if "QueryStage" in cls:
        walk_metrics(node.plan(), tot, broadcast)
    for i in range(node.children().size()):
        walk_metrics(node.children().apply(i), tot, broadcast)


def profile(spark, spec, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    df = spec.spark(spark, sf_dir)
    n = len(df.collect())
    wall = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in plan.getClass().getName():
        plan = plan.executedPlan()
    tot: dict = {}
    bc: dict = {}
    walk_metrics(plan, tot, bc)
    return {
        "query": spec.name,
        "rows": n,
        "wall_s": round(wall, 2),
        "shuffle_mb": round(
            sum(tot.get(k, 0) for k in SHUFFLE_KEYS) / 1e6, 3
        ),
        "shuffle_records": sum(tot.get(k, 0) for k in SHUFFLE_REC_KEYS),
        "spill_mb": round(sum(tot.get(k, 0) for k in SPILL_KEYS) / 1e6, 3),
        "broadcast_mb": round(
            sum(bc.get(k, 0) for k in BROADCAST_BYTES) / 1e6, 3
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--md", action="store_true", help="print a markdown table")
    args = ap.parse_args()
    spark = build_session("profile")
    reg = registry()
    if args.only:
        specs = [reg[n] for n in args.only.split(",")]
    else:
        specs = [s for s in reg.values() if s.bench]
    rows = [profile(spark, s, args.sf) for s in specs]
    if args.md:
        print("| query | rows | wall s | shuffle MB | shuffle rows | spill MB | broadcast MB |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['query']} | {r['rows']} | {r['wall_s']} "
                f"| {r['shuffle_mb']} | {r['shuffle_records']} "
                f"| {r['spill_mb']} | {r['broadcast_mb']} |"
            )
    else:
        import json

        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
