"""Render the cross-round continuity table from the driver artifacts
(BENCH_r*.json, CORRECTNESS_r*.json) so verdicts and future rounds
stop re-deriving it by hand (round-9 verdict ask #8).

Usage:
    python tools/round_summary.py            # human table
    python tools/round_summary.py --json     # machine form

Emits, per round:
  - correctness: green/total gate rows (rows+schema+hash all match),
    plus the names of any red rows
  - bench: parsed or not, total seconds / n_queries, load_suspect
  - the r1-continuity subset sum (the 11 queries benched since round
    1 that still have a bench row), the operative baseline the judge
    tracks against BASELINE.md
  - gate history: how many of this round's gate rows were never gated
    before (fresh external verification bought by rotation)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The 11-query continuity subset: benched in BENCH_r01 and every round
# since (the operative baseline — reference publishes no numbers, so
# round 1's 13.98 s on these is BASELINE.md's anchor).
R1_SUBSET = [
    "list_topk_by_date",
    "pricing_summary",
    "junction_inner_join",
    "chunk_documents",
    "rag_semantic_search",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "textstats_quality",
    "curation_pipeline",
    "local_supplier_volume",
    "shipping_priority_topk",
]


def load_rounds() -> list[int]:
    rounds = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(REPO, "BENCH_r*.json")
    ):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            rounds.add(int(m.group(1)))
    return sorted(rounds)


def correctness(rnd: int) -> dict | None:
    path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
    if not os.path.exists(path):
        return None
    d = json.load(open(path))
    red = [
        k
        for k, v in d.items()
        if not (
            v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        )
    ]
    return {"total": len(d), "green": len(d) - len(red), "red": red,
            "names": list(d)}


def bench(rnd: int) -> dict | None:
    path = os.path.join(REPO, f"BENCH_r{rnd:02d}.json")
    if not os.path.exists(path):
        return None
    d = json.load(open(path))
    p = d.get("parsed")
    if not isinstance(p, dict):
        return {"parsed": False}
    q = p.get("queries", {}) or {}
    subset = {k: q[k] for k in R1_SUBSET if k in q}
    return {
        "parsed": True,
        "total_sec": p.get("value"),
        "n_queries": p.get("n_queries", len(q)),
        "load_suspect": p.get("load_suspect"),
        "r1_subset_sec": round(sum(subset.values()), 2) if subset else None,
        "r1_subset_n": len(subset),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = []
    seen_gated: set[str] = set()
    for rnd in load_rounds():
        c = correctness(rnd)
        b = bench(rnd)
        fresh = None
        if c:
            names = set(c["names"])
            fresh = len(names - seen_gated)
            seen_gated |= names
        rows.append({
            "round": rnd,
            "gate_green": c and f"{c['green']}/{c['total']}",
            "gate_red": c["red"] if c else None,
            "fresh_gated": fresh,
            "bench_parsed": b and b.get("parsed"),
            "bench_total_sec": b and b.get("total_sec"),
            "bench_n": b and b.get("n_queries"),
            "load_suspect": b and b.get("load_suspect"),
            "r1_subset_sec": b and b.get("r1_subset_sec"),
        })

    summary = {
        "rounds": rows,
        "distinct_queries_ever_gated": len(seen_gated),
    }
    if args.json:
        print(json.dumps(summary, indent=2))
        return

    hdr = (
        f"{'rnd':>3}  {'gate':>7}  {'fresh':>5}  {'bench':>9}  "
        f"{'n':>3}  {'load?':>5}  {'r1-subset':>9}"
    )
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        bench_s = (
            f"{r['bench_total_sec']:.1f}s" if r["bench_total_sec"] else
            ("unparsed" if r["bench_parsed"] is False else "-")
        )
        print(
            f"{r['round']:>3}  {r['gate_green'] or '-':>7}  "
            f"{'' if r['fresh_gated'] is None else r['fresh_gated']:>5}  "
            f"{bench_s:>9}  {r['bench_n'] or '-':>3}  "
            f"{str(r['load_suspect']):>5}  "
            f"{('%.2fs' % r['r1_subset_sec']) if r['r1_subset_sec'] else '-':>9}"
        )
        if r["gate_red"]:
            print(f"     RED: {', '.join(r['gate_red'])}")
    print(
        f"\ndistinct queries ever driver-gated: "
        f"{summary['distinct_queries_ever_gated']}"
    )


if __name__ == "__main__":
    main()
