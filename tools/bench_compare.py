"""Compare two BENCH_r*.json records on their comparable subsets.

Totals across rounds are NOT comparable (the bench set grows when
newly gate-critical families are added — 11 queries r1, 17 r6, 26 r7,
32 r8), so this tool compares per-query warm times over the
intersection, flags regressions beyond a noise band, and prints the
canonical continuity-subset sums.

Usage:
    python tools/bench_compare.py BENCH_r07.json BENCH_r08.json
    python tools/bench_compare.py old.json new.json --band 0.5
"""

from __future__ import annotations

import argparse
import json

#: the round-1 11-query set and round-6 17-query set — the sums the
#: verdicts track across rounds.
SUBSET_R1 = (
    "pricing_summary",
    "local_supplier_volume",
    "shipping_priority_topk",
    "list_topk_by_date",
    "junction_inner_join",
    "rag_semantic_search",
    "chunk_documents",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "cms_heavy_hitters",
    "session_peak_concurrency",
)
SUBSET_R6 = SUBSET_R1 + (
    "dedup_incremental_minhash",
    "boilerplate_segment_removal",
    "lm_perplexity_score",
    "bpe_train_merges",
    "curation_pipeline",
    "curation_pipeline_v3",
)


def load(path: str) -> dict:
    """Accept either bench.py's one-JSON-line output (possibly with
    log noise around it) or the driver's BENCH_r*.json wrapper
    ({"parsed": {...}})."""
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = None
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith('{"'):
                try:
                    rec = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if rec is None:
            raise ValueError(f"no JSON record in {path}") from None
    if "queries" not in rec and "parsed" in rec:
        rec = rec["parsed"]
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--band",
        type=float,
        default=0.5,
        help="regression flag threshold: new > old * (1 + band) AND "
        "new - old > 0.5s",
    )
    args = ap.parse_args()
    a, b = load(args.old), load(args.new)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_b = sorted(set(qb) - set(qa))

    print(f"common queries: {len(common)}; new-only: {len(only_b)}")
    regressions = []
    for q in common:
        oa, ob = qa[q], qb[q]
        if ob > oa * (1 + args.band) and ob - oa > 0.5:
            regressions.append((q, oa, ob))
    for name, sub in (("r1-11q", SUBSET_R1), ("r6-17q", SUBSET_R6)):
        sa = sum(qa[q] for q in sub if q in qa)
        sb = sum(qb[q] for q in sub if q in qb)
        na = sum(1 for q in sub if q in qa)
        nb = sum(1 for q in sub if q in qb)
        print(
            f"subset {name}: old {sa:.2f}s ({na}q) -> new {sb:.2f}s "
            f"({nb}q)"
        )
    print(
        f"common-set sum: {sum(qa[q] for q in common):.2f}s -> "
        f"{sum(qb[q] for q in common):.2f}s"
    )
    if only_b:
        added = ", ".join(f"{q}={qb[q]:.2f}s" for q in only_b)
        print(f"new rows: {added}")
    if regressions:
        print("REGRESSIONS (beyond noise band):")
        for q, oa, ob in regressions:
            print(f"  {q}: {oa:.2f}s -> {ob:.2f}s")
        return 1
    print("no per-query regressions beyond the noise band")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
