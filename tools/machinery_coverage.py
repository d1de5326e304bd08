"""Machinery-coverage report (round-10 verdict ask #5): map every
public function in `operators/` and `functions/` to

  (a) the registered queries that EXECUTE it (dynamic sys.setprofile
      trace during plan construction — the phase where operator
      composition happens; executor-side pandas_udf bodies are out of
      trace scope and noted as such),
  (b) which of those queries have EVER held a driver CORRECTNESS row
      (the union of CORRECTNESS_r*.json keys at the repo root), and
  (c) its pytest pins (static scan of tests/*.py for the imported
      name).

With 150+ registry queries never driver-gated, gate-slot rotation
should be prioritized by UNCOVERED MACHINERY, not query count — this
tool prints exactly that residual: public functions whose only
coverage is local (never executed by any ever-gated query).

Usage:
    python tools/machinery_coverage.py [--sf /root/testdata/sf0.001]
                                       [--json MACHINERY_COVERAGE.json]
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PKG = "legal_data_ingestion_rag_pipeline_spark"
SCAN_SUBPKGS = ("operators", "functions")


def public_functions() -> dict[str, str]:
    """{qualified_name: 'subpkg/module.py'} for every public top-level
    function in operators/ and functions/ (underscore names and
    nested defs excluded; module twins count — they back oracles)."""
    out: dict[str, str] = {}
    for sub in SCAN_SUBPKGS:
        for py in sorted((ROOT / PKG / sub).glob("*.py")):
            if py.name == "__init__.py":
                continue
            tree = ast.parse(py.read_text())
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not node.name.startswith("_"):
                        out[f"{sub}.{py.stem}.{node.name}"] = (
                            f"{PKG}/{sub}/{py.name}"
                        )
    return out


def ever_gated_queries() -> set[str]:
    names: set[str] = set()
    for f in ROOT.glob("CORRECTNESS_r*.json"):
        try:
            names.update(json.loads(f.read_text()).keys())
        except Exception:
            pass
    return names


def trace_query_calls(spark, spec, sf_dir: str) -> set[str]:
    """Run spec.spark(spark, sf_dir) under sys.setprofile, recording
    qualified names of repo operators/functions calls (plan
    construction — where DataFrame composition happens)."""
    hits: set[str] = set()
    prefix = str(ROOT / PKG) + "/"

    def prof(frame, event, arg):
        if event != "call":
            return
        fn = frame.f_code.co_filename
        if fn.startswith(prefix):
            rel = fn[len(prefix):]
            sub, _, mod = rel.partition("/")
            if sub in SCAN_SUBPKGS and mod.endswith(".py"):
                hits.add(f"{sub}.{mod[:-3]}.{frame.f_code.co_name}")

    sys.setprofile(prof)
    try:
        df = spec.spark(spark, sf_dir)
        df.schema  # force analysis without executing
    finally:
        sys.setprofile(None)
    return hits


def pytest_pins(funcs: dict[str, str]) -> dict[str, list[str]]:
    """Static scan: a test file pins a function when it contains
    `name(` for a name it imports from (or qualifies into) the
    function's module.  Heuristic, but errs on the side of reporting
    a pin only with the module named somewhere in the file."""
    pins: dict[str, list[str]] = defaultdict(list)
    tests = sorted((ROOT / "tests").glob("test_*.py"))
    bodies = {t.name: t.read_text() for t in tests}
    for qual in funcs:
        sub, mod, name = qual.split(".")
        for tname, body in bodies.items():
            if f"{name}(" in body and (mod in body):
                pins[qual].append(tname)
    return pins


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--json", default=None, help="also write a JSON report")
    args = ap.parse_args()

    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry
    from legal_data_ingestion_rag_pipeline_spark.session import build_session

    funcs = public_functions()
    gated = ever_gated_queries()
    pins = pytest_pins(funcs)
    spark = build_session("machinery_coverage")

    func_to_queries: dict[str, set[str]] = defaultdict(set)
    reg = registry()
    errors: dict[str, str] = {}
    for name, spec in reg.items():
        try:
            for qual in trace_query_calls(spark, spec, args.sf):
                if qual in funcs:
                    func_to_queries[qual].add(name)
        except Exception as e:  # broken query = its own alarm elsewhere
            errors[name] = str(e)[:200]

    rows = []
    for qual in sorted(funcs):
        qs = sorted(func_to_queries.get(qual, ()))
        g = [q for q in qs if q in gated]
        rows.append(
            {
                "function": qual,
                "file": funcs[qual],
                "queries": qs,
                "ever_gated_queries": g,
                "pytest_pins": sorted(pins.get(qual, [])),
            }
        )

    n_gated = sum(1 for r in rows if r["ever_gated_queries"])
    n_local = sum(
        1
        for r in rows
        if not r["ever_gated_queries"] and (r["queries"] or r["pytest_pins"])
    )
    n_dark = sum(
        1 for r in rows if not r["queries"] and not r["pytest_pins"]
    )

    print(f"public functions: {len(rows)}")
    print(f"  executed by an EVER-GATED query: {n_gated}")
    print(f"  local-only coverage (sweep/pytest, never gated): {n_local}")
    print(f"  no detected coverage at all: {n_dark}")
    if errors:
        print(f"  queries that errored during trace: {len(errors)}")
    print()
    print("== functions whose only coverage is local (rotation fodder) ==")
    for r in rows:
        if not r["ever_gated_queries"] and (r["queries"] or r["pytest_pins"]):
            qs = ",".join(r["queries"][:4]) or "-"
            ts = ",".join(r["pytest_pins"][:3]) or "-"
            print(f"  {r['function']:55s} queries[{qs}] tests[{ts}]")
    print()
    print("== functions with NO detected coverage ==")
    for r in rows:
        if not r["queries"] and not r["pytest_pins"]:
            print(f"  {r['function']:55s} ({r['file']})")

    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {
                    "functions": rows,
                    "trace_errors": errors,
                    "n_ever_gated_query_names": len(gated),
                },
                indent=1,
            )
        )
        print(f"\nwrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
