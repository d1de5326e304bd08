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
    return trace_query_calls_df(spark, spec, sf_dir)[0]


def trace_query_calls_df(spark, spec, sf_dir: str):
    """(hits, built DataFrame) — the traced build, with the DataFrame
    returned so one registry build pass can serve BOTH the coverage
    trace and the plan-invariant sweeps (tests/conftest.built_queries
    — three full registry builds collapsed into one, r14)."""
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
    return hits, df


def _resolve_from_import(
    node: ast.ImportFrom, file_pkg: list[str]
) -> list[str] | None:
    """Resolve an ImportFrom to package-relative parts, e.g.
    ['functions', 'portable'] — None when outside the package.
    file_pkg is the importing file's package path relative to PKG
    root, e.g. ['operators'] for operators/fts.py."""
    if node.level:
        base = file_pkg[: len(file_pkg) - (node.level - 1)]
        if node.level - 1 > len(file_pkg):
            return None
        parts = list(base)
    else:
        mod = node.module or ""
        if not mod.startswith(PKG):
            return None
        parts = mod[len(PKG):].strip(".").split(".") if mod != PKG else []
        return parts
    if node.module:
        parts += node.module.split(".")
    return parts


def static_call_edges() -> tuple[dict[str, set[str]], dict[str, str]]:
    """One-level static intra-package call graph (round-11 verdict ask
    #5): scan EVERY module in the package for loads of operators/
    functions names, resolved through import aliases.  Returns

      (callee_qual -> set of caller ids,
       plans_fn_id -> registered query name)

    Caller ids: 'sub.mod.func' for a top-level function,
    'sub.mod.<module>' for import-time module-level code.  The second
    map links plans functions to their registered query (both the
    decorated spark builder and any function passed as oracle=...),
    so a snippet helper called only from an oracle builder still
    attributes to that query's coverage."""
    edges: dict[str, set[str]] = defaultdict(set)
    fn_to_query: dict[str, str] = {}
    for py in sorted((ROOT / PKG).rglob("*.py")):
        rel = py.relative_to(ROOT / PKG)
        if rel.name == "__init__.py":
            mod_parts = list(rel.parts[:-1])
        else:
            mod_parts = list(rel.parts[:-1]) + [rel.stem]
        modqual = ".".join(mod_parts) if mod_parts else "<root>"
        file_pkg = list(rel.parts[:-1])
        tree = ast.parse(py.read_text())
        # import alias maps for this file
        alias_mod: dict[str, str] = {}   # local name -> 'functions.portable'
        alias_fn: dict[str, str] = {}    # local name -> 'functions.portable.tokens'
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                parts = _resolve_from_import(node, file_pkg)
                if parts is None:
                    continue
                for a in node.names:
                    local = a.asname or a.name
                    target = parts + [a.name]
                    if len(target) >= 2 and target[0] in SCAN_SUBPKGS:
                        if len(target) == 2:
                            alias_mod[local] = ".".join(target)
                        else:
                            alias_fn[local] = ".".join(target[:3])
        if not alias_mod and not alias_fn and modqual.split(".")[0] not in SCAN_SUBPKGS:
            continue

        def collect(body_node, caller_id: str) -> None:
            for n in ast.walk(body_node):
                if isinstance(n, ast.Attribute) and isinstance(
                    n.value, ast.Name
                ):
                    base = alias_mod.get(n.value.id)
                    if base:
                        edges[f"{base}.{n.attr}"].add(caller_id)
                elif isinstance(n, ast.Name) and n.id in alias_fn:
                    edges[alias_fn[n.id]].add(caller_id)

        # same-module calls: bare names resolve to the module's own
        # top-level functions — recorded for EVERY module so coverage
        # can chain through private helpers (e.g. an underscore oracle
        # builder calling a snippet function)
        own_funcs: set[str] = {
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                caller = f"{modqual}.{node.name}"
                collect(node, caller)
                if own_funcs:
                    for n in ast.walk(node):
                        if (
                            isinstance(n, ast.Name)
                            and n.id in own_funcs
                            and n.id != node.name
                        ):
                            edges[f"{modqual}.{n.id}"].add(caller)
                # register() decorations -> query-name mapping
                for dec in node.decorator_list:
                    if (
                        isinstance(dec, ast.Call)
                        and isinstance(dec.func, ast.Name)
                        and dec.func.id == "register"
                        and dec.args
                        and isinstance(dec.args[0], ast.Constant)
                    ):
                        qname = dec.args[0].value
                        fn_to_query[f"{modqual}.{node.name}"] = qname
                        if len(dec.args) > 1 and isinstance(
                            dec.args[1], ast.Name
                        ):
                            fn_to_query[
                                f"{modqual}.{dec.args[1].id}"
                            ] = qname
                        for kw in dec.keywords:
                            if kw.arg != "oracle":
                                continue
                            if isinstance(kw.value, ast.Name):
                                fn_to_query[
                                    f"{modqual}.{kw.value.id}"
                                ] = qname
                            elif isinstance(kw.value, ast.Lambda):
                                # oracle=lambda sf: _helper(...) — the
                                # helper inherits the query's coverage
                                for n in ast.walk(kw.value.body):
                                    if (
                                        isinstance(n, ast.Name)
                                        and n.id in own_funcs
                                    ):
                                        fn_to_query.setdefault(
                                            f"{modqual}.{n.id}", qname
                                        )
            else:
                collect(node, f"{modqual}.<module>")
    return edges, fn_to_query


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


def compute_rows(
    spark, sf_dir: str, traced: tuple[dict, dict] | None = None
) -> tuple[list[dict], dict[str, str]]:
    """The full coverage computation, importable so the zero-dark
    invariant can run as a pytest (round-12 verdict ask #6): returns
    (rows, trace_errors).  A row is dark iff it has no executing
    query, no pytest pin, and no covered_via chain.

    ``traced``: optional precomputed (query -> traced call set,
    query -> build error) pair — the pytest path passes the shared
    built_queries fixture's trace so the registry is built once per
    test session instead of once per sweep (r14)."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    funcs = public_functions()
    gated = ever_gated_queries()
    pins = pytest_pins(funcs)

    func_to_queries: dict[str, set[str]] = defaultdict(set)
    reg = registry()
    errors: dict[str, str] = {}
    if traced is not None:
        calls, errors_in = traced
        errors = dict(errors_in)
        for name, quals in calls.items():
            for qual in quals:
                if qual in funcs:
                    func_to_queries[qual].add(name)
    else:
        for name, spec in reg.items():
            try:
                for qual in trace_query_calls(spark, spec, sf_dir):
                    if qual in funcs:
                        func_to_queries[qual].add(name)
            except Exception as e:  # broken query = its own alarm elsewhere
                errors[name] = str(e)[:200]

    # one-level static call graph: a helper invoked INSIDE a covered
    # operator / query builder / oracle builder is covered_via it
    edges, fn_to_query = static_call_edges()

    test_bodies = "\n".join(
        t.read_text() for t in sorted((ROOT / "tests").glob("test_*.py"))
    )

    def caller_status(
        caller: str, depth: int = 0, seen: frozenset = frozenset()
    ) -> tuple[str, str] | None:
        """(status, label) for a caller id, or None if it conveys no
        coverage.  Direct statuses first; otherwise chain through the
        caller's own callers (bounded depth — covers private oracle
        builders and unregistered spec twins) without cycling."""
        q = fn_to_query.get(caller)
        if q is not None:
            return (
                ("gated" if q in gated else "local"),
                f"{caller} (query {q})",
            )
        if caller in funcs:
            qs = func_to_queries.get(caller, set())
            if qs & gated:
                return ("gated", caller)
            if qs or pins.get(caller):
                return ("local", caller)
        if caller.endswith(".<module>"):
            # import-time module-level code executes under every
            # covered query importing the module
            return ("local", caller)
        # unregistered function (spec twin) referenced directly by a test
        bare = caller.rsplit(".", 1)[-1]
        if not bare.startswith("<") and f"{bare}(" in test_bodies:
            return ("local", f"{caller} (pytest)")
        if depth < 4:
            for up in sorted(edges.get(caller, ())):
                if up == caller or up in seen:
                    continue
                st = caller_status(up, depth + 1, seen | {caller})
                if st:
                    return (st[0], f"{caller} <- {st[1]}")
        return None

    rows = []
    for qual in sorted(funcs):
        qs = sorted(func_to_queries.get(qual, ()))
        g = [q for q in qs if q in gated]
        via = []
        for caller in sorted(edges.get(qual, ())):
            if caller == qual:
                continue
            st = caller_status(caller)
            if st:
                via.append({"status": st[0], "caller": st[1]})
        rows.append(
            {
                "function": qual,
                "file": funcs[qual],
                "queries": qs,
                "ever_gated_queries": g,
                "pytest_pins": sorted(pins.get(qual, [])),
                "covered_via": via,
            }
        )
    return rows, errors


def direct(r) -> bool:
    return bool(r["queries"] or r["pytest_pins"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--json", default=None, help="also write a JSON report")
    args = ap.parse_args()

    from legal_data_ingestion_rag_pipeline_spark.session import build_session

    spark = build_session("machinery_coverage")
    rows, errors = compute_rows(spark, args.sf)
    gated = ever_gated_queries()

    n_gated = sum(1 for r in rows if r["ever_gated_queries"])
    n_local = sum(
        1 for r in rows if not r["ever_gated_queries"] and direct(r)
    )
    n_via = sum(1 for r in rows if not direct(r) and r["covered_via"])
    n_dark = sum(1 for r in rows if not direct(r) and not r["covered_via"])

    print(f"public functions: {len(rows)}")
    print(f"  executed by an EVER-GATED query: {n_gated}")
    print(f"  local-only coverage (sweep/pytest, never gated): {n_local}")
    print(f"  covered only VIA a covered caller (1-level static): {n_via}")
    print(f"  no detected coverage at all (genuinely dark): {n_dark}")
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
    print("== functions covered only via a covered caller ==")
    for r in rows:
        if not direct(r) and r["covered_via"]:
            vias = ",".join(v["caller"] for v in r["covered_via"][:3])
            print(f"  {r['function']:55s} via[{vias}]")
    print()
    print("== functions with NO detected coverage (genuinely dark) ==")
    for r in rows:
        if not direct(r) and not r["covered_via"]:
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
