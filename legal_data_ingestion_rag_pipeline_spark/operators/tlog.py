"""A minimal transaction-log table format: versioned appends /
overwrites with time-travel reads — the lakehouse pattern (Delta /
Iceberg's core insight) reduced to its essentials on plain parquet.

Why this exists at 100 TB: a directory of parquet files has no
transactional story — readers list the directory (an O(files) storage
round-trip that is slow and non-atomic on object stores) and see
half-written data.  The fix every table format shares: writers commit
by appending ONE manifest record naming the exact data files of the
new version; readers resolve a version to a file list from the
manifest (KB-scale, one read) and hand Spark that explicit list — no
LIST call, no torn reads, and every historical version remains
readable (time travel) until explicitly vacuumed.

This implementation keeps the contract honest without pretending to
be Delta:

- the manifest is a JSON-lines file (``_tlog.jsonl``); each line is
  one committed version: ``{"version": N, "action": "append" |
  "overwrite", "files": [...]}``.  Appends ADD files to the live set;
  an overwrite REPLACES it.  The live set at version V is replayed by
  scanning the manifest up to V — manifest replay is the reader-side
  protocol of Delta (its JSON actions) in miniature.
- data files land under ``data/`` with a version-prefixed, caller-
  supplied unique name, so concurrent versions never collide and an
  uncommitted write (files present, no manifest line) is simply
  invisible — atomicity rides on the manifest append.
- no vacuum / retention / schema evolution here: out of scope, and
  Spark's own mergeSchema covers the read-side evolution story
  (schema_evolution_scan).

Single-writer by design (the driver is the committer); multi-writer
coordination (optimistic concurrency on the log) is a metadata-layer
concern orthogonal to the Spark plans.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_tlog.jsonl"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _read_manifest(path: str) -> list[dict]:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp, "r", encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def current_version(path: str) -> int:
    """Latest committed version, or -1 for an empty/absent table."""
    entries = _read_manifest(path)
    return entries[-1]["version"] if entries else -1


def commit(
    df: DataFrame, path: str, action: str = "append"
) -> int:
    """Write ``df`` as a new version of the table at ``path``.

    ``action='append'`` adds the written files to the live set;
    ``action='overwrite'`` makes them the entire live set.  Returns
    the committed version number.  The data write happens BEFORE the
    manifest append — a crash in between leaves orphan files that no
    reader resolves, never a torn table.
    """
    if action not in ("append", "overwrite"):
        raise ValueError(f"unknown action {action!r}")
    version = current_version(path) + 1
    vdir = os.path.join(path, "data", f"v{version:06d}")
    df.write.mode("error").parquet(vdir)
    files = sorted(
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet")
    )
    os.makedirs(path, exist_ok=True)
    with open(_manifest_path(path), "a", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {"version": version, "action": action, "files": files}
            )
            + "\n"
        )
    return version


def live_files(path: str, version: int | None = None) -> list[str]:
    """Replay the manifest up to ``version`` (default: latest) and
    return the live data-file list."""
    entries = _read_manifest(path)
    if not entries:
        return []
    if version is None:
        version = entries[-1]["version"]
    live: list[str] = []
    seen = False
    for e in entries:
        if e["version"] > version:
            break
        seen = seen or e["version"] == version
        if e["action"] == "overwrite":
            live = list(e["files"])
        else:
            live.extend(e["files"])
    if not seen:
        committed = [e["version"] for e in entries]
        raise ValueError(
            f"version {version} was never committed (log has {committed})"
        )
    return live


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table exactly as of ``version``.

    The scan receives the EXPLICIT file list resolved from the
    manifest — no directory listing, so uncommitted/orphan files are
    invisible and the plan's FileScan enumerates only live files.
    """
    files = live_files(path, version)
    if not files:
        raise ValueError(f"tlog table at {path} is empty")
    return spark.read.parquet(*files)
