"""URL/domain-level curation: blocklist filtering and per-domain
quota sampling.

The C4/RefinedWeb front-of-pipeline step the corpus families share:
drop documents from blocked domains (spam/adult/boilerplate hosts),
then cap each surviving domain's contribution so no single host
dominates the corpus (per-domain quotas; the complement of
operators/mixture.py's RATE-based domain mixing — quotas are absolute
COUNTS, mixture keeps proportional shares).

Scale shape (100 TB):

- the blocklist join is a broadcast left-anti on the domain key — a
  production blocklist (millions of hosts) is still MBs, far under
  broadcast limits, and the fact table never shuffles;
- quota sampling is deterministic per-group top-k: rank =
  poly_hash(domain | doc_id) (a pure function of the data — retries
  and repartitioning pick the SAME documents, which DataFrame.sample
  cannot promise), selected with the two-phase map-side top-k from
  the ANN family — an Arrow mapInPandas keeps at most
  n_domains x quota narrow rows per partition, so the shuffle carries
  n_partitions x n_domains x quota rows and a plain
  Window.partitionBy(domain) never sees a giant domain's full row
  set (the skew that kills the naive window plan);
- payload columns stay out of both phases: callers semi-join the
  (domain, id) survivor set — n_domains x quota rows, always
  broadcastable — back onto the fact table.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT


def rank_expr(domain_col: str, id_col: str, dialect: str) -> str:
    """Portable deterministic per-(domain, doc) rank in [0, P)."""
    cast = "STRING" if dialect == PT.SPARK else "VARCHAR"
    pair = f"concat({domain_col}, '|', CAST({id_col} AS {cast}))"
    return PT.poly_hash(pair, dialect)


def filter_blocklist(
    docs: DataFrame,
    blocked: DataFrame | Iterable[str],
    domain_col: str = "source",
) -> DataFrame:
    """Drop rows whose domain appears in ``blocked`` (DataFrame with a
    ``domain_col`` column, or an iterable of strings).  Broadcast
    left-anti: the fact side never shuffles."""
    if not isinstance(blocked, DataFrame):
        blocked = docs.sparkSession.createDataFrame(
            [(d,) for d in blocked], f"{domain_col} string"
        )
    return docs.join(
        F.broadcast(blocked.select(domain_col)), domain_col, "left_anti"
    )


def filter_allowlist(
    docs: DataFrame,
    allowed: DataFrame | Iterable[str],
    domain_col: str = "source",
) -> DataFrame:
    """Keep only rows whose domain appears in ``allowed`` — the
    curated-source complement of filter_blocklist."""
    if not isinstance(allowed, DataFrame):
        allowed = docs.sparkSession.createDataFrame(
            [(d,) for d in allowed], f"{domain_col} string"
        )
    return docs.join(
        F.broadcast(allowed.select(domain_col)), domain_col, "left_semi"
    )


def quota_sample(
    docs: DataFrame,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` documents per domain, chosen by the
    deterministic content-hash rank (smallest first, id tie-break).

    Returns (domain_col, id_col, slot) with slot in [1, quota] —
    callers semi-join this narrow survivor set back onto the payload.
    Two-phase: per-partition Arrow top-k bounds the shuffle and the
    final window's partition sizes at n_partitions x quota rows per
    domain, so a billion-document domain costs the same as a small
    one (the _two_phase_topk argument, operators/ann.py).
    """
    narrow = docs.select(
        domain_col,
        id_col,
        F.expr(rank_expr(domain_col, id_col, PT.SPARK)).alias("_rank"),
    )
    schema = narrow.schema

    def part_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat((best, pdf))
            cur = cur.sort_values(
                ["_rank", id_col], ascending=[True, True], kind="mergesort"
            )
            best = cur.groupby(domain_col, sort=False).head(quota)
        if best is not None and len(best):
            yield best

    reduced = narrow.mapInPandas(part_topk, schema)
    w = Window.partitionBy(domain_col).orderBy(F.asc("_rank"), F.asc(id_col))
    return (
        reduced.withColumn("slot", F.row_number().over(w).cast("bigint"))
        .filter(F.col("slot") <= quota)
        .select(domain_col, id_col, "slot")
    )


def canonical_url_sql(expr: str, dialect: str) -> str:
    """Canonical form of a URL expression — the crawl-frontier dedup
    prerequisite (two fetches of nominally-different URLs are the
    same page): lowercase scheme+host, strip the fragment, strip ALL
    utm_* tracking params (consecutive ones too), strip one trailing
    slash. A regexp chain whose patterns mean the same thing under
    Java regex and RE2 (no lookarounds — RE2 has none). Dialect traps
    handled explicitly: DuckDB regexp_replace is single-match without
    'g' (Java is always global) — so '?' normalizes to '&' first and
    every utm param then starts with its own '&' (consecutive
    matches need no lookahead); Spark's SQL parser consumes one level
    of backslash escapes in string literals (DuckDB does not);
    replacement backrefs are $1 in Java, backslash-1 in RE2.

    Deliberately NOT full RFC 3986 normalization (no percent-decode,
    no path-segment resolution): those need stateful parsing; this is
    the high-yield 95% that crawl pipelines actually apply.
    """
    spark = dialect == "spark"
    g = "" if spark else ", 'g'"
    backref = "$1" if spark else "\\1"
    qmark = "\\\\?" if spark else "\\?"
    x = f"regexp_replace({expr}, '#.*$', ''{g})"
    x = f"regexp_replace({x}, '{qmark}', '&'{g})"
    x = f"regexp_replace({x}, '&utm_[^&]*', ''{g})"
    x = f"regexp_replace({x}, '^([^&]*)&', '{backref}?'{g})"
    x = f"regexp_replace({x}, '[?&]+$', ''{g})"
    host = f"lower(regexp_extract({x}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+)', 1))"
    rest = f"regexp_replace({x}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+', ''{g})"
    y = f"concat({host}, {rest})" if spark else f"({host} || {rest})"
    return f"regexp_replace({y}, '/$', ''{g})"
