"""HTML -> text extraction (the WET-extraction stage of a web-corpus
pipeline): strip script/style blocks, comments and tags, decode the
common entities, collapse whitespace.

Pure regexp_replace/replace expression chains — whole-stage codegen,
no UDFs — and every pattern is chosen to mean the same thing in
Java's regex engine (Spark) and RE2 (DuckDB): non-greedy `.*?` with
an inline (?s) flag, character classes, NO backreferences (RE2 has
none — script and style get separate patterns).  A production
extractor adds tag-density boilerplate scoring on top (that stage is
operators/linededup.py's segment dedup here); this function is the
structural strip both start from.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (pattern, replacement) in application order — order matters:
#: blocks before tags, tags before entity decode.
_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
)

#: entity -> text, applied after tag removal (plain replace, no regex)
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
)


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML column; NULL stays NULL."""
    out = col
    for pat, rep in _PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text_sql(expr: str, dialect: str) -> str:
    """The same extraction as a SQL string for the given dialect —
    DuckDB's regexp_replace needs the 'g' flag (Spark's is global by
    default); patterns are identical RE2/Java-common syntax."""
    from . import portable as PT

    out = expr
    for pat, rep in _PATTERNS:
        p = pat.replace("'", "''")
        if dialect == PT.SPARK:
            out = f"regexp_replace({out}, '{p}', '{rep}')"
        else:
            out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    for ent, rep in _ENTITIES:
        e = ent.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"replace({out}, '{e}', '{r}')"
    if dialect == PT.SPARK:
        return f"trim(regexp_replace({out}, '\\\\s+', ' '))"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


#: href harvest: one capture group, no backrefs/lookarounds — the
#: same pattern compiles identically under Java regex and RE2 (and
#: DuckDB's RE2 engine), the htmltext portability rule.
LINK_PATTERN = '<a\\s+[^>]*href="([^"]*)"'


def extract_links_sql(expr: str, dialect: str) -> str:
    """Array of href values from anchor tags of an HTML string
    expression, in document order — the link-graph feed (the
    CommonCrawl WAT step next to html_to_text's WET step): explode
    the result, build (src_page, href) edges, and operators/graph.
    pagerank ranks the crawl."""
    if dialect == "spark":
        return f"regexp_extract_all({expr}, '{LINK_PATTERN}', 1)"
    return f"regexp_extract_all({expr}, '{LINK_PATTERN}', 1)"


def extract_links(col: Column) -> Column:
    from pyspark.sql import functions as F

    return F.regexp_extract_all(col, F.lit(LINK_PATTERN), 1)
