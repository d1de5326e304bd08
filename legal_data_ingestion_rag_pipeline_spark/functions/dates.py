"""Multi-format date parsing (reference ``parse_date``, ingest.py:299-350).

The reference tries formats in order and raises on failure (no sentinel
dates).  Spark-first re-expression: a ``coalesce`` over ``try_to_date``
with each format — null result means "unparseable", which the ingest
plan routes to quarantine as BAD_DATE.  The whole chain is a single
codegen'd expression; Catalyst folds it per-row with no Python.

Spark 4 runs with ANSI mode on, so ``try_to_date`` (not ``to_date``)
is required for the failure-tolerant semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Order mirrors the reference's attempt order (ISO first, then numeric
#: MDY with - or /, then month-name forms).  Spark's default strict
#: parser (timeParserPolicy=CORRECTED) rejects month 13 / day 40 just
#: like the reference's datetime.strptime.
DATE_FORMATS = (
    "yyyy-M-d",       # ISO, single- or double-digit month/day
    "M-d-yyyy",       # numeric MDY dashes
    "M/d/yyyy",       # numeric MDY slashes
    "MMM d, yyyy",    # Oct 3, 2024
    "MMMM d, yyyy",   # October 3, 2024
)


def parse_date_multi(c: Column | str, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """First format that parses wins; null if none do (=> quarantine)."""
    col = F.col(c) if isinstance(c, str) else c
    col = F.trim(col)
    attempts = [F.try_to_date(col, format=fmt) for fmt in formats]
    return F.coalesce(*attempts)


def date_is_bad(c: Column | str) -> Column:
    """True when the raw value is present but unparseable, or missing.

    The reference treats None/empty/unparseable identically (ValueError
    -> quarantine, error code BAD_DATE).
    """
    col = F.col(c) if isinstance(c, str) else c
    return parse_date_multi(col).isNull()
