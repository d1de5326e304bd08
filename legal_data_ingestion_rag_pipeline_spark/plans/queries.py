"""API-equivalent query functions (SURVEY §2.9).

The reference's three REST endpoints become engine functions over the
ingested tables; argument-validation semantics (400/404) are preserved
as ValueError/None so a thin HTTP wrapper could reproduce the API
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

LIST_LIMIT = 200


def list_cases(
    tables: dict[str, DataFrame],
    judge: str | None = None,
    year: int | None = None,
) -> DataFrame:
    """GET /cases?judge=&year= (api.py:154-199).

    - >=1 filter required, else ValueError (the endpoint's 400);
    - judge FILTERED on judges.normalized_name == lower(judge), but the
      output 'judge' field carries the display name (judges.name),
      matching the reference's j.full_name (api.py:186) and the
      /cases/{id} detail endpoint;
    - year via year(filed_date) == year PLUS a filed_date range bound —
      the range predicate is what lets Catalyst prune a date-partitioned
      table at scale (SURVEY §3.3's idiomatic fix);
    - ORDER BY filed_date DESC LIMIT 200 (TakeOrderedAndProject).
    """
    if judge is None and year is None:
        raise ValueError("At least one filter (judge or year) is required")
    cases = tables["cases"]
    judges = tables["judges"]
    courts = tables["courts"]
    df = (
        cases.join(
            F.broadcast(
                judges.select(
                    F.col("id").alias("judge_id"),
                    F.col("normalized_name").alias("judge_name"),
                    F.col("name").alias("judge_display"),
                )
            ),
            "judge_id",
            "left",
        )
        .join(
            F.broadcast(courts.select(F.col("id").alias("court_id"), F.col("name").alias("court_name"))),
            "court_id",
            "left",
        )
    )
    if judge is not None:
        df = df.filter(F.col("judge_name") == judge.lower())
    if year is not None:
        df = df.filter(
            (F.col("filed_date") >= F.lit(f"{year}-01-01").cast("date"))
            & (F.col("filed_date") <= F.lit(f"{year}-12-31").cast("date"))
            & (F.year("filed_date") == year)
        )
    return (
        df.select(
            "case_number",
            "title",
            F.col("court_name").alias("court"),
            F.col("judge_display").alias("judge"),
            F.date_format("filed_date", "yyyy-MM-dd").alias("filed_date"),
            "status",
        )
        .orderBy(F.desc("filed_date"), "case_number")
        .limit(LIST_LIMIT)
    )


def get_case(
    tables: dict[str, DataFrame],
    case_number: str,
    with_parties: bool = True,
) -> Row | None:
    """GET /cases/{case_number} (api.py:221-270): full detail + parties
    ordered (role, name); None => the endpoint's 404.

    ``with_parties=False`` skips the parties join+collect for callers
    that fetch parties themselves in a different shape (the HTTP
    handler) — otherwise a serving request would run that Spark job
    twice.
    """
    cases = tables["cases"]
    detail = (
        cases.filter(F.col("case_number") == case_number)
        .join(F.broadcast(tables["judges"].select(F.col("id").alias("judge_id"), F.col("name").alias("judge"))), "judge_id", "left")
        .join(F.broadcast(tables["courts"].select(F.col("id").alias("court_id"), F.col("name").alias("court"))), "court_id", "left")
        .join(F.broadcast(tables["case_types"].select(F.col("id").alias("case_type_id"), F.col("name").alias("case_type"))), "case_type_id", "left")
        .select(
            "id", "case_number", "title", "court", "judge", "case_type",
            F.date_format("filed_date", "yyyy-MM-dd").alias("filed_date"),
            "docket_text", "status",
        )
    )
    rows = detail.collect()
    if not rows:
        return None
    head = rows[0]
    if not with_parties:
        return head
    parties = case_parties_of(tables, head.id).collect()
    return Row(
        **{**head.asDict(), "parties": [(p.name, p.role) for p in parties]}
    )


def case_parties_of(tables: dict[str, DataFrame], case_id: int) -> DataFrame:
    """Parties of one case ordered by (role, name) (api.py:256-261, J3)."""
    cp = tables["case_parties"]
    parties = tables["parties"]
    return (
        cp.filter(F.col("case_id") == case_id)
        .join(
            parties.select(F.col("id").alias("party_id"), "name", "normalized_name"),
            "party_id",
        )
        .select("name", "normalized_name", "role")
        .orderBy("role", "name")
    )
