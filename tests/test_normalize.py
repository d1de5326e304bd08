from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.functions import normalize as N

CASES = [
    # (raw_court, raw_judge, raw_party, expected_court, expected_judge, expected_party)
    ("S.D.N.Y.", "Hon. Maria Rodriguez", "  Acme   Corp ", "SDNY", "maria rodriguez", "acme corp"),
    ("S D N Y", "Judge Sarah Chen", "JOHN  SMITH", "SDNY", "sarah chen", "john smith"),
    ("N.D. Cal", "HON. A B", "x", "NDCAL", "a b", "x"),
    ("ED Va", "Justice   Roberts", "Y  Z", "EDVA", "roberts", "y z"),
    ("D. N.J", "Maria Rodriguez", "a", "DNJ", "maria rodriguez", "a"),
]


def test_normalizers(spark):
    df = spark.createDataFrame(
        [(c, j, p) for c, j, p, *_ in CASES], "court string, judge string, party string"
    )
    rows = df.select(
        N.normalize_court("court").alias("c"),
        N.normalize_judge("judge").alias("j"),
        N.normalize_party("party").alias("p"),
    ).collect()
    for row, (_, _, _, ec, ej, ep) in zip(rows, CASES):
        assert (row.c, row.j, row.p) == (ec, ej, ep)


def test_status(spark):
    df = spark.createDataFrame(
        [("ACTIVE",), ("Closed",), ("pending",), (None,), ("",), ("open",)], "s string"
    )
    rows = df.select(
        N.normalize_status("s").alias("n"), N.status_is_valid("s").alias("ok")
    ).collect()
    # Reference ingest.py:607 is a plain .lower(): null crashes there
    # (modeled as invalid here) and '' fails the enum check — no trim,
    # no 'active' default on present values.
    assert [(r.n, r.ok) for r in rows] == [
        ("active", True),
        ("closed", True),
        ("pending", True),
        (None, False),
        ("", False),
        ("open", False),
    ]


def test_case_type_default(spark):
    df = spark.createDataFrame([("Civil ",), (None,), ("",)], "t string")
    rows = df.select(N.normalize_case_type("t").alias("n")).collect()
    assert [r.n for r in rows] == ["civil", "civil", "civil"]
