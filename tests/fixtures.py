"""Synthetic dirty-docket fixture mirroring FIXTURES.md §1's grammar
families (not copied from the reference data; hand-built to exercise
every validation/normalization path)."""

DOCKETS = [
    {  # clean ISO record
        "case_number": "1:23-cv-00001",
        "court": "S.D.N.Y.",
        "title": "Smith v. Acme Corp",
        "filed_date": "2023-05-10",
        "parties": "John Smith (plaintiff); Acme Corp, Jane Doe (defendants)",
        "case_type": "Civil",
        "judge": "Hon. Maria Rodriguez",
        "docket_text": "Complaint filed. " * 20,
        "status": "Active",
    },
    {  # MDY single-digit + court variant + judge title variant
        "case_number": "1:23-cv-00002",
        "court": "S D N Y",
        "title": "Taylor v. Energy LLC",
        "filed_date": "6-7-2023",
        "parties": "Taylor (plaintiff) | Energy LLC, Does 1-36 (defendant)",
        "case_type": "civil",
        "judge": "Judge Maria Rodriguez",
        "docket_text": "Motion to dismiss. " * 150,  # multi-chunk at 1200/200
        "status": "ACTIVE",
    },
    {  # month-name date, different court/judge, slash parties, no parens
        "case_number": "2:23-cv-00003",
        "court": "N.D. Cal",
        "title": "Nguyen v. HealthPlus",
        "filed_date": "October 3, 2023",
        "parties": "A plaintiff / B defendant",
        "case_type": "Employment",
        "judge": "Judge Sarah Chen",
        "docket_text": "",
        "status": "Closed",
    },
    {  # duplicate case_number (last wins), judge empty -> NULL
        "case_number": "1:23-cv-00001",
        "court": "SDNY",
        "title": "Smith v. Acme Corp (amended)",
        "filed_date": "5/11/2023",
        "parties": "John Smith (plaintiff); Acme Corp (defendant)",
        "case_type": "civil",
        "judge": "",
        "docket_text": "Amended complaint.",
        "status": "pending",
    },
    {  # BAD_DATE
        "case_number": "9:99-cv-00004",
        "court": "ED Va",
        "title": "Bad Date Case",
        "filed_date": "13-40-2024",
        "parties": "X (plaintiff)",
        "case_type": "criminal",
        "judge": "Hon. A B",
        "docket_text": "text",
        "status": "active",
    },
    {  # MISSING_CASE_NUMBER (blank)
        "case_number": "   ",
        "court": "ED Va",
        "title": "No Case Number",
        "filed_date": "2024-01-01",
        "parties": "Y (defendant)",
        "case_type": "civil",
        "judge": None,
        "docket_text": "text",
        "status": "active",
    },
    {  # STATUS_UNMAPPED — dims still grow from this row (court D NJ!)
        "case_number": "3:24-cv-00005",
        "court": "D. N.J",
        "title": "Weird Status",
        "filed_date": "2024-02-02",
        "parties": "Z (plaintiff)",
        "case_type": "civil",
        "judge": "Justice Roberts",
        "docket_text": "text",
        "status": "open",
    },
    {  # FK_COURT (empty court)
        "case_number": "4:24-cv-00006",
        "court": "",
        "title": "No Court",
        "filed_date": "2024-03-03",
        "parties": "W (plaintiff)",
        "case_type": "civil",
        "judge": "Hon. A B",
        "docket_text": "text",
        "status": "active",
    },
    {  # UNKNOWN: null case_number
        "case_number": None,
        "court": "SDNY",
        "title": "Null CN",
        "filed_date": "2024-04-04",
        "parties": "V (plaintiff)",
        "case_type": "civil",
        "judge": None,
        "docket_text": "text",
        "status": "active",
    },
    {  # UNKNOWN: null status (entities DO get created first)
        "case_number": "5:24-cv-00007",
        "court": "W D Wash",
        "title": "Null Status",
        "filed_date": "2024-05-05",
        "parties": "U (plaintiff)",
        "case_type": "civil",
        "judge": "hon. C D",
        "docket_text": "text",
        "status": None,
    },
]


def make_dirty_dockets(n: int = 500, seed: int = 20260813) -> list[dict]:
    """Seeded generator of dirty dockets at the reference fixture's
    scale (502 records): mixed date formats, status case-variants,
    court spelling variants, duplicate case_numbers, empty judges, and
    a controlled share of invalid rows."""
    import random

    rng = random.Random(seed)
    courts = [
        "S.D.N.Y.", "S D N Y", "SDNY", "N.D. Cal", "N.D.Cal.", "E.D. Tex",
        "C.D. Cal", "D. Mass", "D.Mass.", "W.D. Wash",
    ]
    judges = ["Hon. Maria Rodriguez", "Judge Sarah Chen", "Justice Lee", ""]
    statuses = ["Active", "ACTIVE", "active", "Closed", "pending", "Dismissed"]
    bad_statuses = ["archived", "OPEN"]
    fmt = [
        lambda y, m, d: f"{y}-{m:02d}-{d:02d}",
        lambda y, m, d: f"{m}/{d}/{y}",
        lambda y, m, d: f"{m}-{d}-{y}",
    ]
    out = []
    for i in range(n):
        y, m, d = 2020 + rng.randrange(5), rng.randint(1, 12), rng.randint(1, 28)
        r = rng.random()
        case_number = f"{1 + i % 9}:{y % 100}-cv-{i:05d}"
        if r < 0.04:
            case_number = ""  # MISSING_CASE_NUMBER
        elif r < 0.06:
            case_number = None  # UNKNOWN (strip crash)
        elif r < 0.12:
            case_number = f"1:21-cv-{rng.randrange(20):05d}"  # dup key
        filed = fmt[rng.randrange(3)](y, m, d)
        if rng.random() < 0.05:
            filed = rng.choice(["13-40-2024", "", "not a date"])  # BAD_DATE
        status = rng.choice(statuses)
        if rng.random() < 0.04:
            status = rng.choice(bad_statuses)  # STATUS_UNMAPPED
        court = rng.choice(courts)
        if rng.random() < 0.03:
            court = ""  # FK_COURT
        case_type = rng.choice(["Civil", "civil", "Employment", None])
        if rng.random() < 0.02:
            case_type = ""  # VALIDATION_ERROR (present-but-empty)
        out.append(
            {
                "case_number": case_number,
                "court": court,
                "title": f"Case {i} v. Corp {i % 37}",
                "filed_date": filed,
                "parties": rng.choice(
                    [
                        "P One (plaintiff); D One, D Two (defendants)",
                        "Solo (third_party)",
                        "A / B",
                        "X (intervenor) | Y Group (defendant)",
                    ]
                ),
                "case_type": case_type,
                "judge": rng.choice(judges),
                "docket_text": "Filing text. " * rng.randrange(0, 40),
                "status": status,
            }
        )
    return out


def fuzz_trials(full: int, fast: int) -> int:
    """Trial count for seeded fuzz loops (r14 test-wall fix, round-13
    verdict ask #2's sanctioned shape: "fuzz suites behind a ... fast
    default path").  The default run — what the driver's verify window
    executes — runs `fast` trials, chosen per test so every distinct
    regime (density class, shape family) keeps at least one trial;
    set SPARK_GRAFT_FULL_FUZZ=1 to restore the full sweep (used for
    operator-touching rounds / local deep checks)."""
    import os

    return full if os.environ.get("SPARK_GRAFT_FULL_FUZZ") else fast
