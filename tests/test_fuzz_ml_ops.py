"""Seeded-fuzz equivalence for the session-4/5 training operators:
random small datasets replayed against pure-Python reference models
(the test_fuzz.py convention)."""

from __future__ import annotations

import math
import random

from legal_data_ingestion_rag_pipeline_spark.operators import recurrence, stump

SEED = 20260815


def test_fuzz_histogram_split_search_matches_python(spark):
    rng = random.Random(SEED)
    for trial in range(3):
        n = rng.randrange(20, 120)
        rows = [
            (rng.randrange(0, 10_000), rng.randrange(2)) for _ in range(n)
        ]
        n_bins = rng.choice([4, 16, 64])
        df = spark.createDataFrame(rows, "f: bigint, y: bigint")
        got = [
            (
                r["split_bin"],
                r["split_upper"],
                r["n_left"],
                r["pos_left"],
                r["n_right"],
                r["pos_right"],
                r["gini_micro"],
            )
            for r in stump.histogram_split_search(df, "f", "y", n_bins)
            .orderBy("split_bin")
            .collect()
        ]
        mn = min(r[0] for r in rows)
        mx = max(r[0] for r in rows)
        n_tot, pos_tot = len(rows), sum(r[1] for r in rows)
        hist: dict[int, list[int]] = {}
        for f, y in rows:
            b = ((f - mn) * n_bins) // (mx - mn + 1)
            e = hist.setdefault(b, [0, 0])
            e[0] += 1
            e[1] += y
        expect = []
        nl = pl = 0
        for b in sorted(hist):
            nl += hist[b][0]
            pl += hist[b][1]
            if nl == 0 or nl == n_tot:
                continue
            nr, pr = n_tot - nl, pos_tot - pl
            gini = (pl * (nl - pl) / nl + pr * (nr - pr) / nr) * 2e6 / n_tot
            expect.append(
                (
                    b,
                    mn + ((b + 1) * (mx - mn + 1)) // n_bins - 1,
                    nl,
                    pl,
                    nr,
                    pr,
                    math.floor(gini + 0.5),
                )
            )
        assert got == expect, f"trial {trial}"


def test_fuzz_halving_ewma_matches_python(spark):
    rng = random.Random(SEED + 1)
    rows = []
    expect = []
    for key in range(4):
        series = [rng.randrange(0, 1000) for _ in range(rng.randrange(1, 40))]
        y = None
        for i, x in enumerate(series):
            rows.append((f"k{key}", i, x))
            y = x if y is None else (y + x) // 2
            expect.append((f"k{key}", i, x, y))
    df = spark.createDataFrame(rows, "k: string, t: bigint, x: bigint")
    got = sorted(
        (r["k"], r["t"], r["x"], r["ewma"])
        for r in recurrence.halving_ewma(df, "k", "t", "x").collect()
    )
    assert got == sorted(expect)


def test_fuzz_holt_linear_matches_python_trunc_walk(spark):
    rng = random.Random(SEED + 2)

    def trunc_half(a: int) -> int:
        q = abs(a) // 2
        return q if a >= 0 else -q

    rows = []
    expect = []
    for key in range(4):
        # include steep drops so the trend goes NEGATIVE — the case
        # where floor-vs-truncate semantics actually differ
        series = [rng.randrange(0, 100_000) for _ in range(rng.randrange(2, 40))]
        lv, tr = None, 0
        for i, x in enumerate(series):
            rows.append((f"k{key}", i, x))
            if lv is None:
                lv, tr = x, 0
            else:
                nl = trunc_half(x + lv + tr)
                tr = trunc_half(tr + (nl - lv))
                lv = nl
            expect.append((f"k{key}", i, x, lv, tr))
    df = spark.createDataFrame(rows, "k: string, t: bigint, x: bigint")
    got = sorted(
        (r["k"], r["t"], r["x"], r["level"], r["trend"])
        for r in recurrence.holt_linear(df, "k", "t", "x").collect()
    )
    exp = sorted(expect)
    assert got == exp
    # the negative-trend case must actually occur for the test to bite
    assert any(t < 0 for (_, _, _, _, t) in exp)
