"""Invariants + bit-exact Python twins for the supervised-learning /
feature-engineering family (plans/driver_queries_ml.py).  The hash
gate proves Spark == DuckDB; these prove both equal an independent
model of the math."""

from __future__ import annotations

import math

import duckdb

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


# --------------------------------------------------------------------------
# stump_split_search
# --------------------------------------------------------------------------

def _python_stump(n_bins: int = 64):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    mn = min(r[0] for r in rows)
    mx = max(r[0] for r in rows)
    n_tot = len(rows)
    pos_tot = sum(r[1] for r in rows)
    hist: dict[int, list[int]] = {}
    for cents, y in rows:
        b = ((cents - mn) * n_bins) // (mx - mn + 1)
        e = hist.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += y
    out = []
    nl = pl = 0
    for b in sorted(hist):
        nl += hist[b][0]
        pl += hist[b][1]
        if nl == 0 or nl == n_tot:
            continue
        nr, pr = n_tot - nl, pos_tot - pl
        gini = (pl * (nl - pl) / nl + pr * (nr - pr) / nr) * 2e6 / n_tot
        out.append(
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
    out.sort(key=lambda r: (r[6], r[0]))
    return out


def test_stump_matches_python_model(spark):
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
        for r in _run(spark, "stump_split_search")
    ]
    assert got == _python_stump()


def test_stump_best_split_beats_parent_or_ties(spark):
    rows = _run(spark, "stump_split_search")
    n = rows[0]["n_left"] + rows[0]["n_right"]
    p = rows[0]["pos_left"] + rows[0]["pos_right"]
    parent_micro = math.floor(2e6 * p * (n - p) / (n * n) + 0.5)
    # weighted post-split Gini can never exceed the parent impurity
    assert rows[0]["gini_micro"] <= parent_micro + 1  # +1 snap slack
    # counts are conserved on every candidate row
    for r in rows:
        assert r["n_left"] + r["n_right"] == n
        assert r["pos_left"] + r["pos_right"] == p
        assert 0 <= r["pos_left"] <= r["n_left"]
        assert 0 <= r["pos_right"] <= r["n_right"]


# --------------------------------------------------------------------------
# naive_bayes_lang_confusion
# --------------------------------------------------------------------------

def test_naive_bayes_confusion_partitions_test_docs(spark):
    rows = _run(spark, "naive_bayes_lang_confusion")
    con = duckdb.connect()
    n_test = con.execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet' WHERE doc_id % 2 = 1"
    ).fetchone()[0]
    langs = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT lang FROM '{SF}/documents.parquet'"
            " WHERE doc_id % 2 = 0"
        ).fetchall()
    }
    assert sum(r["n"] for r in rows) == n_test
    for r in rows:
        # predictions only ever come from trained classes
        assert r["pred_lang"] in langs
        assert r["n"] > 0
        # winning log-score of a real doc is strictly negative
        assert r["score_sum_micro"] < 0


# --------------------------------------------------------------------------
# target_encoding_shrunk
# --------------------------------------------------------------------------

def test_target_encoding_shrinks_toward_prior(spark):
    rows = _run(spark, "target_encoding_shrunk")
    assert len(rows) == 25  # 5 segments x 5 priorities, all populated
    for r in rows:
        assert 0 < r["lam_micro"] < 1_000_000
        # the encoding lies between the raw cell mean and the segment
        # prior it shrinks toward (floor-division slack of 1 cent)
        lo = min(r["raw_cents"], r["enc_cents"])
        hi = max(r["raw_cents"], r["enc_cents"])
        assert hi - lo <= abs(r["raw_cents"] - r["enc_cents"]) + 1
        # more data -> less shrinkage: lam is monotone in n
    by_n = sorted(rows, key=lambda r: r["n"])
    lams = [r["lam_micro"] for r in by_n]
    assert lams == sorted(lams)


# --------------------------------------------------------------------------
# itemitem_cosine_topk
# --------------------------------------------------------------------------

def test_itemitem_scores_are_valid_cosines(spark):
    rows = _run(spark, "itemitem_cosine_topk")
    by_a: dict[int, list] = {}
    for r in rows:
        assert r["part_a"] != r["part_b"]
        assert 0 < r["cooc"] <= min(r["na"], r["nb"])
        # cosine of binary vectors is cooc/sqrt(na*nb) in (0, 1]
        assert 0 < r["cos_micro"] <= 1_000_000
        expect = math.floor(
            r["cooc"] * 1e6 / math.sqrt(r["na"] * r["nb"]) + 0.5
        )
        assert r["cos_micro"] == expect
        by_a.setdefault(r["part_a"], []).append(r)
    assert len(by_a) == 10
    for recs in by_a.values():
        ranks = [r["rk"] for r in recs]
        assert ranks == list(range(1, len(recs) + 1))
        scores = [r["cos_micro"] for r in recs]
        assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------------------------
# ewma_event_type_daily
# --------------------------------------------------------------------------

def test_ewma_matches_python_walk(spark):
    rows = _run(spark, "ewma_event_type_daily")
    con = duckdb.connect()
    counts = dict(
        (tuple(r[:2]), r[2])
        for r in con.execute(
            f"""SELECT event_type,
                       CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT),
                       count(*)
                FROM '{SF}/events.parquet' GROUP BY 1, 2"""
        ).fetchall()
    )
    days = sorted({d for (_, d) in counts})
    lo, hi = days[0], days[-1]
    types = sorted({t for (t, _) in counts})
    expect = []
    for t in types:
        y = None
        for d in range(lo, hi + 1):
            x = counts.get((t, d), 0)
            y = x if y is None else (y + x) // 2
            expect.append((t, d, x, y))
    got = [(r["event_type"], r["d"], r["x"], r["ewma"]) for r in rows]
    assert got == expect


# --------------------------------------------------------------------------
# conformal_price_calibration
# --------------------------------------------------------------------------

def test_conformal_qhat_is_the_kth_order_statistic(spark):
    rows = _run(spark, "conformal_price_calibration")
    con = duckdb.connect()
    for r in rows:
        scores = [
            x[0]
            for x in con.execute(
                f"""WITH j AS (
                  SELECT o.o_orderkey,
                         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                           AS cents
                  FROM '{SF}/orders.parquet' o
                  JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
                  WHERE c.c_mktsegment = ? AND o.o_orderkey % 2 = 0
                )
                SELECT abs(cents - ?) FROM j""",
                [r["segment"], r["pred_cents"]],
            ).fetchall()
        ]
        scores.sort()
        assert r["n_cal"] == len(scores)
        k = (9 * (len(scores) + 1) + 9) // 10
        assert r["k"] == k
        assert r["qhat_cents"] == scores[k - 1]
        # calibration-side coverage of [pred - qhat, pred + qhat] is
        # >= k/n by construction of the order statistic
        covered = sum(1 for s in scores if s <= r["qhat_cents"])
        assert covered >= k
        # held-out coverage is reported against a positive test count
        assert 0 < r["n_covered"] <= r["n_test"]


# --------------------------------------------------------------------------
# boosting_two_rounds
# --------------------------------------------------------------------------

def _trunc_div(a: int, b: int) -> int:
    """SQL DIV semantics: truncate toward zero (b > 0)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def test_boosting_matches_python_twin(spark):
    rows = _run(spark, "boosting_two_rounds")
    assert [r["round"] for r in rows] == [1, 2]
    assert [r["feature"] for r in rows] == ["total_cents", "order_month"]

    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                   CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT),
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    mn = min(r[0] for r in data)
    mx = max(r[0] for r in data)
    n_tot = len(data)
    pos_tot = sum(r[2] for r in data)
    f0 = pos_tot * 1_000_000 // n_tot

    # round 1: 64-bin histogram on cents
    h1: dict[int, list[int]] = {}
    for cents, _, y in data:
        b = ((cents - mn) * 64) // (mx - mn + 1)
        e = h1.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += y
    best1, best1_score = None, None
    nl = pl = 0
    for b in sorted(h1):
        nl += h1[b][0]
        pl += h1[b][1]
        if nl == 0 or nl == n_tot:
            continue
        sl = pl * 1_000_000 - nl * f0
        sr = (pos_tot - pl) * 1_000_000 - (n_tot - nl) * f0
        nr = n_tot - nl
        score = float(sl) * sl / nl + float(sr) * sr / nr
        if best1_score is None or score > best1_score:
            best1_score = score
            best1 = (b, nl, nr, sl, sr)
    b, nl1, nr1, sl1, sr1 = best1
    split_upper1 = mn + ((b + 1) * (mx - mn + 1)) // 64 - 1
    gl1, gr1 = _trunc_div(sl1, nl1), _trunc_div(sr1, nr1)
    r1 = rows[0]
    assert (
        r1["split_upper"],
        r1["n_left"],
        r1["n_right"],
        r1["gamma_left_micro"],
        r1["gamma_right_micro"],
        r1["f0_micro"],
    ) == (split_upper1, nl1, nr1, gl1, gr1, f0)

    # round 2: month histogram on updated residuals
    h2: dict[int, list[int]] = {}
    for cents, mth, y in data:
        e = h2.setdefault(mth, [0, 0, 0])
        e[0] += 1
        e[1] += y
        if cents <= split_upper1:
            e[2] += 1
    best2, best2_score = None, None
    s_all = sum(
        p * 1_000_000 - n * f0 - a * gl1 - (n - a) * gr1
        for n, p, a in h2.values()
    )
    nl = sl = 0
    for m in sorted(h2):
        n, p, a = h2[m]
        nl += n
        sl += p * 1_000_000 - n * f0 - a * gl1 - (n - a) * gr1
        if nl == 0 or nl == n_tot:
            continue
        sr = s_all - sl
        nr = n_tot - nl
        score = float(sl) * sl / nl + float(sr) * sr / nr
        if best2_score is None or score > best2_score:
            best2_score = score
            best2 = (m, nl, nr, sl, sr)
    m2, nl2, nr2, sl2, sr2 = best2
    r2 = rows[1]
    assert (
        r2["split_upper"],
        r2["n_left"],
        r2["n_right"],
        r2["gamma_left_micro"],
        r2["gamma_right_micro"],
    ) == (m2, nl2, nr2, _trunc_div(sl2, nl2), _trunc_div(sr2, nr2))


def test_boosting_round2_residuals_shrink(spark):
    """After subtracting round-1 leaf values the total residual mass
    must not grow: |sum r2| <= |sum r1| + truncation slack."""
    rows = _run(spark, "boosting_two_rounds")
    r1, r2 = rows
    # round-2 leaves reconstruct a partition of all rows
    assert r1["n_left"] + r1["n_right"] == r2["n_left"] + r2["n_right"]
    # leaf values are micro-probability corrections, bounded by 1.0
    for r in rows:
        assert abs(r["gamma_left_micro"]) <= 1_000_000
        assert abs(r["gamma_right_micro"]) <= 1_000_000
    assert 0 <= r1["f0_micro"] <= 1_000_000


# --------------------------------------------------------------------------
# logistic_hashed_first_step
# --------------------------------------------------------------------------

def test_logistic_first_step_reduces_loss(spark):
    rows = _run(spark, "logistic_hashed_first_step")
    # buckets partition the (row, feature) incidences: 4 per row
    n = rows[0]["n_rows"]
    assert sum(r["cnt"] for r in rows) == 4 * n
    for r in rows:
        assert 0 <= r["pos"] <= r["cnt"]
        assert r["grad_half"] == r["cnt"] - 2 * r["pos"]
        # w1 = -grad/N in micro units, truncating division
        expect = (2 * r["pos"] - r["cnt"]) * 1_000_000
        q = abs(expect) // (2 * n)
        assert r["w1_micro"] == (q if expect >= 0 else -q)
    # the first gradient step from w=0 can never increase the NLL
    # (it moves along the exact negative gradient with a small step)
    assert rows[0]["loss_after_total_micro"] < rows[0][
        "loss_before_total_micro"
    ]
    assert rows[0]["loss_before_total_micro"] == n * 693147
