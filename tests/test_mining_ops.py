"""Invariants + Python twins for the pattern-mining / alignment /
causal family (plans/driver_queries_mining.py)."""

from __future__ import annotations

import duckdb

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_mining import (
    _py_lcs,
    _py_tokens,
)
from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


def test_association_rules_are_consistent(spark):
    rows = _run(spark, "association_rules_lift")
    assert len(rows) == 20
    lifts = [r["lift_micro"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["supp_ab"] >= 3
        # joint support can never exceed either marginal
        assert r["supp_ab"] <= min(r["supp_ante"], r["supp_cons"])
        # confidence is a probability
        assert 0 < r["conf_micro"] <= 1_000_000
        # exact integer-DIV confidence
        assert r["conf_micro"] == r["supp_ab"] * 1_000_000 // r["supp_ante"]
        # interesting rules only: lift-ranked top-20 should be > 1
        assert r["lift_micro"] > 1_000_000


def test_association_rules_directional_both_ways(spark):
    """Every rule's reverse has identical joint support (symmetric
    co-occurrence) even when its confidence differs."""
    rows = _run(spark, "association_rules_lift")
    con = duckdb.connect()
    for r in rows[:5]:
        rev = con.execute(
            f"""WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                            FROM '{SF}/lineitem.parquet')
                SELECT count(*) FROM op a JOIN op b ON a.o = b.o
                WHERE a.p = ? AND b.p = ?""",
            [r["cons"], r["ante"]],
        ).fetchone()[0]
        assert rev == r["supp_ab"]


def test_lcs_python_primitives():
    assert _py_lcs([], ["a"]) == 0
    assert _py_lcs(list("abcde"), list("ace")) == 3
    assert _py_lcs(list("abc"), list("cba")) == 1
    assert _py_tokens("  A  b\tC ") == ["a", "b", "c"]
    assert _py_tokens(None) == []


def test_lcs_scores_bounded_by_jaccard_candidates(spark):
    rows = _run(spark, "lcs_align_neardups")
    assert len(rows) == 20
    ratios = [r["lcs_ratio_micro"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    for r in rows[:5]:
        ta = _py_tokens(texts[r["id_a"]])
        tb = _py_tokens(texts[r["id_b"]])
        assert (r["n_a"], r["n_b"]) == (len(ta), len(tb))
        # LCS can never exceed the shorter sequence
        assert 0 <= r["lcs_len"] <= min(r["n_a"], r["n_b"])
        assert r["lcs_len"] == _py_lcs(ta, tb)
        assert 0 <= r["lcs_ratio_micro"] <= 1_000_000


def test_did_identity_and_cell_partition(spark):
    rows = _run(spark, "difference_in_differences")
    assert len(rows) == 4
    cells = {(r["treated"], r["post"]): r for r in rows}
    assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    did = rows[0]["did_milli"]
    for r in rows:
        assert r["did_milli"] == did  # constant on every row
        assert r["mean_milli"] == r["sum_cents"] * 1000 // r["n"]
    expect = (
        cells[(1, 1)]["mean_milli"] - cells[(1, 0)]["mean_milli"]
    ) - (cells[(0, 1)]["mean_milli"] - cells[(0, 0)]["mean_milli"])
    assert did == expect
    con = duckdb.connect()
    n = con.execute(
        f"""SELECT count(*) FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey"""
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n


def test_stratified_effect_identity(spark):
    rows = _run(spark, "propensity_stratified_effect")
    assert rows, "common support must be non-empty"
    ate = rows[0]["ate_milli"]
    num = sum(r["n_s"] * (r["mt_milli"] - r["mc_milli"]) for r in rows)
    den = sum(r["n_s"] for r in rows)
    q = abs(num) // den
    assert ate == (q if num >= 0 else -q)
    assert rows[0]["n_support"] == den
    for r in rows:
        assert r["n_t"] > 0 and r["n_c"] > 0  # positivity enforced
        assert r["n_t"] + r["n_c"] == r["n_s"]
        assert r["diff_milli"] == r["mt_milli"] - r["mc_milli"]
        assert r["ate_milli"] == ate


def test_nelson_aalen_consistent_with_km_risk_sets(spark):
    na = _run(spark, "nelson_aalen_hazard")
    km = {r["t_day"]: r for r in _run(spark, "kaplan_meier_conversion")}
    prev_cum = 0
    for r in na:
        # hazard increments are exact integer divisions
        assert r["hazard_micro"] == r["n_events"] * 1_000_000 // r["n_risk"]
        assert r["cum_hazard_micro"] == prev_cum + r["hazard_micro"]
        prev_cum = r["cum_hazard_micro"]
        # same risk sets as the KM curve on shared event days (KM
        # additionally drops d == n_risk days)
        if r["t_day"] in km:
            k = km[r["t_day"]]
            assert (k["n_risk"], k["n_events"]) == (
                r["n_risk"],
                r["n_events"],
            )
        # NA >= -ln(S) is false in general, but both are positive and
        # the hazard is a probability increment
        assert 0 < r["hazard_micro"] <= 1_000_000


def test_hill_alpha_matches_python(spark):
    import math

    rows = _run(spark, "hill_tail_exponent")
    assert len(rows) == 1
    r = rows[0]
    con = duckdb.connect()
    freqs = [
        x[0]
        for x in con.execute(
            f"""SELECT count(*) FROM (
                  SELECT unnest(list_filter(string_split_regex(
                    lower(coalesce(text, '')), '\\s+'), t -> t <> '')) AS w
                  FROM '{SF}/documents.parquet')
                GROUP BY w HAVING count(*) >= 5"""
        ).fetchall()
    ]
    s = sum(
        math.floor(math.log(f / 5) * 1e6 + 0.5) for f in freqs
    )
    assert r["n_tail"] == len(freqs)
    assert r["s_ln_micro"] == s
    assert r["alpha_micro"] == 1_000_000 + math.floor(
        len(freqs) * 1e12 / s + 0.5
    )
    # a plausible power-law-ish tail exponent
    assert 1_000_000 < r["alpha_micro"] < 20_000_000


def test_mcnemar_cells_partition_customers(spark):
    rows = _run(spark, "mcnemar_urgent_periods")
    assert len(rows) == 1
    r = rows[0]
    assert r["a"] + r["b"] + r["c"] + r["d"] == r["n"]
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert r["n"] == n_cust
    import math

    expect = math.floor(
        (r["b"] - r["c"]) ** 2 / (r["b"] + r["c"]) * 1e6 + 0.5
    )
    assert r["mcnemar_micro"] == expect


def test_odds_ratio_ci_brackets_point_estimate(spark):
    rows = _run(spark, "odds_ratio_woolf_ci")
    assert len(rows) == 1
    r = rows[0]
    import math

    for cell in ("a", "b", "c", "d"):
        assert r[cell] > 0  # Woolf needs all four cells populated
    lnor = math.log(r["a"] * r["d"] / (r["b"] * r["c"]))
    se = math.sqrt(1 / r["a"] + 1 / r["b"] + 1 / r["c"] + 1 / r["d"])
    assert r["lnor_micro"] == math.floor(lnor * 1e6 + 0.5)
    assert r["se_micro"] == math.floor(se * 1e6 + 0.5)
    assert r["ci_lo_micro"] == math.floor((lnor - 1.959964 * se) * 1e6 + 0.5)
    assert r["ci_hi_micro"] == math.floor((lnor + 1.959964 * se) * 1e6 + 0.5)
    assert r["ci_lo_micro"] < r["lnor_micro"] < r["ci_hi_micro"]


def test_dtw_twin_matches_bruteforce():
    # seeded fuzz: the two-row DP in _py_dtw vs a memoized recursive
    # definition of DTW, on small random integer series.
    import random
    from functools import lru_cache

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_mining import (
        _py_dtw,
    )

    rng = random.Random(8041)
    for _ in range(60):
        na, nb = rng.randint(1, 8), rng.randint(1, 8)
        a = tuple(rng.randint(0, 20) for _ in range(na))
        b = tuple(rng.randint(0, 20) for _ in range(nb))

        @lru_cache(maxsize=None)
        def rec(i: int, j: int) -> int:
            if i == 0 and j == 0:
                return abs(a[0] - b[0])
            if i < 0 or j < 0:
                return 1 << 62
            return abs(a[i] - b[j]) + min(
                rec(i - 1, j), rec(i, j - 1), rec(i - 1, j - 1)
            )

        assert _py_dtw(list(a), list(b)) == rec(na - 1, nb - 1)
        rec.cache_clear()


def test_dtw_identity_and_shift():
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_mining import (
        _py_dtw,
    )

    s = [3, 1, 4, 1, 5, 9, 2, 6]
    assert _py_dtw(s, s) == 0
    # a pure one-step lag is mostly absorbed by warping: cost far
    # below the unwarped L1 distance
    lag = [0] + s[:-1]
    l1 = sum(abs(x - y) for x, y in zip(s, lag))
    assert _py_dtw(s, lag) < l1


def test_kcenter_radius_sequence_monotone(spark):
    """Greedy k-center invariants: k distinct picks, the seed carries
    the 2e6 max-distance sentinel, and the coverage-radius sequence
    (each later pick's distance to the selected set) never increases
    — the defining property of furthest-point traversal."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    rows = (
        registry()["kcenter_coreset_selection"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.vec_id for r in rows}) == len(rows)
    assert rows[0].dist_micro == 2_000_000
    radii = [r.dist_micro for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(0 <= d <= 2_000_000 for d in radii)


def test_cross_source_matrix_doc_pair_accounting(spark):
    """Each matrix cell's distinct-doc count is bounded by 2*n_pairs
    and at least 2 (a pair needs two docs); lo/hi ordering is
    canonical."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    rows = (
        registry()["cross_source_neardup_matrix"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows  # sf0.001 corpus has near-dup pairs
    for r in rows:
        assert r.source_lo <= r.source_hi
        assert 2 <= r.n_docs <= 2 * r.n_pairs
