"""Driver queries: statistical-test and distribution-analytics
operators — the hypothesis-testing / association / concentration
family a data-quality or experimentation platform layers on top of
the OLAP core — every family listed here is implemented in
this module: chi-squared
independence, Benford digit audit, Shannon entropy, seasonality
profile, Spearman rank correlation, Gini concentration,
Kolmogorov-Smirnov, last-touch attribution, lag-1 autocorrelation,
RFM segmentation, degree assortativity, Adamic-Adar link
prediction, HITS, exact tie-corrected ROC-AUC (Mann-Whitney), decile
lift/calibration, exact banded quantiles (global and
per-group), calendar-spine gap filling, CUSUM change-point
detection, Mann-Kendall trend significance (tie-corrected, with
Kendall tau-b), Kaplan-Meier survival (product-limit over censored
conversion times) with its two-sample log-rank test, a
deterministic Poisson-bootstrap confidence
interval, an exact 28-day DFT periodogram (literal milli trig
tables folded in Python, BIGINT spectral power), Wald's SPRT
sequential conversion monitor (folded micro-nat LLR literals), and
the index-of-dispersion overdispersion diagnostic.  The global-order
statistics (Spearman,
Gini, KS, RFM, AUC, quantiles) all run through the two-phase
band-parallel rank/prefix-sum layer (operators/ranks.py) — never a
single-task global sort.

Every query follows the repo's cross-engine exactness conventions:
counts and cents are exact BIGINTs, each transcendental (ln) is
applied once to a ratio of exact integers and snapped to micro-units
before any summation (the psi_value_drift / lm_perplexity
convention), constants are folded in Python as literal tables (the
decayed_user_value convention), and every final ordering carries a
deterministic total-order tie-break.

No reference-file citation applies: the reference engine
(/root/reference) has no statistics surface; these extend the
engine the way its data_quality module extends ingest — same table
domain, new measures.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..session import barrier, load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "chi_squared_independence",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS observed
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rt AS (SELECT segment, CAST(sum(observed) AS BIGINT) AS row_tot
           FROM cells GROUP BY 1),
    ct AS (SELECT priority, CAST(sum(observed) AS BIGINT) AS col_tot
           FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells)
    SELECT cells.segment, cells.priority, cells.observed,
           (rt.row_tot * ct.col_tot * 1000) // tot.n AS expected_milli,
           CAST(floor(
             CAST(cells.observed * tot.n - rt.row_tot * ct.col_tot AS DOUBLE)
             * CAST(cells.observed * tot.n - rt.row_tot * ct.col_tot AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * rt.row_tot * ct.col_tot)
             * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
    FROM cells
    JOIN rt ON rt.segment = cells.segment
    JOIN ct ON ct.priority = cells.priority
    CROSS JOIN tot
    ORDER BY cells.segment, cells.priority
    """,
    doc="chi-squared test of independence between customer market "
    "segment and order priority: the per-cell contingency "
    "contribution (O-E)^2/E, reported per cell so the total "
    "statistic is an exact reader-side sum of micro-units. "
    "Expected counts are exact integer millis (row_tot*col_tot*1000 "
    "DIV N — no float division); the chi2 contribution rewrites "
    "(O-E)^2/E as (O*N - rt*ct)^2 / (N*rt*ct) so the ONLY doubles "
    "are casts of exact BIGINTs and the arithmetic is one identical "
    "IEEE expression in both engines. One fact-scale shuffle "
    "(orders⋈customer) feeds a 20-cell table; marginals and the "
    "1-row total broadcast — the plan is flat at any corpus size.",
)
def chi_squared_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    rt = cells.groupBy("segment").agg(
        F.sum("observed").cast("bigint").alias("row_tot")
    )
    ct = cells.groupBy("priority").agg(
        F.sum("observed").cast("bigint").alias("col_tot")
    )
    tot = cells.agg(F.sum("observed").cast("bigint").alias("n"))
    return (
        cells.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "priority")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "priority",
            "observed",
            F.expr("row_tot * col_tot * 1000 DIV n").alias("expected_milli"),
            F.expr(
                "CAST(floor("
                "CAST(observed * n - row_tot * col_tot AS DOUBLE)"
                " * CAST(observed * n - row_tot * col_tot AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * row_tot * col_tot)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("chi2_micro"),
        )
        .orderBy("segment", "priority")
    )


#: Benford first-digit expectation log10(1 + 1/d), micro-snapped in
#: Python once and folded into both dialects as the same literal
#: array — log10 walks different libm paths in the two engines, a
#: literal table walks none (the decayed_user_value convention).
_BENFORD_MICRO = [
    int(math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000 + 0.5))
    for d in range(1, 10)
]


@register(
    "benford_first_digit",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM cents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM digits)
    SELECT d.digit, d.n,
           (d.n * 1000000) // tot.t AS share_micro,
           ([{', '.join(str(v) for v in _BENFORD_MICRO)}])[d.digit]
             AS benford_micro,
           (d.n * 1000000) // tot.t
             - ([{', '.join(str(v) for v in _BENFORD_MICRO)}])[d.digit]
             AS delta_micro
    FROM digits d CROSS JOIN tot
    ORDER BY d.digit
    """,
    doc="Benford's-law first-digit audit of order totals — the "
    "classic fabricated-data / corrupted-feed screen: observed "
    "first-significant-digit shares vs the log10(1+1/d) expectation. "
    "The digit is extracted from the exact cents BIGINT via "
    "integer-to-string (no float log10 at query time), shares are "
    "exact integer-division micros, and the expectation is a "
    "Python-folded literal table — the whole result is "
    "transcendental-free and hash-exact. One grouped pass; the "
    "9-row digit table and 1-row total broadcast.",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    benford = F.array(*[F.lit(v).cast("bigint") for v in _BENFORD_MICRO])
    digits = (
        o.filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)"
                " AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = digits.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 DIV t").alias("share_micro"),
            F.element_at(benford, F.col("digit").cast("int")).alias(
                "benford_micro"
            ),
            (
                F.expr("n * 1000000 DIV t")
                - F.element_at(benford, F.col("digit").cast("int"))
            ).alias("delta_micro"),
        )
        .orderBy("digit")
    )


@register(
    "entropy_priority_by_segment",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    seg AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS tot FROM cells
            GROUP BY 1)
    SELECT cells.segment,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(max(seg.tot) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(
             CAST(cells.cnt AS DOUBLE) / seg.tot
             * ln(CAST(seg.tot AS DOUBLE) / cells.cnt)
             * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
    FROM cells JOIN seg ON seg.segment = cells.segment
    GROUP BY cells.segment
    ORDER BY cells.segment
    """,
    doc="Shannon entropy of the order-priority mix within each "
    "market segment — the distribution-uniformity measure feeding "
    "mixture balancing and drift alerts (a segment whose priority "
    "entropy collapses is routing everything one way). Each cell's "
    "-p*ln(p) term is computed on ratios of exact integers, "
    "micro-snapped BEFORE the per-segment sum (the psi_value_drift "
    "convention), so the aggregate is an exact BIGINT sum of "
    "deterministic terms. One fact-scale shuffle feeds a 20-cell "
    "table; per-segment totals broadcast.",
)
def entropy_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    seg = cells.groupBy("segment").agg(
        F.sum("cnt").cast("bigint").alias("tot")
    )
    return (
        cells.join(F.broadcast(seg), "segment")
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.max("tot").cast("bigint").alias("n_orders"),
            F.sum(
                F.expr(
                    "CAST(floor(CAST(cnt AS DOUBLE) / tot"
                    " * ln(CAST(tot AS DOUBLE) / cnt)"
                    " * 1000000.0 + 0.5) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("entropy_micro"),
        )
        .orderBy("segment")
    )


#: 1994-12-26 is a Monday; every o_orderdate (1995+) is after it, so
#: the day-difference is nonnegative and % 7 agrees between engines
#: (no negative-modulo semantics in play). 0=Mon .. 6=Sun.
_DOW_ANCHOR = "1994-12-26"
_DOW_NAMES = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]


@register(
    "dow_seasonality_profile",
    oracle=f"""
    WITH d AS (
      SELECT (CAST(o_orderdate AS DATE) - DATE '{_DOW_ANCHOR}') % 7
               AS dow_idx,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    g AS (
      SELECT dow_idx, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM d GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS t FROM g)
    SELECT CAST(g.dow_idx AS BIGINT) AS dow_idx,
           (['{"', '".join(_DOW_NAMES)}'])[g.dow_idx + 1] AS dow_name,
           g.n_orders, g.revenue_cents,
           g.revenue_cents // g.n_orders AS avg_order_cents,
           CAST(floor(CAST(g.revenue_cents AS DOUBLE) / tot.t
                * 1000000.0 + 0.5) AS BIGINT) AS share_micro
    FROM g CROSS JOIN tot
    ORDER BY dow_idx
    """,
    doc="day-of-week seasonality profile of order revenue — the "
    "weekly-cycle decomposition a forecasting or anomaly layer "
    "subtracts before flagging residuals (daily_count_anomalies' "
    "calendar complement). The weekday index is pure integer "
    "arithmetic against a folded Monday anchor (no engine-specific "
    "dayofweek(), whose 0/1-origin and week-start conventions "
    "differ); revenue is exact cents, the per-day average is exact "
    "integer division, and only the 7-row share computation touches "
    "doubles (cast from exact BIGINTs — scale-safe where a "
    "rev*1e6 integer product would overflow at petabyte sums). One "
    "grouped pass over orders.",
)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    names = F.array(*[F.lit(s) for s in _DOW_NAMES])
    g = (
        o.select(
            (
                F.datediff(F.to_date("o_orderdate"), F.lit(_DOW_ANCHOR)) % 7
            ).alias("dow_idx"),
            F.expr(
                "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("dow_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    tot = g.agg(F.sum("revenue_cents").cast("bigint").alias("t"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow_idx").cast("bigint").alias("dow_idx"),
            F.element_at(names, F.col("dow_idx").cast("int") + 1).alias(
                "dow_name"
            ),
            "n_orders",
            "revenue_cents",
            F.expr("revenue_cents DIV n_orders").alias("avg_order_cents"),
            F.expr(
                "CAST(floor(CAST(revenue_cents AS DOUBLE) / t"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("share_micro"),
        )
        .orderBy("dow_idx")
    )


# ---------------------------------------------------------------------------
# Rank statistics: Spearman, Gini, RFM — two-phase global ranks
# (operators/ranks.py), never a single-task global sort.  Oracles
# deliberately use the plain one-window SQL formulation: independent
# algorithm, same ranks — exactly what the hash gate should prove.
# ---------------------------------------------------------------------------


@register(
    "spearman_balance_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS ck,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS sp
      FROM orders GROUP BY 1),
    base AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey AS ck,
             CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal, s.sp
      FROM customer c JOIN spend s ON s.ck = c.c_custkey),
    r AS (
      SELECT segment,
             row_number() OVER (PARTITION BY segment ORDER BY bal, ck) AS rx,
             row_number() OVER (PARTITION BY segment ORDER BY sp, ck) AS ry
      FROM base),
    g AS (
      SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
      FROM r GROUP BY segment)
    SELECT segment, n_customers, sum_d2,
           CAST(floor((1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
                / (CAST(n_customers AS DOUBLE) * n_customers * n_customers
                   - n_customers))
                * 1000000.0 + 0.5) AS BIGINT) AS rho_micro
    FROM g ORDER BY segment
    """,
    doc="Spearman rank correlation between customer account balance "
    "and total order spend, per market segment — the monotone-"
    "association test (does a bigger balance rank where a bigger "
    "spend ranks?). Both variables rank through the TWO-PHASE global "
    "rank (operators/ranks.two_phase_rank): band-parallel in-band "
    "row_numbers plus band-carry offsets from a band-bounded window "
    "— no single-task global sort at any corpus size. Ranks are "
    "row_number over the total order (value, custkey) — the "
    "deterministic tie policy, documented in lieu of average ranks — "
    "so sum_d2 is an exact BIGINT and rho = 1 - 6*sum_d2/(n^3-n) is "
    "one identical IEEE expression over exact integers, micro-"
    "snapped. Customers with no orders are excluded (rank domain = "
    "joined rows).",
)
def spearman_balance_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("sp")
    )
    base = (
        c.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)").alias(
                "bal"
            ),
        )
        .join(spend, "ck")
        # bands: $1000 of balance / $100k of spend — value-range-
        # bounded partitions of the sort domain (the two-phase
        # contract), monotone under trunc DIV even at negative cents
        .withColumn("bal_band", F.expr("bal DIV 100000"))
        .withColumn("sp_band", F.expr("sp DIV 10000000"))
    )
    ranked = ranks.two_phase_rank(
        base, ["bal", "ck"], "bal_band", part_cols=["segment"], rank_name="rx"
    )
    ranked = ranks.two_phase_rank(
        ranked, ["sp", "ck"], "sp_band", part_cols=["segment"], rank_name="ry"
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.expr("(rx - ry) * (rx - ry)"))
            .cast("bigint")
            .alias("sum_d2"),
        )
        .select(
            "segment",
            "n_customers",
            "sum_d2",
            F.expr(
                "CAST(floor((1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)"
                " / (CAST(n_customers AS DOUBLE) * n_customers * n_customers"
                " - n_customers))"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("rho_micro"),
        )
        .orderBy("segment")
    )


@register(
    "gini_revenue_by_segment",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
             CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS sp
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    r AS (
      SELECT segment, sp,
             row_number() OVER (PARTITION BY segment ORDER BY sp, ck) AS i
      FROM spend),
    g AS (
      SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(sp) AS BIGINT) AS revenue_cents,
             CAST(sum(i * sp) AS BIGINT) AS t
      FROM r GROUP BY segment)
    SELECT segment, n_customers, revenue_cents,
           CAST(floor((2.0 * CAST(t AS DOUBLE)
                - (CAST(n_customers AS DOUBLE) + 1.0) * revenue_cents)
                / (CAST(n_customers AS DOUBLE) * revenue_cents)
                * 1000000.0 + 0.5) AS BIGINT) AS gini_micro
    FROM g ORDER BY segment
    """,
    doc="Gini concentration of revenue across customers, per market "
    "segment — the inequality measure a mixture/curation layer uses "
    "to detect head-heavy domains. The sorted prefix-weight sum "
    "T = sum(i * x_i) over ascending-spend ranks comes from the "
    "two-phase global rank (no single-task sort); "
    "G = (2T - (n+1)S) / (nS) evaluates as one identical IEEE "
    "expression over the exact BIGINTs (T, S, n), micro-snapped. "
    "Rank ties break by (spend, custkey) — a total order, so T is "
    "deterministic. BIGINT headroom: T <= n^2 * avg_spend_cents "
    "fits int64 to ~10^9 customers at TPC-H spend levels; beyond "
    "that, sum i*x_i into DECIMAL(38,0) on both engines.",
)
def gini_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("ck"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
            )
            .cast("bigint")
            .alias("sp")
        )
        .withColumn("sp_band", F.expr("sp DIV 10000000"))
    )
    ranked = ranks.two_phase_rank(
        spend, ["sp", "ck"], "sp_band", part_cols=["segment"], rank_name="i"
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("sp").cast("bigint").alias("revenue_cents"),
            F.sum(F.expr("i * sp")).cast("bigint").alias("t"),
        )
        .select(
            "segment",
            "n_customers",
            "revenue_cents",
            F.expr(
                "CAST(floor((2.0 * CAST(t AS DOUBLE)"
                " - (CAST(n_customers AS DOUBLE) + 1.0) * revenue_cents)"
                " / (CAST(n_customers AS DOUBLE) * revenue_cents)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("gini_micro"),
        )
        .orderBy("segment")
    )


@register(
    "ks_urgent_price_distribution",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
               END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1
               END) AS BIGINT) AS cb
      FROM orders GROUP BY 1),
    r AS (
      SELECT cents,
             CAST(sum(ca) OVER (ORDER BY cents) AS BIGINT) AS ca_run,
             CAST(sum(cb) OVER (ORDER BY cents) AS BIGINT) AS cb_run
      FROM v),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                 CAST(sum(cb) AS BIGINT) AS n_b FROM v)
    SELECT t.n_a AS n_urgent, t.n_b AS n_rest, r.cents AS at_cents,
           abs(r.ca_run * t.n_b - r.cb_run * t.n_a) AS ks_num,
           CAST(floor(CAST(abs(r.ca_run * t.n_b - r.cb_run * t.n_a)
                AS DOUBLE)
                / (CAST(t.n_a AS DOUBLE) * t.n_b) * 1000000.0 + 0.5)
             AS BIGINT) AS ks_micro
    FROM r CROSS JOIN t
    ORDER BY ks_num DESC, at_cents LIMIT 1
    """,
    doc="two-sample Kolmogorov-Smirnov distance between the order-"
    "total distributions of URGENT orders vs the rest — the "
    "distribution-drift test (did the urgent lane's price mix "
    "shift?). Both ECDFs come from ONE two-phase prefix sum "
    "(operators/ranks.two_phase_prefix_sum) over per-distinct-cents "
    "group counts: band-parallel running sums plus band-carry "
    "offsets, never a single-task global sort. The supremum "
    "|F_a - F_b| maximizes the exact integer cross product "
    "|ca_run*n_b - cb_run*n_a| (no float ECDF), reported with its "
    "argmax value (min-cents tie-break) and the micro-snapped "
    "normalized statistic; the top-1 is TakeOrderedAndProject. "
    "Oracle: the one-window SQL formulation — independent algorithm, "
    "same supremum.",
)
def ks_urgent_price_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders")
    v = (
        o.select(
            F.expr(
                "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("cents"),
            F.expr(
                "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
            ).alias("ia"),
        )
        .groupBy("cents")
        .agg(
            F.sum("ia").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - ia")).cast("bigint").alias("cb"),
        )
        .withColumn("band", F.expr("cents DIV 1000000"))
    )
    runs = ranks.two_phase_prefix_sum(v, ["cents"], "band", ["ca", "cb"])
    tot = v.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    return (
        runs.crossJoin(F.broadcast(tot))
        .select(
            F.col("n_a").alias("n_urgent"),
            F.col("n_b").alias("n_rest"),
            F.col("cents").alias("at_cents"),
            F.expr("abs(ca_run * n_b - cb_run * n_a)").alias("ks_num"),
            F.expr(
                "CAST(floor(CAST(abs(ca_run * n_b - cb_run * n_a) AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * n_b) * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("ks_micro"),
        )
        .orderBy(F.desc("ks_num"), "at_cents")
        .limit(1)
    )


_MWU_Z = (
    "CAST(floor((CAST(u2a AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)"
    " / (2.0 * sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)"
    "   * ((CAST(n_a + n_b AS DOUBLE) + 1.0)"
    "      - CAST(ts AS DOUBLE)"
    "        / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


@register(
    "mannwhitney_urgent_price",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
               END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1
               END) AS BIGINT) AS cb
      FROM orders GROUP BY 1),
    r AS (
      SELECT cents, ca, cb,
             CAST(sum(ca + cb) OVER (ORDER BY cents) AS BIGINT) AS n_run
      FROM v),
    s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b,
             CAST(sum(ca * (2 * (n_run - (ca + cb)) + (ca + cb) + 1))
               AS BIGINT) AS r2a,
             CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
               AS BIGINT) AS ts
      FROM r),
    u AS (SELECT n_a, n_b, r2a, ts,
                 r2a - n_a * (n_a + 1) AS u2a FROM s)
    SELECT n_a AS n_urgent, n_b AS n_rest, r2a AS r2_urgent,
           u2a AS u2_urgent, ts AS tie_term, {_MWU_Z} AS z_micro
    FROM u
    """,
    doc="two-sample Mann-Whitney U (Wilcoxon rank-sum) between URGENT "
    "orders' totals and the rest — the rank-sum member of the "
    "two-sample family beside ks_urgent_price_distribution (ECDF "
    "supremum) and logrank_conversion_arms (censored risk sets): "
    "location shift, robust to outliers, no normality assumed.  Ties "
    "get textbook midranks, kept EXACT by working in DOUBLED ranks: "
    "a tie group of size t after S predecessors contributes "
    "ca*(2S + t + 1) to the doubled rank sum, so R2a, U2a = R2a - "
    "nA(nA+1), and the tie term sum(t^3 - t) are all BIGINTs; the "
    "normal-approximation z (tie-corrected variance) is ONE double "
    "expression of those integers, micro-snapped (sqrt is "
    "IEEE-exact, unlike ln).  Scale: the SAME per-distinct-cents "
    "count table + band-parallel prefix sum as the KS query — one "
    "shuffle on cents groups, constant-size output; the global sort "
    "this avoids is the classic rank-statistic scale-killer.  "
    "Oracle: the one-window SQL formulation — independent algorithm, "
    "same integers.",
)
def mannwhitney_urgent_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders")
    v = (
        o.select(
            F.expr(
                "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("cents"),
            F.expr(
                "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
            ).alias("ia"),
        )
        .groupBy("cents")
        .agg(
            F.sum("ia").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - ia")).cast("bigint").alias("cb"),
        )
        .withColumn("band", F.expr("cents DIV 1000000"))
        .withColumn("ct", F.expr("ca + cb"))
    )
    runs = ranks.two_phase_prefix_sum(v, ["cents"], "band", ["ct"])
    s = runs.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.expr("ca * (2 * (ct_run - ct) + ct + 1)"))
        .cast("bigint")
        .alias("r2a"),
        F.sum(F.expr("ct * ct * ct - ct")).cast("bigint").alias("ts"),
    ).withColumn("u2a", F.expr("r2a - n_a * (n_a + 1)"))
    return s.select(
        F.col("n_a").alias("n_urgent"),
        F.col("n_b").alias("n_rest"),
        F.col("r2a").alias("r2_urgent"),
        F.col("u2a").alias("u2_urgent"),
        F.col("ts").alias("tie_term"),
        F.expr(_MWU_Z).alias("z_micro"),
    )


_KW_H = (
    "CAST(floor((3.0 * CAST(dev_milli AS DOUBLE)"
    " / (1000.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))"
    " / (1.0 - CAST(ts AS DOUBLE)"
    "     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    "        - CAST(n AS DOUBLE)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)

#: per-segment squared-deviation term of the Kruskal-Wallis H, in
#: DOUBLED ranks (global doubled mean rank is exactly n+1), milli-
#: snapped PER SEGMENT before the exact integer sum — the
#: source_unigram_kl convention that makes the float work
#: order-independent (a raw double sum over groups would depend on
#: Spark's aggregation order).
_KW_TERM = (
    "CAST(floor((CAST(r2 AS DOUBLE) / nj - (CAST(n AS DOUBLE) + 1.0))"
    " * (CAST(r2 AS DOUBLE) / nj - (CAST(n AS DOUBLE) + 1.0))"
    " * CAST(nj AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)"
)


@register(
    "kruskal_wallis_segments",
    oracle=f"""
    WITH os AS (
      SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             c.c_mktsegment AS segment
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    g AS (SELECT cents, segment, CAST(count(*) AS BIGINT) AS csg
          FROM os GROUP BY 1, 2),
    v AS (SELECT cents, CAST(sum(csg) AS BIGINT) AS ct FROM g GROUP BY 1),
    r AS (SELECT cents, ct,
                 CAST(sum(ct) OVER (ORDER BY cents) AS BIGINT) AS ct_run
          FROM v),
    seg AS (
      SELECT g.segment,
             CAST(sum(g.csg) AS BIGINT) AS nj,
             CAST(sum(g.csg * (2 * (r.ct_run - r.ct) + r.ct + 1))
               AS BIGINT) AS r2
      FROM g JOIN r USING (cents) GROUP BY g.segment),
    tot AS (SELECT CAST(sum(nj) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_segments
            FROM seg),
    ties AS (SELECT CAST(sum(ct * ct * ct - ct) AS BIGINT) AS ts FROM r),
    terms AS (
      SELECT CAST(sum({_KW_TERM}) AS BIGINT) AS dev_milli
      FROM seg CROSS JOIN tot)
    SELECT tot.n, tot.n_segments, ties.ts AS tie_term,
           terms.dev_milli, {_KW_H} AS h_micro
    FROM tot CROSS JOIN ties CROSS JOIN terms
    """,
    doc="Kruskal-Wallis H across the five market segments' order-total "
    "distributions — the k-sample extension of mannwhitney_urgent_"
    "price (same doubled-midrank machinery, same per-distinct-cents "
    "prefix sum): does ANY segment's price distribution sit shifted "
    "from the others (chi-square with k-1 df under H0).  Per-segment "
    "doubled rank sums are exact BIGINTs via the (cents, segment) "
    "cell counts joined to the global cents-rank table; the squared-"
    "deviation terms use that the global doubled mean rank is EXACTLY "
    "n+1 and are milli-snapped PER SEGMENT before the exact sum (the "
    "KL-cell convention — a raw double aggregate over groups would "
    "depend on aggregation order); H with the tie correction is one "
    "micro-snapped double expression.  Scale: one (cents, segment) "
    "shuffle + the shared band-parallel cents prefix; output is one "
    "row.  Oracle: the one-window SQL formulation.",
)
def kruskal_wallis_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    os_ = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.col("c_mktsegment").alias("segment"),
    )
    g = os_.groupBy("cents", "segment").agg(
        F.count("*").cast("bigint").alias("csg")
    )
    g = barrier(g)
    v = (
        g.groupBy("cents")
        .agg(F.sum("csg").cast("bigint").alias("ct"))
        .withColumn("band", F.expr("cents DIV 1000000"))
    )
    r = ranks.two_phase_prefix_sum(v, ["cents"], "band", ["ct"]).select(
        "cents", "ct", "ct_run"
    )
    seg = (
        g.join(r, "cents")
        .groupBy("segment")
        .agg(
            F.sum("csg").cast("bigint").alias("nj"),
            F.sum(F.expr("csg * (2 * (ct_run - ct) + ct + 1)"))
            .cast("bigint")
            .alias("r2"),
        )
    )
    tot = seg.agg(
        F.sum("nj").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_segments"),
    )
    ties = r.agg(
        F.sum(F.expr("ct * ct * ct - ct")).cast("bigint").alias("ts")
    )
    terms = (
        seg.crossJoin(F.broadcast(tot))
        .select(F.expr(_KW_TERM).alias("term_milli"))
        .agg(F.sum("term_milli").cast("bigint").alias("dev_milli"))
    )
    return (
        tot.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(terms))
        .select(
            "n",
            "n_segments",
            F.col("ts").alias("tie_term"),
            "dev_milli",
            F.expr(_KW_H).alias("h_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Attribution, time series, RFM
# ---------------------------------------------------------------------------


@register(
    "last_touch_attribution",
    oracle="""
    WITH a AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             coalesce(last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'direct') AS touch
      FROM events)
    SELECT touch, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS attributed_cents
    FROM a WHERE event_type = 'purchase'
    GROUP BY touch ORDER BY touch
    """,
    doc="last-touch revenue attribution: each purchase credits its "
    "value to the user's most recent strictly-earlier non-purchase "
    "event type ('direct' when none) — the marketing-attribution "
    "pattern, expressed as the as-of window (last_value IGNORE NULLS "
    "over preceding rows, the asof_prev_purchase machinery) so the "
    "lookup never self-joins the event log. Per-user window (never "
    "global), (ts, event_id) total-order tie-break, exact cents.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.coalesce(
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
        F.lit("direct"),
    )
    return (
        ev.select(
            "event_type",
            F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
            touch.alias("touch"),
        )
        .filter(F.col("event_type") == "purchase")
        .groupBy("touch")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
        .orderBy("touch")
    )


#: shared final expression for exact-integer Pearson correlations —
#: identical string on both engines so the one double expression
#: evaluates bit-identically (micro-snapped).
_PEARSON_MICRO = (
    "CAST(floor((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


@register(
    "autocorr_daily_purchases",
    oracle=f"""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    p AS (
      SELECT a.c AS x, b.c AS y
      FROM dc a JOIN dc b ON b.day = a.day + 1),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_days,
           m AS n_pairs, {_PEARSON_MICRO} AS autocorr_micro
    FROM s
    """,
    doc="lag-1 autocorrelation of the daily purchase-count series — "
    "the burst/trend detector for ingestion monitoring. Calendar-"
    "consecutive day pairs come from an equi-join of the daily-count "
    "table against itself on day+1 (day gaps drop the pair; no "
    "window, no global sort), all Pearson sums are exact BIGINTs, "
    "and the correlation is one shared IEEE expression over them, "
    "micro-snapped. The daily-count table is calendar-bounded, so "
    "every post-aggregation step is corpus-size-independent.",
)
def autocorr_daily_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dc = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    a = dc.select(F.col("day").alias("da"), F.col("c").alias("x"))
    b = dc.select(F.col("day").alias("db"), F.col("c").alias("y"))
    p = a.join(b, F.date_add(F.col("da"), 1) == F.col("db"))
    s = p.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
    )
    n_days = dc.agg(F.count("*").cast("bigint").alias("n_days"))
    return s.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("m").alias("n_pairs"),
        F.expr(_PEARSON_MICRO).alias("autocorr_micro"),
    )


@register(
    "rfm_customer_segments",
    oracle="""
    WITH mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM orders),
    f AS (
      SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS mon,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
               (SELECT maxd FROM mx)) AS BIGINT) AS rec
      FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
    r AS (
      SELECT freq, mon,
             row_number() OVER (ORDER BY rec DESC, ck) AS rr,
             row_number() OVER (ORDER BY freq, ck) AS rf,
             row_number() OVER (ORDER BY mon, ck) AS rm
      FROM f),
    s AS (
      SELECT mon,
             1 + ((rr - 1) * 5) // (SELECT n FROM n) AS r_score,
             1 + ((rf - 1) * 5) // (SELECT n FROM n) AS f_score,
             1 + ((rm - 1) * 5) // (SELECT n FROM n) AS m_score
      FROM r)
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(mon) AS BIGINT) AS monetary_cents
    FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="RFM segmentation: per customer, recency (days from their "
    "last order to the corpus max order date), frequency (order "
    "count), monetary (exact cents) each quintile-scored 1..5 via "
    "the exact-integer rule 1+((rank-1)*5) DIV n, score 5 = best "
    "(most recent / most frequent / highest spend — recency ranks "
    "descending so the oldest customer ranks first). All three "
    "global ranks run through the TWO-PHASE band-parallel rank "
    "(operators/ranks.two_phase_rank — no single-task global sort); "
    "bands are value-range-bounded (quarter-of-recency / 4-orders / "
    "$1M-of-spend), tie-break (value, custkey). Output is the "
    "125-cell segment histogram.",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    f = (
        o.groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("mon"),
            F.max(F.col("o_orderdate").cast("date")).alias("lastd"),
        )
        .crossJoin(F.broadcast(mx))
        .withColumn("rec", F.datediff("maxd", "lastd").cast("bigint"))
        .withColumn("neg_rec", F.expr("-rec"))
        .withColumn("rec_band", F.expr("(-rec) DIV 90"))
        .withColumn("freq_band", F.expr("freq DIV 4"))
        .withColumn("mon_band", F.expr("mon DIV 100000000"))
    )
    ranked = ranks.two_phase_rank(f, ["neg_rec", "ck"], "rec_band", rank_name="rr")
    ranked = ranks.two_phase_rank(ranked, ["freq", "ck"], "freq_band", rank_name="rf")
    ranked = ranks.two_phase_rank(ranked, ["mon", "ck"], "mon_band", rank_name="rm")
    n = f.agg(F.count("*").cast("bigint").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "mon",
            ranks.quintile_score("rr", "n").alias("r_score"),
            ranks.quintile_score("rf", "n").alias("f_score"),
            ranks.quintile_score("rm", "n").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("mon").cast("bigint").alias("monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Graph statistics: assortativity, Adamic-Adar, HITS
# ---------------------------------------------------------------------------


@register(
    "degree_assortativity_trade",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    dc AS (SELECT ck, CAST(count(*) AS BIGINT) AS dx FROM e GROUP BY 1),
    ds AS (SELECT sk, CAST(count(*) AS BIGINT) AS dy FROM e GROUP BY 1),
    p AS (
      SELECT dc.dx AS x, ds.dy AS y
      FROM e JOIN dc ON dc.ck = e.ck JOIN ds ON ds.sk = e.sk),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p)
    SELECT m AS n_edges, sx AS sum_cust_deg, sy AS sum_supp_deg,
           {_PEARSON_MICRO} AS assortativity_micro
    FROM s
    """,
    doc="cross-set degree assortativity of the customer-supplier "
    "trade graph: Pearson correlation between the customer-side and "
    "supplier-side degrees across edges (do high-degree customers "
    "trade with high-degree suppliers?) — the graph-structure drift "
    "signal. Degrees come from two shuffle-aggs over the distinct "
    "edge list, per-edge (x, y) from two key joins, Pearson sums are "
    "exact BIGINTs folded in one agg, and the coefficient is the "
    "shared micro-snapped IEEE expression. No windows, no iteration "
    "— three shuffles total, all corpus-partitioned.",
)
def degree_assortativity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    dc = e.groupBy("ck").agg(F.count("*").cast("bigint").alias("dx"))
    ds = e.groupBy("sk").agg(F.count("*").cast("bigint").alias("dy"))
    p = e.join(dc, "ck").join(ds, "sk").select(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    )
    return p.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
    ).select(
        F.col("m").alias("n_edges"),
        F.col("sx").alias("sum_cust_deg"),
        F.col("sy").alias("sum_supp_deg"),
        F.expr(_PEARSON_MICRO).alias("assortativity_micro"),
    )


@register(
    "adamic_adar_parts",
    oracle="""
    WITH ops AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    w AS (
      SELECT ok, CAST(floor(1000000.0 / ln(CAST(count(*) AS DOUBLE)) + 0.5)
               AS BIGINT) AS w_micro
      FROM ops GROUP BY ok HAVING count(*) >= 2),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, w.w_micro
      FROM ops a JOIN ops b ON a.ok = b.ok AND a.pk < b.pk
      JOIN w ON w.ok = a.ok)
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_common_orders,
           CAST(sum(w_micro) AS BIGINT) AS aa_score_micro
    FROM pairs GROUP BY 1, 2
    ORDER BY aa_score_micro DESC, part_a, part_b LIMIT 20
    """,
    doc="Adamic-Adar link prediction between parts: "
    "score(a,b) = sum over orders containing both of 1/ln(|order|), "
    "|order| = the witness order's distinct-part count — rare "
    "co-occurrence contexts weigh more (the related-items / "
    "link-prediction standard). Each ln applies once to an exact "
    "integer degree and snaps to micro-units BEFORE summation (the "
    "psi_value_drift transcendental convention), so the sum is an "
    "exact BIGINT. Scale: the witness fan-out is bounded by the "
    "order-size DOMAIN (TPC-H caps lineitems/order at 7, C(7,2)=21 "
    "pairs per order — corpus-size-independent), so the pair "
    "explode is O(|lineitem|); top-20 is TakeOrderedAndProject with "
    "a (score DESC, part_a, part_b) total order.",
)
def adamic_adar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ops = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    w = (
        ops.groupBy("ok")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= 2)
        .select(
            "ok",
            F.expr(
                "CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)"
            ).alias("w_micro"),
        )
    )
    a = ops.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = ops.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .join(w, "ok")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(
            F.count("*").cast("bigint").alias("n_common_orders"),
            F.sum("w_micro").cast("bigint").alias("aa_score_micro"),
        )
        .orderBy(F.desc("aa_score_micro"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "hits_trade_authorities",
    bench=True,
    oracle="""
    WITH raw AS (
      SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                      's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
    a1r AS (
      SELECT nodes.node, CAST(coalesce(s.v, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, CAST(count(*) AS BIGINT) * 1000000 AS v
        FROM raw e GROUP BY 1) s ON s.node = nodes.node),
    a1s AS (SELECT greatest(CAST(1 AS BIGINT),
                   (max(v) + 999999) // 1000000) AS s FROM a1r),
    a1 AS (SELECT node, v // (SELECT s FROM a1s) AS a FROM a1r),
    h1r AS (
      SELECT nodes.node, CAST(coalesce(s.v, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN (
        SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS v
        FROM raw e JOIN a1 ON a1.node = e.dst GROUP BY 1) s
      ON s.node = nodes.node),
    h1s AS (SELECT greatest(CAST(1 AS BIGINT),
                   (max(v) + 999999) // 1000000) AS s FROM h1r),
    h1 AS (SELECT node, v // (SELECT s FROM h1s) AS h FROM h1r),
    a2r AS (
      SELECT nodes.node, CAST(coalesce(s.v, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS v
        FROM raw e JOIN h1 ON h1.node = e.src GROUP BY 1) s
      ON s.node = nodes.node),
    a2s AS (SELECT greatest(CAST(1 AS BIGINT),
                   (max(v) + 999999) // 1000000) AS s FROM a2r),
    a2 AS (SELECT node, v // (SELECT s FROM a2s) AS a FROM a2r),
    h2r AS (
      SELECT nodes.node, CAST(coalesce(s.v, 0) AS BIGINT) AS v
      FROM nodes LEFT JOIN (
        SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS v
        FROM raw e JOIN a2 ON a2.node = e.dst GROUP BY 1) s
      ON s.node = nodes.node),
    h2s AS (SELECT greatest(CAST(1 AS BIGINT),
                   (max(v) + 999999) // 1000000) AS s FROM h2r),
    h2 AS (SELECT node, v // (SELECT s FROM h2s) AS h FROM h2r)
    SELECT h2.node, CAST(h2.h AS BIGINT) AS hub_units,
           CAST(a2.a AS BIGINT) AS auth_units
    FROM h2 JOIN a2 ON a2.node = h2.node
    ORDER BY auth_units DESC, hub_units DESC, h2.node LIMIT 20
    """,
    doc="fixed-point HITS, 2 iterations, over the directed "
    "customer->supplier trade graph (operators/graph.hits): hub and "
    "authority scores live in exact BIGINT units, every half-step "
    "max-normalizes with an exact ceiling divisor and integer DIV "
    "(the pagerank_trade_network reproducibility stance — "
    "bit-identical across engines and partitionings), Gauss-Seidel "
    "ordering (hub update reads the NEW authorities). Per half-step: "
    "one vertex-key join + one shuffle-agg + a 1-row max broadcast; "
    "localCheckpoint keeps lineage O(1). Oracle unrolls the "
    "identical two iterations in SQL (iteration 1's auth sum folds "
    "to in-degree * scale since hub_0 is uniform). Top-20 "
    "authorities with a total-order tie-break.",
)
def hits_trade_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    out = graph.hits(edges, iterations=2, assume_distinct=True)
    return out.orderBy(
        F.desc("auth_units"), F.desc("hub_units"), "node"
    ).limit(20)


# ---------------------------------------------------------------------------
# Model-evaluation + order statistics: exact AUC, exact quantiles
# ---------------------------------------------------------------------------


@register(
    "auc_purchase_value",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1
               END) AS BIGINT) AS nn
      FROM events GROUP BY 1),
    r AS (
      SELECT np, nn,
             CAST(sum(nn) OVER (ORDER BY cents) AS BIGINT) AS nn_run
      FROM v),
    s AS (
      SELECT CAST(sum(2 * np * (nn_run - nn) + np * nn) AS BIGINT)
               AS u2,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg
      FROM r)
    SELECT n_pos, n_neg, u2 AS u_half_units,
           CAST(floor(CAST(u2 AS DOUBLE)
                / (2.0 * CAST(n_pos AS DOUBLE) * n_neg)
                * 1000000.0 + 0.5) AS BIGINT) AS auc_micro
    FROM s
    """,
    doc="exact tie-corrected ROC-AUC of event value as a purchase "
    "classifier — the Mann-Whitney U statistic, the model-eval "
    "primitive every trained-filter pipeline needs (the "
    "quality_classifier_trained eval half). Scores pre-aggregate "
    "per DISTINCT cent value to (np, nn) counts, the below-value "
    "negative mass comes from ONE two-phase prefix sum "
    "(operators/ranks.two_phase_prefix_sum — band-parallel, no "
    "single-task sort), and U accumulates in HALF-units "
    "(2*np*below + np*nn ties) so tie correction is exact integer "
    "arithmetic, never midrank floats. AUC = U2/(2*n_pos*n_neg) "
    "evaluates once in a shared IEEE expression, micro-snapped "
    "(exact while n_pos*n_neg < 2^52; beyond that route the "
    "division through DECIMAL). Oracle: the one-window SQL "
    "formulation — independent algorithm, same statistic.",
)
def auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    ev = _t(spark, sf_dir, "events")
    v = (
        ev.select(
            F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
            F.expr(
                "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            ).alias("ip"),
        )
        .groupBy("cents")
        .agg(
            F.sum("ip").cast("bigint").alias("np"),
            F.sum(F.expr("1 - ip")).cast("bigint").alias("nn"),
        )
        .withColumn("band", F.expr("cents DIV 1000000"))
    )
    runs = ranks.two_phase_prefix_sum(v, ["cents"], "band", ["nn"])
    s = runs.agg(
        F.sum(F.expr("2 * np * (nn_run - nn) + np * nn"))
        .cast("bigint")
        .alias("u2"),
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.col("u2").alias("u_half_units"),
        F.expr(
            "CAST(floor(CAST(u2 AS DOUBLE)"
            " / (2.0 * CAST(n_pos AS DOUBLE) * n_neg)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("auc_micro"),
    )


#: exact-quantile probe points in micro-probability units, folded as
#: the same literal list into both dialects.
_QUANTILE_PROBES = [500000, 900000, 990000, 999000]


@register(
    "exact_quantiles_order_totals",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             o_orderkey AS k
      FROM orders),
    r AS (
      SELECT cents, row_number() OVER (ORDER BY cents, k) AS rk FROM v),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    p AS (SELECT unnest(ARRAY[{', '.join(str(x) for x in _QUANTILE_PROBES)}])
            AS p_micro)
    SELECT p.p_micro,
           CAST((p.p_micro * n.n + 999999) // 1000000 AS BIGINT) AS k_rank,
           r.cents AS value_cents
    FROM p CROSS JOIN n
    JOIN r ON r.rk = (p.p_micro * n.n + 999999) // 1000000
    ORDER BY p.p_micro
    """,
    doc="EXACT p50/p90/p99/p99.9 of order totals without a global "
    "sort: the k-th order statistic selected by the TWO-PHASE global "
    "rank (operators/ranks.two_phase_rank — $10k-band-parallel "
    "row_numbers plus band-carry offsets), k = ceil(p*n) in exact "
    "integer arithmetic from a 1-row count broadcast. This is the "
    "deterministic alternative to percentile_approx at 100 TB: "
    "approx sketches give no exactness guarantee and vary with "
    "merge order, while the banded rank is exact, deterministic, "
    "and still fully parallel (the KS/Gini/Spearman machinery "
    "pointed at selection instead of summation). Ties on cents "
    "break by order key — a total order, so every engine selects "
    "the identical row.",
)
def exact_quantiles_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders")
    v = o.select(
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderkey").alias("k"),
    ).withColumn("band", F.expr("cents DIV 1000000"))
    ranked = ranks.two_phase_rank(v, ["cents", "k"], "band", rank_name="rk")
    n = v.agg(F.count("*").cast("bigint").alias("n"))
    probes = F.array(
        *[F.lit(x).cast("bigint") for x in _QUANTILE_PROBES]
    )
    # 4-row (p, k_rank) probe table from the 1-row count — the fact
    # table meets it in a broadcast join on the rank, never exploding
    probe_ranks = n.select(
        F.explode(probes).alias("p_micro"), "n"
    ).select(
        "p_micro",
        F.expr("(p_micro * n + 999999) DIV 1000000").alias("k_rank"),
    )
    return (
        ranked.join(
            F.broadcast(probe_ranks), ranked.rk == probe_ranks.k_rank
        )
        .select("p_micro", "k_rank", F.col("cents").alias("value_cents"))
        .orderBy("p_micro")
    )


@register(
    "decile_lift_purchase",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             event_id,
             CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS BIGINT) AS ip
      FROM events),
    r AS (
      SELECT ip, cents,
             row_number() OVER (ORDER BY cents, event_id) AS rk
      FROM v),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    d AS (
      SELECT CAST(1 + ((rk - 1) * 10) // n.n AS BIGINT) AS decile, ip,
             cents
      FROM r CROSS JOIN n),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(ip) AS BIGINT) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(n_events) AS BIGINT) AS nt,
                 CAST(sum(n_purchases) AS BIGINT) AS pt FROM g)
    SELECT decile, n_events, n_purchases, sum_cents,
           (n_purchases * 1000000) // n_events AS rate_micro,
           CAST(sum(n_purchases) OVER (ORDER BY decile DESC)
             AS BIGINT) AS cum_purchases,
           CAST(floor(CAST(n_purchases AS DOUBLE) * nt
                / (CAST(n_events AS DOUBLE) * pt)
                * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
    FROM g CROSS JOIN t ORDER BY decile
    """,
    doc="decile lift / calibration table for event value as a "
    "purchase predictor — the gains-chart companion to "
    "auc_purchase_value (every trained-filter rollout reads one of "
    "these before setting a threshold). Events rank by (value "
    "cents, event_id) through the TWO-PHASE band-parallel rank "
    "(operators/ranks.two_phase_rank — no single-task sort), "
    "deciles come from the exact-integer rule 1+((rank-1)*10) DIV "
    "n, and per-decile purchase rate (exact integer micros), "
    "top-down cumulative purchases (a 10-row decile window — "
    "decile-bounded, never corpus-bounded), and lift vs the base "
    "rate (one shared IEEE expression over exact counts, "
    "micro-snapped; exact while counts < 2^52) are all "
    "hash-gateable. Decile 10 = highest values.",
)
def decile_lift_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
        "event_id",
        F.expr(
            "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("ip"),
    ).withColumn("band", F.expr("cents DIV 1000000"))
    ranked = ranks.two_phase_rank(
        v, ["cents", "event_id"], "band", rank_name="rk"
    )
    n = v.agg(F.count("*").cast("bigint").alias("n"))
    g = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("CAST(1 + ((rk - 1) * 10) DIV n AS BIGINT)").alias(
                "decile"
            ),
            "ip",
            "cents",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("ip").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
    )
    t = g.agg(
        F.sum("n_events").cast("bigint").alias("nt"),
        F.sum("n_purchases").cast("bigint").alias("pt"),
    )
    w = (
        Window.orderBy(F.desc("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_events",
            "n_purchases",
            "sum_cents",
            F.expr("(n_purchases * 1000000) DIV n_events").alias(
                "rate_micro"
            ),
            F.sum("n_purchases").over(w).cast("bigint").alias(
                "cum_purchases"
            ),
            F.expr(
                "CAST(floor(CAST(n_purchases AS DOUBLE) * nt"
                " / (CAST(n_events AS DOUBLE) * pt)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy("decile")
    )


@register(
    "segment_price_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT c.c_mktsegment AS segment,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             o.o_orderkey AS k
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    r AS (
      SELECT segment, cents,
             row_number() OVER (PARTITION BY segment
                                ORDER BY cents, k) AS rk
      FROM v),
    n AS (SELECT segment, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
    p AS (SELECT unnest(ARRAY[{', '.join(str(x) for x in _QUANTILE_PROBES)}])
            AS p_micro)
    SELECT r.segment, p.p_micro,
           CAST((p.p_micro * n.n + 999999) // 1000000 AS BIGINT) AS k_rank,
           r.cents AS value_cents
    FROM p CROSS JOIN n
    JOIN r ON r.segment = n.segment
          AND r.rk = (p.p_micro * n.n + 999999) // 1000000
    ORDER BY r.segment, p.p_micro
    """,
    doc="exact per-group quantiles: p50/p90/p99/p99.9 of order "
    "totals WITHIN each market segment — the grouped form of "
    "exact_quantiles_order_totals, proving the two-phase rank's "
    "part_cols path (band-parallel row_numbers inside each "
    "(segment, band) cell, segment-scoped band carries). k = "
    "ceil(p*n_g) per group from a groups-bounded count table "
    "(broadcast), selection by a broadcast join on (segment, "
    "rank). The per-group alternative to percentile_approx with an "
    "exactness guarantee; ties break by order key.",
)
def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.expr(
                "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("cents"),
            F.col("o_orderkey").alias("k"),
        )
        .withColumn("band", F.expr("cents DIV 1000000"))
    )
    ranked = ranks.two_phase_rank(
        v, ["cents", "k"], "band", part_cols=["segment"], rank_name="rk"
    )
    n = v.groupBy("segment").agg(F.count("*").cast("bigint").alias("n"))
    probes = F.array(*[F.lit(x).cast("bigint") for x in _QUANTILE_PROBES])
    probe_ranks = n.select(
        "segment", F.explode(probes).alias("p_micro"), "n"
    ).select(
        "segment",
        "p_micro",
        F.expr("(p_micro * n + 999999) DIV 1000000").alias("k_rank"),
    )
    return (
        ranked.join(
            F.broadcast(probe_ranks),
            (ranked.segment == probe_ranks.segment)
            & (ranked.rk == probe_ranks.k_rank),
        )
        .select(
            ranked.segment, "p_micro", "k_rank",
            F.col("cents").alias("value_cents"),
        )
        .orderBy("segment", "p_micro")
    )


@register(
    "daily_purchases_gapfilled",
    oracle="""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM dc),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS day
      FROM bounds)
    SELECT spine.day, coalesce(dc.n, 0) AS n_purchases,
           coalesce(dc.cents, 0) AS revenue_cents,
           (dc.day IS NULL) AS is_gap
    FROM spine LEFT JOIN dc ON dc.day = spine.day
    ORDER BY spine.day
    """,
    doc="calendar-spine gap filling: the daily purchase series joined "
    "LEFT onto a generated min..max date spine so zero-activity days "
    "appear explicitly (every downstream window/anomaly/seasonality "
    "computation silently mis-lags across gaps otherwise — the "
    "autocorr_daily_purchases docstring's dropped-pair caveat, "
    "solved). The spine comes from sequence() over a 1-row bounds "
    "broadcast — calendar-bounded, never corpus-bounded; the join is "
    "day-keyed against the already-aggregated daily table.",
)
def daily_purchases_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dc = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    bounds = dc.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    return (
        spine.join(dc, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_purchases"),
            F.coalesce("cents", F.lit(0))
            .cast("bigint")
            .alias("revenue_cents"),
            F.col("n").isNull().alias("is_gap"),
        )
        .orderBy("day")
    )


@register(
    "cusum_change_point",
    oracle="""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(c) AS BIGINT) AS total FROM dc),
    s AS (
      SELECT day,
             CAST(sum(c * (SELECT m FROM t) - (SELECT total FROM t))
               OVER (ORDER BY day) AS BIGINT) AS s_k
      FROM dc)
    SELECT (SELECT m FROM t) AS n_days, day AS change_day,
           abs(s_k) AS cusum_peak_scaled,
           CAST(floor(CAST(abs(s_k) AS DOUBLE)
                / (SELECT CAST(m AS DOUBLE) FROM t)
                * 1000000.0 + 0.5) AS BIGINT) AS cusum_peak_micro
    FROM s ORDER BY abs(s_k) DESC, day LIMIT 1
    """,
    doc="CUSUM change-point detection on the daily purchase series — "
    "the monitoring primitive that localizes WHEN a level shift "
    "happened (complementing daily_count_anomalies' pointwise "
    "z-scores and psi_value_drift's distribution drift): the "
    "cumulative sum of mean-centered counts peaks at the "
    "change point. Centering is kept exact by scaling with the day "
    "count (c*m - total — integer, no float mean), the running sum "
    "rides the calendar-bounded daily table (a days-scale window, "
    "never corpus-scale), and the peak is TakeOrderedAndProject "
    "with a (|S_k| DESC, day) total order. The micro-normalized "
    "peak divides the one exact integer by m in a shared IEEE "
    "expression.",
)
def cusum_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dc = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    t = dc.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("c").cast("bigint").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = (
        dc.crossJoin(F.broadcast(t))
        .withColumn(
            "s_k", F.sum(F.expr("c * m - total")).over(w).cast("bigint")
        )
    )
    return (
        s.select(
            F.col("m").alias("n_days"),
            F.col("day").alias("change_day"),
            F.expr("abs(s_k)").alias("cusum_peak_scaled"),
            F.expr(
                "CAST(floor(CAST(abs(s_k) AS DOUBLE) / CAST(m AS DOUBLE)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("cusum_peak_micro"),
        )
        .orderBy(F.desc("cusum_peak_scaled"), "change_day")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Trend significance, survival analysis, bootstrap
# ---------------------------------------------------------------------------


@register(
    "mann_kendall_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie3,
             CAST(coalesce(sum((t * (t - 1)) // 2), 0) AS BIGINT) AS tie2
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y)
    )
    SELECT n.n_days, s.s_stat,
           n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie3
             AS var_num18,
           CAST(floor(
             (CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                   WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                   ELSE 0.0 END)
             / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - ties.tie3 AS DOUBLE) / 18.0)
             * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
           CAST(floor(
             CAST(s.s_stat AS DOUBLE)
             / sqrt(CAST((n.n_days * (n.n_days - 1) // 2) AS DOUBLE)
                    * CAST((n.n_days * (n.n_days - 1) // 2) - ties.tie2
                           AS DOUBLE))
             * 1000000.0 + 0.5) AS BIGINT) AS tau_b_micro
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
    doc="Mann-Kendall trend significance of the daily event series — "
    "the non-parametric IS-there-a-trend test beside Theil-Sen's "
    "HOW-steep estimate (the two are the classic pair). "
    "S = sum of sign(y_j - y_i) over day pairs i<j is an exact "
    "BIGINT from the same CALENDAR-bounded pairwise join Theil-Sen "
    "uses (days^2, never facts^2); the tie-corrected variance "
    "n(n-1)(2n+5) - sum t(t-1)(2t+5) stays exact-integer as "
    "var_num18 (the /18 is folded into the reported expression), "
    "and the only transcendental is ONE sqrt applied to a ratio of "
    "exact integers, micro-snapped (the psi ln convention). "
    "tau_b = S / sqrt(D(D - T_y)) reuses the exact tie table "
    "(day ranks are tie-free, so T_x = 0). Continuity-corrected "
    "z = (S -/+ 1)/sqrt(var): |z| > 1.96 rejects no-trend at 5%.",
)
def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("bigint")
        .alias("x")
    ).agg(F.count("*").cast("bigint").alias("y"))
    a = daily.select(F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = daily.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    s = (
        a.join(b, F.col("bx") > F.col("ax"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN by > ay THEN 1 WHEN by < ay THEN -1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = daily.agg(F.count("*").cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").cast("bigint").alias("t"))
        .agg(
            F.coalesce(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0))
            .cast("bigint")
            .alias("tie3"),
            F.coalesce(F.sum(F.expr("(t * (t - 1)) DIV 2")), F.lit(0))
            .cast("bigint")
            .alias("tie2"),
        )
    )
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            F.expr(
                "n_days * (n_days - 1) * (2 * n_days + 5) - tie3"
            ).alias("var_num18"),
            F.expr(
                "CAST(floor("
                "(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)"
                " WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)"
                " ELSE 0.0 END)"
                " / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5)"
                " - tie3 AS DOUBLE) / 18.0)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("z_micro"),
            F.expr(
                "CAST(floor("
                "CAST(s_stat AS DOUBLE)"
                " / sqrt(CAST((n_days * (n_days - 1) DIV 2) AS DOUBLE)"
                " * CAST((n_days * (n_days - 1) DIV 2) - tie2 AS DOUBLE))"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("tau_b_micro"),
        )
    )


@register(
    "kaplan_meier_conversion",
    bench=True,
    oracle="""
    WITH signup AS (
      SELECT user_id, min(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    fp AS (
      SELECT s.user_id, s.s_ts, min(e.ts) AS p_ts
      FROM signup s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts >= s.s_ts
      GROUP BY 1, 2
    ),
    study AS (SELECT max(CAST(ts AS DATE)) AS end_d FROM events),
    subj AS (
      SELECT CAST(coalesce(CAST(f.p_ts AS DATE), st.end_d)
                  - CAST(f.s_ts AS DATE) AS BIGINT) AS t_day,
             CASE WHEN f.p_ts IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM fp f CROSS JOIN study st
    ),
    daily AS (
      SELECT t_day, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(1 - e) AS BIGINT) AS c
      FROM subj GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM daily),
    risk AS (
      SELECT t_day, d, c,
             tot.n - CAST(coalesce(sum(d + c) OVER (ORDER BY t_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM daily CROSS JOIN tot
    ),
    steps AS (
      SELECT t_day, n_risk, d, c,
             CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                           / CAST(n_risk AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS term_micro
      FROM risk WHERE d > 0 AND d < n_risk
    )
    SELECT t_day, n_risk, d AS n_events, c AS n_censored,
           CAST(sum(term_micro) OVER (ORDER BY t_day) AS BIGINT)
             AS surv_ln_micro
    FROM steps ORDER BY t_day
    """,
    doc="Kaplan-Meier product-limit estimator of signup-to-purchase "
    "conversion time with right censoring — subjects who never "
    "purchase are censored at the study end (global max event date), "
    "not dropped, which is exactly the bias naive time-to-convert "
    "averages (funnel_time_to_convert) suffer. Per-duration-day "
    "event/censor counts are exact integers from one grouped pass; "
    "the at-risk count n_i = N - (removed before t) and the curve "
    "accumulates ln((n_i - d_i)/n_i) per event day — each ln applied "
    "once to a ratio of exact integers and micro-snapped BEFORE the "
    "cumulative sum (the psi convention), so surv_ln_micro is an "
    "exact BIGINT and S(t) = exp(surv_ln_micro/1e6) reader-side. "
    "Windows run over the DURATION-day table — calendar-bounded like "
    "the sweep carries, never corpus-bounded. Days where the full "
    "risk set converts (S hits exact 0, ln undefined) terminate the "
    "reported curve by construction; censoring at study end makes "
    "that a theoretical edge only.",
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts")
    )
    fp = (
        signup.join(
            purch,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("pts") >= F.col("s_ts")),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("pts").alias("p_ts"))
    )
    study = ev.agg(F.max(F.to_date("ts")).alias("end_d"))
    subj = fp.crossJoin(F.broadcast(study)).select(
        F.datediff(
            F.coalesce(F.to_date("p_ts"), F.col("end_d")), F.to_date("s_ts")
        )
        .cast("bigint")
        .alias("t_day"),
        F.expr("CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END").alias("e"),
    )
    daily = subj.groupBy("t_day").agg(
        F.sum("e").cast("bigint").alias("d"),
        F.sum(F.expr("1 - e")).cast("bigint").alias("c"),
    )
    tot = daily.agg(F.sum(F.expr("d + c")).cast("bigint").alias("n"))
    w_prev = (
        Window.orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = daily.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        (
            F.col("n")
            - F.coalesce(F.sum(F.expr("d + c")).over(w_prev), F.lit(0))
        ).cast("bigint"),
    )
    steps = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).withColumn(
        "term_micro",
        F.expr(
            "CAST(floor(ln(CAST(n_risk - d AS DOUBLE)"
            " / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
        ),
    )
    w_run = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "t_day",
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.sum("term_micro").over(w_run).cast("bigint").alias("surv_ln_micro"),
    ).orderBy("t_day")


#: Poisson(1) cumulative distribution, micro-snapped in Python once
#: and folded into both dialects as the same literal table (the
#: Benford/decayed_user_value convention — exp walks no libm path at
#: query time).  weight = #{k : u_micro >= cdf_micro[k]} gives the
#: standard Poisson bootstrap resample multiplicity, capped at 9 by
#: the table length (P(w > 8) ~ 1e-7).
_POISSON1_CDF_MICRO = [
    367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999
]
_P_MOD = 1_000_000_007


def _bootstrap_weight_sql(dialect: str) -> str:
    """w(ok, b): two multiplicative-congruential rounds over exact
    int64s (no intermediate exceeds (1e9+7)*48271 < 2^63), then the
    folded Poisson table as a COMPARISON LADDER — sum of (u >= t_i)
    casts over the 9 CDF literals, identical values in both engines.

    The ladder replaced the original size(filter(array(...), lambda))
    fold after a measured 14x regression hunt: Spark's higher-order
    array functions run OUTSIDE whole-stage codegen, so the lambda
    form re-evaluated the LCG per array element per row and broke the
    codegen span — 12-16 s warm at sf0.1 vs 0.9 s for the ladder,
    bit-identical output (PERFORMANCE.md round 8)."""
    ladder = " + ".join(
        f"CAST(_u >= {t} AS BIGINT)" for t in _POISSON1_CDF_MICRO
    )
    return f"CAST({ladder} AS BIGINT)"


def _bootstrap_u_sql() -> str:
    """The per-(ok, b) uniform in [0, 1e6): hoisted into its own
    column/CTE so the CDF ladder reads it 9 times without
    re-evaluating the LCG (measured 2.6 s -> 0.9 s at sf0.1)."""
    return (
        f"((((ok % {_P_MOD}) * 48271 + (b + 1) * 16807) % {_P_MOD})"
        f" * 48271 + 11) % {_P_MOD} % 1000000"
    )


@register(
    "bootstrap_mean_ci",
    bench=True,
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey AS ok,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    xu AS (
      SELECT b, cents, {_bootstrap_u_sql()} AS _u
      FROM o CROSS JOIN range(0, 64) t(b)
    ),
    x AS (
      SELECT b, cents, {_bootstrap_weight_sql('duckdb')} AS w FROM xu
    ),
    m AS (
      SELECT b,
             (CAST(sum(w * cents) AS BIGINT) * 1000)
               // CAST(sum(w) AS BIGINT) AS mean_milli
      FROM x GROUP BY b
    ),
    r AS (
      SELECT mean_milli,
             row_number() OVER (ORDER BY mean_milli, b) AS rnk
      FROM m
    ),
    pt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             (CAST(sum(cents) AS BIGINT) * 1000)
               // CAST(count(*) AS BIGINT) AS mean_milli
      FROM o
    )
    SELECT CAST(64 AS BIGINT) AS n_resamples, pt.n_orders,
           pt.mean_milli AS mean_milli,
           CAST(max(CASE WHEN r.rnk = 2 THEN r.mean_milli END) AS BIGINT)
             AS ci_lo_milli,
           CAST(max(CASE WHEN r.rnk = 63 THEN r.mean_milli END) AS BIGINT)
             AS ci_hi_milli
    FROM r CROSS JOIN pt
    GROUP BY pt.n_orders, pt.mean_milli
    """,
    doc="deterministic Poisson-bootstrap confidence interval for mean "
    "order value: 64 resamples where each order's multiplicity in "
    "resample b is Poisson(1)-distributed but PURELY a function of "
    "(o_orderkey, b) — two integer LCG rounds mod 1e9+7 feed a "
    "folded Poisson CDF literal table, so re-runs, retries, and any "
    "partitioning draw the SAME resamples (the deterministic_sample "
    "property, extended to weighted replication). The Poisson trick "
    "is WHY bootstrap scales: no resample materializes — each row "
    "contributes (w, w*cents) partials that map-side combine into "
    "64 groups, one 64-row shuffle regardless of corpus size. CI "
    "bounds are EXACT order statistics (2nd / 63rd of 64 resample "
    "means, a ~93.7% interval) — no quantile interpolation to "
    "diverge between engines; means are exact integer milli-cents "
    "(floor division, both operands positive). BIGINT headroom: "
    "sum(w*cents)*1000 fits int64 to ~4e15 total order cents; "
    "beyond, accumulate DECIMAL(38,0) on both engines.",
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    bs = F.array([F.lit(i) for i in range(64)])
    x = (
        o.select("ok", "cents", F.explode(bs).alias("b"))
        .withColumn("_u", F.expr(_bootstrap_u_sql()))
        .withColumn("w", F.expr(_bootstrap_weight_sql("spark")))
    )
    m = x.groupBy("b").agg(
        F.expr(
            "(CAST(sum(w * cents) AS BIGINT) * 1000)"
            " DIV CAST(sum(w) AS BIGINT)"
        ).alias("mean_milli")
    )
    r = m.select(
        F.col("mean_milli").alias("rmean"),
        F.row_number()
        .over(Window.orderBy("mean_milli", "b"))
        .alias("rnk"),
    )
    pt = o.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.expr(
            "(CAST(sum(cents) AS BIGINT) * 1000) DIV CAST(count(*) AS BIGINT)"
        ).alias("mean_milli"),
    )
    return (
        r.crossJoin(F.broadcast(pt))
        .groupBy("n_orders", "mean_milli")
        .agg(
            F.max(F.expr("CASE WHEN rnk = 2 THEN rmean END"))
            .cast("bigint")
            .alias("ci_lo_milli"),
            F.max(F.expr("CASE WHEN rnk = 63 THEN rmean END"))
            .cast("bigint")
            .alias("ci_hi_milli"),
        )
        .select(
            F.lit(64).cast("bigint").alias("n_resamples"),
            "n_orders",
            "mean_milli",
            "ci_lo_milli",
            "ci_hi_milli",
        )
    )


def _pav_pools(
    bins: list[tuple[int, int, int]]
) -> list[tuple[int, int, int]]:
    """Pool-Adjacent-Violators over (bin, n, pos) rows sorted by bin:
    returns (bin, pool_n, pool_pos) with pooled positive rates
    non-decreasing in bin.  Rates compare as RATIONALS (pos_a * n_b
    vs pos_b * n_a) — exact integer arithmetic, no floats anywhere —
    so the fit is a deterministic pure function of the aggregate
    table and both engines' twins agree bit-for-bit."""
    stack: list[list[int | list[int]]] = []  # [n, pos, [bins...]]
    for b, n, pos in sorted(bins):
        stack.append([n, pos, [b]])
        # merge while the top pool's rate is BELOW its predecessor's
        while (
            len(stack) >= 2
            and stack[-1][1] * stack[-2][0] < stack[-2][1] * stack[-1][0]
        ):
            n2, p2, b2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            stack[-1][2].extend(b2)
    out: list[tuple[int, int, int]] = []
    for n, pos, bs in stack:
        for b in bs:
            out.append((b, n, pos))
    return sorted(out)


#: isotonic bin spec shared by both engines: $1000 account-balance
#: bands, clamped to [0, 9]; negative balances clamp BEFORE the
#: division (Spark DIV truncates toward zero, DuckDB // floors — they
#: disagree on negatives, so the operand is made non-negative first).
_ISO_BIN = "least(greatest(bal, 0) DIV 100000, 9)"
_ISO_BIN_DUCK = "least(greatest(bal, 0) // 100000, 9)"


def _iso_bins_duckdb(sf_dir: str) -> list[tuple[int, int, int]]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH lab AS (
          SELECT o_custkey AS ck,
                 max(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN 1 ELSE 0 END) AS pos
          FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1),
        base AS (
          SELECT CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
                 coalesce(l.pos, 0) AS pos
          FROM read_parquet('{sf_dir}/customer.parquet') c
          LEFT JOIN lab l ON l.ck = c.c_custkey)
        SELECT CAST({_ISO_BIN_DUCK} AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS pos
        FROM base GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    con.close()
    return [(int(b), int(n), int(p)) for b, n, p in rows]


def _isotonic_oracle(sf_dir: str) -> str:
    """Python twin: DuckDB aggregates the same bins, the shared
    exact-rational PAV pools them, and the full result is emitted as
    VALUES (the mmr/kcore convention for sequential algorithms)."""
    bins = _iso_bins_duckdb(sf_dir)
    pooled = {b: (n, p) for b, n, p in _pav_pools(bins)}
    rows = []
    for b, n, p in bins:
        pn, pp = pooled[b]
        rows.append(
            (b, n, p, p * 1_000_000 // n, pp * 1_000_000 // pn)
        )
    vals = ", ".join(f"({b}, {n}, {p}, {r}, {c})" for b, n, p, r, c in rows)
    return (
        "SELECT CAST(bin AS BIGINT) AS bin,"
        " CAST(n_customers AS BIGINT) AS n_customers,"
        " CAST(n_pos AS BIGINT) AS n_pos,"
        " CAST(rate_micro AS BIGINT) AS rate_micro,"
        " CAST(cal_micro AS BIGINT) AS cal_micro"
        f" FROM (VALUES {vals})"
        " AS t(bin, n_customers, n_pos, rate_micro, cal_micro)"
        " ORDER BY bin"
    )


@register(
    "isotonic_calibration",
    oracle=_isotonic_oracle,
    doc="Isotonic regression via Pool-Adjacent-Violators — the "
    "calibration step every learned quality/relevance scorer needs "
    "before its scores gate data (Zadrozny & Elkan 2002): account-"
    "balance bands as the score, has-an-URGENT-order as the label; "
    "PAV pools adjacent rate violators until the calibrated rate is "
    "non-decreasing in the score. The distributed work is the two "
    "aggregations (per-customer label, per-bin counts — one fact "
    "shuffle, output rows = #bins, bounded); PAV itself runs driver-"
    "side on that KB-scale table in EXACT RATIONAL arithmetic "
    "(pos_a*n_b comparisons, no floats) — the classifier ridge-solve "
    "convention for bounded sequential steps — and rejoins as a "
    "broadcast literal. rate_micro/cal_micro are exact integer "
    "micro-unit divisions; cal_micro is non-decreasing by "
    "construction (pinned in pytest). Oracle: DuckDB re-aggregates, "
    "the shared exact-rational PAV twin pools, emitted as VALUES.",
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    lab = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("pos")
    )
    base = (
        c.select(
            F.col("c_custkey").alias("ck"),
            F.expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)").alias(
                "bal"
            ),
        )
        .join(lab, "ck", "left")
        .select(
            F.expr(f"CAST({_ISO_BIN} AS BIGINT)").alias("bin"),
            F.coalesce(F.col("pos"), F.lit(0)).alias("pos"),
        )
    )
    bins_df = base.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    # bounded collect (rows = #bins <= 10): the PAV pooling is the
    # one sequential step, solved driver-side like the classifier's
    # ridge solve, then rejoined as a broadcast literal table
    rows = bins_df.collect()
    pooled = _pav_pools(
        [(int(r["bin"]), int(r["n_customers"]), int(r["n_pos"])) for r in rows]
    )
    cal = spark.createDataFrame(
        [(b, pp * 1_000_000 // pn) for b, pn, pp in pooled],
        "bin bigint, cal_micro bigint",
    )
    return (
        bins_df.join(F.broadcast(cal), "bin")
        .select(
            "bin",
            "n_customers",
            "n_pos",
            F.expr("(n_pos * 1000000) DIV n_customers").alias("rate_micro"),
            F.col("cal_micro").cast("bigint").alias("cal_micro"),
        )
        .orderBy("bin")
    )


#: Shapley attribution over the four non-conversion channels, exact:
#: coalition subsets and their factorial weights |S|! * (n-1-|S|)!
#: (denominator n! = 24) are folded in Python as literal tables — the
#: decayed_user_value convention — so both engines run the identical
#: 32-row join, and phi arrives as an exact BIGINT in 24ths.
_SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAP_TERMS = [
    (name, s, s | bit, math.factorial(bin(s).count("1"))
     * math.factorial(3 - bin(s).count("1")))
    for name, bit in _SHAP_CHANNELS
    for s in range(16)
    if not s & bit
]
_SHAP_MASK = (
    "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
    " + 2 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
    " + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"
    " + 8 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
)


@register(
    "shapley_channel_attribution",
    oracle=f"""
    WITH u AS (
      SELECT user_id, {_SHAP_MASK} AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id),
    m AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv
          FROM u GROUP BY mask),
    s(s) AS (VALUES {", ".join(f"({i})" for i in range(16))}),
    v AS (SELECT s.s,
                 CAST(coalesce(sum(m.conv), 0) AS BIGINT) AS v
          FROM s LEFT JOIN m ON (m.mask & s.s) = m.mask GROUP BY s.s),
    t(channel, s_wo, s_wi, w) AS (VALUES
      {", ".join(f"('{c}', {a}, {b}, {w})" for c, a, b, w in _SHAP_TERMS)})
    SELECT t.channel,
           CAST(sum(t.w * (vi.v - vs.v)) AS BIGINT) AS phi_24,
           CAST((sum(t.w * (vi.v - vs.v)) * 1000000) // 24 AS BIGINT)
             AS phi_micro
    FROM t
    JOIN v vs ON vs.s = t.s_wo
    JOIN v vi ON vi.s = t.s_wi
    GROUP BY t.channel ORDER BY t.channel
    """,
    doc="Exact Shapley-value channel attribution (the cooperative-"
    "game split of conversion credit; Shapley 1953, applied to "
    "marketing funnels): channels are the four non-purchase event "
    "types, a user's coalition is the SET of channels they touched, "
    "and v(S) = conversions among users whose touched set is "
    "contained in S — monotone by construction. phi_channel = sum "
    "over subsets S without the channel of |S|!(n-1-|S|)! * "
    "[v(S+ch) - v(S)], kept as an exact BIGINT numerator over n!=24 "
    "(phi_24) — the efficiency axiom sum(phi) = v(full) - v(empty) "
    "holds EXACTLY and is pinned in pytest. Scale: one fact-table "
    "user aggregate, then a 16-row mask rollup; the subset lattice "
    "and factorial weights are FOLDED literal tables (32 rows) "
    "joined to the 16-row v table — beyond the user aggregate "
    "nothing scales with the corpus. Beside last_touch_attribution "
    "(positional rule) and markov_event_transitions (path model) "
    "this completes the attribution ladder with the axiomatic one.",
)
def shapley_channel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(
        F.expr(_SHAP_MASK).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    m = u.groupBy("mask").agg(F.sum("conv").cast("bigint").alias("conv"))
    s = spark.createDataFrame([(i,) for i in range(16)], "s bigint")
    v = (
        s.join(
            F.broadcast(m),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("bigint").alias("v"))
    )
    t = spark.createDataFrame(
        _SHAP_TERMS, "channel string, s_wo bigint, s_wi bigint, w bigint"
    )
    vs = v.select(F.col("s").alias("s_wo"), F.col("v").alias("_v_wo"))
    vi = v.select(F.col("s").alias("s_wi"), F.col("v").alias("_v_wi"))
    return (
        t.join(F.broadcast(vs), "s_wo")
        .join(F.broadcast(vi), "s_wi")
        .groupBy("channel")
        .agg(
            F.sum(F.expr("w * (_v_wi - _v_wo)"))
            .cast("bigint")
            .alias("phi_24"),
            F.expr(
                "CAST((sum(w * (_v_wi - _v_wo)) * 1000000) DIV 24 AS BIGINT)"
            ).alias("phi_micro"),
        )
        .orderBy("channel")
    )


#: Markov attribution: the four channel states in fixed order; CONV /
#: NULL are absorbing, START is the synthetic source state.
_MKV_CHANNELS = ["click", "error", "signup", "view"]


def _markov_conv_prob(
    trans: dict[tuple[str, str], int], removed: str | None
) -> float:
    """P(absorb in CONV | start at START) for the first-order chain
    defined by integer transition counts, with ``removed`` (if any)
    taken out the standard removal-effect way: its INCOMING flow
    redirects to NULL, its outgoing rows drop.  Pure deterministic
    Python (fixed state order, no pivoting — the diagonal is
    1 - P(s->s) > 0 for any state with an exit path), shared by the
    Spark query and the oracle twin so the engines only have to
    agree on the integer counts."""
    states = ["START"] + [c for c in _MKV_CHANNELS if c != removed]
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    a = [[0.0] * n for _ in range(n)]
    b = [0.0] * n
    for i, s in enumerate(states):
        out: dict[str, int] = {}
        for (src, dst), c in trans.items():
            if src != s:
                continue
            if dst == removed:
                dst = "NULL"
            out[dst] = out.get(dst, 0) + c
        tot = sum(out.values())
        a[i][i] = 1.0
        if tot == 0:
            continue  # no exit path -> p = 0
        for dst, c in out.items():
            p = c / tot
            if dst == "CONV":
                b[i] += p
            elif dst in idx:
                a[i][idx[dst]] -= p
    # Gaussian elimination, fixed order
    for col in range(n):
        piv = a[col][col]
        for row in range(col + 1, n):
            f = a[row][col] / piv
            if f == 0.0:
                continue
            for k in range(col, n):
                a[row][k] -= f * a[col][k]
            b[row] -= f * b[col]
    x = [0.0] * n
    for row in range(n - 1, -1, -1):
        s = b[row]
        for k in range(row + 1, n):
            s -= a[row][k] * x[k]
        x[row] = s / a[row][row]
    return x[idx["START"]]


_MKV_TRANS_DUCK = """
    WITH p AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase'
                 THEN ts END) AS p_ts,
             min(CASE WHEN event_type = 'purchase'
                 THEN event_id END) AS p_eid0
      FROM events GROUP BY 1),
    pp AS (
      SELECT e.user_id, p.p_ts,
             min(e.event_id) AS p_eid
      FROM events e JOIN p ON p.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts = p.p_ts
      GROUP BY 1, 2),
    ch AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type,
             pp.p_ts IS NOT NULL AS conv
      FROM events e LEFT JOIN pp ON pp.user_id = e.user_id
      WHERE e.event_type != 'purchase'
        AND (pp.p_ts IS NULL OR e.ts < pp.p_ts
             OR (e.ts = pp.p_ts AND e.event_id < pp.p_eid))),
    seq AS (
      SELECT user_id, event_type, conv,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    allu AS (
      SELECT u.user_id, pp.p_ts IS NOT NULL AS conv,
             coalesce(s.n, 0) AS n
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN pp ON pp.user_id = u.user_id
      LEFT JOIN (SELECT user_id, max(n) AS n FROM seq GROUP BY 1) s
        ON s.user_id = u.user_id),
    t AS (
      SELECT CASE WHEN rn = 1 THEN 'START' ELSE prev END AS src,
             event_type AS dst
      FROM seq
      UNION ALL
      SELECT event_type, CASE WHEN conv THEN 'CONV' ELSE 'NULL' END
      FROM seq WHERE rn = n
      UNION ALL
      SELECT 'START', CASE WHEN conv THEN 'CONV' ELSE 'NULL' END
      FROM allu WHERE n = 0)
    SELECT src, dst, CAST(count(*) AS BIGINT) AS c
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def _markov_removal_oracle(sf_dir: str) -> str:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(_MKV_TRANS_DUCK).fetchall()
    con.close()
    trans = {(s, d): int(c) for s, d, c in rows}
    base = _markov_conv_prob(trans, None)

    def micro(x: float) -> int:
        import math

        return int(math.floor(x * 1_000_000.0 + 0.5))

    effs = {
        c: base - _markov_conv_prob(trans, c) for c in _MKV_CHANNELS
    }
    tot = sum(micro(e) for e in effs.values())
    vals = ", ".join(
        f"('{c}', {micro(base)}, {micro(base - effs[c])}, {micro(effs[c])},"
        f" {micro(effs[c]) * 1_000_000 // tot if tot else 0})"
        for c in _MKV_CHANNELS
    )
    return (
        "SELECT channel, CAST(base_conv_micro AS BIGINT) AS base_conv_micro,"
        " CAST(removal_conv_micro AS BIGINT) AS removal_conv_micro,"
        " CAST(effect_micro AS BIGINT) AS effect_micro,"
        " CAST(share_micro AS BIGINT) AS share_micro"
        f" FROM (VALUES {vals}) AS t(channel, base_conv_micro,"
        " removal_conv_micro, effect_micro, share_micro)"
        " ORDER BY channel"
    )


@register(
    "markov_removal_attribution",
    oracle=_markov_removal_oracle,
    doc="Markov removal-effect attribution (Anderl et al. 2016) — "
    "the path-model member of the attribution trio beside last-touch "
    "(positional) and Shapley (coalition): fit a first-order chain "
    "over pre-conversion channel sequences (START -> channels -> "
    "CONV/NULL absorbing), then each channel's credit is how much "
    "the absorption probability drops when its incoming flow "
    "redirects to NULL. The distributed work is the transition-count "
    "build (per-user lag window over (ts, event_id), truncated at "
    "the first purchase by the same total order both engines use); "
    "the absorbing-chain solve runs driver-side on the <= 7x7 "
    "integer count table (the classifier/PAV bounded-solve "
    "convention) through a solve function SHARED with the oracle "
    "twin — the gate therefore proves the engines agree on every "
    "integer transition count. Shares are exact integer divisions "
    "of micro-snapped effects.",
)
def markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import math

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pur = ev.filter(F.col("event_type") == "purchase")
    pp = (
        pur.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("_p"))
        .select(
            "user_id",
            F.col("_p.ts").alias("p_ts"),
            F.col("_p.event_id").alias("p_eid"),
        )
    )
    ch = (
        ev.filter(F.col("event_type") != "purchase")
        .join(pp, "user_id", "left")  # user-keyed equi-join: shuffle
        .filter(
            F.col("p_ts").isNull()
            | (F.col("ts") < F.col("p_ts"))
            | ((F.col("ts") == F.col("p_ts")) & (F.col("event_id") < F.col("p_eid")))
        )
        .withColumn("conv", F.col("p_ts").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ch.select(
        "user_id",
        "event_type",
        "conv",
        F.lag("event_type").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    inner = seq.select(
        F.when(F.col("rn") == 1, F.lit("START"))
        .otherwise(F.col("prev"))
        .alias("src"),
        F.col("event_type").alias("dst"),
    )
    last = seq.filter(F.col("rn") == F.col("n")).select(
        F.col("event_type").alias("src"),
        F.when(F.col("conv"), F.lit("CONV")).otherwise(F.lit("NULL")).alias("dst"),
    )
    allu = (
        ev.select("user_id")
        .distinct()
        .join(pp, "user_id", "left")
        .join(
            seq.groupBy("user_id").agg(F.max("n").alias("_n")),
            "user_id",
            "left",
        )
        .filter(F.coalesce(F.col("_n"), F.lit(0)) == 0)
        .select(
            F.lit("START").alias("src"),
            F.when(F.col("p_ts").isNotNull(), F.lit("CONV"))
            .otherwise(F.lit("NULL"))
            .alias("dst"),
        )
    )
    counts = (
        inner.unionByName(last)
        .unionByName(allu)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    trans = {
        (r["src"], r["dst"]): int(r["c"]) for r in counts.collect()
    }
    base = _markov_conv_prob(trans, None)

    def micro(x: float) -> int:
        return int(math.floor(x * 1_000_000.0 + 0.5))

    effs = {c: base - _markov_conv_prob(trans, c) for c in _MKV_CHANNELS}
    tot = sum(micro(e) for e in effs.values())
    rows = [
        (
            c,
            micro(base),
            micro(base - effs[c]),
            micro(effs[c]),
            micro(effs[c]) * 1_000_000 // tot if tot else 0,
        )
        for c in _MKV_CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_micro bigint, removal_conv_micro bigint,"
        " effect_micro bigint, share_micro bigint",
    ).orderBy("channel")


# --------------------------------------------------------------------------
# periodogram_weekly_cycle
# --------------------------------------------------------------------------

#: literal milli-unit trig tables for the fixed 28-day DFT window,
#: folded in Python (the decayed_user_value convention): T = 28 gives
#: four full weeks, so the weekly cycle sits EXACTLY on bin k = 4.
_DFT_T = 28
_DFT_KMAX = 14
_DFT_TRIG = [
    (
        k,
        d,
        int(math.floor(math.cos(2.0 * math.pi * k * d / _DFT_T) * 1000 + 0.5)),
        int(math.floor(math.sin(2.0 * math.pi * k * d / _DFT_T) * 1000 + 0.5)),
    )
    for k in range(1, _DFT_KMAX + 1)
    for d in range(_DFT_T)
]

_DFT_VALUES = ", ".join(
    f"({k}, {d}, {c}, {sn})" for k, d, c, sn in _DFT_TRIG
)


@register(
    "periodogram_weekly_cycle",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    trig AS (
      SELECT * FROM (VALUES {_DFT_VALUES}) AS t(k, d, c_milli, s_milli)
    ),
    spec AS (
      SELECT CAST(trig.k AS BIGINT) AS k,
             CAST(sum(daily.y * trig.c_milli) AS BIGINT) AS re_milli,
             CAST(sum(daily.y * trig.s_milli) AS BIGINT) AS im_milli
      FROM trig JOIN daily ON daily.d = trig.d
      WHERE daily.d < {_DFT_T}
      GROUP BY trig.k
    )
    SELECT k, {_DFT_T * 1000000} // k AS period_micro_days,
           re_milli, im_milli,
           re_milli * re_milli + im_milli * im_milli AS power_milli2
    FROM spec ORDER BY k
    """,
    doc="exact discrete-Fourier periodogram of daily purchase counts "
    "over the fixed first-28-day window (four full weeks, so the "
    "weekly cycle lands EXACTLY on bin k = 4 — the spectral twin of "
    "dow_seasonality_profile's time-domain readout): cos/sin folded "
    "in Python as a literal 14 x 28 milli-unit table joined onto the "
    "daily series, so each Fourier coefficient is an exact BIGINT "
    "dot product and power = re^2 + im^2 is exact integer "
    "arithmetic (bounded: |re| <= sum(y)*1000, fine to ~3e9 "
    "events/day before int64 pressure).  Scale: one fact groupBy to "
    "the daily series; the spectrum is a broadcast join against 392 "
    "literal rows.",
)
def periodogram_weekly_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
        "event_type",
    )
    daily = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("d") < _DFT_T)
        )
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    trig = spark.createDataFrame(
        _DFT_TRIG, "k long, d long, c_milli long, s_milli long"
    )
    spec = (
        daily.join(F.broadcast(trig), "d")
        .groupBy("k")
        .agg(
            F.sum(F.col("y") * F.col("c_milli"))
            .cast("bigint")
            .alias("re_milli"),
            F.sum(F.col("y") * F.col("s_milli"))
            .cast("bigint")
            .alias("im_milli"),
        )
    )
    return spec.select(
        "k",
        F.expr(f"{_DFT_T * 1000000} DIV k").alias("period_micro_days"),
        "re_milli",
        "im_milli",
        (
            F.col("re_milli") * F.col("re_milli")
            + F.col("im_milli") * F.col("im_milli")
        ).alias("power_milli2"),
    ).orderBy("k")


# --------------------------------------------------------------------------
# logrank_conversion_arms
# --------------------------------------------------------------------------

@register(
    "logrank_conversion_arms",
    oracle="""
    WITH signup AS (
      SELECT user_id, min(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    fp AS (
      SELECT s.user_id, s.s_ts, min(e.ts) AS p_ts
      FROM signup s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts >= s.s_ts
      GROUP BY 1, 2
    ),
    study AS (SELECT max(CAST(ts AS DATE)) AS end_d FROM events),
    subj AS (
      SELECT CAST(f.user_id % 2 AS BIGINT) AS arm,
             CAST(coalesce(CAST(f.p_ts AS DATE), st.end_d)
                  - CAST(f.s_ts AS DATE) AS BIGINT) AS t_day,
             CASE WHEN f.p_ts IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM fp f CROSS JOIN study st
    ),
    daily AS (
      SELECT t_day,
             CAST(sum(CASE WHEN arm = 0 THEN e ELSE 0 END) AS BIGINT) AS d0,
             CAST(sum(CASE WHEN arm = 0 THEN 1 - e ELSE 0 END) AS BIGINT)
               AS c0,
             CAST(sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN arm = 1 THEN 1 - e ELSE 0 END) AS BIGINT)
               AS c1
      FROM subj GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(d0 + c0) AS BIGINT) AS n0_all,
             CAST(sum(d1 + c1) AS BIGINT) AS n1_all
      FROM daily
    ),
    risk AS (
      SELECT t_day, d0, d1,
             tot.n0_all - CAST(coalesce(sum(d0 + c0) OVER (ORDER BY t_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n0t,
             tot.n1_all - CAST(coalesce(sum(d1 + c1) OVER (ORDER BY t_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1t
      FROM daily CROSS JOIN tot
    ),
    terms AS (
      SELECT t_day, d0, d1, n0t, n1t,
             d0 + d1 AS dt, n0t + n1t AS nt,
             CAST(floor(CAST((d0 + d1) * n1t AS DOUBLE)
                        / CAST(n0t + n1t AS DOUBLE)
                        * 1000000.0 + 0.5) AS BIGINT) AS e1_micro,
             CAST(floor(CAST((d0 + d1) * n1t * n0t
                             * (n0t + n1t - d0 - d1) AS DOUBLE)
                        / CAST((n0t + n1t) * (n0t + n1t)
                               * (n0t + n1t - 1) AS DOUBLE)
                        * 1000000.0 + 0.5) AS BIGINT) AS v_micro
      FROM risk
      WHERE d0 + d1 > 0 AND n0t + n1t > 1
    ),
    agg AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum(d0) AS BIGINT) AS o0,
             CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
             CAST(sum(v_micro) AS BIGINT) AS v_micro
      FROM terms
    )
    SELECT tot.n0_all, tot.n1_all, agg.o0, agg.o1,
           agg.e1_micro,
           (agg.o0 + agg.o1) * 1000000 - agg.e1_micro AS e0_micro,
           agg.v_micro,
           CAST(floor(
             CAST(agg.o1 * 1000000 - agg.e1_micro AS DOUBLE)
             * CAST(agg.o1 * 1000000 - agg.e1_micro AS DOUBLE)
             / CAST(agg.v_micro AS DOUBLE) / 1000000.0 + 0.5)
             AS BIGINT) AS chi2_micro
    FROM agg CROSS JOIN tot
    """,
    doc="two-sample log-rank test of signup-to-purchase conversion "
    "between the deterministic experiment arms user_id % 2 — the "
    "inferential completion of the survival trio (Kaplan-Meier "
    "curve, Nelson-Aalen hazard, and now 'do the arms differ'): at "
    "each event day the observed arm-1 events are compared to the "
    "hypergeometric expectation d_t * n1_t/n_t, variance "
    "d_t*n1_t*n0_t*(n_t-d_t) / (n_t^2 (n_t-1)), chi^2 = "
    "(O1-E1)^2/V.  Same censoring-at-study-end risk-set machinery "
    "as kaplan_meier_conversion; per-day E and V are each ONE "
    "double division of exact BIGINT products, micro-snapped "
    "BEFORE summation (the psi convention), and the final chi^2 "
    "divides once more.  Windows run over the duration-day table — "
    "calendar-bounded.  chi2_micro ~ 3.84e6 is the 5% line.",
)
def logrank_conversion_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("pts")
    )
    fp = (
        signup.join(
            purch,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("pts") >= F.col("s_ts")),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("pts").alias("p_ts"))
    )
    study = ev.agg(F.max(F.col("ts").cast("date")).alias("end_d"))
    subj = fp.crossJoin(F.broadcast(study)).select(
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        F.expr(
            "CAST(datediff(coalesce(CAST(p_ts AS DATE), end_d),"
            " CAST(s_ts AS DATE)) AS BIGINT)"
        ).alias("t_day"),
        F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("e"),
    )
    daily = subj.groupBy("t_day").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("e")).otherwise(0))
        .cast("bigint")
        .alias("d0"),
        F.sum(F.when(F.col("arm") == 0, 1 - F.col("e")).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("e")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("arm") == 1, 1 - F.col("e")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    tot = daily.agg(
        F.sum(F.col("d0") + F.col("c0")).cast("bigint").alias("n0_all"),
        F.sum(F.col("d1") + F.col("c1")).cast("bigint").alias("n1_all"),
    )
    w = (
        Window.orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = daily.crossJoin(F.broadcast(tot)).select(
        "t_day",
        "d0",
        "d1",
        (
            F.col("n0_all")
            - F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(w), F.lit(0))
        )
        .cast("bigint")
        .alias("n0t"),
        (
            F.col("n1_all")
            - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(w), F.lit(0))
        )
        .cast("bigint")
        .alias("n1t"),
    )
    terms = risk.filter(
        (F.col("d0") + F.col("d1") > 0) & (F.col("n0t") + F.col("n1t") > 1)
    ).select(
        "d0",
        "d1",
        F.expr(
            "CAST(floor(CAST((d0 + d1) * n1t AS DOUBLE)"
            " / CAST(n0t + n1t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("e1_micro"),
        F.expr(
            "CAST(floor(CAST((d0 + d1) * n1t * n0t"
            " * (n0t + n1t - d0 - d1) AS DOUBLE)"
            " / CAST((n0t + n1t) * (n0t + n1t)"
            " * (n0t + n1t - 1) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("v_micro"),
    )
    agg = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("d0").cast("bigint").alias("o0"),
        F.sum("e1_micro").cast("bigint").alias("e1_micro"),
        F.sum("v_micro").cast("bigint").alias("v_micro"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n0_all",
        "n1_all",
        "o0",
        "o1",
        "e1_micro",
        ((F.col("o0") + F.col("o1")) * 1000000 - F.col("e1_micro")).alias(
            "e0_micro"
        ),
        "v_micro",
        F.expr(
            "CAST(floor("
            "CAST(o1 * 1000000 - e1_micro AS DOUBLE)"
            " * CAST(o1 * 1000000 - e1_micro AS DOUBLE)"
            " / CAST(v_micro AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT)"
        ).alias("chi2_micro"),
    )


# --------------------------------------------------------------------------
# sprt_conversion_monitor
# --------------------------------------------------------------------------

#: SPRT constants folded in Python (the literal-table convention):
#: H0 p=0.45 vs H1 p=0.55, alpha = beta = 0.05.  Per-trial log-
#: likelihood-ratio increments and the two Wald decision thresholds,
#: all in micro-nats.
_SPRT_P0, _SPRT_P1 = 0.45, 0.55
_SPRT_WIN = int(math.floor(math.log(_SPRT_P1 / _SPRT_P0) * 1e6 + 0.5))
_SPRT_LOSE = int(
    math.floor(math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e6 + 0.5)
)
_SPRT_A = int(math.floor(math.log(0.95 / 0.05) * 1e6 + 0.5))   # accept H1
_SPRT_B = int(math.floor(math.log(0.05 / 0.95) * 1e6 + 0.5))   # accept H0


@register(
    "sprt_conversion_monitor",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    walk AS (
      SELECT d, x, n,
             x * {_SPRT_WIN} + (n - x) * ({_SPRT_LOSE}) AS llr_micro,
             CAST(sum(x * {_SPRT_WIN} + (n - x) * ({_SPRT_LOSE}))
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_llr_micro
      FROM daily
    )
    SELECT d, x, n, CAST(llr_micro AS BIGINT) AS llr_micro,
           cum_llr_micro,
           CAST({_SPRT_A} AS BIGINT) AS accept_h1_at,
           CAST({_SPRT_B} AS BIGINT) AS accept_h0_at,
           CAST(CASE WHEN cum_llr_micro >= {_SPRT_A} THEN 1
                     WHEN cum_llr_micro <= {_SPRT_B} THEN -1
                     ELSE 0 END AS BIGINT) AS decision
    FROM walk ORDER BY d
    """,
    doc="Wald's sequential probability ratio test monitoring the "
    "purchase share among click+purchase events day by day — the "
    "always-valid sequential monitor a platform runs INSTEAD of "
    "peeking at a fixed-horizon test (peeking inflates false "
    "positives; the SPRT's Wald thresholds ln((1-b)/a), ln(b/(1-a)) "
    "hold at every look).  H0 p=0.45 vs H1 p=0.55, alpha=beta=0.05; "
    "the per-trial LLR increments and both thresholds are "
    "Python-folded micro-nat literals, so the daily walk is exact "
    "BIGINT multiply-add and the cumulative sum runs over the "
    "calendar-bounded unique-day table (tie-free ordering).  "
    "decision: +1 cross-up (accept H1), -1 cross-down, 0 continue.  "
    "The sequential sibling of cusum_change_point (drift detection) "
    "and mcnemar (paired fixed-horizon).",
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
        "event_type",
    )
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("d")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("bigint")
            .alias("x"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.withColumn(
        "llr_micro",
        (
            F.col("x") * F.lit(_SPRT_WIN)
            + (F.col("n") - F.col("x")) * F.lit(_SPRT_LOSE)
        ).cast("bigint"),
    ).withColumn(
        "cum_llr_micro", F.sum("llr_micro").over(w).cast("bigint")
    )
    return walk.select(
        "d",
        "x",
        "n",
        "llr_micro",
        "cum_llr_micro",
        F.lit(_SPRT_A).cast("bigint").alias("accept_h1_at"),
        F.lit(_SPRT_B).cast("bigint").alias("accept_h0_at"),
        F.when(F.col("cum_llr_micro") >= _SPRT_A, 1)
        .when(F.col("cum_llr_micro") <= _SPRT_B, -1)
        .otherwise(0)
        .cast("bigint")
        .alias("decision"),
    ).orderBy("d")


# --------------------------------------------------------------------------
# dispersion_index_daily
# --------------------------------------------------------------------------

@register(
    "dispersion_index_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(y) AS BIGINT) AS s1,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, s1, s2,
           CAST(floor(
             CAST(n_days * s2 - s1 * s1 AS DOUBLE)
             / CAST(n_days - 1 AS DOUBLE)
             / (CAST(s1 AS DOUBLE) / n_days)
             * 1000000.0 + 0.5) AS BIGINT)
             AS dispersion_micro
    FROM m WHERE n_days > 1
    ORDER BY event_type
    """,
    doc="index of dispersion (variance-to-mean ratio) of each event "
    "type's daily count series — the overdispersion diagnostic that "
    "decides Poisson vs negative-binomial modeling (and whether "
    "daily_count_anomalies' thresholds are honest): variance from "
    "exact BIGINT moment sums (n*S2 - S1^2 over n-1), divided once "
    "by the exact mean and micro-snapped.  ~1e6 means Poisson-like; "
    "well above means bursty.  One fact groupBy to the daily "
    "series; moments are calendar-bounded.",
)
def dispersion_index_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("bigint").alias("y")
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("y").cast("bigint").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s2"),
    )
    return (
        m.filter(F.col("n_days") > 1)
        .select(
            "event_type",
            "n_days",
            "s1",
            "s2",
            F.expr(
                "CAST(floor("
                "CAST(n_days * s2 - s1 * s1 AS DOUBLE)"
                " / CAST(n_days - 1 AS DOUBLE)"
                " / (CAST(s1 AS DOUBLE) / n_days)"
                " * 1000000.0 + 0.5)"
                " AS BIGINT)"
            ).alias("dispersion_micro"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# user_activity_lorenz
# --------------------------------------------------------------------------

@register(
    "user_activity_lorenz",
    oracle="""
    WITH ue AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY 1
    ),
    rk AS (
      SELECT n_ev,
             row_number() OVER (ORDER BY n_ev, user_id) AS r,
             count(*) OVER () AS n_users,
             sum(n_ev) OVER () AS total_ev
      FROM ue
    ),
    cum AS (
      SELECT r, n_users, total_ev,
             CAST(sum(n_ev) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_ev,
             (r * 10) // n_users AS decile_edge,
             ((r - 1) * 10) // n_users AS prev_edge
      FROM rk
    )
    SELECT CAST(decile_edge AS BIGINT) AS decile,
           CAST(max(r) AS BIGINT) AS n_users_cum,
           CAST(max(cum_ev) AS BIGINT) AS cum_events,
           CAST(max(cum_ev) * 1000000 // max(total_ev) AS BIGINT)
             AS cum_share_micro
    FROM cum WHERE decile_edge > prev_edge
    GROUP BY decile_edge ORDER BY decile
    """,
    doc="Lorenz curve of user activity concentration: users ranked "
    "ascending by event count ((n_ev, user_id) total order), the "
    "cumulative event share read at each population-decile edge — "
    "the curve whose area complement IS the Gini the "
    "gini_revenue_by_segment query summarizes, kept as explicit "
    "curve points because mixture/among-user budgeting reads the "
    "SHAPE ('the top decile produces X%').  Rank and prefix sum run "
    "over the per-user aggregate (one fact groupBy, then a "
    "user-table window); shares are exact micro floor-divisions.  "
    "Decile edges by integer r*10/n flooring — the last row is "
    "always decile 10 at share 1e6.",
)
def user_activity_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id")
    ue = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_ev")
    )
    w_r = Window.orderBy("n_ev", "user_id")
    w_all = Window.partitionBy()
    rk = ue.select(
        "n_ev",
        F.row_number().over(w_r).alias("r"),
        F.count("*").over(w_all).alias("n_users"),
        F.sum("n_ev").over(w_all).alias("total_ev"),
    )
    w_cum = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rk.select(
        "r",
        "n_users",
        "total_ev",
        F.sum("n_ev").over(w_cum).cast("bigint").alias("cum_ev"),
        F.expr("(r * 10) DIV n_users").alias("decile_edge"),
        F.expr("((r - 1) * 10) DIV n_users").alias("prev_edge"),
    )
    return (
        cum.filter(F.col("decile_edge") > F.col("prev_edge"))
        .groupBy(F.col("decile_edge").alias("decile"))
        .agg(
            F.max("r").cast("bigint").alias("n_users_cum"),
            F.max("cum_ev").cast("bigint").alias("cum_events"),
            F.expr(
                "CAST(max(cum_ev) * 1000000 DIV max(total_ev) AS BIGINT)"
            ).alias("cum_share_micro"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# seasonal_residual_anomalies (round 10): the deseasonalized control
# chart — remove the (event_type, weekday) baseline FIRST, then flag.
# ---------------------------------------------------------------------------

@register(
    "seasonal_residual_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             (CAST(ts AS DATE) - DATE '{_DOW_ANCHOR}') % 7 AS dow_idx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    mom AS (
      SELECT event_type, dow_idx,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(n) AS BIGINT) AS s1,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM daily GROUP BY 1, 2
    ),
    z AS (
      SELECT d.event_type, d.day, CAST(d.dow_idx AS BIGINT) AS dow_idx,
             d.n,
             CASE WHEN m.cnt * m.s2 - m.s1 * m.s1 <= 0
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(
                    (CAST(m.cnt AS DOUBLE) * d.n - m.s1)
                    / sqrt(CAST(m.cnt AS DOUBLE) * m.s2
                           - CAST(m.s1 AS DOUBLE) * m.s1)
                    * 1000000.0 + 0.5) AS BIGINT) END AS z_micro
      FROM daily d JOIN mom m
        ON d.event_type = m.event_type AND d.dow_idx = m.dow_idx
    )
    SELECT event_type, day, dow_idx, n, z_micro
    FROM z WHERE abs(z_micro) > 1000000
    ORDER BY event_type, day
    """,
    doc="seasonality-adjusted volume anomalies on the per-type daily "
    "event series: the weekly cycle is removed by scoring each day "
    "against its OWN (event_type, weekday) baseline — exact integer "
    "moments (count, sum, sum-of-squares) per cell over the "
    "calendar-bounded daily aggregate, z = (cnt*n - s1)/sqrt(cnt*s2 "
    "- s1^2) micro-floored once, zero-variance CASE-guarded, |z| > 1 "
    "flags — so a busy-every-Monday type stops alarming every Monday "
    "(the failure mode of the global-baseline daily_count_anomalies, "
    "which this complements; dow_seasonality_profile reports the "
    "cycle itself, this subtracts it).  Weekday index is the folded "
    "integer anchor arithmetic (no engine dayofweek()).  Scale: one "
    "grouped pass to the daily table (rows = days x types), one "
    "7x|types| moment aggregate broadcast back — nothing beyond the "
    "daily rollup ever shuffles.",
)
def seasonal_residual_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (
            F.datediff(F.to_date("ts"), F.lit(_DOW_ANCHOR)) % 7
        ).alias("dow_idx"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    mom = daily.groupBy("event_type", "dow_idx").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.expr("n * n")).cast("bigint").alias("s2"),
    )
    z = daily.join(F.broadcast(mom), ["event_type", "dow_idx"]).select(
        "event_type",
        "day",
        F.col("dow_idx").cast("bigint").alias("dow_idx"),
        "n",
        F.expr(
            "CASE WHEN cnt * s2 - s1 * s1 <= 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(floor((CAST(cnt AS DOUBLE) * n - s1) "
            "/ sqrt(CAST(cnt AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) "
            "* 1000000.0 + 0.5) AS BIGINT) END"
        ).alias("z_micro"),
    )
    return (
        z.filter(F.abs(F.col("z_micro")) > 1_000_000)
        .orderBy("event_type", "day")
    )
