"""Driver queries: pattern-mining, alignment, and causal / survival /
tail-analytics operators (round 8) — exactly nine families, each
implemented and registered in this module:

- association_rules_lift — classic directional association rules
  over customer-order baskets: support / confidence / lift for part
  pairs, minimum-support pruned.  Distinct from frequent_brand_pairs
  (support only) and brand_pair_pmi (symmetric PMI): rules are
  DIRECTIONAL (conf(A->B) != conf(B->A)) and lift-ranked.
- lcs_align_neardups — alignment VERIFICATION of near-duplicate
  candidates: the top word-3-gram-Jaccard pairs (the
  dedup_ngram_jaccard machinery) re-scored by exact token-level
  longest-common-subsequence ratio via a per-pair dynamic program in
  grouped applyInPandas — set-similarity proposes, sequence
  alignment confirms (order-sensitive, unlike Jaccard).  The oracle
  is a bit-exact pure-Python twin emitted as VALUES (the
  mmr/isotonic dynamic-oracle convention).
- difference_in_differences — the 2x2 causal-analytics standard:
  treated (BUILDING segment) vs control, before/after 1998-01-01,
  cell means in exact milli-cents and the DID interaction as an
  exact BIGINT difference of differences.
- propensity_stratified_effect — the stratification/standardization
  estimator beside DID: per-nation strata on common support, exact
  milli-cent cell means, population-weighted ATE as one final
  integer division.
- nelson_aalen_hazard — the cumulative-hazard complement of the
  gated Kaplan-Meier curve: per-event-day d/n snapped to micro
  BEFORE the calendar-bounded cumulative sum (same censored
  risk-set machinery, additive instead of product-limit).
- hill_tail_exponent — the Hill/power-law estimator of the
  word-frequency tail exponent (the Zipf audit of a corpus
  datacard): each ln(f/xmin) snapped to micro from exact counts,
  one final alpha division on exact BIGINTs.
- mcnemar_urgent_periods — McNemar's paired test on per-customer
  urgent-order status before/after 1998: the discordant-pair
  statistic (b-c)^2/(b+c), the right test when the two proportions
  share subjects and chi-squared independence does not apply.
- odds_ratio_woolf_ci — the 2x2 odds ratio (BUILDING exposure vs
  urgent outcome, per customer) with Woolf's log-normal confidence
  interval; ln(OR) and each CI bound snapped once from exact cell
  counts.
- dtw_daily_series_alignment — dynamic time warping of each
  non-purchase event type's dense daily-count series against the
  purchase series: integer |a-b| step costs, classic O(T^2) DP per
  type in grouped applyInPandas (calendar-bounded, never
  corpus-scale), reported beside the no-warp L1 baseline so the
  output reads as "how much does warping explain".  Python-twin
  VALUES oracle like lcs_align_neardups.

Conventions as everywhere: exact BIGINT counts/cents, one division
per output cell (integer DIV where exactness allows, double +
micro/milli snap otherwise), total-order tie-breaks.

No reference-file citation applies: /root/reference stops at
retrieval; these extend the analytics families of
driver_queries_stats / driver_queries_ml.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..functions import portable as PT
from ..operators import dedup
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# association_rules_lift
# --------------------------------------------------------------------------

_AR_MINSUP = 3

@register(
    "association_rules_lift",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    s AS (SELECT p, CAST(count(*) AS BIGINT) AS supp FROM op GROUP BY p),
    nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM op),
    pairs AS (
      SELECT a.p AS ante, b.p AS cons, CAST(count(*) AS BIGINT) AS supp_ab
      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
      GROUP BY a.p, b.p
      HAVING count(*) >= {_AR_MINSUP}
    )
    SELECT pr.ante, pr.cons, pr.supp_ab,
           sa.supp AS supp_ante, sc.supp AS supp_cons,
           pr.supp_ab * 1000000 // sa.supp AS conf_micro,
           CAST(floor(CAST(pr.supp_ab * nn.n AS DOUBLE)
                      / (CAST(sa.supp AS DOUBLE) * sc.supp)
                      * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
    FROM pairs pr
    JOIN s sa ON sa.p = pr.ante
    JOIN s sc ON sc.p = pr.cons
    CROSS JOIN nn
    ORDER BY lift_micro DESC, pr.ante, pr.cons
    LIMIT 20
    """,
    doc="directional association rules over order baskets: "
    "ante -> cons with exact support counts, confidence = "
    "supp(AB)/supp(A) as an exact integer-DIV micro fraction, and "
    "lift = supp(AB)*N/(supp(A)*supp(B)) micro-snapped once from "
    "exact BIGINTs; minimum support {minsup}, top-20 by (lift DESC, "
    "rule). Scale: the pair build fans out per order and TPC-H caps "
    "lineitems/order at 7 (C(7,2)=21 pairs per order, corpus-size-"
    "independent — the adamic_adar argument); marginals broadcast. "
    "The market-basket classic that PMI and raw pair counts only "
    "approximate.".format(minsup=_AR_MINSUP),
)
def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    s = li.groupBy("p").agg(F.count("*").cast("bigint").alias("supp"))
    nn = li.agg(F.countDistinct("o").cast("bigint").alias("n"))
    pairs = (
        li.select(F.col("o"), F.col("p").alias("ante"))
        .join(li.select("o", F.col("p").alias("cons")), "o")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("bigint").alias("supp_ab"))
        .filter(F.col("supp_ab") >= _AR_MINSUP)
    )
    return (
        pairs.join(
            F.broadcast(s.select(F.col("p").alias("ante"),
                                 F.col("supp").alias("supp_ante"))),
            "ante",
        )
        .join(
            F.broadcast(s.select(F.col("p").alias("cons"),
                                 F.col("supp").alias("supp_cons"))),
            "cons",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "ante",
            "cons",
            "supp_ab",
            "supp_ante",
            "supp_cons",
            F.expr("supp_ab * 1000000 DIV supp_ante").alias("conf_micro"),
            F.expr(
                "CAST(floor(CAST(supp_ab * n AS DOUBLE)"
                " / (CAST(supp_ante AS DOUBLE) * supp_cons)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy(F.col("lift_micro").desc(), "ante", "cons")
        .limit(20)
    )


# --------------------------------------------------------------------------
# lcs_align_neardups
# --------------------------------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    """Bit-equal twin of PT.tokens: lowercase, split on whitespace
    runs, drop empties."""
    import re

    return [t for t in re.split(PT.PY_WS, (text or "").lower()) if t != ""]


def _py_lcs(a: list[str], b: list[str]) -> int:
    """Classic two-row LCS dynamic program on token sequences."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


_LCS_TOPK = 20


def _lcs_oracle(sf_dir: str) -> str:
    """Python twin: the SAME top-20 Jaccard candidate pairs (replayed
    via the dedup_ngram_jaccard oracle SQL), the same tokenizer, the
    same DP — emitted as VALUES."""
    import math

    import duckdb

    from .driver_queries_similarity import _NGRAM_JACCARD_ORACLE

    pair_sql = _NGRAM_JACCARD_ORACLE.replace("LIMIT 100", f"LIMIT {_LCS_TOPK}")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    pairs = con.execute(pair_sql).fetchall()
    texts = dict(
        con.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    con.close()
    rows = []
    for id_a, id_b, _, _ in pairs:
        ta, tb = _py_tokens(texts[id_a]), _py_tokens(texts[id_b])
        lcs = _py_lcs(ta, tb)
        ratio = int(
            math.floor(2.0 * lcs / (len(ta) + len(tb)) * 1_000_000.0 + 0.5)
        )
        rows.append((id_a, id_b, len(ta), len(tb), lcs, ratio))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    vals = ", ".join(f"({a}, {b}, {na}, {nb}, {l}, {r})"
                     for a, b, na, nb, l, r in rows)
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,"
        " CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,"
        " CAST(lcs_len AS BIGINT) AS lcs_len,"
        " CAST(lcs_ratio_micro AS BIGINT) AS lcs_ratio_micro"
        f" FROM (VALUES {vals}) AS t(id_a, id_b, n_a, n_b, lcs_len,"
        " lcs_ratio_micro)"
        " ORDER BY lcs_ratio_micro DESC, id_a, id_b"
    )


@register(
    "lcs_align_neardups",
    oracle=_lcs_oracle,
    doc="alignment verification of near-duplicate candidates: the "
    "top-20 exact word-3-gram Jaccard pairs (the dedup_ngram_jaccard "
    "inverted-index machinery, df-capped) re-scored by token-level "
    "longest-common-subsequence — 2*LCS/(|A|+|B|) micro-snapped — "
    "via ONE dynamic program per pair inside grouped applyInPandas "
    "(Arrow path; each pair is an independent task). Set similarity "
    "is order-blind: a shuffled copy and a true edit chain get the "
    "same Jaccard but very different LCS, which is why dedup "
    "pipelines align their candidates before acting. Scale: the DP "
    "is PAIR-bounded (candidates come from the capped index join, "
    "top-k'd), never corpus-scale; texts move once, to exactly the "
    "tasks that align them. Oracle: bit-exact Python twin as VALUES "
    "(the mmr dynamic-oracle convention).",
)
def lcs_align_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _t(spark, sf_dir, "documents")
    pairs = (
        dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, min_jaccard=0.05, max_doc_freq=100
        )
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(_LCS_TOPK)
        .select("id_a", "id_b")
    )
    ta = docs.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    joined = pairs.join(ta, "id_a").join(tb, "id_b").select(
        "id_a", "id_b", "text_a", "text_b"
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), True),
            T.StructField("id_b", T.LongType(), True),
            T.StructField("n_a", T.LongType(), True),
            T.StructField("n_b", T.LongType(), True),
            T.StructField("lcs_len", T.LongType(), True),
            T.StructField("lcs_ratio_micro", T.LongType(), True),
        ]
    )

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        rows = []
        for _, r in pdf.iterrows():
            ta_ = _py_tokens(r["text_a"])
            tb_ = _py_tokens(r["text_b"])
            lcs = _py_lcs(ta_, tb_)
            ratio = int(
                math.floor(
                    2.0 * lcs / (len(ta_) + len(tb_)) * 1_000_000.0 + 0.5
                )
            )
            rows.append(
                (int(r["id_a"]), int(r["id_b"]), len(ta_), len(tb_), lcs,
                 ratio)
            )
        return pd.DataFrame(
            rows, columns=["id_a", "id_b", "n_a", "n_b", "lcs_len",
                           "lcs_ratio_micro"]
        )

    return (
        joined.groupBy("id_a", "id_b")
        .applyInPandas(align, out_schema)
        .orderBy(F.col("lcs_ratio_micro").desc(), "id_a", "id_b")
    )


# --------------------------------------------------------------------------
# difference_in_differences
# --------------------------------------------------------------------------

@register(
    "difference_in_differences",
    oracle="""
    WITH j AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treated,
             CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01' THEN 1
                  ELSE 0 END AS post,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(cents) AS BIGINT) * 1000 // count(*) AS mean_milli
      FROM j GROUP BY treated, post
    ),
    did AS (
      SELECT (max(CASE WHEN treated = 1 AND post = 1 THEN mean_milli END)
            - max(CASE WHEN treated = 1 AND post = 0 THEN mean_milli END))
           - (max(CASE WHEN treated = 0 AND post = 1 THEN mean_milli END)
            - max(CASE WHEN treated = 0 AND post = 0 THEN mean_milli END))
               AS did_milli
      FROM cells
    )
    SELECT c.treated, c.post, c.n, c.sum_cents, c.mean_milli, d.did_milli
    FROM cells c CROSS JOIN did d
    ORDER BY c.treated, c.post
    """,
    doc="difference-in-differences, the 2x2 causal-analytics "
    "standard: treated = BUILDING-segment orders, post = on/after "
    "1998-01-01; per-cell means in exact milli-cents (BIGINT "
    "sum*1000 DIV n — milli, not micro, keeps the product inside "
    "int64 headroom through sf100) and the interaction "
    "(T.post - T.pre) - (C.post - C.pre) as an exact BIGINT "
    "constant on every row. One fact-scale join + a 4-row groupBy; "
    "the parallel-trends reader has the four cells to check.",
)
def difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderdate") >= "1998-01-01", 1).otherwise(0)
        .alias("post"),
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        .alias("treated"),
    )
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("treated", "post")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            "treated",
            "post",
            "n",
            "sum_cents",
            F.expr("sum_cents * 1000 DIV n").alias("mean_milli"),
        )
    )
    did = cells.agg(
        (
            (
                F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1),
                             F.col("mean_milli")))
                - F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0),
                               F.col("mean_milli")))
            )
            - (
                F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1),
                             F.col("mean_milli")))
                - F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0),
                               F.col("mean_milli")))
            )
        ).alias("did_milli")
    )
    return (
        cells.crossJoin(F.broadcast(did))
        .select("treated", "post", "n", "sum_cents", "mean_milli",
                "did_milli")
        .orderBy("treated", "post")
    )


# --------------------------------------------------------------------------
# propensity_stratified_effect
# --------------------------------------------------------------------------

@register(
    "propensity_stratified_effect",
    oracle="""
    WITH j AS (
      SELECT c.c_nationkey AS nation,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treated,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    strata AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_s,
             CAST(count(*) FILTER (WHERE treated = 1) AS BIGINT) AS n_t,
             CAST(count(*) FILTER (WHERE treated = 0) AS BIGINT) AS n_c,
             CAST(coalesce(sum(cents) FILTER (WHERE treated = 1), 0)
                  AS BIGINT) AS s_t,
             CAST(coalesce(sum(cents) FILTER (WHERE treated = 0), 0)
                  AS BIGINT) AS s_c
      FROM j GROUP BY nation
    ),
    supp AS (
      SELECT nation, n_s, n_t, n_c,
             s_t * 1000 // n_t AS mt_milli,
             s_c * 1000 // n_c AS mc_milli
      FROM strata WHERE n_t > 0 AND n_c > 0
    ),
    ate AS (
      SELECT CAST(sum(n_s * (mt_milli - mc_milli)) AS BIGINT)
               // CAST(sum(n_s) AS BIGINT) AS ate_milli,
             CAST(sum(n_s) AS BIGINT) AS n_support
      FROM supp
    )
    SELECT s.nation, s.n_s, s.n_t, s.n_c, s.mt_milli, s.mc_milli,
           s.mt_milli - s.mc_milli AS diff_milli,
           a.ate_milli, a.n_support
    FROM supp s CROSS JOIN ate a
    ORDER BY s.nation
    """,
    doc="stratified (standardized) average-treatment-effect estimate "
    "beside difference_in_differences: treated = BUILDING-segment "
    "orders, strata = customer nation, outcome = exact milli-cent "
    "order value. Strata lacking common support (no treated or no "
    "control rows) are excluded — the standard positivity "
    "restriction, made explicit. Per-stratum means are exact "
    "integer divisions; the population-weighted ATE "
    "sum(n_s * diff) / sum(n_s) is ONE final BIGINT division, so "
    "the estimate is bit-portable. One fact-scale join feeds a "
    "nation-bounded strata table; everything after is constant "
    "size.",
)
def propensity_stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nation"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        .alias("treated"),
    )
    strata = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_s"),
            F.count(F.when(F.col("treated") == 1, 1))
            .cast("bigint")
            .alias("n_t"),
            F.count(F.when(F.col("treated") == 0, 1))
            .cast("bigint")
            .alias("n_c"),
            F.coalesce(
                F.sum(F.when(F.col("treated") == 1, F.col("cents"))), F.lit(0)
            )
            .cast("bigint")
            .alias("s_t"),
            F.coalesce(
                F.sum(F.when(F.col("treated") == 0, F.col("cents"))), F.lit(0)
            )
            .cast("bigint")
            .alias("s_c"),
        )
    )
    supp = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0)).select(
        "nation",
        "n_s",
        "n_t",
        "n_c",
        F.expr("s_t * 1000 DIV n_t").alias("mt_milli"),
        F.expr("s_c * 1000 DIV n_c").alias("mc_milli"),
    )
    ate = supp.agg(
        F.expr(
            "CAST(sum(n_s * (mt_milli - mc_milli)) AS BIGINT)"
            " DIV CAST(sum(n_s) AS BIGINT)"
        ).alias("ate_milli"),
        F.sum("n_s").cast("bigint").alias("n_support"),
    )
    return (
        supp.crossJoin(F.broadcast(ate))
        .select(
            "nation",
            "n_s",
            "n_t",
            "n_c",
            "mt_milli",
            "mc_milli",
            (F.col("mt_milli") - F.col("mc_milli")).alias("diff_milli"),
            "ate_milli",
            "n_support",
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# nelson_aalen_hazard
# --------------------------------------------------------------------------

@register(
    "nelson_aalen_hazard",
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
             d * 1000000 // n_risk AS hazard_micro
      FROM risk WHERE d > 0
    )
    SELECT t_day, n_risk, d AS n_events, c AS n_censored, hazard_micro,
           CAST(sum(hazard_micro) OVER (ORDER BY t_day) AS BIGINT)
             AS cum_hazard_micro
    FROM steps ORDER BY t_day
    """,
    doc="Nelson-Aalen cumulative hazard of signup-to-purchase "
    "conversion — the additive complement of the gated Kaplan-Meier "
    "product-limit curve, on the SAME right-censored risk-set "
    "machinery (subjects who never purchase censor at the study "
    "end). Each event day's hazard increment d/n is one exact "
    "integer division to micro-units; the cumulative hazard is then "
    "an exact BIGINT running sum over the calendar-bounded event-day "
    "table — no transcendental at all, unlike KM's ln-product, "
    "which is why NA is the estimator of choice when increments "
    "must aggregate exactly. One fact-scale min-ts aggregation per "
    "cohort leg; everything downstream is day-bounded.",
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_raw")
    )
    fp = (
        signup.join(
            purchases,
            (signup.user_id == purchases.user_id)
            & (purchases.p_raw >= signup.s_ts),
            "left",
        )
        .groupBy(signup.user_id, "s_ts")
        .agg(F.min("p_raw").alias("p_ts"))
    )
    study = ev.agg(F.max(F.col("ts").cast("date")).alias("end_d"))
    subj = fp.crossJoin(F.broadcast(study)).select(
        F.expr(
            "CAST(datediff(coalesce(CAST(p_ts AS DATE), end_d),"
            " CAST(s_ts AS DATE)) AS BIGINT)"
        ).alias("t_day"),
        F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("e"),
    )
    daily = subj.groupBy("t_day").agg(
        F.sum("e").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("e")).cast("bigint").alias("c"),
    )
    tot = daily.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n"))
    w_prev = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = daily.crossJoin(F.broadcast(tot)).select(
        "t_day",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    steps = risk.filter(F.col("d") > 0).select(
        "t_day",
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.expr("d * 1000000 DIV n_risk").alias("hazard_micro"),
    )
    w_cum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return steps.select(
        "t_day",
        "n_risk",
        "n_events",
        "n_censored",
        "hazard_micro",
        F.sum("hazard_micro").over(w_cum).cast("bigint").alias(
            "cum_hazard_micro"
        ),
    ).orderBy("t_day")


# --------------------------------------------------------------------------
# hill_tail_exponent
# --------------------------------------------------------------------------

_HILL_XMIN = 5

def _hill_oracle() -> str:
    toks = PT.tokens("coalesce(text, '')", D)
    return f"""
    WITH tok AS (SELECT t.w FROM documents, unnest({toks}) AS t(w)),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f
             FROM tok GROUP BY w),
    tail AS (
      SELECT w, f,
             CAST(floor(ln(CAST(f AS DOUBLE) / {_HILL_XMIN})
                  * 1000000.0 + 0.5) AS BIGINT) AS ln_micro
      FROM freq WHERE f >= {_HILL_XMIN}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(ln_micro) AS BIGINT) AS s_ln_micro
      FROM tail
    )
    SELECT CAST({_HILL_XMIN} AS BIGINT) AS xmin, agg.n_tail,
           agg.s_ln_micro,
           1000000 + CAST(floor(
             CAST(agg.n_tail AS DOUBLE) * 1000000000000.0 / agg.s_ln_micro
             + 0.5) AS BIGINT) AS alpha_micro
    FROM agg
    """


@register(
    "hill_tail_exponent",
    oracle=_hill_oracle(),
    doc="Hill maximum-likelihood estimator of the word-frequency "
    "power-law tail exponent (alpha = 1 + n / sum ln(f/xmin), "
    "xmin={xmin}) — the Zipf audit a corpus datacard reports to "
    "catch degenerate token distributions. Each ln applies once to "
    "a ratio of an exact BIGINT count over the folded xmin and "
    "snaps to micro BEFORE the sum (the psi convention), so the "
    "only floating step in the final alpha is one deterministic "
    "double division of exact integers. Scale: the frequency table "
    "is vocabulary-bounded after one token-count shuffle; the tail "
    "aggregate is a single row.".format(xmin=_HILL_XMIN),
)
def hill_tail_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = PT.tokens("text", S)
    freq = (
        docs.select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    tail = freq.filter(F.col("f") >= _HILL_XMIN).select(
        F.expr(
            f"CAST(floor(ln(CAST(f AS DOUBLE) / {_HILL_XMIN})"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("ln_micro")
    )
    agg = tail.agg(
        F.count("*").cast("bigint").alias("n_tail"),
        F.sum("ln_micro").cast("bigint").alias("s_ln_micro"),
    )
    return agg.select(
        F.lit(_HILL_XMIN).cast("bigint").alias("xmin"),
        "n_tail",
        "s_ln_micro",
        F.expr(
            "1000000 + CAST(floor(CAST(n_tail AS DOUBLE) * 1000000000000.0"
            " / s_ln_micro + 0.5) AS BIGINT)"
        ).alias("alpha_micro"),
    )


# --------------------------------------------------------------------------
# mcnemar_urgent_periods
# --------------------------------------------------------------------------

@register(
    "mcnemar_urgent_periods",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       AND o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS x_a,
             max(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                       AND o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS x_b
      FROM orders GROUP BY o_custkey
    ),
    cells AS (
      SELECT
        CAST(count(*) FILTER (WHERE x_a = 1 AND x_b = 1) AS BIGINT) AS a,
        CAST(count(*) FILTER (WHERE x_a = 1 AND x_b = 0) AS BIGINT) AS b,
        CAST(count(*) FILTER (WHERE x_a = 0 AND x_b = 1) AS BIGINT) AS c,
        CAST(count(*) FILTER (WHERE x_a = 0 AND x_b = 0) AS BIGINT) AS d,
        CAST(count(*) AS BIGINT) AS n
      FROM per_cust
    )
    SELECT a, b, c, d, n,
           CAST(floor(CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
                * 1000000.0 + 0.5) AS BIGINT) AS mcnemar_micro
    FROM cells
    """,
    doc="McNemar's test for paired binary outcomes: per customer, "
    "did they place an URGENT order before vs on/after 1998-01-01? "
    "The statistic (b-c)^2/(b+c) uses only the DISCORDANT pairs — "
    "the correct test when both proportions measure the same "
    "subjects, where chi_squared_independence's independence "
    "assumption fails. One grouped pass builds the per-subject "
    "paired indicators (two conditional max aggregates, one "
    "shuffle); the 2x2 cell reduction and the single micro-snapped "
    "division are constant-size. Exact BIGINT cells at any scale.",
)
def mcnemar_urgent_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate",
                                           "o_orderpriority")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(
            F.when(
                (F.col("o_orderdate") < "1998-01-01")
                & (F.col("o_orderpriority") == "1-URGENT"),
                1,
            ).otherwise(0)
        ).alias("x_a"),
        F.max(
            F.when(
                (F.col("o_orderdate") >= "1998-01-01")
                & (F.col("o_orderpriority") == "1-URGENT"),
                1,
            ).otherwise(0)
        ).alias("x_b"),
    )
    cells = per_cust.agg(
        F.count(F.when((F.col("x_a") == 1) & (F.col("x_b") == 1), 1))
        .cast("bigint")
        .alias("a"),
        F.count(F.when((F.col("x_a") == 1) & (F.col("x_b") == 0), 1))
        .cast("bigint")
        .alias("b"),
        F.count(F.when((F.col("x_a") == 0) & (F.col("x_b") == 1), 1))
        .cast("bigint")
        .alias("c"),
        F.count(F.when((F.col("x_a") == 0) & (F.col("x_b") == 0), 1))
        .cast("bigint")
        .alias("d"),
        F.count("*").cast("bigint").alias("n"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        "n",
        F.expr(
            "CAST(floor(CAST((b - c) * (b - c) AS DOUBLE) / (b + c)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("mcnemar_micro"),
    )


# --------------------------------------------------------------------------
# odds_ratio_woolf_ci
# --------------------------------------------------------------------------

@register(
    "odds_ratio_woolf_ci",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS exposed,
             max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS outcome
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    cells AS (
      SELECT
        CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 1) AS BIGINT)
          AS a,
        CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 0) AS BIGINT)
          AS b,
        CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 1) AS BIGINT)
          AS c,
        CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 0) AS BIGINT)
          AS d
      FROM per_cust
    )
    SELECT a, b, c, d,
      CAST(floor(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
           * 1000000.0 + 0.5) AS BIGINT) AS lnor_micro,
      CAST(floor(sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)
           * 1000000.0 + 0.5) AS BIGINT) AS se_micro,
      CAST(floor((ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
           - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
           * 1000000.0 + 0.5) AS BIGINT) AS ci_lo_micro,
      CAST(floor((ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
           + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
           * 1000000.0 + 0.5) AS BIGINT) AS ci_hi_micro
    FROM cells
    """,
    doc="2x2 odds ratio with Woolf's log-normal 95% confidence "
    "interval: exposure = BUILDING segment, outcome = the customer "
    "ever placed an URGENT order. ln(OR) = ln(a*d/(b*c)) applies "
    "once to a ratio of exact BIGINT cell products; the standard "
    "error sqrt(1/a+1/b+1/c+1/d) and each CI bound are single "
    "snapped double expressions of the same exact cells (the 1.96 "
    "quantile folded as a literal), so all four statistics are "
    "bit-portable. One join + one grouped pass builds the "
    "per-customer table; the 2x2 reduction is constant-size. The "
    "epidemiology classic beside the cohort-level "
    "chi_squared/McNemar tests.",
)
def odds_ratio_woolf_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        .alias("exposed"),
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "exposed")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("outcome")
        )
    )
    cells = per_cust.agg(
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 1), 1))
        .cast("bigint")
        .alias("a"),
        F.count(F.when((F.col("exposed") == 1) & (F.col("outcome") == 0), 1))
        .cast("bigint")
        .alias("b"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 1), 1))
        .cast("bigint")
        .alias("c"),
        F.count(F.when((F.col("exposed") == 0) & (F.col("outcome") == 0), 1))
        .cast("bigint")
        .alias("d"),
    )
    lnor = "ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
    se = "sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)"
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(
            f"CAST(floor({lnor} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("lnor_micro"),
        F.expr(
            f"CAST(floor({se} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("se_micro"),
        F.expr(
            f"CAST(floor(({lnor} - 1.959964 * {se}) * 1000000.0 + 0.5)"
            " AS BIGINT)"
        ).alias("ci_lo_micro"),
        F.expr(
            f"CAST(floor(({lnor} + 1.959964 * {se}) * 1000000.0 + 0.5)"
            " AS BIGINT)"
        ).alias("ci_hi_micro"),
    )


# --------------------------------------------------------------------------
# dtw_daily_series_alignment
# --------------------------------------------------------------------------

def _py_dtw(a: list[int], b: list[int]) -> int:
    """Classic two-row DTW dynamic program with integer |a-b| step
    cost — exact BIGINT arithmetic throughout."""
    if not a or not b:
        return 0
    INF = 1 << 62
    prev = [INF] * (len(b) + 1)
    prev[0] = 0
    for x in a:
        cur = [INF] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            c = x - y if x >= y else y - x
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[-1]


def _dtw_series(con) -> dict[str, list[int]]:
    """Dense per-type daily-count series over the global [min, max]
    day spine (gaps are 0) — shared by oracle twin and test twins."""
    rows = con.execute(
        "SELECT event_type,"
        " CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,"
        " CAST(count(*) AS BIGINT) AS y"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    series: dict[str, list[int]] = {}
    for et, d, y in rows:
        s = series.setdefault(et, [0] * (hi - lo + 1))
        s[d - lo] = y
    return series


def _dtw_oracle(sf_dir: str) -> str:
    """Python twin: same dense spine, same DP — emitted as VALUES."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    )
    series = _dtw_series(con)
    con.close()
    ref = series.get("purchase", [])
    rows = []
    for et in sorted(series):
        if et == "purchase":
            continue
        a = series[et]
        dtw = _py_dtw(a, ref)
        l1 = sum(
            x - y if x >= y else y - x for x, y in zip(a, ref)
        )
        rows.append((et, len(a), dtw, l1, l1 - dtw))
    vals = ", ".join(
        f"('{et}', {n}, {dtw}, {l1}, {g})" for et, n, dtw, l1, g in rows
    )
    return (
        "SELECT event_type, CAST(n_days AS BIGINT) AS n_days,"
        " CAST(dtw_cost AS BIGINT) AS dtw_cost,"
        " CAST(l1_cost AS BIGINT) AS l1_cost,"
        " CAST(warp_gain AS BIGINT) AS warp_gain"
        f" FROM (VALUES {vals}) AS t(event_type, n_days, dtw_cost,"
        " l1_cost, warp_gain)"
        " ORDER BY event_type"
    )


@register(
    "dtw_daily_series_alignment",
    bench=True,
    oracle=_dtw_oracle,
    doc="dynamic time warping of each non-purchase event type's dense "
    "daily-count series against the purchase series (both gap-filled "
    "to the global calendar spine): integer |a-b| step costs, the "
    "classic O(T^2) DP run ONCE PER TYPE inside grouped "
    "applyInPandas (Arrow path — each type is an independent task "
    "whose input is 2 x T bounded rows, T calendar-bounded, never "
    "corpus-scale).  Reported beside the no-warp L1 baseline; "
    "warp_gain = L1 - DTW >= 0 is how much lag/stretch structure "
    "the alignment explains — the lead-lag screen beside "
    "autocorr_daily_purchases.  The corpus-scale work is one daily "
    "groupBy; the DP inputs move once, to exactly the task that "
    "aligns them.  Oracle: bit-exact Python twin as VALUES (the "
    "lcs_align_neardups convention).",
)
def dtw_daily_series_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("bigint").alias("y")
    )
    bounds = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi)")).alias("d")
    )
    types = daily.select("event_type").distinct()
    dense = (
        types.crossJoin(spine)
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    ref = dense.filter(F.col("event_type") == "purchase").select(
        "d", F.col("y").alias("y_ref")
    )
    paired = (
        dense.filter(F.col("event_type") != "purchase")
        .join(F.broadcast(ref), "d")
        .select("event_type", "d", "y", "y_ref")
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("n_days", T.LongType(), True),
            T.StructField("dtw_cost", T.LongType(), True),
            T.StructField("l1_cost", T.LongType(), True),
            T.StructField("warp_gain", T.LongType(), True),
        ]
    )

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        a = [int(v) for v in pdf["y"]]
        b = [int(v) for v in pdf["y_ref"]]
        dtw = _py_dtw(a, b)
        l1 = sum(x - y if x >= y else y - x for x, y in zip(a, b))
        return pd.DataFrame(
            [(pdf["event_type"].iloc[0], len(a), dtw, l1, l1 - dtw)],
            columns=["event_type", "n_days", "dtw_cost", "l1_cost",
                     "warp_gain"],
        )

    return (
        paired.groupBy("event_type")
        .applyInPandas(align, out_schema)
        .orderBy("event_type")
    )
