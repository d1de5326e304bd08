"""Driver queries: supervised-learning / feature-engineering
operators (round 8) — the model-training layer a pretraining-data
platform runs on top of the curation core.  Exactly ten families,
each implemented and registered in this module:

- stump_split_search        — histogram-based decision-stump split
  search (the LightGBM/XGBoost-histogram pattern: one constant-width
  binning pass, bin-bounded cumulative scan, micro-snapped Gini).
- naive_bayes_lang_confusion — multinomial Naive Bayes trained on the
  even-doc_id half of the documents table (Laplace-smoothed word
  likelihoods as micro-ln literals derived in-plan), scored on the
  odd half, reported as a confusion matrix.
- target_encoding_shrunk    — two-level shrinkage target encoding
  (cell -> segment -> global), the categorical-feature standard.
- itemitem_cosine_topk      — item-item collaborative filtering:
  co-occurrence cosine over customer baskets, top-5 neighbors for
  the 10 most-purchased parts.
- cf_holdout_hitrate        — leave-last-out evaluation of that
  recommender: hold out each eval user's most recent part, rebuild
  the similarity table on the remaining pairs, recommend by summed
  neighbor cosine, report each panel user's held-out rank (the
  hit@k / MRR readout, kept per-user for hash discriminativeness).
- frequent_event_trigrams   — order-aware sequential-pattern support
  counting (contiguous event-type trigrams per user).
- ewma_event_type_daily     — integer alpha=1/2 EWMA over the dense
  per-type daily count series (operators/recurrence.py walk; the
  oracle replays it with a recursive CTE).
- conformal_price_calibration — split-conformal interval calibration:
  per-segment k-th order statistic of calibration residuals via the
  band-parallel two-phase rank (operators/ranks.py), coverage audited
  on the held-out half.
- boosting_two_rounds       — two rounds of L2 gradient boosting
  (Friedman's least-squares boosting) composed from histogram split
  searches: micro-integer residual algebra keeps every per-bin
  residual sum EXACT (residuals take finitely many values per round,
  so bin sums derive from indicator counts), SSE split scores are
  deterministic doubles of exact BIGINTs, and leaf values are
  truncating integer division — the GBDT trajectory, hash-gated.
- logistic_hashed_first_step — the hashing-trick linear model: four
  categorical features hashed into 32 shared buckets (collisions
  kept — that IS the trick), and the first logistic-regression
  gradient step from w=0, which is CLOSED FORM exact because
  sigmoid(0) = 1/2 makes the gradient a half-integer count (step -grad/N); the
  before/after NLL totals audit the step, per-row micro-snapped.

Cross-engine exactness follows the repo conventions: prices in exact
BIGINT cents (floor(x*100+0.5)), every transcendental (ln, sqrt)
applied once to a ratio/product of exact integers and snapped to
micro-units before any summation (the psi_value_drift convention),
deterministic total-order tie-breaks on every rank and limit.

No reference-file citation applies: /root/reference stops at
retrieval; these extend the engine with the training-side operators
its corpus would feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import portable as PT
from ..operators import ranks, recurrence, stump
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# stump_split_search
# --------------------------------------------------------------------------

@register(
    "stump_split_search",
    bench=True,
    oracle="""
    WITH f AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    s AS (SELECT CAST(min(cents) AS BIGINT) AS mn,
                 CAST(max(cents) AS BIGINT) AS mx,
                 CAST(count(*) AS BIGINT) AS n_tot,
                 CAST(sum(y) AS BIGINT) AS pos_tot FROM f),
    b AS (SELECT ((cents - mn) * 64) // (mx - mn + 1) AS bin, y FROM f, s),
    h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin),
    c AS (SELECT bin, CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS n_left,
                 CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS pos_left
          FROM h)
    SELECT c.bin AS split_bin,
           s.mn + ((c.bin + 1) * (s.mx - s.mn + 1)) // 64 - 1 AS split_upper,
           c.n_left, c.pos_left,
           s.n_tot - c.n_left AS n_right,
           s.pos_tot - c.pos_left AS pos_right,
           CAST(floor(
             (CAST(c.pos_left AS DOUBLE) * (c.n_left - c.pos_left) / c.n_left
              + CAST(s.pos_tot - c.pos_left AS DOUBLE)
                * ((s.n_tot - c.n_left) - (s.pos_tot - c.pos_left))
                / (s.n_tot - c.n_left))
             * 2000000.0 / s.n_tot + 0.5) AS BIGINT) AS gini_micro
    FROM c, s
    WHERE c.n_left > 0 AND c.n_left < s.n_tot
    ORDER BY gini_micro, split_bin
    """,
    doc="histogram decision-stump split search (operators/stump.py) "
    "predicting URGENT priority from the exact-cents order total: "
    "the full 63-candidate Gini table, best split first. The only "
    "fact-scale work is ONE 64-bin binning groupBy (map-side "
    "combine to <= 64 rows); the cumulative scan is a bin-bounded "
    "window and every impurity is micro-snapped once from exact "
    "BIGINT counts (the chi-squared double convention). This is "
    "the split primitive of the GBDT quality-classifier family "
    "at 100 TB: per-feature histograms, never a per-node sort.",
)
def stump_split_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    return stump.histogram_split_search(o, "cents", "y", n_bins=64).orderBy(
        "gini_micro", "split_bin"
    )


# --------------------------------------------------------------------------
# naive_bayes_lang_confusion
# --------------------------------------------------------------------------

def _nb_oracle() -> str:
    toks = PT.tokens("coalesce(text, '')", D)
    return f"""
    WITH tr AS (SELECT doc_id, lang, coalesce(text, '') AS text
                FROM documents WHERE doc_id % 2 = 0),
    te AS (SELECT doc_id, lang AS true_lang, coalesce(text, '') AS text
           FROM documents WHERE doc_id % 2 = 1),
    tr_tok AS (SELECT tr.lang AS c, t.w FROM tr,
               unnest({toks}) AS t(w)),
    cnt AS (SELECT c, w, CAST(count(*) AS BIGINT) AS k
            FROM tr_tok GROUP BY c, w),
    totc AS (SELECT c, CAST(sum(k) AS BIGINT) AS t_c FROM cnt GROUP BY c),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tr_tok),
    ndoc AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM tr),
    classes AS (
      SELECT d.lang AS c, CAST(count(*) AS BIGINT) AS n_c, totc.t_c,
             vocab.v, ndoc.n_train
      FROM tr d JOIN totc ON totc.c = d.lang, vocab, ndoc
      GROUP BY d.lang, totc.t_c, vocab.v, ndoc.n_train
    ),
    cls AS (
      SELECT c, t_c, v,
        CAST(floor(ln(CAST(n_c AS DOUBLE) / n_train) * 1000000.0 + 0.5)
             AS BIGINT) AS prior_micro,
        CAST(floor(ln(1.0 / (t_c + v)) * 1000000.0 + 0.5)
             AS BIGINT) AS oov_micro
      FROM classes
    ),
    wll AS (
      SELECT cnt.w, cnt.c,
        CAST(floor(ln(CAST(cnt.k + 1 AS DOUBLE) / (cls.t_c + cls.v))
                   * 1000000.0 + 0.5) AS BIGINT) AS ll_micro
      FROM cnt JOIN cls ON cls.c = cnt.c
    ),
    te_tok AS (SELECT te.doc_id, t.w FROM te, unnest({toks}) AS t(w)),
    tw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
           FROM te_tok GROUP BY doc_id, w),
    tok_scores AS (
      SELECT tw.doc_id, cls.c,
             CAST(sum(tw.k * coalesce(wll.ll_micro, cls.oov_micro))
                  AS BIGINT) AS tok_micro
      FROM tw CROSS JOIN cls
      LEFT JOIN wll ON wll.w = tw.w AND wll.c = cls.c
      GROUP BY tw.doc_id, cls.c
    ),
    scored AS (
      SELECT te.doc_id, te.true_lang, cls.c,
             cls.prior_micro + coalesce(ts.tok_micro, 0) AS score_micro
      FROM te CROSS JOIN cls
      LEFT JOIN tok_scores ts ON ts.doc_id = te.doc_id AND ts.c = cls.c
    ),
    pred AS (
      SELECT doc_id, true_lang, c AS pred_lang, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, c) AS rn
      FROM scored
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(score_micro) AS BIGINT) AS score_sum_micro
    FROM pred WHERE rn = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """


@register(
    "naive_bayes_lang_confusion",
    bench=True,
    oracle=_nb_oracle(),
    doc="multinomial Naive Bayes language classifier trained fully "
    "in-plan on the even-doc_id half (Laplace-smoothed word "
    "log-likelihoods: each ln applies once to a ratio of exact "
    "integer counts and snaps to micro-units — the psi_value_drift "
    "convention — so per-doc scores are exact BIGINT sums), scored "
    "on the odd half with class-constant OOV fallback, argmax with "
    "a (score DESC, class) total order, reported as the confusion "
    "matrix. Scale: token counting is the only fact-scale shuffle; "
    "the (vocab x class) likelihood table is vocabulary-bounded and "
    "broadcast; the doc x class fan-out is a constant factor C=5. "
    "The generative counterpart of the trained ridge classifier "
    "(operators/classifier.py).",
)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = PT.tokens("text", S)
    tr = docs.filter(F.col("doc_id") % 2 == 0)
    te = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    tr_tok = tr.select(
        F.col("lang").alias("c"), F.explode(F.expr(toks)).alias("w")
    )
    cnt = tr_tok.groupBy("c", "w").agg(F.count("*").cast("bigint").alias("k"))
    totc = cnt.groupBy("c").agg(F.sum("k").cast("bigint").alias("t_c"))
    vocab = tr_tok.agg(F.countDistinct("w").cast("bigint").alias("v"))
    ndoc = tr.agg(F.count("*").cast("bigint").alias("n_train"))
    cls = (
        tr.groupBy(F.col("lang").alias("c"))
        .agg(F.count("*").cast("bigint").alias("n_c"))
        .join(totc, "c")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndoc))
        .select(
            "c",
            "t_c",
            "v",
            F.expr(
                "CAST(floor(ln(CAST(n_c AS DOUBLE) / n_train)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("prior_micro"),
            F.expr(
                "CAST(floor(ln(1.0 / (t_c + v)) * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("oov_micro"),
        )
    )
    wll = cnt.join(F.broadcast(cls.select("c", "t_c", "v")), "c").select(
        "w",
        "c",
        F.expr(
            "CAST(floor(ln(CAST(k + 1 AS DOUBLE) / (t_c + v))"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("ll_micro"),
    )
    tw = (
        te.select("doc_id", F.explode(F.expr(toks)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    tok_scores = (
        tw.crossJoin(F.broadcast(cls.select("c", "oov_micro")))
        .join(F.broadcast(wll), ["w", "c"], "left")
        .groupBy("doc_id", "c")
        .agg(
            F.sum(F.col("k") * F.coalesce(F.col("ll_micro"), F.col("oov_micro")))
            .cast("bigint")
            .alias("tok_micro")
        )
    )
    scored = (
        te.select("doc_id", "true_lang")
        .crossJoin(F.broadcast(cls.select("c", "prior_micro")))
        .join(tok_scores, ["doc_id", "c"], "left")
        .select(
            "doc_id",
            "true_lang",
            "c",
            (F.col("prior_micro") + F.coalesce(F.col("tok_micro"), F.lit(0)))
            .cast("bigint")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("c")
    )
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_lang", F.col("c").alias("pred_lang"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("score_micro").cast("bigint").alias("score_sum_micro"),
        )
        .orderBy("true_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# target_encoding_shrunk
# --------------------------------------------------------------------------

_TE_M = 20  # shrinkage pseudo-count (fold-constant)

@register(
    "target_encoding_shrunk",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cell AS (SELECT segment, priority, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cents) AS BIGINT) AS s
             FROM j GROUP BY segment, priority),
    seg AS (SELECT segment, CAST(sum(n) AS BIGINT) AS n_seg,
                   CAST(sum(s) AS BIGINT) AS s_seg FROM cell GROUP BY segment),
    tot AS (SELECT CAST(sum(n_seg) AS BIGINT) AS n_tot,
                   CAST(sum(s_seg) AS BIGINT) AS s_tot FROM seg),
    enc_seg AS (
      SELECT seg.segment,
             (seg.s_seg + {_TE_M} * (tot.s_tot // tot.n_tot))
               // (seg.n_seg + {_TE_M}) AS seg_enc_cents
      FROM seg, tot
    )
    SELECT cell.segment, cell.priority, cell.n,
           cell.s // cell.n AS raw_cents,
           (cell.s + {_TE_M} * e.seg_enc_cents) // (cell.n + {_TE_M})
             AS enc_cents,
           cell.n * 1000000 // (cell.n + {_TE_M}) AS lam_micro
    FROM cell JOIN enc_seg e ON e.segment = cell.segment
    ORDER BY cell.segment, cell.priority
    """,
    doc="two-level shrinkage target encoding of the (segment, "
    "priority) categorical interaction against order value: each "
    "cell's mean shrinks toward its segment's encoding, which "
    "shrinks toward the global mean, with pseudo-count m=20 — the "
    "hierarchical mean-encoding standard for high-cardinality "
    "features. All arithmetic is exact BIGINT floor division on "
    "cents, so both engines agree bit-for-bit at any scale. One "
    "fact-scale join+groupBy; the cell/segment tables are "
    "cardinality-bounded and broadcast.",
)
def target_encoding_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderpriority").alias("priority"),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("segment", "priority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s"),
        )
    )
    seg = cell.groupBy("segment").agg(
        F.sum("n").cast("bigint").alias("n_seg"),
        F.sum("s").cast("bigint").alias("s_seg"),
    )
    tot = seg.agg(
        F.sum("n_seg").cast("bigint").alias("n_tot"),
        F.sum("s_seg").cast("bigint").alias("s_tot"),
    )
    enc_seg = seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        F.expr(
            f"(s_seg + {_TE_M} * (s_tot DIV n_tot)) DIV (n_seg + {_TE_M})"
        ).alias("seg_enc_cents"),
    )
    return (
        cell.join(F.broadcast(enc_seg), "segment")
        .select(
            "segment",
            "priority",
            "n",
            F.expr("s DIV n").alias("raw_cents"),
            F.expr(
                f"(s + {_TE_M} * seg_enc_cents) DIV (n + {_TE_M})"
            ).alias("enc_cents"),
            F.expr(f"n * 1000000 DIV (n + {_TE_M})").alias("lam_micro"),
        )
        .orderBy("segment", "priority")
    )


# --------------------------------------------------------------------------
# itemitem_cosine_topk
# --------------------------------------------------------------------------

@register(
    "itemitem_cosine_topk",
    oracle="""
    WITH ua AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ic AS (SELECT p, CAST(count(*) AS BIGINT) AS nu FROM ua GROUP BY p),
    pop AS (
      SELECT p, nu FROM (
        SELECT p, nu, row_number() OVER (ORDER BY nu DESC, p) AS rn FROM ic
      ) WHERE rn <= 10
    ),
    pairs AS (
      SELECT a.p AS part_a, pop.nu AS na, b.p AS part_b,
             CAST(count(*) AS BIGINT) AS cooc
      FROM ua a JOIN pop ON pop.p = a.p
      JOIN ua b ON b.u = a.u AND b.p <> a.p
      GROUP BY a.p, pop.nu, b.p
    ),
    scored AS (
      SELECT pairs.part_a, pairs.part_b, pairs.cooc, pairs.na,
             ic.nu AS nb,
             CAST(floor(pairs.cooc * 1000000.0
                        / sqrt(CAST(pairs.na AS DOUBLE) * ic.nu) + 0.5)
                  AS BIGINT) AS cos_micro
      FROM pairs JOIN ic ON ic.p = pairs.part_b
    )
    SELECT part_a, part_b, cooc, na, nb, cos_micro, rk FROM (
      SELECT scored.*, row_number() OVER (PARTITION BY part_a
               ORDER BY cos_micro DESC, part_b) AS rk
      FROM scored
    ) WHERE rk <= 5
    ORDER BY part_a, rk
    """,
    doc="item-item collaborative filtering: cosine similarity over "
    "binary customer-basket co-occurrence, top-5 neighbors for the "
    "10 most-purchased parts. Each sqrt applies once to a product "
    "of exact BIGINT user counts and the score snaps to micro-units "
    "(the adamic_adar convention). Scale: the anchor set is top-k "
    "bounded and BROADCAST, so the pair build is a semi-join "
    "fan-out of <= 10 x basket size per customer — never the full "
    "item-item self-join; per-anchor top-5 is a 10-partition "
    "window. The related-items primitive behind every co-purchase "
    "recommender.",
)
def itemitem_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ua = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ic = ua.groupBy("p").agg(F.count("*").cast("bigint").alias("nu"))
    w_pop = Window.orderBy(F.col("nu").desc(), F.col("p"))
    pop = (
        ic.withColumn("rn", F.row_number().over(w_pop))
        .filter(F.col("rn") <= 10)
        .select("p", "nu")
    )
    a = ua.join(
        F.broadcast(pop.select(F.col("p"), F.col("nu").alias("na"))), "p"
    ).select(F.col("p").alias("part_a"), "na", "u")
    pairs = (
        a.join(ua.select("u", F.col("p").alias("part_b")), "u")
        .filter(F.col("part_b") != F.col("part_a"))
        .groupBy("part_a", "na", "part_b")
        .agg(F.count("*").cast("bigint").alias("cooc"))
    )
    scored = pairs.join(
        ic.select(F.col("p").alias("part_b"), F.col("nu").alias("nb")),
        "part_b",
    ).select(
        "part_a",
        "part_b",
        "cooc",
        "na",
        "nb",
        F.expr(
            "CAST(floor(cooc * 1000000.0"
            " / sqrt(CAST(na AS DOUBLE) * nb) + 0.5) AS BIGINT)"
        ).alias("cos_micro"),
    )
    w_rk = Window.partitionBy("part_a").orderBy(
        F.col("cos_micro").desc(), F.col("part_b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 5)
        .select("part_a", "part_b", "cooc", "na", "nb", "cos_micro", "rk")
        .orderBy("part_a", "rk")
    )


# --------------------------------------------------------------------------
# frequent_event_trigrams
# --------------------------------------------------------------------------

@register(
    "frequent_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t2,
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS t3
      FROM events
    )
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS support,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY support DESC, t1, t2, t3
    LIMIT 20
    """,
    doc="order-aware sequential-pattern mining: support counts of "
    "contiguous event-type trigrams per user session stream (the "
    "level-1 PrefixSpan/SPAM primitive), with both occurrence "
    "support and distinct-user support, top-20 under a (support "
    "DESC, trigram) total order. Distinct from "
    "markov_event_transitions: this counts length-3 episodes, not "
    "first-order transition probabilities. One shuffle on user_id "
    "feeds the lead window (the per-user frame is a total order on "
    "(ts, event_id)); the trigram groupBy is alphabet-bounded "
    "(<= |types|^3 groups).",
)
def frequent_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(
            F.count("*").cast("bigint").alias("support"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("support").desc(), "t1", "t2", "t3")
        .limit(20)
    )


# --------------------------------------------------------------------------
# ewma_event_type_daily
# --------------------------------------------------------------------------

@register(
    "ewma_event_type_daily",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             event_type
      FROM events
    ),
    bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM base),
    days AS (SELECT CAST(g.x AS BIGINT) AS d
             FROM bounds, unnest(range(mn, mx + 1)) AS g(x)),
    types AS (SELECT DISTINCT event_type FROM base),
    counts AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS c
               FROM base GROUP BY event_type, d),
    grid AS (
      SELECT t.event_type, dy.d, CAST(coalesce(c.c, 0) AS BIGINT) AS x
      FROM types t CROSS JOIN days dy
      LEFT JOIN counts c ON c.event_type = t.event_type AND c.d = dy.d
    ),
    r AS (
      SELECT g.event_type, g.d, g.x, g.x AS ewma
      FROM grid g, bounds WHERE g.d = bounds.mn
      UNION ALL
      SELECT g.event_type, g.d, g.x, (r.ewma + g.x) // 2
      FROM r JOIN grid g ON g.event_type = r.event_type AND g.d = r.d + 1
    )
    SELECT event_type, d, x, ewma FROM r ORDER BY event_type, d
    """,
    doc="integer alpha=1/2 EWMA over each event type's DENSE daily "
    "count series: calendar-spine gap fill (missing days count 0 — "
    "the timeseries_gapfill composition) then the exact floor-"
    "division recurrence y_t = (y_{t-1} + x_t) DIV 2 via the "
    "grouped-applyInPandas walk (operators/recurrence.py) — the "
    "one shape windows cannot express because the state is "
    "non-linearly (floor) coupled. The oracle replays the identical "
    "recurrence with a recursive CTE: two genuinely independent "
    "evaluations of the same walk. Scale: keys are embarrassingly "
    "parallel, per-key state is one BIGINT, series length is "
    "calendar-bounded.",
)
def ewma_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
        "event_type",
    )
    bounds = ev.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    days = bounds.select(
        F.explode(F.expr("sequence(mn, mx)")).alias("d")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("bigint").alias("c")
    )
    grid = (
        types.crossJoin(days)
        .join(counts, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.col("d").cast("bigint").alias("d"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("x"),
        )
    )
    return recurrence.halving_ewma(grid, "event_type", "d", "x").orderBy(
        "event_type", "d"
    )


# --------------------------------------------------------------------------
# conformal_price_calibration
# --------------------------------------------------------------------------

@register(
    "conformal_price_calibration",
    bench=True,
    oracle="""
    WITH j AS (
      SELECT o.o_orderkey, c.c_mktsegment AS segment,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cal AS (SELECT * FROM j WHERE o_orderkey % 2 = 0),
    te  AS (SELECT * FROM j WHERE o_orderkey % 2 = 1),
    pred AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_cal,
                    CAST(sum(cents) AS BIGINT) // count(*) AS pred_cents
             FROM cal GROUP BY segment),
    scores AS (
      SELECT cal.segment, cal.o_orderkey,
             abs(cal.cents - p.pred_cents) AS s
      FROM cal JOIN pred p ON p.segment = cal.segment
    ),
    ranked AS (
      SELECT segment, s, row_number() OVER (PARTITION BY segment
               ORDER BY s, o_orderkey) AS rnk
      FROM scores
    ),
    qhat AS (
      SELECT r.segment, r.s AS qhat_cents, p.n_cal,
             (9 * (p.n_cal + 1) + 9) // 10 AS k
      FROM ranked r JOIN pred p ON p.segment = r.segment
      WHERE r.rnk = (9 * (p.n_cal + 1) + 9) // 10
    )
    SELECT q.segment, q.n_cal, p.pred_cents, q.k, q.qhat_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN abs(te.cents - p.pred_cents) <= q.qhat_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
    FROM te JOIN pred p ON p.segment = te.segment
    JOIN qhat q ON q.segment = te.segment
    GROUP BY q.segment, q.n_cal, p.pred_cents, q.k, q.qhat_cents
    ORDER BY q.segment
    """,
    doc="split-conformal prediction calibration at 90% target "
    "coverage: per-segment mean predictor fit on even order keys, "
    "nonconformity = absolute cents residual, q_hat = the "
    "ceil(0.9*(n+1))-th smallest calibration score — an order "
    "statistic computed with the band-parallel two-phase rank "
    "(operators/ranks.py, band = s DIV 100000, price-domain-"
    "bounded, never a single-task sort) — and held-out coverage "
    "audited on odd keys. Everything is exact BIGINT (counts, "
    "cents, |residual|, floor-division k), so the finite-sample "
    "guarantee audit is bit-portable across engines.",
)
def conformal_price_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "segment", "cents"
    )
    cal = j.filter(F.col("o_orderkey") % 2 == 0)
    te = j.filter(F.col("o_orderkey") % 2 == 1)
    pred = cal.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n_cal"),
        F.expr("CAST(sum(cents) AS BIGINT) DIV count(*)").alias("pred_cents"),
    )
    scores = cal.join(F.broadcast(pred), "segment").select(
        "segment",
        "o_orderkey",
        F.abs(F.col("cents") - F.col("pred_cents")).alias("s"),
        F.expr("abs(cents - pred_cents) DIV 100000").alias("band"),
    )
    ranked = ranks.two_phase_rank(
        scores,
        order_cols=["s", "o_orderkey"],
        band_col="band",
        part_cols=["segment"],
        rank_name="rnk",
    )
    qhat = (
        ranked.join(F.broadcast(pred.select("segment", "n_cal")), "segment")
        .filter(
            F.col("rnk") == F.expr("(9 * (n_cal + 1) + 9) DIV 10")
        )
        .select(
            "segment",
            F.col("s").alias("qhat_cents"),
            "n_cal",
            F.expr("(9 * (n_cal + 1) + 9) DIV 10").alias("k"),
        )
    )
    return (
        te.join(F.broadcast(pred.select("segment", "pred_cents")), "segment")
        .join(F.broadcast(qhat), "segment")
        .groupBy("segment", "n_cal", "pred_cents", "k", "qhat_cents")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred_cents"))
                    <= F.col("qhat_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
        .select(
            "segment", "n_cal", "pred_cents", "k", "qhat_cents",
            "n_test", "n_covered",
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# boosting_two_rounds
# --------------------------------------------------------------------------

_BOOST_ORACLE = """
    WITH base AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mth,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    st AS (SELECT CAST(min(cents) AS BIGINT) AS mn,
                  CAST(max(cents) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS n_tot,
                  CAST(sum(y) AS BIGINT) AS pos_tot,
                  CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS f0
           FROM base),
    h1 AS (SELECT ((cents - mn) * 64) // (mx - mn + 1) AS bin,
                  CAST(count(*) AS BIGINT) AS n1,
                  CAST(sum(y) AS BIGINT) AS p1
           FROM base, st GROUP BY 1),
    c1 AS (SELECT bin,
                  CAST(sum(n1) OVER (ORDER BY bin) AS BIGINT) AS nl,
                  CAST(sum(p1) OVER (ORDER BY bin) AS BIGINT) AS pl
           FROM h1),
    cand1 AS (
      SELECT bin, nl, pl,
             pl * 1000000 - nl * st.f0 AS sl,
             (st.pos_tot - pl) * 1000000 - (st.n_tot - nl) * st.f0 AS sr,
             st.n_tot - nl AS nr, st.mn, st.mx, st.n_tot, st.f0
      FROM c1, st WHERE nl > 0 AND nl < st.n_tot
    ),
    best1 AS (
      SELECT * FROM (
        SELECT cand1.*, row_number() OVER (ORDER BY
                 CAST(sl AS DOUBLE) * sl / nl
                 + CAST(sr AS DOUBLE) * sr / nr DESC, bin) AS rn
        FROM cand1
      ) WHERE rn = 1
    ),
    b1 AS (
      SELECT mn + ((bin + 1) * (mx - mn + 1)) // 64 - 1 AS split_upper1,
             nl AS nl1, nr AS nr1,
             sl // nl AS gl1, sr // nr AS gr1, n_tot, f0
      FROM best1
    ),
    h2 AS (
      SELECT base.mth,
             CAST(count(*) AS BIGINT) AS n2,
             CAST(sum(base.y) AS BIGINT) AS p2,
             CAST(sum(CASE WHEN base.cents <= b1.split_upper1
                           THEN 1 ELSE 0 END) AS BIGINT) AS a2
      FROM base, b1 GROUP BY base.mth
    ),
    s2 AS (
      SELECT h2.mth, h2.n2,
             h2.p2 * 1000000 - h2.n2 * b1.f0
               - h2.a2 * b1.gl1 - (h2.n2 - h2.a2) * b1.gr1 AS sb
      FROM h2, b1
    ),
    c2 AS (SELECT mth,
                  CAST(sum(n2) OVER (ORDER BY mth) AS BIGINT) AS nl,
                  CAST(sum(sb) OVER (ORDER BY mth) AS BIGINT) AS sl
           FROM s2),
    tot2 AS (SELECT CAST(sum(sb) AS BIGINT) AS s_all FROM s2),
    cand2 AS (
      SELECT c2.mth, c2.nl, c2.sl,
             tot2.s_all - c2.sl AS sr, b1.n_tot - c2.nl AS nr
      FROM c2, tot2, b1 WHERE c2.nl > 0 AND c2.nl < b1.n_tot
    ),
    best2 AS (
      SELECT * FROM (
        SELECT cand2.*, row_number() OVER (ORDER BY
                 CAST(sl AS DOUBLE) * sl / nl
                 + CAST(sr AS DOUBLE) * sr / nr DESC, mth) AS rn
        FROM cand2
      ) WHERE rn = 1
    )
    SELECT CAST(1 AS BIGINT) AS round, 'total_cents' AS feature,
           b1.split_upper1 AS split_upper, b1.nl1 AS n_left,
           b1.nr1 AS n_right, b1.gl1 AS gamma_left_micro,
           b1.gr1 AS gamma_right_micro, b1.f0 AS f0_micro
    FROM b1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'order_month', best2.mth, best2.nl,
           best2.nr, best2.sl // best2.nl, best2.sr // best2.nr, b1.f0
    FROM best2, b1
    ORDER BY round
"""


@register(
    "boosting_two_rounds",
    oracle=_BOOST_ORACLE,
    doc="two rounds of L2 gradient boosting (Friedman's least-squares "
    "boosting on the URGENT label): round 1 fits a histogram stump "
    "on the exact-cents total, round 2 fits a stump on the order "
    "month against the UPDATED residuals. The key exactness trick: "
    "after k rounds the residual takes finitely many values (y x "
    "leaf-path), so every per-bin residual SUM derives exactly from "
    "indicator counts (p*1e6 - n*f0 - a*gammaL - (n-a)*gammaR) — no "
    "float accumulates, ever. SSE split scores (SL^2/nL + SR^2/nR) "
    "are deterministic doubles of exact BIGINTs used only for the "
    "argmax; leaf values are truncating integer division (SQL DIV "
    "semantics in both engines, exact on negative sums too). Scale: "
    "each round is ONE 64-or-12-bin histogram groupBy over the "
    "facts plus a bin-bounded scan — the LightGBM per-round cost "
    "shape; the trajectory (split, leaf values per round) is the "
    "output, as a model store would persist it.",
)
def boosting_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _t(spark, sf_dir, "orders").select(
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.expr("CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT)").alias(
            "mth"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    st = base.agg(
        F.min("cents").cast("bigint").alias("mn"),
        F.max("cents").cast("bigint").alias("mx"),
        F.count("*").cast("bigint").alias("n_tot"),
        F.sum("y").cast("bigint").alias("pos_tot"),
        F.expr("CAST(sum(y) AS BIGINT) * 1000000 DIV count(*)").alias("f0"),
    )
    h1 = (
        base.crossJoin(F.broadcast(st))
        .select(
            F.expr("((cents - mn) * 64) DIV (mx - mn + 1)").alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n1"),
            F.sum("y").cast("bigint").alias("p1"),
        )
    )
    w_bin = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c1 = h1.select(
        "bin",
        F.sum("n1").over(w_bin).cast("bigint").alias("nl"),
        F.sum("p1").over(w_bin).cast("bigint").alias("pl"),
    )
    cand1 = (
        c1.crossJoin(F.broadcast(st))
        .filter((F.col("nl") > 0) & (F.col("nl") < F.col("n_tot")))
        .select(
            "bin",
            "nl",
            F.expr("pl * 1000000 - nl * f0").alias("sl"),
            F.expr(
                "(pos_tot - pl) * 1000000 - (n_tot - nl) * f0"
            ).alias("sr"),
            (F.col("n_tot") - F.col("nl")).alias("nr"),
            "mn",
            "mx",
            "n_tot",
            "f0",
        )
    )
    w_score = Window.orderBy(
        F.expr(
            "CAST(sl AS DOUBLE) * sl / nl + CAST(sr AS DOUBLE) * sr / nr"
        ).desc(),
        F.col("bin"),
    )
    b1 = (
        cand1.withColumn("rn", F.row_number().over(w_score))
        .filter(F.col("rn") == 1)
        .select(
            F.expr("mn + ((bin + 1) * (mx - mn + 1)) DIV 64 - 1").alias(
                "split_upper1"
            ),
            F.col("nl").alias("nl1"),
            F.col("nr").alias("nr1"),
            F.expr("sl DIV nl").alias("gl1"),
            F.expr("sr DIV nr").alias("gr1"),
            "n_tot",
            "f0",
        )
    )
    h2 = (
        base.crossJoin(F.broadcast(b1))
        .groupBy("mth")
        .agg(
            F.count("*").cast("bigint").alias("n2"),
            F.sum("y").cast("bigint").alias("p2"),
            F.sum(
                F.when(F.col("cents") <= F.col("split_upper1"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("a2"),
        )
    )
    s2 = h2.crossJoin(F.broadcast(b1)).select(
        "mth",
        "n2",
        F.expr(
            "p2 * 1000000 - n2 * f0 - a2 * gl1 - (n2 - a2) * gr1"
        ).alias("sb"),
    )
    w_mth = Window.orderBy("mth").rowsBetween(Window.unboundedPreceding, 0)
    c2 = s2.select(
        "mth",
        F.sum("n2").over(w_mth).cast("bigint").alias("nl"),
        F.sum("sb").over(w_mth).cast("bigint").alias("sl"),
    )
    tot2 = s2.agg(F.sum("sb").cast("bigint").alias("s_all"))
    cand2 = (
        c2.crossJoin(F.broadcast(tot2))
        .crossJoin(F.broadcast(b1.select("n_tot", "f0")))
        .filter((F.col("nl") > 0) & (F.col("nl") < F.col("n_tot")))
        .select(
            "mth",
            "nl",
            "sl",
            (F.col("s_all") - F.col("sl")).alias("sr"),
            (F.col("n_tot") - F.col("nl")).alias("nr"),
            "f0",
        )
    )
    w_score2 = Window.orderBy(
        F.expr(
            "CAST(sl AS DOUBLE) * sl / nl + CAST(sr AS DOUBLE) * sr / nr"
        ).desc(),
        F.col("mth"),
    )
    b2 = (
        cand2.withColumn("rn", F.row_number().over(w_score2))
        .filter(F.col("rn") == 1)
        .select(
            F.lit(2).cast("bigint").alias("round"),
            F.lit("order_month").alias("feature"),
            F.col("mth").alias("split_upper"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.expr("sl DIV nl").alias("gamma_left_micro"),
            F.expr("sr DIV nr").alias("gamma_right_micro"),
            F.col("f0").alias("f0_micro"),
        )
    )
    r1 = b1.select(
        F.lit(1).cast("bigint").alias("round"),
        F.lit("total_cents").alias("feature"),
        F.col("split_upper1").alias("split_upper"),
        F.col("nl1").alias("n_left"),
        F.col("nr1").alias("n_right"),
        F.col("gl1").alias("gamma_left_micro"),
        F.col("gr1").alias("gamma_right_micro"),
        F.col("f0").alias("f0_micro"),
    )
    return r1.unionByName(b2).orderBy("round")


# --------------------------------------------------------------------------
# logistic_hashed_first_step
# --------------------------------------------------------------------------

_LH_BUCKETS = 32
_LH_LN2_MICRO = 693147  # floor(ln(2)*1e6 + 0.5), folded in Python


def _lh_oracle() -> str:
    ph = PT.poly_hash("fs", D)
    return f"""
    WITH j AS (
      SELECT o.o_orderkey AS rid,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
             c.c_mktsegment AS seg, CAST(c.c_nationkey AS VARCHAR) AS nat,
             o.o_orderstatus AS st,
             CAST(month(CAST(o.o_orderdate AS DATE)) AS VARCHAR) AS mo
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    feats AS (
      SELECT rid, y, f.fs FROM j, unnest([
        'seg=' || seg, 'nat=' || nat, 'st=' || st, 'mo=' || mo
      ]) AS f(fs)
    ),
    dim AS (
      SELECT fs, ({ph}) % {_LH_BUCKETS} AS bucket
      FROM (SELECT DISTINCT fs FROM feats)
    ),
    fb AS (SELECT feats.rid, feats.y, dim.bucket
           FROM feats JOIN dim ON dim.fs = feats.fs),
    g AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS pos
      FROM fb GROUP BY bucket
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
    w1 AS (
      SELECT bucket, cnt, pos, cnt - 2 * pos AS grad_half,
             ((2 * pos - cnt) * 1000000) // (2 * nn.n) AS w1_micro
      FROM g, nn
    ),
    z AS (
      SELECT fb.rid, max(fb.y) AS y,
             CAST(sum(w1.w1_micro) AS BIGINT) AS z_micro
      FROM fb JOIN w1 ON w1.bucket = fb.bucket GROUP BY fb.rid
    ),
    loss AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) * {_LH_LN2_MICRO}
               AS loss_before_total_micro,
             CAST(sum(CAST(floor(ln(1.0 + exp(
               CASE WHEN y = 1 THEN -CAST(z_micro AS DOUBLE) / 1000000.0
                    ELSE CAST(z_micro AS DOUBLE) / 1000000.0 END))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS loss_after_total_micro
      FROM z
    )
    SELECT w1.bucket, w1.cnt, w1.pos, w1.grad_half, w1.w1_micro,
           loss.n_rows, loss.loss_before_total_micro,
           loss.loss_after_total_micro
    FROM w1 CROSS JOIN loss
    ORDER BY w1.bucket
    """


@register(
    "logistic_hashed_first_step",
    oracle=_lh_oracle(),
    doc="the hashing-trick linear model, first training step, exact: "
    "four categorical features (segment, nation, status, month) "
    "hash into 32 shared buckets via the portable polynomial hash — "
    "collisions are KEPT, that is the point of feature hashing — "
    "and the first logistic gradient step from w=0 is closed-form "
    "exact because sigmoid(0)=1/2 makes each bucket's gradient the "
    "half-integer cnt-2*pos; w1 = -grad/32 lands as one truncating "
    "integer division (SQL DIV in both engines). The NLL audit: "
    "before = N*ln(2) folded to micro-literals, after = per-row "
    "ln(1+exp(-margin)) snapped to micro BEFORE the exact BIGINT "
    "sum (the lm_perplexity per-row convention). Scale: the hash "
    "runs on the DOMAIN-bounded distinct-value table (45 strings, "
    "broadcast), never per row — the bootstrap HOF-lambda lesson; "
    "the two fact-scale passes are one explode-groupBy and one "
    "margin groupBy by row key.",
)
def logistic_hashed_first_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _LH_BUCKETS
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("rid"),
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
        F.col("o_orderstatus").alias("st"),
        F.expr("CAST(month(CAST(o_orderdate AS DATE)) AS STRING)").alias(
            "mo"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("string").alias("nat"),
    )
    j = o.join(c, o.o_custkey == c.c_custkey)
    feats = j.select(
        "rid",
        "y",
        F.explode(
            F.array(
                F.concat(F.lit("seg="), F.col("seg")),
                F.concat(F.lit("nat="), F.col("nat")),
                F.concat(F.lit("st="), F.col("st")),
                F.concat(F.lit("mo="), F.col("mo")),
            )
        ).alias("fs"),
    )
    dim = feats.select("fs").distinct().select(
        "fs",
        (F.expr(PT.poly_hash("fs", S)) % B).alias("bucket"),
    )
    fb = feats.join(F.broadcast(dim), "fs").select("rid", "y", "bucket")
    g = fb.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    nn = j.agg(F.count("*").cast("bigint").alias("n"))
    w1 = g.crossJoin(F.broadcast(nn)).select(
        "bucket",
        "cnt",
        "pos",
        (F.col("cnt") - 2 * F.col("pos")).alias("grad_half"),
        F.expr("((2 * pos - cnt) * 1000000) DIV (2 * n)").alias("w1_micro"),
    )
    z = (
        fb.join(F.broadcast(w1.select("bucket", "w1_micro")), "bucket")
        .groupBy("rid")
        .agg(
            F.max("y").alias("y"),
            F.sum("w1_micro").cast("bigint").alias("z_micro"),
        )
    )
    loss = z.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.count("*").cast("bigint") * _LH_LN2_MICRO).alias(
            "loss_before_total_micro"
        ),
        F.sum(
            F.expr(
                "CAST(floor(ln(1.0 + exp("
                "CASE WHEN y = 1 THEN -CAST(z_micro AS DOUBLE) / 1000000.0"
                " ELSE CAST(z_micro AS DOUBLE) / 1000000.0 END))"
                " * 1000000.0 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("loss_after_total_micro"),
    )
    return (
        w1.crossJoin(F.broadcast(loss))
        .select(
            "bucket",
            "cnt",
            "pos",
            "grad_half",
            "w1_micro",
            "n_rows",
            "loss_before_total_micro",
            "loss_after_total_micro",
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# cf_holdout_hitrate
# --------------------------------------------------------------------------

_CF_EVAL_USERS = 100
_CF_NBRS = 20
_CF_RR = " ".join(
    f"WHEN {r} THEN {round(1_000_000 / r)}" for r in range(1, 11)
)
_CF_RR_CASE = f"CASE hit_rank {_CF_RR} ELSE 0 END"


@register(
    "cf_holdout_hitrate",
    oracle=f"""
    WITH up AS (
      SELECT o.o_custkey AS u, l.l_partkey AS p,
             max(o.o_orderdate) AS d_p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    eligible AS (
      SELECT u FROM up GROUP BY u HAVING count(*) >= 2
    ),
    panel AS (
      SELECT u FROM eligible ORDER BY u LIMIT {_CF_EVAL_USERS}
    ),
    holdout AS (
      SELECT u, p AS h FROM (
        SELECT up.u, up.p,
               row_number() OVER (PARTITION BY up.u
                                  ORDER BY up.d_p DESC, up.p DESC) AS rn
        FROM up JOIN panel USING (u)) t
      WHERE rn = 1
    ),
    train AS (
      SELECT up.u, up.p FROM up
      LEFT JOIN holdout ho ON ho.u = up.u AND ho.h = up.p
      WHERE ho.u IS NULL
    ),
    ic AS (SELECT p, CAST(count(*) AS BIGINT) AS nu FROM train GROUP BY p),
    cooc AS (
      SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c
      FROM train a JOIN train b ON b.u = a.u AND b.p <> a.p
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT pa, pb, cos_micro FROM (
        SELECT cooc.pa, cooc.pb,
               CAST(floor(cooc.c * 1000000.0
                          / sqrt(CAST(ia.nu AS DOUBLE) * ib.nu) + 0.5)
                    AS BIGINT) AS cos_micro,
               row_number() OVER (PARTITION BY cooc.pa
                 ORDER BY CAST(floor(cooc.c * 1000000.0
                   / sqrt(CAST(ia.nu AS DOUBLE) * ib.nu) + 0.5) AS BIGINT)
                   DESC, cooc.pb) AS rk
        FROM cooc JOIN ic ia ON ia.p = cooc.pa
        JOIN ic ib ON ib.p = cooc.pb) t
      WHERE rk <= {_CF_NBRS}
    ),
    basket AS (
      SELECT t.u, t.p FROM train t JOIN panel USING (u)
    ),
    cand AS (
      SELECT b.u, s.pb AS c, CAST(sum(s.cos_micro) AS BIGINT) AS score
      FROM basket b JOIN sim s ON s.pa = b.p
      WHERE NOT EXISTS (
        SELECT 1 FROM train t2 WHERE t2.u = b.u AND t2.p = s.pb
      )
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT u, c, row_number() OVER (PARTITION BY u
               ORDER BY score DESC, c) AS rk
      FROM cand
    ),
    bsize AS (
      SELECT u, CAST(count(*) AS BIGINT) AS n_train_parts
      FROM basket GROUP BY u
    ),
    hitting AS (
      SELECT ho.u, bs.n_train_parts,
             CAST(coalesce(min(CASE WHEN r.c = ho.h THEN r.rk END), 0)
                  AS BIGINT) AS hit_rank,
             CAST(coalesce(max(r.rk), 0) AS BIGINT) AS n_candidates
      FROM holdout ho
      JOIN bsize bs ON bs.u = ho.u
      LEFT JOIN ranked r ON r.u = ho.u
      GROUP BY ho.u, bs.n_train_parts
    )
    SELECT u, n_train_parts, n_candidates, hit_rank,
           CAST({_CF_RR_CASE} AS BIGINT) AS rr_micro
    FROM hitting ORDER BY u
    """,
    doc="leave-last-out recommender evaluation of the item-item CF "
    "family: for a deterministic 100-user panel (smallest custkeys "
    "with >= 2 distinct parts), hold out each user's most recent "
    "part ((max orderdate, part) total order), rebuild the "
    "co-occurrence cosine similarity table on the REMAINING pairs "
    "(no leakage of the held-out interaction), recommend by summed "
    "neighbor cosine over the user's training basket (candidates "
    "outside the basket, 20 neighbors per anchor), and report PER "
    "USER the held-out part's full rank (0 = not reachable through "
    "any neighbor list), candidate-set size, and the rank<=10 "
    "reciprocal-rank micro credit (literal table) — hit@k and MRR "
    "are one aggregation away, and the per-user ranks keep the "
    "gate hash discriminative even on this co-purchase-free "
    "synthetic data (an aggregate would collapse to zeros).  Every "
    "cosine is the one-sqrt-of-integer-product micro "
    "snap; scores are exact BIGINT sums, so rankings are total-"
    "ordered.  Scale: the cooc build is the basket^2 fan-out "
    "(sum over users of basket size squared — bounded by basket "
    "caps in production); the panel side is 100-user bounded.",
)
def cf_holdout_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    up = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .agg(F.max("o_orderdate").alias("d_p"))
    )
    from ..session import barrier

    up = barrier(up)
    panel = (
        up.groupBy("u")
        .agg(F.count("*").alias("np"))
        .filter(F.col("np") >= 2)
        .select("u")
        .orderBy("u")
        .limit(_CF_EVAL_USERS)
    )
    w_h = Window.partitionBy("u").orderBy(
        F.col("d_p").desc(), F.col("p").desc()
    )
    holdout = (
        up.join(F.broadcast(panel), "u")
        .withColumn("rn", F.row_number().over(w_h))
        .filter(F.col("rn") == 1)
        .select("u", F.col("p").alias("h"))
    )
    train = up.select("u", "p").join(
        holdout.select("u", F.col("h").alias("p")), ["u", "p"], "left_anti"
    )
    train = barrier(train)
    ic = train.groupBy("p").agg(F.count("*").cast("bigint").alias("nu"))
    a = train.select("u", F.col("p").alias("pa"))
    b = train.select("u", F.col("p").alias("pb"))
    cooc = (
        a.join(b, "u")
        .filter(F.col("pb") != F.col("pa"))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    sim = (
        cooc.join(ic.select(F.col("p").alias("pa"), F.col("nu").alias("na")), "pa")
        .join(ic.select(F.col("p").alias("pb"), F.col("nu").alias("nb")), "pb")
        .select(
            "pa",
            "pb",
            F.expr(
                "CAST(floor(c * 1000000.0"
                " / sqrt(CAST(na AS DOUBLE) * nb) + 0.5) AS BIGINT)"
            ).alias("cos_micro"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("pa").orderBy(
                    F.desc("cos_micro"), "pb"
                )
            ),
        )
        .filter(F.col("rk") <= _CF_NBRS)
        .select("pa", "pb", "cos_micro")
    )
    basket = train.join(F.broadcast(panel), "u")
    cand = (
        basket.join(sim, basket.p == sim.pa)
        .select("u", F.col("pb").alias("c"), "cos_micro")
        .join(
            train.select("u", F.col("p").alias("c")),
            ["u", "c"],
            "left_anti",
        )
        .groupBy("u", "c")
        .agg(F.sum("cos_micro").cast("bigint").alias("score"))
    )
    ranked = cand.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("u").orderBy(F.desc("score"), "c")
        ),
    )
    bsize = basket.groupBy("u").agg(
        F.count("*").cast("bigint").alias("n_train_parts")
    )
    joined = holdout.join(F.broadcast(bsize), "u").join(
        ranked.select(F.col("u").alias("ru"), "c", "rk"),
        (holdout.u == F.col("ru")),
        "left",
    )
    hitting = joined.groupBy("u", "n_train_parts").agg(
        F.coalesce(
            F.min(F.when(F.col("c") == F.col("h"), F.col("rk"))), F.lit(0)
        )
        .cast("bigint")
        .alias("hit_rank"),
        F.coalesce(F.max("rk"), F.lit(0)).cast("bigint").alias(
            "n_candidates"
        ),
    )
    return hitting.select(
        "u",
        "n_train_parts",
        "n_candidates",
        "hit_rank",
        F.expr(_CF_RR_CASE).cast("bigint").alias("rr_micro"),
    ).orderBy("u")


# --------------------------------------------------------------------------
# logistic_gd_two_steps (round 10): actually-ITERATIVE in-plan training
# — two full batch gradient-descent steps with a per-row snapped
# sigmoid, the multi-pass extension of logistic_hashed_first_step
# (whose single step from w=0 needs no sigmoid: p is exactly 1/2).
# --------------------------------------------------------------------------

#: learning rate 0.5 folded as the /2.0 in the update; features are
#: small exact ints so two steps move the weights visibly.
_GD_FEATS = (
    ("f0", "CAST(1 AS BIGINT)"),
    ("f1", "least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 5)"),
    ("f2", "CAST(year(CAST(o_orderdate AS DATE)) - 1995 AS BIGINT)"),
)
_GD_Y = "CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS BIGINT)"


def _gd_margin(w: list[int]) -> str:
    return " + ".join(f"({wj} * {name})" for wj, (name, _) in zip(w, _GD_FEATS))


def _gd_p_micro(w: list[int]) -> str:
    return (
        f"CAST(floor(1000000.0 / (1.0 + exp(-(CAST({_gd_margin(w)} AS DOUBLE)"
        f" / 1000000.0))) + 0.5) AS BIGINT)"
    )


def _gd_correct(w: list[int]) -> str:
    m = _gd_margin(w)
    return (
        f"sum(CASE WHEN (({m}) > 0 AND y = 1) OR (({m}) <= 0 AND y = 0) "
        f"THEN 1 ELSE 0 END)"
    )


@register(
    "logistic_gd_two_steps",
    oracle=f"""
    WITH f AS (
      SELECT {", ".join(f"{expr} AS {name}" for name, expr in _GD_FEATS)},
             {_GD_Y} AS y
      FROM orders
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
    g1 AS (
      SELECT {", ".join(
          f"CAST(sum({name} * (y * 1000000 - 500000)) AS BIGINT) AS g{j}"
          for j, (name, _) in enumerate(_GD_FEATS))}
      FROM f
    ),
    w1 AS (
      SELECT {", ".join(
          f"CAST(floor(((CAST(g{j} AS DOUBLE) / nn.n) / 2.0) + 0.5)"
          f" AS BIGINT) AS w{j}"
          for j in range(len(_GD_FEATS)))}
      FROM g1, nn
    ),
    s2 AS (
      SELECT f.*, w1.*,
             CAST(floor(1000000.0 / (1.0 + exp(-(CAST(
               w1.w0 * f.f0 + w1.w1 * f.f1 + w1.w2 * f.f2
             AS DOUBLE) / 1000000.0))) + 0.5) AS BIGINT) AS p
      FROM f CROSS JOIN w1
    ),
    pass2 AS (
      SELECT {", ".join(
          f"CAST(sum(f{j} * (y * 1000000 - p)) AS BIGINT) AS g{j}"
          for j in range(len(_GD_FEATS)))},
             CAST(sum(CASE WHEN ((w0 * f0 + w1 * f1 + w2 * f2) > 0
                                 AND y = 1)
                           OR ((w0 * f0 + w1 * f1 + w2 * f2) <= 0
                                 AND y = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS correct1
      FROM s2
    ),
    w2 AS (
      SELECT {", ".join(
          f"w1.w{j} + CAST(floor(((CAST(pass2.g{j} AS DOUBLE) / nn.n)"
          f" / 2.0) + 0.5) AS BIGINT) AS w{j}"
          for j in range(len(_GD_FEATS)))}
      FROM w1, pass2, nn
    ),
    acc2 AS (
      SELECT CAST(sum(CASE WHEN ((w2.w0 * f.f0 + w2.w1 * f.f1
                                  + w2.w2 * f.f2) > 0 AND f.y = 1)
                           OR ((w2.w0 * f.f0 + w2.w1 * f.f1
                                  + w2.w2 * f.f2) <= 0 AND f.y = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS correct2
      FROM f CROSS JOIN w2
    )
    SELECT CAST(1 AS BIGINT) AS step, w1.w0, w1.w1 AS w1_, w1.w2 AS w2_,
           pass2.correct1 * 1000 // nn.n AS acc_milli
    FROM w1, pass2, nn
    UNION ALL
    SELECT CAST(2 AS BIGINT), w2.w0, w2.w1, w2.w2,
           acc2.correct2 * 1000 // nn.n
    FROM w2, acc2, nn
    ORDER BY step
    """,
    doc="two full batch gradient-descent steps of logistic regression "
    "trained in-plan (lr 1/2, log-loss) — the genuinely ITERATIVE "
    "training shape: step 1 from w=0 needs no transcendental (sigmoid "
    "of zero is exactly 500000 micro), step 2 evaluates the sigmoid "
    "per row against the step-1 weights — one exp per row per "
    "subsequent step, applied to an exact-integer-derived double and "
    "micro-snapped (the logistic_hashed_first_step loss convention), "
    "so gradients are exact BIGINT sums of (y*1e6 - p_micro) "
    "products and weight updates snap once per step per coordinate "
    "(floor((G/n)/2 + 0.5) on bit-identical doubles).  Output: "
    "weights + train accuracy after each step — the learning-curve "
    "row pair a trainer reports.  Oracle: the SAME two steps unrolled as "
    "SQL CTEs — no literals, DuckDB re-derives the weights from "
    "scratch, the strongest oracle form for a trainer.  Scale: one "
    "count + one aggregation pass per step + one accuracy pass, "
    "every pass a map-side fold to a 1-row result; weights are "
    "driver-side scalars (the bpe/mmr driver-loop convention).",
)
def logistic_gd_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    o = _t(spark, sf_dir, "orders")
    f = o.select(
        *[F.expr(expr).alias(name) for name, expr in _GD_FEATS],
        F.expr(_GD_Y).alias("y"),
    )
    n = f.count()
    d = len(_GD_FEATS)
    w = [0] * d
    rows = []
    for step in (1, 2):
        p = _gd_p_micro(w)
        agg = f.agg(
            *[
                F.expr(
                    f"CAST(sum({name} * (y * 1000000 - {p})) AS BIGINT)"
                ).alias(f"g{j}")
                for j, (name, _) in enumerate(_GD_FEATS)
            ],
        ).collect()[0]
        w = [
            w[j]
            + int(
                math.floor(
                    ((float(int(agg[f"g{j}"])) / float(n)) / 2.0) + 0.5
                )
            )
            for j in range(d)
        ]
        correct = f.agg(
            F.expr(f"CAST({_gd_correct(w)} AS BIGINT)").alias("c")
        ).collect()[0].c
        rows.append((step, w[0], w[1], w[2], int(correct) * 1000 // n))
    return spark.createDataFrame(
        rows, "step bigint, w0 bigint, w1_ bigint, w2_ bigint, acc_milli bigint"
    ).orderBy("step")
