"""Driver queries: privacy-audit and data-profiling operators
(round 8) — the release-readiness layer a dataset platform runs
before shipping a corpus (what Deequ/Great Expectations profile, what
a privacy review audits).  Exactly four families, each implemented
and registered in this module:

- k_anonymity_audit          — equivalence-class size audit of a
  quasi-identifier tuple at the standard k thresholds (2/5/10/25):
  how many classes, and how many ROWS, sit below each k.
- l_diversity_audit          — distinct-sensitive-value histogram of
  the QI classes (distinct order priorities per (segment, nation)
  class): the l-diversity complement to the k audit.
- quantile_normalization_deciles — exact quantile mapping of one
  group's distribution onto a reference group's (the bioinformatics /
  feature-normalization standard), reported at the deciles, computed
  with the band-parallel two-phase rank — never a global sort.
- table_profile_orders       — per-column profile of the orders
  table (null count, distinct count, min/max, modal value) as one
  long-format table; numeric columns profile on exact cents, the
  timestamp on its ISO date string, so every cell is engine-portable.

All counts are exact BIGINTs; the only ratio (pct_rows_micro) is an
exact integer floor-scale.  Deterministic tie-breaks everywhere (the
modal value resolves count ties to the smallest value).

No reference-file citation applies: /root/reference has no
profiling surface; this extends the engine's data_quality analog
(plans/quality_report.py) from pipeline health to release audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import ranks
from ..session import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# k_anonymity_audit
# --------------------------------------------------------------------------

_K_THRESHOLDS = (2, 5, 10, 25)

@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT c_mktsegment AS segment, c_nationkey AS nation,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) // 100000
               AS bal_band
      FROM customer
    ),
    cls AS (SELECT segment, nation, bal_band,
                   CAST(count(*) AS BIGINT) AS sz
            FROM qi GROUP BY segment, nation, bal_band),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(sum(sz) AS BIGINT) AS n_rows FROM cls),
    ks AS (SELECT CAST(g.x AS BIGINT) AS k
           FROM unnest([{", ".join(str(k) for k in _K_THRESHOLDS)}]) AS g(x))
    SELECT ks.k, tot.n_classes,
           CAST(count(*) FILTER (WHERE cls.sz < ks.k) AS BIGINT)
             AS n_classes_below,
           CAST(coalesce(sum(cls.sz) FILTER (WHERE cls.sz < ks.k), 0)
                AS BIGINT) AS n_rows_below,
           CAST(coalesce(sum(cls.sz) FILTER (WHERE cls.sz < ks.k), 0)
                AS BIGINT) * 1000000 // tot.n_rows AS pct_rows_micro
    FROM ks CROSS JOIN tot CROSS JOIN cls
    GROUP BY ks.k, tot.n_classes, tot.n_rows
    ORDER BY ks.k
    """,
    doc="k-anonymity audit of the (segment, nation, $1000-balance-"
    "band) quasi-identifier tuple over customers: for each standard "
    "re-identification threshold k in (2,5,10,25), the number of "
    "equivalence classes below k and the number of ROWS those "
    "classes expose (the quantity a privacy review actually signs "
    "off on), with the exposed-row fraction in exact micro-units. "
    "Scale: one groupBy builds the class-size table (map-side "
    "combine; cardinality bounded by the QI domain, not the corpus); "
    "the 4-threshold scan is a constant cross join over that "
    "bounded table.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        F.expr(
            "CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) DIV 100000"
        ).alias("bal_band"),
    )
    cls = qi.groupBy("segment", "nation", "bal_band").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    tot = cls.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    )
    ks = spark.range(len(_K_THRESHOLDS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _K_THRESHOLDS]),
            (F.col("id") + 1).cast("int"),
        )
        .cast("bigint")
        .alias("k")
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .crossJoin(cls)
        .groupBy("k", "n_classes", "n_rows")
        .agg(
            F.count(F.when(F.col("sz") < F.col("k"), 1))
            .cast("bigint")
            .alias("n_classes_below"),
            F.coalesce(
                F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_rows_below"),
        )
        .select(
            "k",
            "n_classes",
            "n_classes_below",
            "n_rows_below",
            F.expr("n_rows_below * 1000000 DIV n_rows").alias(
                "pct_rows_micro"
            ),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# l_diversity_audit
# --------------------------------------------------------------------------

@register(
    "l_diversity_audit",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
             o.o_orderpriority AS sensitive
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cls AS (SELECT segment, nation,
                   CAST(count(DISTINCT sensitive) AS BIGINT) AS l,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM j GROUP BY segment, nation)
    SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(n_rows) AS BIGINT) AS n_rows
    FROM cls GROUP BY l ORDER BY l
    """,
    doc="l-diversity audit complementing the k-anonymity check: per "
    "(segment, nation) quasi-identifier class, the number of "
    "DISTINCT sensitive values (order priority) seen, histogrammed "
    "by l — a class with l=1 leaks its members' attribute exactly "
    "even when k is large. One fact-scale join + groupBy; the "
    "histogram is sensitive-domain-bounded (l <= 5).",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("sensitive")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
    )
    cls = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("segment", "nation")
        .agg(
            F.countDistinct("sensitive").cast("bigint").alias("l"),
            F.count("*").cast("bigint").alias("nr"),
        )
    )
    return (
        cls.groupBy("l")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("nr").cast("bigint").alias("n_rows"),
        )
        .orderBy("l")
    )


# --------------------------------------------------------------------------
# quantile_normalization_deciles
# --------------------------------------------------------------------------

@register(
    "quantile_normalization_deciles",
    oracle="""
    WITH a AS (
      SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents,
             c_custkey,
             row_number() OVER (ORDER BY
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT), c_custkey)
               AS rnk
      FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    b AS (
      SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents,
             c_custkey,
             row_number() OVER (ORDER BY
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT), c_custkey)
               AS rnk
      FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    probes AS (
      SELECT CAST(g.x AS BIGINT) AS d,
             (CAST(g.x AS BIGINT) * na.n + 9) // 10 AS a_rank
      FROM unnest(range(1, 11)) AS g(x), na
    ),
    mapped AS (
      SELECT p.d, p.a_rank, a.cents AS a_cents,
             (p.a_rank * nb.n + na.n - 1) // na.n AS b_rank
      FROM probes p JOIN a ON a.rnk = p.a_rank, na, nb
    )
    SELECT m.d, m.a_rank, m.a_cents, m.b_rank, b.cents AS b_cents
    FROM mapped m JOIN b ON b.rnk = m.b_rank
    ORDER BY m.d
    """,
    doc="exact quantile normalization of the BUILDING segment's "
    "account-balance distribution onto AUTOMOBILE's, reported at "
    "the 10 deciles: decile d of A maps to B's value at rank "
    "ceil(rank_A * n_B / n_A) — the microarray/feature-normalization "
    "standard, in exact integer rank arithmetic. Ranks on both "
    "sides come from the band-parallel two-phase rank "
    "(operators/ranks.py, $1000 cent bands) so no global sort ever "
    "materializes; the decile probe table is constant-size and the "
    "rank lookups are broadcast joins against it.",
)
def quantile_normalization_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(
            "CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) DIV 100000"
        ).alias("band"),
    )

    def ranked(segment: str) -> DataFrame:
        return ranks.two_phase_rank(
            cust.filter(F.col("c_mktsegment") == segment).select(
                "cents", "c_custkey", "band"
            ),
            order_cols=["cents", "c_custkey"],
            band_col="band",
            rank_name="rnk",
        )

    a = ranked("BUILDING")
    b = ranked("AUTOMOBILE")
    na = a.agg(F.count("*").cast("bigint").alias("n_a"))
    nb = b.agg(F.count("*").cast("bigint").alias("n_b"))
    probes = (
        spark.range(1, 11)
        .select(F.col("id").cast("bigint").alias("d"))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "d",
            F.expr("(d * n_a + 9) DIV 10").alias("a_rank"),
            "n_a",
            "n_b",
        )
    )
    mapped = (
        a.join(
            F.broadcast(probes), F.col("rnk") == F.col("a_rank"), "inner"
        )
        .select(
            "d",
            "a_rank",
            F.col("cents").alias("a_cents"),
            F.expr("(a_rank * n_b + n_a - 1) DIV n_a").alias("b_rank"),
        )
    )
    return (
        b.join(
            F.broadcast(mapped), F.col("rnk") == F.col("b_rank"), "inner"
        )
        .select(
            "d", "a_rank", "a_cents", "b_rank",
            F.col("cents").alias("b_cents"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# table_profile_orders
# --------------------------------------------------------------------------

def _profile_oracle() -> str:
    cols = [
        ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
        ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_orderpriority", "o_orderpriority"),
        ("total_cents", "CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR)"),
        ("order_date", "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"),
    ]
    blocks = []
    for name, expr in cols:
        blocks.append(f"""
    SELECT '{name}' AS col_name,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(v) AS BIGINT) AS n_null,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           min(v) AS min_repr, max(v) AS max_repr,
           (SELECT v FROM (SELECT {expr} AS v FROM orders) t2
            WHERE v IS NOT NULL GROUP BY v
            ORDER BY count(*) DESC, v LIMIT 1) AS modal_value,
           (SELECT CAST(count(*) AS BIGINT)
            FROM (SELECT {expr} AS v FROM orders) t3
            WHERE v = (SELECT v FROM (SELECT {expr} AS v FROM orders) t4
                       WHERE v IS NOT NULL GROUP BY v
                       ORDER BY count(*) DESC, v LIMIT 1)) AS modal_n
    FROM (SELECT {expr} AS v FROM orders) t1""")
    return " UNION ALL ".join(blocks) + " ORDER BY col_name"


@register(
    "table_profile_orders",
    oracle=_profile_oracle(),
    doc="per-column data profile of the orders table in long format "
    "(the Deequ/Great-Expectations profiling primitive): row count, "
    "null count, exact distinct count, lexicographic min/max of the "
    "portable string representation, and the modal value with its "
    "count (ties resolve to the smallest value). Numeric columns "
    "profile on exact cents and the timestamp on its ISO date "
    "string so every cell is engine-portable; each column is an "
    "independent pruned-scan aggregate (column pruning means each "
    "branch reads ONE parquet column), unioned into the report.",
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        (
            "total_cents",
            F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").cast(
                "string"
            ),
        ),
        ("order_date", F.col("o_orderdate").cast("date").cast("string")),
    ]
    parts = []
    for name, expr in cols:
        v = o.select(expr.alias("v"))
        stats = v.agg(
            F.count("*").cast("bigint").alias("n"),
            (F.count("*") - F.count("v")).cast("bigint").alias("n_null"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.min("v").alias("min_repr"),
            F.max("v").alias("max_repr"),
        )
        modal = (
            v.filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count("*").cast("bigint").alias("modal_n"))
            .orderBy(F.col("modal_n").desc(), F.col("v"))
            .limit(1)
            .select(F.col("v").alias("modal_value"), "modal_n")
        )
        parts.append(
            stats.crossJoin(F.broadcast(modal)).select(
                F.lit(name).alias("col_name"),
                "n",
                "n_null",
                "n_distinct",
                "min_repr",
                "max_repr",
                "modal_value",
                "modal_n",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


# --------------------------------------------------------------------------
# constraint_check_suite (round 8: declarative data-quality contract)
# --------------------------------------------------------------------------

@register(
    "constraint_check_suite",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS check_name, 'orders' AS table_name,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS violations
      FROM orders
      UNION ALL
      SELECT 'lineitem_fk_orders', 'lineitem',
             CAST(count(*) AS BIGINT)
      FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'orders_fk_customer', 'orders',
             CAST(count(*) AS BIGINT)
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'orderstatus_domain', 'orders',
             CAST(count(*) FILTER (WHERE o_orderstatus NOT IN
               ('O', 'F', 'P')) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'discount_range', 'lineitem',
             CAST(count(*) FILTER (WHERE l_discount < 0
               OR l_discount > 0.1) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'quantity_positive', 'lineitem',
             CAST(count(*) FILTER (WHERE l_quantity IS NULL
               OR l_quantity <= 0) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'events_value_nonnull', 'events',
             CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'documents_text_nonempty', 'documents',
             CAST(count(*) FILTER (WHERE text IS NULL
               OR length(text) = 0) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'totalprice_positive', 'orders',
             CAST(count(*) FILTER (WHERE o_totalprice IS NULL
               OR o_totalprice <= 0) AS BIGINT)
      FROM orders
    ) t
    ORDER BY check_name
    """,
    doc="declarative data-quality contract, Deequ/Great-Expectations "
    "style — the generalization of the reference's data_quality "
    "module from one hard-wired report to a CHECK SUITE: primary-key "
    "uniqueness (count minus countDistinct, never a self-join), "
    "referential integrity as LEFT-ANTI probe counts "
    "(lineitem->orders, orders->customer), domain membership, range "
    "and non-null checks — one row per check with its exact BIGINT "
    "violation count (0 = pass; the driver hash certifies the whole "
    "contract at once).  Scale: every check is one aggregate over "
    "its table — the anti-joins broadcast the key side when small "
    "and shuffle-hash otherwise; no check materializes violating "
    "rows (drill-down is a follow-up filter).",
)
def constraint_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents")

    def row(name: str, table: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.lit(table).alias("table_name"),
            F.col("violations").cast("bigint").alias("violations"),
        )

    checks = [
        row(
            "orders_pk_unique",
            "orders",
            o.agg(
                (F.count("*") - F.countDistinct("o_orderkey")).alias(
                    "violations"
                )
            ),
        ),
        row(
            "lineitem_fk_orders",
            "lineitem",
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        row(
            "orders_fk_customer",
            "orders",
            o.join(
                c.select("c_custkey"),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count("*").alias("violations")),
        ),
        row(
            "orderstatus_domain",
            "orders",
            o.agg(
                F.count(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
                ).alias("violations")
            ),
        ),
        row(
            "discount_range",
            "lineitem",
            li.agg(
                F.count(
                    F.when(
                        (F.col("l_discount") < 0)
                        | (F.col("l_discount") > 0.1),
                        1,
                    )
                ).alias("violations")
            ),
        ),
        row(
            "quantity_positive",
            "lineitem",
            li.agg(
                F.count(
                    F.when(
                        F.col("l_quantity").isNull()
                        | (F.col("l_quantity") <= 0),
                        1,
                    )
                ).alias("violations")
            ),
        ),
        row(
            "events_value_nonnull",
            "events",
            ev.agg(
                F.count(F.when(F.col("value").isNull(), 1)).alias(
                    "violations"
                )
            ),
        ),
        row(
            "documents_text_nonempty",
            "documents",
            docs.agg(
                F.count(
                    F.when(
                        F.col("text").isNull()
                        | (F.length("text") == 0),
                        1,
                    )
                ).alias("violations")
            ),
        ),
        row(
            "totalprice_positive",
            "orders",
            o.agg(
                F.count(
                    F.when(
                        F.col("o_totalprice").isNull()
                        | (F.col("o_totalprice") <= 0),
                        1,
                    )
                ).alias("violations")
            ),
        ),
    ]
    out = checks[0]
    for ck in checks[1:]:
        out = out.unionAll(ck)
    return out.orderBy("check_name")


# --------------------------------------------------------------------------
# dp_noise_calibration (round 10): the geometric-mechanism release
# audit — what each eps does to THIS table's counts, under a fixed
# evaluation seed.  Completes the privacy family: k_anonymity /
# l_diversity AUDIT exposure; this calibrates the RELEASE.
# --------------------------------------------------------------------------

_DP_EPS_MILLI = (100, 500, 1000)


def _dp_noise_sql(dialect: str) -> str:
    """noise = G1 - G2, G = floor(ln(1-u) / -eps) — the two-sided
    geometric (discrete Laplace) mechanism.  u comes from the
    portable polynomial hash of (segment, eps, leg) — a FIXED
    evaluation seed so both engines draw the same noise: this
    calibrates magnitudes (the eps-picking audit); a production
    release swaps the hash for real entropy, same algebra."""
    from ..functions import portable as PTT

    def u(leg: int) -> str:
        cat = (
            f"concat(segment, '#', CAST(eps_milli AS STRING), '#{leg}')"
            if dialect == PTT.SPARK
            else f"segment || '#' || CAST(eps_milli AS VARCHAR) || '#{leg}'"
        )
        return f"(CAST(({PTT.poly_hash(cat, dialect)}) AS DOUBLE) / {PTT.P}.0)"

    def g(leg: int) -> str:
        return (
            f"CAST(floor(ln(1.0 - {u(leg)})"
            f" / (-(CAST(eps_milli AS DOUBLE) / 1000.0))) AS BIGINT)"
        )

    return f"(({g(1)}) - ({g(2)}))"


@register(
    "dp_noise_calibration",
    oracle=f"""
    WITH h AS (
      SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS true_n
      FROM customer GROUP BY 1
    ),
    e AS (SELECT CAST(g.x AS BIGINT) AS eps_milli
          FROM unnest([{", ".join(str(e) for e in _DP_EPS_MILLI)}]) AS g(x)),
    n AS (
      SELECT e.eps_milli, h.segment, h.true_n,
             {_dp_noise_sql("duckdb")} AS noise
      FROM e CROSS JOIN h
    )
    SELECT eps_milli, segment, true_n,
           CAST(true_n + noise AS BIGINT) AS released_n,
           CAST(abs(noise) AS BIGINT) AS abs_err
    FROM n ORDER BY eps_milli, segment
    """,
    doc="differential-privacy noise calibration for a histogram "
    "release (the two-sided geometric / discrete-Laplace mechanism, "
    "Ghosh-Roughgarden-Sundararajan 2009): for each candidate eps "
    "(0.1 / 0.5 / 1.0), draw per-cell noise G1 - G2 with "
    "G = floor(ln(1-u) / -eps) and report released counts and "
    "realized absolute error next to the true counts — the table a "
    "privacy review reads to pick eps (completing the privacy "
    "family: k_anonymity_audit and l_diversity_audit measure "
    "exposure; this calibrates the release).  The uniforms come "
    "from the portable polynomial hash of (cell, eps, leg) — a "
    "FIXED EVALUATION SEED, stated plainly: that makes this a "
    "deterministic calibration of the mechanism's algebra and "
    "magnitudes (hash-gateable), NOT a private release; production "
    "swaps the hash for real entropy, algebra unchanged.  One ln "
    "per draw on an exact-integer-derived double (the snap "
    "convention).  Scale: one groupBy to the bounded cell table; "
    "noise is a map-side expression over |cells| x |eps| rows.",
)
def dp_noise_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import portable as PTT

    h = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").cast("bigint").alias("true_n"))
    )
    e = spark.range(len(_DP_EPS_MILLI)).select(
        F.element_at(
            F.array(*[F.lit(v) for v in _DP_EPS_MILLI]),
            (F.col("id") + 1).cast("int"),
        )
        .cast("bigint")
        .alias("eps_milli")
    )
    n = e.crossJoin(h).withColumn(
        "noise", F.expr(_dp_noise_sql(PTT.SPARK))
    )
    return n.select(
        "eps_milli",
        "segment",
        "true_n",
        F.expr("CAST(true_n + noise AS BIGINT)").alias("released_n"),
        F.expr("CAST(abs(noise) AS BIGINT)").alias("abs_err"),
    ).orderBy("eps_milli", "segment")
