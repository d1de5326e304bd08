"""Domain-mixture sampling for training-data curation.

A pretraining corpus is assembled to a TARGET MIX — "12.5% of the
token budget from src0, ..." — not by concatenating whatever each
source happens to contain. This operator keeps each domain's
documents at rate

    min(1, share_d * budget / domain_tokens_d)

deciding membership by a content-hash bucket, so the sample is a pure
function of the data: retries, speculative task re-execution, and any
repartitioning select the SAME documents (``DataFrame.sample``'s
rand() gives none of that). The reference has no analog; this is one
of the beyond-reference LLM-pipeline operators (SURVEY north star).

Scale shape: the only non-map-side work is the per-domain token-count
aggregate — partial-agg'd map-side, output rows = #domains — which
broadcasts back onto the fact scan; the keep decision is a codegen'd
integer comparison. No fact-table shuffle at any point.

Determinism contract: thresholds are computed in ALL-INTEGER
arithmetic — ``floor(scale * budget * w_d / (W * domain_tokens))`` as
bigint division — so the DuckDB oracle reproduces the sample
bit-identically (no float rounding to drift across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Hash-bucket resolution: rates are granular to 1/SCALE.
SCALE = 1_000_000


def mixture_thresholds(
    docs: DataFrame,
    domain_col: str,
    n_tokens_col: str,
    budget: int,
    weights: dict[str, int] | None = None,
    default_weight: int = 1,
    scale: int = SCALE,
) -> DataFrame:
    """Per-domain keep thresholds in [0, scale].

    ``weights`` are integer mixture weights (share_d = w_d / sum(w));
    domains absent from the dict get ``default_weight``. Returns
    (domain, dom_tok, w, thr) — rows = #domains, safe to broadcast.

    The threshold numerator ``scale * budget * w`` must fit in int64
    (Spark's non-ANSI arithmetic would WRAP NEGATIVE and silently
    sample a domain to zero rows; DuckDB would error, breaking oracle
    parity) — rejected up front. At pretraining budgets (trillions of
    tokens) pass a coarser ``scale``: 10_000 still gives 0.01%-rate
    granularity with ~100x more budget headroom.
    """
    max_w = max(weights.values(), default=default_weight) if weights else default_weight
    max_num = scale * budget * max(int(max_w), default_weight)
    if max_num >= 1 << 63:
        raise ValueError(
            f"scale*budget*w = {max_num} overflows int64; "
            "use a smaller scale (granularity) or budget"
        )
    totals = docs.groupBy(domain_col).agg(
        F.sum(n_tokens_col).cast("bigint").alias("dom_tok")
    )
    w = F.lit(default_weight).cast("bigint")
    if weights:
        pairs = [x for kv in weights.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        w = F.coalesce(
            F.create_map(*pairs)[F.col(domain_col)].cast("bigint"), w
        )
    totals = totals.withColumn("w", w)
    # w_total = sum of weights over OBSERVED domains; the window runs
    # over the #domains-row aggregate, not the fact table. (NOT named
    # "W": Spark's resolver is case-insensitive, so "W" and "w" would
    # be the same identifier inside F.expr.)
    totals = totals.withColumn(
        "w_total", F.sum("w").over(Window.partitionBy())
    )
    thr = F.least(
        F.lit(scale).cast("bigint"),
        F.expr(
            f"CAST({scale} AS BIGINT) * CAST({budget} AS BIGINT) * w"
            " DIV (w_total * dom_tok)"
        ),
    )
    return totals.withColumn("thr", thr).select(domain_col, "dom_tok", "w", "thr")


def sample_to_mixture(
    docs: DataFrame,
    domain_col: str,
    n_tokens_col: str,
    bucket_col: str,
    budget: int,
    weights: dict[str, int] | None = None,
    default_weight: int = 1,
    scale: int = SCALE,
) -> DataFrame:
    """Deterministically sample ``docs`` toward the target mixture.

    ``bucket_col`` must hold a content-hash bucket uniform on
    [0, scale) — e.g. ``poly_hash(text) % scale`` (functions/portable)
    so the oracle can reproduce it. Keeps rows whose bucket falls
    under their domain's threshold.
    """
    thr = mixture_thresholds(
        docs, domain_col, n_tokens_col, budget, weights, default_weight, scale
    )
    return docs.join(
        F.broadcast(thr.select(domain_col, "thr")), domain_col
    ).filter(F.col(bucket_col) < F.col("thr"))
