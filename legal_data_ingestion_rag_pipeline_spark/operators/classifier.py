"""Hashing-trick linear text classifier scoring (fastText-style).

Modern pretraining curation filters documents with a cheap linear
classifier over hashed token features (the DCLM / FineWeb-Edu /
CCNet-LM recipe): score = bias + sum over tokens of W[h(token) % dim].
Training happens offline on labeled samples; the SCORING pass is the
100 TB-scale operation, and it is embarrassingly map-side:

- the weight vector is a literal array folded into the plan (the
  broadcast-equivalent for a model measured in KB), so scoring
  shuffles NOTHING — it is one codegen'd projection over the corpus;
- token hashing uses the portable polynomial family
  (functions/portable.py), so a DuckDB oracle reproduces scores
  bit-for-bit (the fold order over tokens is identical, hence the
  double sum is identical, not merely close);
- no sigmoid in the gated output: monotone, so thresholding on the
  raw margin is equivalent, and it avoids cross-engine libm exp()
  differences.

Weights arrive as a plain Python list (train anywhere — sklearn,
fastText, a Spark LR — and paste); demo_weights() provides the
deterministic stand-in used by the oracle-gated query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import portable as PT


def demo_weights(dim: int) -> list[float]:
    """Deterministic pseudo-random weights in [-1, 1), derived from
    the portable universal-hash constants so both engines can inline
    the identical literals.  Stands in for a trained model in the
    oracle-gated query; real deployments pass their own weights."""
    a, b = PT._perm_constants(1)[0]
    return [((a * i + b) % PT.P % 2001 - 1000) / 1000.0 for i in range(dim)]


def _score_sql(text_expr: str, weights: list[float], dialect: str) -> str:
    """The scoring expression, emitted for either dialect: a left fold
    of W[poly_hash(token) % dim + 1] over the lowercased tokens.  The
    sequential fold gives both engines the same addition order, so the
    double score is bit-identical, not approximately equal."""
    dim = len(weights)
    w_lit = ", ".join(repr(w) for w in weights)
    arr = f"array({w_lit})" if dialect == PT.SPARK else f"[{w_lit}]"
    # NULL text scores as bias (empty token list), not NULL — a NULL
    # score would silently fail every keep-threshold downstream
    toks = PT.tokens(f"coalesce({text_expr}, '')", dialect)
    ph = PT.poly_hash("t", dialect)
    idx = f"(({ph}) % {dim}) + 1"
    if dialect == PT.SPARK:
        pick = PT.element_at_1based(arr, idx, dialect)
    else:
        # DuckDB parses `[lits][expr]` as list concatenation, not
        # subscript — use list_extract for a literal-array lookup
        pick = f"list_extract({arr}, {idx})"
    # map tokens -> weights FIRST, then fold doubles: DuckDB's
    # reduce_ emulates the init by list_prepend, which would reject a
    # DOUBLE init prepended onto a VARCHAR token list
    picks = PT.transform(toks, f"t -> ({pick})", dialect)
    return PT.reduce_(
        picks, "CAST(0.0 AS DOUBLE)", "(s, x) -> s + x", dialect
    )


def score_documents(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Append (score, keep) to docs: score = bias + hashed-feature
    dot, keep = score >= threshold.  Pure map-side projection — no
    shuffle, no UDF, whole-stage codegen."""
    score: Column = F.lit(float(bias)) + F.expr(
        _score_sql(text_col, weights, PT.SPARK)
    )
    return docs.withColumn("score", score.cast("double")).withColumn(
        "keep", F.col("score") >= float(threshold)
    )


def oracle_score_sql(text_expr: str, weights: list[float], bias: float) -> str:
    """DuckDB scoring expression mirroring score_documents."""
    return f"CAST({float(bias)!r} + ({_score_sql(text_expr, weights, PT.DUCKDB)}) AS DOUBLE)"
