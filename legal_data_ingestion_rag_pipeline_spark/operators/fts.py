"""Full-text search: inverted index + BM25 ranking.

Closes the one reference surface this engine had skipped: the
reference declares a GIN full-text index over docket text
(schema.sql:140-141) but never queries it ("for future use",
README.md:129).  Here the equivalent capability is a first-class
queryable operator — keyword search is table stakes for a
training-data curation engine (boolean corpus filtering, slice
extraction for eval sets).

Scale shape (100 TB):
- Tokenization and document length are computed map-side from the text
  column; the explode is immediately filtered to the query's terms, so
  the only rows that ever reach a shuffle are postings FOR THE QUERY
  TERMS (a few rows per matching doc), not the full inverted index.
- Per-term document frequencies and the corpus-level (N, avgdl)
  scalars are tiny aggregates broadcast back onto the postings — no
  fact-side shuffle beyond the one groupBy (doc, term).
- Final ranking is ORDER BY score LIMIT k -> TakeOrderedAndProject
  (per-partition top-k then a k-row merge), never a global sort.

Determinism: per-(doc, term) BM25 partials are quantized to integer
micro-units (round6 grid) and summed as BIGINTs, so the per-doc score
is independent of floating-point addition order across partitions —
the same discipline as the decimal aggregates in pricing_summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: Okapi BM25 defaults (Robertson/Sparck Jones; the universal k1/b).
K1 = 1.2
B = 0.75


def postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf, dl): the inverted-index rows of a corpus.

    Materialize-and-bucket-by-term at scale for repeated queries; the
    search path below inlines this and prunes to the query terms before
    any shuffle, which is cheaper for ad-hoc queries.
    """
    toks = F.expr(PT.tokens(text_col, PT.SPARK))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
        )
        .withColumn("dl", F.size("_toks"))
        .select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )


def _tokens_expr(text_col: str, tokenizer: str) -> F.Column:
    if tokenizer == "ws":
        # whitespace tokens — the portable form mirrored by the gate
        # oracle (keeps punctuation attached, like vocab_topk)
        return F.expr(PT.tokens(text_col, PT.SPARK))
    if tokenizer == "word":
        # alnum word tokens — what an interactive keyword search wants
        # ('complaint' must match 'complaint.')
        return F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    raise ValueError(f"unknown tokenizer {tokenizer!r} (use 'ws' or 'word')")


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    tokenizer: str = "ws",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query under Okapi BM25.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Returns (doc_id, n_terms_hit, score) with score on the 1e-6 grid
    (see module docstring), ties broken by doc_id.
    """
    toks = _tokens_expr(text_col, tokenizer)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("dl", F.size("_toks"))
    )
    # Corpus scalars: one tiny agg, broadcast onto every posting row.
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").cast("double").alias("avgdl"),
    )
    hits = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*query_terms))  # prune BEFORE the shuffle
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df_per_term = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n, df, tf, dl, avgdl = (
        F.col("n_docs").cast("double"),
        F.col("df").cast("double"),
        F.col("tf").cast("double"),
        F.col("dl").cast("double"),
        F.col("avgdl"),
    )
    idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
    partial = idf * tf * F.lit(k1 + 1.0) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    )
    # Integer micro-units -> order-independent BIGINT sum per doc.
    micro = F.floor(partial * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    return (
        hits.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum(micro).alias("_score_micro"),
        )
        .select(
            "doc_id",
            "n_terms_hit",
            (F.col("_score_micro").cast("double") / F.lit(1000000.0)).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def conjunctive_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 50,
) -> DataFrame:
    """Boolean-AND keyword search: documents containing ALL query
    terms, ranked by total term frequency — the posting-list
    INTERSECTION access path beside bm25_topk's ranked union.

    The intersection is computed as count-of-matched-terms == n_terms
    after a map-side IN prune, never as an n-way self-join of posting
    lists: one filter that drops every non-query token before any
    shuffle, one (doc, term) aggregation, one per-doc count — shuffle
    volume is (matching docs x query terms) rows regardless of corpus
    size, and adding a term tightens rather than widens the plan.
    Ties rank by doc id for determinism.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = F.expr(PT.tokens(text_col, PT.SPARK))
    hits = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("_n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .filter(F.col("_n_terms") == len(terms))
        .select("doc_id", "total_tf")
        .orderBy(F.desc("total_tf"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: list[str],
    k: int = 50,
) -> DataFrame:
    """Exact-phrase search over POSITIONAL postings: documents where
    the query tokens appear adjacent and in order, ranked by
    occurrence count — the third FTS access path beside bm25_topk's
    ranked union and conjunctive_search's boolean intersection
    (reference analog: the phraseto_tsquery semantics of the rag.py
    FTS note).

    The adjacency join is rewritten as the BASE-POSITION trick: a
    token at position p matching phrase slot i anchors base = p - i,
    and a phrase occurrence exists exactly where one (doc, base)
    group covers ALL n slots (count of DISTINCT slots == n — repeated
    phrase words contribute distinct slots, so 'the cat the' works).
    One map-side IN prune before any shuffle, one (doc, base)
    aggregation, one per-doc count: shuffle volume is (query-token
    hits x 1) rows regardless of corpus size — never an n-way
    posting self-join, and longer phrases only tighten the plan."""
    if len(phrase) < 2:
        raise ValueError("phrase needs at least two tokens")
    terms = sorted(set(phrase))
    toks = F.expr(PT.tokens(text_col, PT.SPARK))
    slots = F.array(*[F.lit(t) for t in phrase])
    hits = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.posexplode("_toks").alias("pos", "term"))
        .filter(F.col("term").isin(terms))
        # one row per (token hit, matching slot): repeated words in
        # the phrase fan out to each slot they could anchor
        .select(
            "doc_id",
            "pos",
            "term",
            F.posexplode(slots).alias("slot", "slot_term"),
        )
        .filter(F.col("term") == F.col("slot_term"))
        .select("doc_id", (F.col("pos") - F.col("slot")).alias("base"), "slot")
    )
    occ = (
        hits.groupBy("doc_id", "base")
        .agg(F.countDistinct("slot").alias("_n"))
        .filter((F.col("_n") == len(phrase)) & (F.col("base") >= 0))
    )
    return (
        occ.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )
