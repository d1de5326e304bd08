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


def bm25f_topk(
    docs: DataFrame,
    id_col: str,
    fields: list[tuple[str, str, float, float]],
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
) -> DataFrame:
    """Top-k docs under simple BM25F (Zaragoza et al. 2004, "Microsoft
    Cambridge at TREC-13"): per-field term frequencies are
    length-normalized and weight-combined BEFORE one shared
    saturation, instead of summing independent per-field BM25 scores —
    the fielded-document ranking a search deployment runs over
    title/body/anchor zones.

        wtf(t,d) = sum_f w_f * tf_f / (1 - b_f + b_f * dl_f/avgdl_f)
        score(d) = sum_t idf(t) * wtf / (k1 + wtf)

    ``fields`` rows are (name, sql_expr, weight, b_f); ``idf`` uses
    document frequency over ANY field.  EXACTLY TWO FIELDS are
    supported: the per-(doc,term) field combination is a sum of two
    doubles, which IEEE addition makes order-independent (three or
    more would need a deterministic fold).  Score quantizes to the
    1e-6 grid per term before the per-doc BIGINT sum (the module's
    hash-gate convention); ties break on doc_id.

    Scale shape: per-field postings prune to the query terms BEFORE
    any shuffle (the :func:`postings` inline), field stats are one
    tiny broadcast agg each, the (doc,term,field) partials shuffle on
    the uniform doc key once, and top-k plans as
    TakeOrderedAndProject.  Built on :func:`postings`.
    """
    if len(fields) != 2:
        raise ValueError("bm25f_topk supports exactly two fields")
    per_field = []
    stat_cols = []
    for fname, expr, w, bf in fields:
        fdocs = docs.select(
            F.col(id_col).alias("doc_id"), F.expr(expr).alias("_ftext")
        )
        p = postings(fdocs, "doc_id", "_ftext").filter(
            F.col("term").isin(*query_terms)
        )
        stat_cols.append(
            F.avg(
                F.size(F.expr(PT.tokens(expr, PT.SPARK)))
            )
            .cast("double")
            .alias(f"avgdl_{fname}")
        )
        per_field.append(
            p.select(
                "doc_id",
                "term",
                F.lit(fname).alias("field"),
                F.col("tf").cast("double").alias("tf"),
                F.col("dl").cast("double").alias("dl"),
                F.lit(float(w)).alias("w"),
                F.lit(float(bf)).alias("bf"),
            )
        )
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    # both field averages from ONE corpus scan (column-pruned to the
    # shared source column), not one full pass per field
    fstats = docs.agg(*stat_cols)
    unioned = per_field[0].unionByName(per_field[1])
    avgdl = F.when(
        F.col("field") == fields[0][0], F.col(f"avgdl_{fields[0][0]}")
    ).otherwise(F.col(f"avgdl_{fields[1][0]}"))
    wtf_part = F.col("w") * F.col("tf") / (
        F.lit(1.0) - F.col("bf") + F.col("bf") * F.col("dl") / avgdl
    )
    combined = (
        unioned.join(F.broadcast(fstats))
        .select("doc_id", "term", wtf_part.alias("_wtf_f"))
        .groupBy("doc_id", "term")
        .agg(F.sum("_wtf_f").alias("wtf"))  # two doubles: order-free
    )
    df_per_term = combined.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n, dfc = F.col("n_docs"), F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    partial = idf * F.col("wtf") / (F.lit(float(k1)) + F.col("wtf"))
    micro = F.floor(partial * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    return (
        combined.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum(micro).alias("_m"),
        )
        .select(
            "doc_id",
            "n_terms_hit",
            (F.col("_m").cast("double") / F.lit(1000000.0)).alias("score"),
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


def rm3_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback search (Lavrenko & Croft 2001
    relevance models; the Anserini/Lucene default PRF): a first-pass
    BM25 retrieval picks ``fb_docs`` feedback documents, their term
    distribution (weighted by first-pass score) nominates
    ``fb_terms`` expansion terms, and the final ranking scores the
    corpus under the interpolated query

        score(d) = lam * BM25_Q(d) + (1 - lam) * BM25_E(d)

    — the recall repair between exact keyword search and dense
    retrieval in this repo's ladder (bm25 -> +PRF -> conjunctive ->
    MaxSim -> bi-encoder -> RRF).

    Exact-integer discipline: per-(doc,term) BM25 partials snap to
    micro (the fts convention); the feedback weight of a term is the
    BIGINT sum over feedback docs of ``tf * score_micro DIV dl`` (an
    integer rendering of P(t|d)*P(q|d)); the lambda blend is integer
    ``lam_num*partial`` / ``(lam_den-lam_num)*partial`` per term.
    All selection boundaries carry total tie orders (score DESC then
    doc_id; weight DESC then term), so any engine and partitioning
    selects identical feedback docs, expansion terms, and final
    ranking.

    Scale shape: THE EXPANSION NEVER TOUCHES THE DRIVER — the
    feedback-doc frame (<= fb_docs rows) and the expansion-term frame
    (<= fb_terms rows) stay DataFrames and BROADCAST into the
    feedback scan and the final scoring scan; both corpus passes
    prune postings map-side (term IN query / broadcast semi-join on
    the weighted-term table) before their one (doc,term) shuffle.
    Three scans of the text column total; a deployment with a
    materialized postings table replaces each with an index read of
    the touched terms only.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q_terms = sorted(set(query_terms))
    toks = F.expr(PT.tokens(text_col, PT.SPARK))
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").cast("double").alias("avgdl"),
    )

    def scored_hits(hits):
        """(doc_id, term, tf, dl) -> + df, stats, micro partial."""
        df_per_term = hits.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        n, dfc, tf, dl, avgdl = (
            F.col("n_docs").cast("double"),
            F.col("df").cast("double"),
            F.col("tf").cast("double"),
            F.col("dl").cast("double"),
            F.col("avgdl"),
        )
        idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
        partial = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
        )
        micro = F.floor(partial * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
        return (
            hits.join(F.broadcast(df_per_term), "term")
            .join(F.broadcast(stats))
            .withColumn("partial_micro", micro)
        )

    # pass 1: BM25 over the original terms, top-fb_docs feedback set
    hits1 = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*q_terms))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    fb = (
        scored_hits(hits1)
        .groupBy("doc_id", "dl")
        .agg(F.sum("partial_micro").alias("s_micro"))
        .orderBy(F.desc("s_micro"), F.asc("doc_id"))
        .limit(fb_docs)
        .select("doc_id", "dl", "s_micro")
    )
    # feedback term distribution: fbw(t) = sum_d tf * s_micro DIV dl
    fb_term_rows = (
        base.join(F.broadcast(fb.select("doc_id", "s_micro")), "doc_id")
        .select(
            "doc_id", "dl", "s_micro", F.explode("_toks").alias("term")
        )
        .filter(~F.col("term").isin(*q_terms))
        .groupBy("doc_id", "term", "dl", "s_micro")
        .agg(F.count("*").alias("tf"))
        .select(
            "term",
            F.expr("tf * s_micro DIV dl").cast("bigint").alias("w"),
        )
        .groupBy("term")
        .agg(F.sum("w").cast("bigint").alias("fbw"))
    )
    from pyspark.sql import Window

    exp_terms = (
        fb_term_rows.withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.desc("fbw"), F.asc("term"))
            ),
        )
        .filter(F.col("_rk") <= fb_terms)
        .select("term")
    )
    # pass 2: interpolated scoring over Q (weight lam_num) + E (mu)
    mu = lam_den - lam_num
    weighted = exp_terms.withColumn("w", F.lit(mu)).unionByName(
        docs.sparkSession.createDataFrame(
            [(t, lam_num) for t in q_terms], "term string, w int"
        )
    )
    hits2 = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(weighted), "term")
        .groupBy("doc_id", "term", "dl", "w")
        .agg(F.count("*").alias("tf"))
    )
    return (
        scored_hits(hits2)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            F.sum(F.col("w") * F.col("partial_micro"))
            .cast("bigint")
            .alias("rm3_micro"),
        )
        .orderBy(F.desc("rm3_micro"), F.asc("doc_id"))
        .limit(k)
    )


def maxscore_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    tokenizer: str = "ws",
) -> DataFrame:
    """Top-k BM25 with MaxScore pruning (Turtle & Flood 1995) — the
    SAME result as :func:`bm25_topk` (gate-proven), reached by
    shuffling only the postings of documents that can still make the
    top k.

    Batch/distributed adaptation of the classic document-at-a-time
    algorithm: what a posting-list engine saves in skipped postings,
    a shuffle engine saves in rows entering the per-document
    aggregation exchange —

      1. scored postings are built map-side (prune to query terms at
         the scan, per-posting micro score, NO shuffle yet);
      2. per-term max contributions ms(t) reduce to T rows (exact,
         from the actual postings — tighter than the (k1+1)*idf
         asymptote) and come back to the driver with df/avgdl;
      3. a SEED pass exact-scores only the documents containing the
         highest-impact term t*; the k-th seed score is a LOWER
         bound theta on the final k-th score;
      4. terms split driver-side: the maximal ascending-ms prefix
         with sum(ms) < theta is NON-ESSENTIAL — a document matching
         only those terms scores strictly below theta and cannot
         displace the k seeds — so only documents matching >= 1
         ESSENTIAL term keep their postings (a semi-join against a
         usually-tiny doc set) and enter the final aggregation.

    theta = 0 (fewer than k seed docs) degrades gracefully to the
    exhaustive plan.  All score arithmetic is the shared micro-unit
    integer convention, so pruning cannot perturb a single bit of the
    surviving scores, and the strict sum(ms) < theta inequality keeps
    boundary ties on the safe (kept) side.

    Returns (doc_id, n_terms_hit, score) exactly like bm25_topk.
    """
    toks = _tokens_expr(text_col, tokenizer)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("dl", F.size("_toks"))
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").cast("double").alias("avgdl"),
    )
    hits = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*query_terms))
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
    micro = F.floor(partial * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    sp = (
        hits.join(F.broadcast(df_per_term), "term")
        .join(F.broadcast(stats))
        .select("doc_id", "term", micro.alias("micro"))
        .localCheckpoint(eager=True)  # both phases read it; postings-sized
    )
    # (2) per-term exact max contribution — T rows to the driver
    ms = {
        r.term: r.ms
        for r in sp.groupBy("term").agg(F.max("micro").alias("ms")).collect()
    }
    if not ms:
        return sp.select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_terms_hit"),
            F.lit(0.0).alias("score"),
        ).limit(0)
    t_star = max(ms, key=lambda t: (ms[t], t))
    # (3) seed: exact scores of docs containing t*
    seed_ids = sp.filter(F.col("term") == t_star).select("doc_id")
    seed_scores = (
        sp.join(F.broadcast(seed_ids), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("micro").alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = seed_scores[-1].s if len(seed_scores) == k else 0
    # (4) driver-side essential split: maximal ascending prefix with
    # cumulative ms strictly below theta is non-essential
    cum = 0
    non_essential = set()
    for t in sorted(ms, key=lambda t: (ms[t], t)):
        if cum + ms[t] < theta:
            cum += ms[t]
            non_essential.add(t)
        else:
            break
    essential = [t for t in ms if t not in non_essential]
    keep = (
        sp.filter(F.col("term").isin(essential))
        .select("doc_id")
        .distinct()
    )
    return (
        sp.join(F.broadcast(keep), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("micro").alias("_score_micro"),
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
