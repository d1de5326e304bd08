"""Driver queries: pretraining-corpus curation additions (round 5).

- boilerplate_segment_removal — cross-document segment dedup
  (operators/linededup.py), the CCNet/RefinedWeb line-level recipe on
  the driver's documents table.  The synthetic corpus has no newline
  structure, so the gated query uses the deterministic 4-token-window
  segmentation (segment_token_windows); production crawls use
  segment_lines with identical downstream semantics.

- cms_heavy_hitters — count-min sketch build + point estimates
  (operators/sketches.py) over the document token stream, reporting
  the top-20 estimated-frequency tokens next to their true counts (the
  one-sided estimate >= truth error is visible and oracle-checked).

Both oracles are built from the same portable hash/array builders as
the Spark plans, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import htmltext, portable as PT
from ..operators import classifier, domains, linededup, packing as packing_mod, sketches
from ..session import barrier, load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK

_SEG_W = 4
_SEG_MIN_DOCS = 3

_BOILERPLATE_ORACLE = f"""
WITH t AS (
  -- coalesce mirrors segment_token_windows' NULL-text -> '' survival:
  -- removal must never delete documents
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
segs AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS seg_pos,
         array_to_string(
           list_slice(toks, CAST(g.i * {_SEG_W} + 1 AS BIGINT),
                      CAST(g.i * {_SEG_W} + {_SEG_W} AS BIGINT)), ' ') AS seg
  FROM t, unnest(range(CAST(ceil(len(toks) / {_SEG_W}.0) AS BIGINT))) AS g(i)
),
bp AS (
  SELECT seg FROM segs WHERE seg <> ''
  GROUP BY seg HAVING count(DISTINCT doc_id) >= {_SEG_MIN_DOCS}
)
SELECT s.doc_id,
       coalesce(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END,
                           ' ' ORDER BY s.seg_pos), '') AS clean_text,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM segs s LEFT JOIN bp b ON s.seg = b.seg
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@register(
    "boilerplate_segment_removal",
    bench=True,
    oracle=_BOILERPLATE_ORACLE,
    doc="Cross-document segment (line) deduplication, the CCNet/"
    "RefinedWeb boilerplate recipe: segments shared verbatim by >= "
    f"{_SEG_MIN_DOCS} documents are stripped from every document, "
    "order preserved, with per-doc removal accounting. Scale: "
    "map-side explode, ONE df shuffle on the uniform segment key, "
    "small-set removal join, one doc_id reassembly shuffle — no "
    "windows, no UDFs (operators/linededup.py).",
)
def boilerplate_segment_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return linededup.boilerplate_strip(
        docs, min_docs=_SEG_MIN_DOCS, w=_SEG_W
    ).orderBy("doc_id")


_CMS_D = 3
_CMS_WIDTH = 64


def _cms_oracle() -> str:
    toks = PT.tokens("text", D)
    ph = PT.poly_hash("tok", D)
    buckets = sketches.bucket_exprs_sql("h", _CMS_D, _CMS_WIDTH)
    rows_arms = " UNION ALL ".join(
        f"SELECT {i} AS h_idx, {b} AS bucket FROM base"
        for i, b in enumerate(buckets)
    )
    key_arms = " UNION ALL ".join(
        f"SELECT tok, true_cnt, {i} AS h_idx, {b} AS bucket FROM keys"
        for i, b in enumerate(buckets)
    )
    return f"""
    WITH toks AS (SELECT unnest({toks}) AS tok FROM documents),
    base AS (SELECT tok, {ph} AS h FROM toks),
    rows_ AS ({rows_arms}),
    cms AS (SELECT h_idx, bucket, count(*) AS cnt FROM rows_ GROUP BY 1, 2),
    keys AS (SELECT tok, min(h) AS h, count(*) AS true_cnt
             FROM base GROUP BY tok),
    kb AS ({key_arms}),
    est AS (
      SELECT kb.tok, min(coalesce(cms.cnt, 0)) AS est,
             min(kb.true_cnt) AS true_cnt
      FROM kb LEFT JOIN cms USING (h_idx, bucket)
      GROUP BY kb.tok
    )
    SELECT tok, CAST(est AS BIGINT) AS est, CAST(true_cnt AS BIGINT) AS true_cnt
    FROM est ORDER BY est DESC, tok LIMIT 20
    """


@register(
    "cms_heavy_hitters",
    bench=True,
    oracle=_cms_oracle(),
    doc="Count-min sketch heavy hitters: d=3 x width=64 counter "
    "matrix built in one bounded-key shuffle (<= d*width groups "
    "regardless of corpus size), broadcast to point-estimate every "
    "candidate token, top-20 by estimate with the true count beside "
    "it — the overestimate-only CMS guarantee is part of the gated "
    "values (operators/sketches.py).",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        F.explode(F.expr(PT.tokens("text", S))).alias("tok")
    )
    truth = items.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    # this query materializes the exact per-token aggregate anyway (the
    # truth column), so the sketch builds from it WEIGHTED — identical
    # counters, one corpus pass instead of two, vocabulary-scale build
    sketch = sketches.cms_build(
        truth, "tok", d=_CMS_D, width=_CMS_WIDTH, weight_col="true_cnt"
    )
    est = sketches.cms_estimate(
        sketch, truth.select("tok"), "tok", d=_CMS_D, width=_CMS_WIDTH
    )
    return (
        est.join(truth, "tok")
        .select("tok", F.col("est").cast("bigint").alias("est"),
                F.col("true_cnt").cast("bigint").alias("true_cnt"))
        .orderBy(F.desc("est"), "tok")
        .limit(20)
    )


_CLS_DIM = 256
_CLS_BIAS = 0.05
_CLS_WEIGHTS = classifier.demo_weights(_CLS_DIM)


@register(
    "quality_classifier_filter",
    oracle=f"""
    SELECT doc_id,
           {classifier.oracle_score_sql('text', _CLS_WEIGHTS, _CLS_BIAS)}
             AS score,
           {classifier.oracle_score_sql('text', _CLS_WEIGHTS, _CLS_BIAS)} >= 0.0
             AS keep
    FROM documents
    ORDER BY doc_id
    """,
    doc="Hashing-trick linear classifier scoring (fastText-style "
    "quality filter, the DCLM/FineWeb curation step): score = bias + "
    "sum of W[poly_hash(token) % dim] via a sequential fold, so the "
    "double sum is bit-identical across engines. Pure map-side "
    "codegen projection — the KB-scale model is a folded literal, "
    "nothing shuffles (operators/classifier.py).",
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        classifier.score_documents(docs, _CLS_WEIGHTS, bias=_CLS_BIAS)
        .select("doc_id", "score", "keep")
        .orderBy("doc_id")
    )


_BPE_N = 8


def _bpe_oracle(sf_dir: str) -> str:
    from ..operators import bpe

    merges = bpe.train_merges_from_parquet(
        f"{sf_dir}/documents.parquet", _BPE_N
    )
    # q_duck: learned symbols are corpus-derived strings — escape them
    # for the VALUES literals or any apostrophe-bearing token breaks
    # the oracle SQL
    values = ",\n           ".join(
        f"({i}, '{bpe.q_duck(l)}', '{bpe.q_duck(r)}', {c})"
        for i, (l, r, c) in enumerate(merges)
    )
    return f"""
    SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM (VALUES {values}) t(rank, lhs, rhs, pair_count)
    ORDER BY rank
    """


@register(
    "bpe_train_merges",
    bench=True,
    oracle=_bpe_oracle,
    doc="BPE merge-table training (Sennrich subword vocab, the "
    "tokenizer-training step): per round one vocabulary-scale pair "
    "aggregation + a 1-row argmax collect, greedy left-to-right "
    "codegen'd merge folds, corpus touched exactly once for word "
    "frequencies. Deterministic tie-break (count DESC, pair ASC); "
    "the oracle re-trains the identical table through the "
    "pure-Python twin from the same parquet and inlines it as "
    "literals — the kmeans/PQ dynamic-oracle convention for "
    "iterative algorithms (operators/bpe.py).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_merges(docs, _BPE_N)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank bigint, lhs string, rhs string, pair_count bigint",
    ).orderBy("rank")


# Ask for a production-leaning table; the synthetic corpus's template
# vocabulary saturates at 89 learnable merges — under FOLD_MAX_MERGES —
# so the query pins mode="arrow" explicitly: the point is to drive the
# constant-plan-size encoder a real 30k-merge vocab would auto-select.
_ENC_N_MERGES = 150


def _bpe_encode_oracle(sf_dir: str) -> str:
    from ..operators import bpe

    path = f"{sf_dir}/documents.parquet"
    merges = bpe.train_merges_from_parquet(path, _ENC_N_MERGES)
    stats = bpe.encode_stats_from_parquet(path, merges)
    values = ",\n           ".join(
        f"({d}, {nw}, {ns})" for d, (nw, ns) in sorted(stats.items())
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syms AS BIGINT) AS n_syms
    FROM (VALUES {values}) t(doc_id, n_words, n_syms)
    ORDER BY doc_id
    """


@register(
    "bpe_encode_corpus",
    oracle=_bpe_encode_oracle,
    doc="BPE ENCODE at production merge-table size: train "
    f"{_ENC_N_MERGES} merges (the deterministic twin, pinned to the "
    "Spark trainer by bpe_train_merges), then tokenize every document "
    "and apply the full table via the Arrow pandas_udf encoder — the "
    "chained-fold path's plan size is linear in the table and cliffs "
    "at real vocabularies, so above FOLD_MAX_MERGES=100 the encoder "
    "is ONE vectorized UDF whose plan is constant-size "
    "(operators/bpe.py). Output is per-doc (n_words, n_syms); the "
    "oracle re-encodes through the SEQUENTIAL fold-order twin, "
    "cross-checking the rank-dict/fold equivalence, not just the "
    "plumbing. Scale: tokenize+encode is map-side; the shuffle "
    "carries (doc_id, int) partials only.",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    merges = bpe.train_merges_from_parquet(
        f"{sf_dir}/documents.parquet", _ENC_N_MERGES
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.expr(PT.tokens("text", S))).alias("word")
    ).withColumn("syms", F.expr("split(word, '')"))
    enc = bpe.apply_merges(words, merges, "syms", mode="arrow")
    return (
        enc.select("doc_id", F.size("syms").alias("_n"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_n").cast("bigint").alias("n_syms"),
        )
        .orderBy("doc_id")
    )


_RR_TERMS = ("vector", "merge", "window")

_RERANK_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents
    ),
    docs2 AS (SELECT doc_id, len(toks) AS dl, toks FROM base),
    stats AS (SELECT count(*) AS n_docs, CAST(avg(dl) AS DOUBLE) AS avgdl FROM docs2),
    hits AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(toks) AS term FROM docs2
      ) WHERE term IN ('vector', 'merge', 'window')
      GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.doc_id,
             CAST(floor(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                        / (CAST(d.df AS DOUBLE) + 0.5))
               * CAST(h.tf AS DOUBLE) * 2.2
               / (CAST(h.tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(h.dl AS DOUBLE) / s.avgdl))
               * 1000000.0 + 0.5) AS BIGINT) AS micro
      FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
    ),
    pool AS (
      SELECT doc_id, CAST(sum(micro) AS DOUBLE) / 1000000.0 AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 20
    ),
    rr AS (
      SELECT p.doc_id, p.bm25,
             CAST(len(list_filter(list_distinct(b.toks),
                                  t -> t IN ('merge', 'vector', 'window')))
                  AS DOUBLE)
             / CAST(greatest(len(list_distinct(b.toks)) + 3
                    - len(list_filter(list_distinct(b.toks),
                                      t -> t IN ('merge', 'vector', 'window'))),
                    1) AS DOUBLE) AS rerank_score
      FROM pool p JOIN base b ON p.doc_id = b.doc_id
    )
    SELECT doc_id, bm25, rerank_score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT doc_id, bm25, rerank_score,
             row_number() OVER (ORDER BY rerank_score DESC, bm25 DESC, doc_id)
               AS rn
      FROM rr) t
    WHERE rn <= 5 ORDER BY rank
"""


@register(
    "rag_rerank_bm25",
    oracle=_RERANK_ORACLE,
    doc="Two-stage retrieve->rerank (the production RAG shape, "
    "operators/rerank.py): BM25 pools 20 candidates (term-pruned "
    "postings, corpus-scale stage), then the reranker scores ONLY "
    "the pool — Jaccard token overlap here (bit-identical integer "
    "division on both engines); the cross-encoder pandas_udf swaps "
    "in via CrossEncoderReranker with the identical pool-bounded "
    "plan. Reranking cost is independent of corpus size.",
)
def rag_rerank_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import fts, rerank

    docs = load_table(spark, sf_dir, "documents")
    pool = (
        fts.bm25_topk(docs, "doc_id", "text", list(_RR_TERMS), k=20)
        .select("doc_id", F.col("score").alias("bm25"))
    )
    cands = pool.join(docs.select("doc_id", "text"), "doc_id")
    out = rerank.jaccard_rerank(
        cands, list(_RR_TERMS), stage1_col="bm25", k=5
    )
    return out.select(
        "doc_id", "bm25", "rerank_score", F.col("rank").cast("bigint").alias("rank")
    ).orderBy("rank")


def _v3_oracle(src: str = "documents", prelude: str = "") -> str:
    """The curation-v3 oracle, parameterized on the source relation so
    v4 can prepend its domain-filter CTEs."""
    return f"""
    WITH {prelude}scored AS (
      SELECT doc_id, text,
             {classifier.oracle_score_sql('text', _CLS_WEIGHTS, _CLS_BIAS)}
               AS score
      FROM {src}
    ),
    kept AS (SELECT doc_id, text, score FROM scored WHERE score >= 0.0),
    t AS (SELECT doc_id, score, string_split(coalesce(text, ''), ' ') AS toks
          FROM kept),
    segs AS (
      SELECT doc_id, score, CAST(g.i AS BIGINT) AS seg_pos,
             array_to_string(
               list_slice(toks, CAST(g.i * {_SEG_W} + 1 AS BIGINT),
                          CAST(g.i * {_SEG_W} + {_SEG_W} AS BIGINT)), ' ') AS seg
      FROM t, unnest(range(CAST(ceil(len(toks) / {_SEG_W}.0) AS BIGINT))) AS g(i)
    ),
    bp AS (
      SELECT seg FROM segs WHERE seg <> ''
      GROUP BY seg HAVING count(DISTINCT doc_id) >= {_SEG_MIN_DOCS}
    ),
    cleaned AS (
      SELECT s.doc_id, min(s.score) AS score,
             coalesce(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END,
                                 ' ' ORDER BY s.seg_pos), '') AS clean_text,
             CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
      FROM segs s LEFT JOIN bp b ON s.seg = b.seg
      GROUP BY s.doc_id
    ),
    keeper AS (
      SELECT clean_text, min(doc_id) AS keep_id FROM cleaned GROUP BY clean_text
    )
    SELECT c.doc_id, c.score, c.clean_text, c.n_removed
    FROM cleaned c JOIN keeper k
      ON c.clean_text = k.clean_text AND c.doc_id = k.keep_id
    ORDER BY c.doc_id
"""


def _v3_stages(docs: DataFrame) -> DataFrame:
    """classifier filter -> boilerplate segment removal -> exact dedup
    of the cleaned text, as one lazy plan.  ``docs`` needs (doc_id,
    text).  Shared by curation_pipeline_v3 and _v4."""
    kept = (
        classifier.score_documents(docs, _CLS_WEIGHTS, bias=_CLS_BIAS)
        .filter(F.col("keep"))
        .select("doc_id", "text", "score")
    )
    segs = linededup.segment_token_windows(kept, w=_SEG_W)
    bp = linededup.common_segments(segs, _SEG_MIN_DOCS)
    cleaned = linededup.remove_common_segments(segs, bp).join(
        kept.select("doc_id", "score"), "doc_id"
    )
    # dedup keys on sha2(clean_text) — the operators/dedup.py
    # convention — so the keeper shuffle carries 64-hex-char keys, not
    # multi-KB document bodies; hash equality == text equality for the
    # oracle's purposes (collision odds are negligible at any corpus
    # size we'd run)
    hashed = cleaned.withColumn("_key", F.sha2(F.col("clean_text"), 256))
    keeper = hashed.groupBy("_key").agg(F.min("doc_id").alias("doc_id"))
    return (
        hashed.join(keeper, ["_key", "doc_id"], "left_semi")
        .select("doc_id", "score", "clean_text", "n_removed")
        .orderBy("doc_id")
    )


@register(
    "curation_pipeline_v3",
    bench=True,
    oracle=_v3_oracle(),
    doc="End-to-end FineWeb/DCLM-style curation composed from the "
    "round-5 operators: (1) hashing-trick classifier filter "
    "(map-side, zero shuffle), (2) cross-document boilerplate "
    "segment removal on the survivors (df shuffle on the segment "
    "key), (3) first-occurrence exact dedup of the CLEANED text "
    "(min-doc_id per content group, no window over the corpus). "
    "Demonstrates that the stages compose into one lazy plan — "
    "Catalyst pipelines the classifier predicate into the "
    "segmentation scan, so filtered docs never reach the shuffle.",
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _v3_stages(docs)


_DOM_BLOCKED = ("src7", "src13")
_DOM_QUOTA = 15


def _domain_prelude() -> tuple[str, str]:
    """(prelude_ctes, src_rel) for the domain-filtered oracles."""
    rank = domains.rank_expr("source", "doc_id", D)
    blocked = ", ".join(f"'{b}'" for b in _DOM_BLOCKED)
    prelude = f"""ranked AS (
      SELECT doc_id, text, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {rank}, doc_id) AS slot
      FROM documents WHERE source NOT IN ({blocked})
    ),
    dom AS (SELECT doc_id, text FROM ranked WHERE slot <= {_DOM_QUOTA}),
    """
    return prelude, "dom"


@register(
    "url_domain_filter",
    oracle=f"""
    SELECT doc_id, source, CAST(slot AS BIGINT) AS slot FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {domains.rank_expr('source', 'doc_id', D)},
                                         doc_id) AS slot
      FROM documents WHERE source NOT IN ('src7', 'src13')
    ) WHERE slot <= {_DOM_QUOTA} ORDER BY doc_id
    """,
    doc="URL/domain-level curation front door (the C4/RefinedWeb "
    "step): broadcast left-anti blocklist join, then a deterministic "
    f"per-domain quota of {_DOM_QUOTA} documents chosen by content-"
    "hash rank — retries and repartitioning select the SAME documents "
    "(DataFrame.sample cannot promise that). Scale: the quota is a "
    "two-phase top-k (Arrow map-side per-partition cap, then a window "
    "over n_partitions x quota survivors per domain), so a giant "
    "domain never lands on one reducer (operators/domains.py).",
)
def url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = domains.filter_blocklist(docs, _DOM_BLOCKED)
    return (
        domains.quota_sample(survivors, _DOM_QUOTA)
        .select("doc_id", "source", "slot")
        .orderBy("doc_id")
    )


@register(
    "curation_pipeline_v4",
    oracle=_v3_oracle(src=_domain_prelude()[1], prelude=_domain_prelude()[0]),
    doc="curation_pipeline_v3 with the domain front door composed in: "
    "blocklist anti-join -> per-domain quota sample -> classifier "
    "filter -> boilerplate segment removal -> exact dedup of cleaned "
    "text, all one lazy plan. The quota survivor set (n_domains x "
    "quota narrow rows) semi-joins back onto the payload broadcast-"
    "style, so the fact table is filtered map-side before the first "
    "shuffle (operators/domains.py + the _v3_stages composition).",
)
def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = domains.filter_blocklist(docs, _DOM_BLOCKED)
    picked = domains.quota_sample(survivors, _DOM_QUOTA).select("doc_id")
    base = survivors.join(F.broadcast(picked), "doc_id", "left_semi").select(
        "doc_id", "text"
    )
    return _v3_stages(base)


_HQ_BINS = 256
_HQ_QS = (0.25, 0.5, 0.75, 0.95, 0.99)


@register(
    "histogram_quantile_sketch",
    oracle=f"""
    WITH b AS (
      SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
             max(CAST(l_extendedprice AS DOUBLE)) AS hi
      FROM lineitem
    ),
    h AS (
      SELECT least(CAST({_HQ_BINS - 1} AS BIGINT),
                   greatest(CAST(0 AS BIGINT),
                     CAST(floor((CAST(l_extendedprice AS DOUBLE) - b.lo)
                                / (b.hi - b.lo) * {_HQ_BINS}) AS BIGINT)))
               AS bin,
             count(*) AS cnt
      FROM lineitem, b GROUP BY 1
    ),
    c AS (
      SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
             sum(cnt) OVER () AS total
      FROM h
    ),
    qs AS (SELECT unnest([{', '.join(str(q) for q in _HQ_QS)}]) AS q),
    sel AS (
      SELECT q, min(bin) AS b_
      FROM c, qs WHERE cum >= q * total GROUP BY q
    )
    SELECT q,
           CAST(b.lo + (b_ + 1) * ((b.hi - b.lo) / {_HQ_BINS}) AS DOUBLE)
             AS estimate,
           CAST((b.hi - b.lo) / {_HQ_BINS} AS DOUBLE) AS max_err
    FROM sel, b ORDER BY q
    """,
    doc="Deterministic mergeable quantile sketch: a 256-bin equi-width "
    "histogram (bounded-key shuffle, counters merge by addition like "
    "the CMS) answers any quantile with a hard one-bin-width error "
    "bound. Chosen over t-digest/GK precisely because those sketches' "
    "merge-order-dependent centroids cannot be hash-checked across "
    "engines; this one is bit-reproducible (operators/sketches.py). "
    "The cumsum window runs over <= 256 rows, never the data.",
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("double")
    lo, hi = li.agg(F.min(x), F.max(x)).first()
    hist = sketches.histogram_build(
        li, "l_extendedprice", float(lo), float(hi), _HQ_BINS
    )
    return sketches.histogram_quantiles(
        hist, list(_HQ_QS), float(lo), float(hi), _HQ_BINS
    )


@register(
    "corpus_token_accounting",
    oracle=f"""
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(len({PT.tokens('text', D)})) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY ROLLUP (source, lang)
    ORDER BY source NULLS FIRST, lang NULLS FIRST
    """,
    doc="Corpus accounting: the token-budget report every mixture "
    "plan starts from — docs/tokens/chars per (domain, language) with "
    "ROLLUP subtotals per domain and a grand total, produced in ONE "
    "aggregation pass (rollup partials combine map-side; output rows "
    "= #domains x #languages, trivially collectable at any corpus "
    "size). Token counting is the portable whitespace tokenizer, so "
    "both engines count identically.",
)
def corpus_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            F.size(F.expr(PT.tokens("text", S))).cast("bigint").alias("_nt"),
            F.col("n_chars").cast("bigint").alias("_nc"),
        )
        .rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum("_nc").alias("total_chars"),
        )
        .orderBy(
            F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first()
        )
    )


_LM_ORACLE = f"""
    WITH t AS (SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents),
    uni AS (SELECT word, count(*) AS c1
            FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    v AS (SELECT count(*) AS vs FROM uni),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
           FROM t),
    bi AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    scored AS (
      SELECT g.doc_id,
             CAST(floor(-ln((coalesce(b.c2, 0) + 1)
                            / CAST(u.c1 + v.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp
      FROM bg g
      LEFT JOIN bi b USING (bigram)
      JOIN uni u ON u.word = string_split(g.bigram, chr(1))[1]
      CROSS JOIN v
    ),
    agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(nlp) AS s
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           CAST(coalesce(a.s, 0) AS BIGINT) AS sum_nlp_micro,
           CAST(coalesce(a.s, 0) // greatest(coalesce(a.n_bigrams, 0), 1)
                AS BIGINT) AS avg_nlp_micro
    FROM (SELECT doc_id FROM t) d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""


@register(
    "lm_perplexity_score",
    oracle=_LM_ORACLE,
    bench=True,
    doc="N-gram LM perplexity scoring (the CCNet/Gopher quality "
    "signal): every document's bigram cross-entropy under an add-one "
    "bigram LM trained in one pass over the corpus (vocabulary-scale "
    "model tables, never corpus-scale). Per-bigram -ln p snaps to "
    "integer micro-units (the BM25 fixed-point convention) so the "
    "per-doc sums are order-independent BIGINTs and the average is "
    "exact integer division — hash-identical across engines. Scale: "
    "one uniform bigram-key shuffle join + a unigram fallback join + "
    "one per-doc agg; <2-token documents survive with n_bigrams=0 "
    "(operators/lm.py).",
)
def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni, bi, v = lm.train_bigram_lm(docs)
    return lm.perplexity_score(docs, uni, bi, v).orderBy("doc_id")


# The KN model/scoring CTE chain through the per-bigram `scored`
# table — shared verbatim by the kneser_ney_perplexity and
# mink_prob_contamination oracles (both aggregate `scored`
# differently), so the two can never drift apart.
_KN_SCORED_CTES = f"""
    WITH t AS (SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
           FROM t),
    bi AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    w1 AS (SELECT string_split(bigram, chr(1))[1] AS w,
                  CAST(sum(c2) AS BIGINT) AS c1w,
                  CAST(count(*) AS BIGINT) AS n1p
           FROM bi GROUP BY 1),
    w2 AS (SELECT string_split(bigram, chr(1))[2] AS w,
                  CAST(count(*) AS BIGINT) AS ncont
           FROM bi GROUP BY 1),
    bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
    scored AS (
      SELECT g.doc_id,
             CAST(floor(-ln(
               CAST(greatest(4 * b.c2 - 3, 0) * bt.b
                    + 3 * w1.n1p * w2.ncont AS DOUBLE)
               / CAST(4 * w1.c1w * bt.b AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS nlp
      FROM bg g
      JOIN bi b USING (bigram)
      JOIN w1 ON w1.w = string_split(g.bigram, chr(1))[1]
      JOIN w2 ON w2.w = string_split(g.bigram, chr(1))[2]
      CROSS JOIN bt
    )"""

_KN_ORACLE = f"""{_KN_SCORED_CTES},
    agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(nlp) AS s
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           CAST(coalesce(a.s, 0) AS BIGINT) AS sum_nlp_micro,
           CAST(coalesce(a.s, 0) // greatest(coalesce(a.n_bigrams, 0), 1)
                AS BIGINT) AS avg_nlp_micro
    FROM (SELECT doc_id FROM t) d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""


@register(
    "kneser_ney_perplexity",
    oracle=_KN_ORACLE,
    bench=True,
    doc="Interpolated Kneser-Ney bigram scoring — the smoothing that "
    "beats add-one on real text (Chen & Goodman 1998): absolute "
    "discount D=3/4 kept RATIONAL so P_KN = (max(4*c2-3,0)*B + "
    "3*N1+(w1,.)*N1+(.,w2)) / (4*c(w1 .)*B) is ONE ratio of exact "
    "BIGINTs — the continuation counts N1+ are the KN insight "
    "(how many DISTINCT contexts a word appears in, not how often). "
    "All three model tables derive from the bigram-TYPE table, so KN "
    "adds only vocabulary-scale aggregations to the one corpus-scale "
    "bigram count pass; scoring is the same uniform bigram-key "
    "shuffle join as lm_perplexity_score plus two vocabulary-keyed "
    "joins. -ln snaps to micro-units before the per-doc BIGINT sum "
    "(operators/lm.py kneser_ney_score).",
)
def kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bi, w1s, w2s, b = lm.train_kneser_ney_lm(docs)
    return lm.kneser_ney_score(docs, bi, w1s, w2s, b).orderBy("doc_id")


def _unigram_oracle(sf_dir: str) -> str:
    """Sparkless twin: word counts from the parquet, the same seeding
    + hard-EM + Viterbi pure functions, per-doc stats as VALUES — the
    bpe_encode_corpus convention; Spark and the twin share only the
    pure (deterministic-integer) functions, while every AGGREGATION
    runs through a different engine."""
    from ..operators import unigram

    path = f"{sf_dir}/documents.parquet"
    wc = unigram.word_counts_from_parquet(path)
    counts = unigram.train_unigram_py(wc)
    stats = unigram.encode_stats_from_parquet(path, counts)
    values = ",\n             ".join(
        f"({d}, {a}, {b}, {c})" for d, (a, b, c) in sorted(stats.items())
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(sum_cost_micro AS BIGINT) AS sum_cost_micro
    FROM (VALUES {values})
      AS t(doc_id, n_words, n_pieces, sum_cost_micro)
    ORDER BY doc_id
    """


@register(
    "unigram_lm_tokenize",
    oracle=_unigram_oracle,
    bench=True,
    doc="Unigram-LM subword tokenizer (SentencePiece; Kudo 2018) — "
    "the OTHER major vocab recipe beside BPE: seed all substrings up "
    "to 4 chars over the word-frequency table, fit piece "
    "probabilities by two hard-EM rounds (Viterbi-segment every "
    "distinct word, re-count pieces), then report per-document "
    "fertility stats (n_words, n_pieces, total micro-cost) under the "
    "trained model. Corpus touched ONCE (word_frequencies); seeding "
    "and every EM round are vocabulary-scale aggregations with the "
    "piece-cost model riding in an Arrow pandas_udf closure "
    "(constant plan size — the BPE FOLD_MAX lesson). All arithmetic "
    "is exact-integer (micro-cost Viterbi DP with a total tie rule: "
    "longest piece on equal cost); ln is applied driver-side to "
    "exact count ratios, so the two engines only have to agree on "
    "integer counts (operators/unigram.py).",
)
def unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import unigram

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    counts = unigram.train_unigram(docs)
    return unigram.encode_stats(docs, counts).orderBy("doc_id")


#: temperature-weighting sample budget (slots to apportion) and the
#: milli-snapped weight expression shared by both dialects: w_d =
#: mass_d^0.7 computed as exp(0.7 * ln(mass)) with EACH transcendental
#: applied once to a bit-identical double input and snapped — ln takes
#: an exact-BIGINT cast, its micro-snap re-enters exp as (7 * micro) /
#: 1e7, both exact-int-derived doubles (the psi/lm snap convention,
#: extended to a two-transcendental chain).
_TEMP_BUDGET = 1_000_000
_TEMP_W = (
    "CAST(floor(exp(CAST(7 * CAST(floor(ln(CAST(mass AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 10000000.0)"
    " * 1000.0 + 0.5) AS BIGINT)"
)


@register(
    "temperature_mixture_weights",
    oracle=f"""
    WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
               FROM documents GROUP BY 1),
    w AS (SELECT source, mass, {_TEMP_W} AS w_milli FROM m),
    tot AS (SELECT CAST(sum(w_milli) AS BIGINT) AS tw FROM w),
    q AS (SELECT source, mass, w_milli,
                 CAST(({_TEMP_BUDGET} * w_milli) // tw AS BIGINT)
                   AS base_alloc,
                 CAST(({_TEMP_BUDGET} * w_milli) % tw AS BIGINT) AS rem
          FROM w CROSS JOIN tot),
    l AS (SELECT CAST({_TEMP_BUDGET} - sum(base_alloc) AS BIGINT)
                   AS leftover FROM q),
    r AS (SELECT q.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q)
    SELECT source, mass, w_milli, base_alloc,
           CAST(CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(base_alloc
                + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r CROSS JOIN l ORDER BY source
    """,
    doc="Temperature-based mixture apportionment (the mT5/multilingual "
    "sampling rule): domain weight = mass^0.7 — the exponent that "
    "up-samples tail domains without letting the head starve them — "
    f"then {_TEMP_BUDGET} sample slots apportioned by LARGEST "
    "REMAINDER (Hamilton): floor quotas in exact integer arithmetic, "
    "leftovers to the largest remainders with a deterministic "
    "(remainder DESC, source) tiebreak, so sum(alloc) == budget "
    "EXACTLY — the invariant naive float-rounding apportionment "
    "violates. The power folds to exp(0.7*ln(mass)) with each "
    "transcendental applied once to an exact-integer-derived double "
    "and snapped (module constant _TEMP_W). Scale: one partial-agg'd "
    "domain rollup (output rows = #domains); the quota window runs "
    "over that bounded table, never the corpus — feeds "
    "mixture.sample_to_mixture as its weights table.",
)
def temperature_mixture_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    m = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    )
    w = m.withColumn("w_milli", F.expr(_TEMP_W))
    tot = w.agg(F.sum("w_milli").cast("bigint").alias("tw"))
    q = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "base_alloc", F.expr(f"({_TEMP_BUDGET} * w_milli) DIV tw")
        )
        .withColumn("rem", F.expr(f"({_TEMP_BUDGET} * w_milli) % tw"))
    )
    leftover = q.agg(
        (F.lit(_TEMP_BUDGET) - F.sum("base_alloc"))
        .cast("bigint")
        .alias("leftover")
    )
    # global window over the DOMAIN table (rows = #domains, bounded)
    # — never over the corpus
    rk = F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    return (
        q.withColumn("rk", rk)
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "mass",
            "w_milli",
            "base_alloc",
            F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("extra"),
            (
                F.col("base_alloc")
                + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("source")
    )


_PACK_BUDGET = 2048


def _prep_oracle(sf_dir: str) -> str:
    from ..operators import bpe

    path = f"{sf_dir}/documents.parquet"
    merges = bpe.train_merges_from_parquet(path, _ENC_N_MERGES)
    stats = bpe.encode_stats_from_parquet(path, merges)
    values = ",\n             ".join(
        f"({d}, {ns})" for d, (_, ns) in sorted(stats.items())
    )
    return f"""
    WITH enc AS (SELECT * FROM (VALUES {values}) t(doc_id, n_syms)),
    kept AS (
      SELECT d.doc_id, d.source, e.n_syms
      FROM documents d JOIN enc e USING (doc_id)
      WHERE {classifier.oracle_score_sql('d.text', _CLS_WEIGHTS, _CLS_BIAS)}
            >= 0.0
    ),
    p AS (
      SELECT source, doc_id, n_syms,
             sum(n_syms) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_syms AS prefix
      FROM kept
    )
    SELECT source, CAST(prefix // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_syms) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM p GROUP BY source, pack_id ORDER BY source, pack_id
    """


@register(
    "pretrain_prep_pipeline",
    oracle=_prep_oracle,
    doc="The training-prep capstone: classifier quality filter -> "
    "whitespace tokenize -> BPE subword ENCODE (Arrow encoder, "
    "trained merge table) -> per-source sequence packing into "
    f"~{_PACK_BUDGET}-token bins — i.e. packing REAL subword counts, "
    "not whitespace counts, which is what the trainer's data loader "
    "sees. Every stage is an already-gated operator; composition adds "
    "one (doc_id, int) partial-agg shuffle and the per-shard packing "
    "window (partitioned by source — no global window). Oracle "
    "re-encodes through the sequential Python twin and packs in SQL.",
)
def pretrain_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import bpe

    merges = bpe.train_merges_from_parquet(
        f"{sf_dir}/documents.parquet", _ENC_N_MERGES
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    kept = classifier.score_documents(
        docs, _CLS_WEIGHTS, bias=_CLS_BIAS
    ).filter(F.col("keep"))
    words = kept.select(
        "doc_id",
        "source",
        F.explode(F.expr(PT.tokens("text", S))).alias("word"),
    ).withColumn("syms", F.expr("split(word, '')"))
    enc = bpe.apply_merges(words, merges, "syms", mode="arrow")
    per_doc = (
        enc.select("doc_id", "source", F.size("syms").alias("_n"))
        .groupBy("doc_id", "source")
        .agg(F.sum("_n").cast("bigint").alias("n_syms"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = per_doc.withColumn(
        "prefix", F.sum("n_syms").over(w) - F.col("n_syms")
    ).withColumn("pack_id", F.expr(f"prefix DIV {_PACK_BUDGET}"))
    return (
        p.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_syms").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


def _html_wrap_sql(dialect: str) -> str:
    """Deterministic HTML page around each doc (the corpus has no raw
    HTML, so the query manufactures the same page on both engines):
    head noise that must vanish, body content that must survive.
    DuckDB-dialect string (the Spark side builds the identical page
    with F.concat)."""
    assert dialect == D
    return (
        "'<html><head><title>T&amp;C</title><script type=\"text/javascript\">"
        "var x = 1 < 2;</script><style>p { color: red; }</style></head>"
        "<body><h1>' || source || '</h1><!-- nav --><p>' || text ||"
        " '</p>&nbsp;<em>fin</em></body></html>'"
    )


@register(
    "html_text_extraction",
    oracle=f"""
    SELECT doc_id,
           {htmltext.html_to_text_sql(_html_wrap_sql(D), D)} AS extracted,
           CAST(length({htmltext.html_to_text_sql(_html_wrap_sql(D), D)})
                AS BIGINT) AS n_chars
    FROM documents ORDER BY doc_id
    """,
    doc="HTML -> text extraction (the WET step of a web-corpus "
    "pipeline): strip script/style/comment blocks and tags, decode "
    "entities, collapse whitespace — a pure regexp_replace codegen "
    "chain, zero shuffles, with every pattern chosen to mean the same "
    "thing in Java regex and RE2 so the oracle is exact "
    "(functions/htmltext.py). The corpus has no raw HTML, so the "
    "query wraps each document in a deterministic page (script + "
    "style + comment + entities) and must recover exactly the "
    "heading, body text and decoded entities.",
)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            '<html><head><title>T&amp;C</title><script type="text/javascript">'
            "var x = 1 < 2;</script><style>p { color: red; }</style></head>"
            "<body><h1>"
        ),
        F.col("source"),
        F.lit("</h1><!-- nav --><p>"),
        F.col("text"),
        F.lit("</p>&nbsp;<em>fin</em></body></html>"),
    )
    extracted = htmltext.html_to_text(page)
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.length(extracted).cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "intradoc_segment_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
      FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST(g.i AS BIGINT) AS seg_pos,
             array_to_string(
               list_slice(toks, CAST(g.i * {_SEG_W} + 1 AS BIGINT),
                          CAST(g.i * {_SEG_W} + {_SEG_W} AS BIGINT)), ' ')
               AS seg
      FROM t, unnest(range(CAST(ceil(len(toks) / {_SEG_W}.0) AS BIGINT))) AS g(i)
    ),
    f AS (SELECT doc_id, seg, min(seg_pos) AS fp
          FROM segs GROUP BY doc_id, seg)
    SELECT s.doc_id,
           coalesce(string_agg(
             CASE WHEN s.seg_pos = f.fp OR s.seg = '' THEN s.seg END,
             ' ' ORDER BY s.seg_pos), '') AS clean_text,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN s.seg_pos <> f.fp AND s.seg <> '' THEN 1
                         ELSE 0 END) AS BIGINT) AS n_removed
    FROM segs s JOIN f ON s.doc_id = f.doc_id AND s.seg = f.seg
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    doc="INTRA-document segment dedup — the Gopher repetition rules "
    "as removal rather than scoring: a segment repeated inside one "
    "document keeps its first occurrence, later copies are stripped, "
    "order preserved, blank segments survive. One (doc, segment) "
    "groupBy + the order-restoring array_sort reassembly — no window "
    "wider than a document, no UDFs "
    "(operators/linededup.py dedup_segments_within_doc).",
)
def intradoc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    segs = linededup.segment_token_windows(docs, w=_SEG_W)
    return linededup.dedup_segments_within_doc(segs).orderBy("doc_id")


def _compression_values(sf_dir: str) -> str:
    """VALUES rows (doc_id, raw, comp, ratio) from the zlib Python
    twin — shared by the compression-ratio oracle and the v5 curation
    oracle."""
    import math
    import zlib

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = (text or "").encode("utf-8")
        c = len(zlib.compress(b, 6)) if b else 0
        r = 0.0 if not b else math.floor(c / len(b) * 1e6 + 0.5) / 1e6
        rows.append(f"({did}, {len(b)}, {c}, {r!r})")
    return ",\n           ".join(rows)


def _compression_oracle(sf_dir: str) -> str:
    """Python-twin dynamic oracle (the bpe_train_merges convention):
    re-compress every document with the IDENTICAL zlib call in this
    interpreter and inline the expected rows as VALUES — proving the
    Spark plan's batching/NULL plumbing, with byte counts exact and
    ratios micro-rounded by the same formula."""
    values = _compression_values(sf_dir)
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(raw_bytes AS BIGINT) AS raw_bytes,
           CAST(compressed_bytes AS BIGINT) AS compressed_bytes,
           CAST(compression_ratio AS DOUBLE) AS compression_ratio
    FROM (VALUES {values})
      t(doc_id, raw_bytes, compressed_bytes, compression_ratio)
    ORDER BY doc_id
    """


@register(
    "textstats_compression_ratio",
    oracle=_compression_oracle,
    doc="zlib compressibility quality proxy (functions/textstats."
    "compression_ratio_arrow): per-doc raw/compressed byte counts and "
    "micro-rounded ratio — the Gopher repetition/junk signal that "
    "n-gram rules miss. Map-side Arrow pass, no shuffle; "
    "deterministic for a fixed zlib level, so the Python-twin VALUES "
    "oracle hash-gates a signal SQL cannot express.",
)
def textstats_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textstats import compression_ratio_arrow

    docs = load_table(spark, sf_dir, "documents")
    return compression_ratio_arrow(docs, "text", "doc_id").orderBy("doc_id")


_V5_MAX_DUP = 0.5
_V5_CR_LO, _V5_CR_HI = 0.43, 0.95


def _v5_oracle(sf_dir: str) -> str:
    """v5 oracle: the duplicate-span CTE chain (SQL, from the gated
    dedup_duplicate_spans oracle pieces) joined to the zlib
    Python-twin VALUES, with the same keep thresholds."""
    from .driver_queries_similarity import _SPAN_FRAC, _SPAN_K, _SPAN_TOKS

    values = _compression_values(sf_dir)
    return f"""
    WITH t AS (SELECT doc_id, {_SPAN_TOKS} AS toks FROM documents),
    h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 {PT.hash_array('toks', PT.DUCKDB)} AS th FROM t),
    gr AS (SELECT doc_id, n_tokens,
                  {PT.word_ngram_hashes('th', _SPAN_K, PT.DUCKDB)} AS grams
           FROM h),
    g AS (SELECT doc_id, i AS pos, grams[i + 1] AS gram_hash
          FROM gr, unnest(range(len(grams))) AS u(i)),
    dup AS (SELECT gram_hash FROM g GROUP BY gram_hash HAVING count(*) >= 2),
    contrib AS (
      SELECT doc_id, pos,
             max(pos + {_SPAN_K}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM g JOIN dup USING (gram_hash)),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(greatest(0, pos + {_SPAN_K}
                               - greatest(coalesce(prev_end, pos), pos)))
                  AS BIGINT) AS covered_tokens
      FROM contrib GROUP BY doc_id),
    spans AS (
      SELECT gr.doc_id, gr.n_tokens,
             CASE WHEN gr.n_tokens = 0 THEN 0.0
                  ELSE {_SPAN_FRAC} END AS dup_fraction
      FROM gr LEFT JOIN per_doc USING (doc_id)),
    comp AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(compression_ratio AS DOUBLE) AS compression_ratio
      FROM (VALUES {values})
        t(doc_id, raw_bytes, compressed_bytes, compression_ratio))
    SELECT spans.doc_id, spans.n_tokens, spans.dup_fraction,
           comp.compression_ratio
    FROM spans JOIN comp ON comp.doc_id = spans.doc_id
    WHERE spans.dup_fraction <= {_V5_MAX_DUP}
      AND comp.compression_ratio BETWEEN {_V5_CR_LO} AND {_V5_CR_HI}
    ORDER BY spans.doc_id
    """


@register(
    "curation_pipeline_v5",
    oracle=_v5_oracle,
    doc="fifth curation composition — the two NEWEST signals fused "
    "into one selection: keep documents whose duplicated-span "
    "fraction (dedup.duplicate_spans, the Lee et al. exact-substring "
    "signal) stays <= 0.5 AND whose zlib compression ratio "
    "(textstats.compression_ratio_arrow, the Gopher "
    "compressibility band) sits in [0.43, 0.95] — dropping "
    "boilerplate-heavy, repetition-collapsed, and junk-incompressible "
    "documents in one pass. One lazy plan: the span branch's only "
    "wide ops are its gram-key and doc-key shuffles, the compression "
    "branch is a map-side Arrow pass, and the final join keys on "
    "doc_id. Oracle = span SQL chain x zlib Python-twin VALUES.",
)
def curation_pipeline_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textstats import compression_ratio_arrow
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    spans = dedup.duplicate_spans(docs, "doc_id", "text", k=8).select(
        "doc_id", "n_tokens", "dup_fraction"
    )
    comp = compression_ratio_arrow(docs, "text", "doc_id").select(
        "doc_id", "compression_ratio"
    )
    return (
        spans.join(comp, "doc_id")
        .filter(
            (F.col("dup_fraction") <= _V5_MAX_DUP)
            & F.col("compression_ratio").between(_V5_CR_LO, _V5_CR_HI)
        )
        .select("doc_id", "n_tokens", "dup_fraction", "compression_ratio")
        .orderBy("doc_id")
    )


def _linked_page_spark() -> F.Column:
    return F.concat(
        F.lit('<html><body><h1>doc</h1><a href="https://'),
        F.col("source"),
        F.lit('.example.com/doc/'),
        F.col("doc_id").cast("string"),
        F.lit('">self</a><p>body</p><a class="nav" href="/doc/'),
        (F.col("doc_id") % 50).cast("string"),
        F.lit('">next</a><area href="#skip"></body></html>'),
    )


_LINK_PAGE_DUCK = (
    "'<html><body><h1>doc</h1><a href=\"https://' || source || "
    "'.example.com/doc/' || CAST(doc_id AS VARCHAR) || "
    "'\">self</a><p>body</p><a class=\"nav\" href=\"/doc/' || "
    "CAST(doc_id % 50 AS VARCHAR) || "
    "'\">next</a><area href=\"#skip\"></body></html>'"
)


@register(
    "html_link_extraction",
    oracle=f"""
    WITH pages AS (SELECT doc_id, {_LINK_PAGE_DUCK} AS page FROM documents),
    links AS (SELECT doc_id,
                     {htmltext.extract_links_sql('page', 'duckdb')} AS hrefs
              FROM pages)
    SELECT doc_id, i AS pos, hrefs[i + 1] AS href
    FROM links, unnest(range(len(hrefs))) AS u(i)
    ORDER BY doc_id, pos
    """,
    doc="HTML link harvest (the WAT step beside html_text_extraction's "
    "WET step): every anchor href in document order via ONE "
    "regexp_extract_all capture — a pattern chosen to compile "
    "identically under Java regex and RE2, zero shuffles before the "
    "explode. The corpus has no raw HTML, so each doc wraps in a "
    "deterministic page with an absolute link, a relative link, and "
    "an <area> decoy that must NOT match. Exploded (doc, pos, href) "
    "edges are exactly what feeds operators/graph.pagerank for "
    "link-graph ranking.",
)
def html_link_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select("doc_id", _linked_page_spark().alias("page"))
    links = pages.select(
        "doc_id", htmltext.extract_links(F.col("page")).alias("hrefs")
    )
    return links.select(
        "doc_id", F.posexplode("hrefs").alias("pos", "href")
    ).orderBy("doc_id", "pos")


_URLV_SPARK = """
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN concat('https://', source, '.example.com/doc/',
                       CAST(doc_id % 25 AS STRING))
    WHEN 1 THEN concat('HTTPS://', upper(source), '.EXAMPLE.COM/doc/',
                       CAST(doc_id % 25 AS STRING))
    WHEN 2 THEN concat('https://', source, '.example.com/doc/',
                       CAST(doc_id % 25 AS STRING), '?utm_source=feed&utm_medium=rss')
    ELSE concat('https://', source, '.example.com/doc/',
                CAST(doc_id % 25 AS STRING), '/#section-2')
  END
"""

_URLV_DUCK = """
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 'https://' || source || '.example.com/doc/' ||
                CAST(doc_id % 25 AS VARCHAR)
    WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM/doc/' ||
                CAST(doc_id % 25 AS VARCHAR)
    WHEN 2 THEN 'https://' || source || '.example.com/doc/' ||
                CAST(doc_id % 25 AS VARCHAR) || '?utm_source=feed&utm_medium=rss'
    ELSE 'https://' || source || '.example.com/doc/' ||
         CAST(doc_id % 25 AS VARCHAR) || '/#section-2'
  END
"""


@register(
    "url_canonical_dedup",
    oracle=f"""
    WITH urls AS (SELECT doc_id, ({_URLV_DUCK}) AS url FROM documents),
    canon AS (SELECT doc_id, url,
                     {domains.canonical_url_sql('url', 'duckdb')} AS canonical
              FROM urls)
    SELECT canonical,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
           min(doc_id) AS first_doc
    FROM canon GROUP BY canonical ORDER BY canonical
    """,
    doc="URL canonicalization + frontier dedup (operators/domains."
    "canonical_url_sql): uppercase hosts, utm tracking params, "
    "fragments and trailing slashes all collapse to one canonical "
    "form — the crawl stage that keeps the SAME page from entering "
    "the corpus four times. The corpus has no URL column, so each "
    "doc synthesizes one of four deterministic variants of a shared "
    "target; the gate proves every variant lands on the same "
    "canonical. Pure codegen regexp chain (dialect-exact: RE2 'g' "
    "flag, backref and escaping differences handled), then one "
    "uniform-key groupBy.",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.selectExpr("doc_id", f"({_URLV_SPARK}) AS url")
    canon = urls.selectExpr(
        "doc_id",
        "url",
        f"{domains.canonical_url_sql('url', 'spark')} AS canonical",
    )
    return (
        canon.groupBy("canonical")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.countDistinct("url").cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("canonical")
    )


def _ensemble_oracle(sf_dir: str) -> str:
    from .driver_queries_similarity import _QUALITY_ORACLE

    values = _compression_values(sf_dir)
    return f"""
    WITH q AS ({_QUALITY_ORACLE}),
    c AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(compression_ratio AS DOUBLE) AS cr
          FROM (VALUES {values}) t(doc_id, raw_bytes, compressed_bytes,
                                   compression_ratio)),
    sig AS (SELECT q.doc_id,
                   CAST(FLOOR(q.quality * 1000000.0 + 0.5) AS BIGINT) AS qa,
                   CAST(FLOOR(c.cr * 1000000.0 + 0.5) AS BIGINT) AS qb
            FROM q JOIN c ON c.doc_id = q.doc_id),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(qa) AS DECIMAL(38,0)) AS s1a,
                   CAST(sum(CAST(qa AS DECIMAL(38,0)) * qa) AS DECIMAL(38,0)) AS s2a,
                   CAST(sum(qb) AS DECIMAL(38,0)) AS s1b,
                   CAST(sum(CAST(qb AS DECIMAL(38,0)) * qb) AS DECIMAL(38,0)) AS s2b
            FROM sig),
    z AS (SELECT sig.doc_id,
                 CASE WHEN CAST(n AS DOUBLE) * CAST(s2a AS DOUBLE)
                           - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) <= 0.0
                      THEN 0.0
                      ELSE (CAST(qa AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1a AS DOUBLE))
                           / sqrt(CAST(n AS DOUBLE) * CAST(s2a AS DOUBLE)
                                  - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
                 END AS za,
                 CASE WHEN CAST(n AS DOUBLE) * CAST(s2b AS DOUBLE)
                           - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) <= 0.0
                      THEN 0.0
                      ELSE (CAST(qb AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1b AS DOUBLE))
                           / sqrt(CAST(n AS DOUBLE) * CAST(s2b AS DOUBLE)
                                  - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
                 END AS zb
          FROM sig, mom)
    SELECT doc_id,
           CAST(FLOOR(((za + zb) * 1000000.0) + 0.5) AS DOUBLE) / 1000000.0
             AS ensemble_z
    FROM z ORDER BY ensemble_z DESC, doc_id LIMIT 20
    """


@register(
    "quality_ensemble_topk",
    oracle=_ensemble_oracle,
    bench=True,
    doc="multi-signal quality ensemble (the FineWeb-style blended "
    "filter): the textstats composite score and the zlib compression "
    "ratio are z-normalized against CORPUS moments and summed; top-20 "
    "by the blended score. Scale-safe rank-free normalization: "
    "signals snap to exact integer micro-units, the five moment sums "
    "aggregate exactly in DECIMAL(38,0) (one 1-row broadcast — no "
    "global sort, no percent_rank over the corpus), and only the "
    "final z arithmetic runs in double, micro-rounded so the "
    "decimal->double ULP divergence between engines collapses.",
)
def quality_ensemble_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textstats import compression_ratio_arrow, quality_stats_arrow
    from ..session import barrier as _barrier

    docs = load_table(spark, sf_dir, "documents")
    # FLOOR(x*1e6 + 0.5), not a bare cast: DuckDB CAST(double AS
    # BIGINT) rounds to nearest while Spark truncates, and the
    # micro-rounded signals sit exactly on x.999... doubles
    qa = quality_stats_arrow(_barrier(docs), "text", "doc_id").selectExpr(
        "doc_id", "CAST(FLOOR(quality * 1000000.0 + 0.5) AS BIGINT) AS qa"
    )
    qb = compression_ratio_arrow(docs, "text", "doc_id").selectExpr(
        "doc_id",
        "CAST(FLOOR(compression_ratio * 1000000.0 + 0.5) AS BIGINT) AS qb",
    )
    sig = qa.join(qb, "doc_id").localCheckpoint(eager=True)
    mom = sig.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("qa").cast("decimal(38,0)").alias("s1a"),
        F.sum(F.col("qa").cast("decimal(38,0)") * F.col("qa")).cast(
            "decimal(38,0)"
        ).alias("s2a"),
        F.sum("qb").cast("decimal(38,0)").alias("s1b"),
        F.sum(F.col("qb").cast("decimal(38,0)") * F.col("qb")).cast(
            "decimal(38,0)"
        ).alias("s2b"),
    )
    # Zero-variance guard (z := 0 when a signal is constant across the
    # corpus): without it the denominator hits 0 and Spark (non-ANSI)
    # returns NULL for double x/0 while DuckDB's IEEE ops return
    # inf/NaN — the gate would diverge on a degenerate corpus instead
    # of agreeing. Same CASE in the oracle SQL.
    z = sig.crossJoin(F.broadcast(mom)).selectExpr(
        "doc_id",
        """CASE WHEN CAST(n AS DOUBLE) * CAST(s2a AS DOUBLE)
                     - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) <= 0.0
                THEN 0.0
                ELSE (CAST(qa AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1a AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE) * CAST(s2a AS DOUBLE)
                            - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
           END AS za""",
        """CASE WHEN CAST(n AS DOUBLE) * CAST(s2b AS DOUBLE)
                     - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) <= 0.0
                THEN 0.0
                ELSE (CAST(qb AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1b AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE) * CAST(s2b AS DOUBLE)
                            - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
           END AS zb""",
    )
    out = z.selectExpr(
        "doc_id",
        "CAST(FLOOR(((za + zb) * 1000000.0) + 0.5) AS DOUBLE) / 1000000.0"
        " AS ensemble_z",
    )
    return out.orderBy(F.desc("ensemble_z"), "doc_id").limit(20)


def _trained_cls_oracle(sf_dir: str) -> str:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    w = classifier.train_distilled_weights_py(
        rows, _CLS_WEIGHTS, _CLS_BIAS, _CLS_DIM, ridge=0.01
    )
    score = classifier.oracle_score_micro_sql("text", w)
    return f"""
    SELECT doc_id,
           {score} AS score_micro,
           {score} >= 0 AS keep
    FROM documents
    ORDER BY doc_id
    """


@register(
    "quality_classifier_trained",
    oracle=_trained_cls_oracle,
    doc="in-Spark classifier training (the verdict's what's-missing "
    "#2): ridge least squares distills the fixed-literal teacher "
    "(quality_classifier_filter's demo weights) into a trained "
    "micro-unit weight vector, then scores the corpus with it. The "
    "corpus-scale work is one hashed-feature pass plus one Gram/"
    "moment aggregation bounded by (dim+1)^2 output rows at ANY "
    "corpus size, integer-exact in DECIMAL(38,0); the (dim+1)-square "
    "solve is a driver-side numpy step (pq_train_codebook "
    "convention). The oracle RE-TRAINS via the bit-exact pure-Python "
    "twin and scores with ITS weights, so a green row proves "
    "Spark-trained == twin-trained weight-for-weight "
    "(operators/classifier.py train_distilled_weights; parity with "
    "the teacher's keep decisions asserted in "
    "tests/test_pretrain_ops.py).",
)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = classifier.train_distilled_weights(
        docs, _CLS_WEIGHTS, _CLS_BIAS, _CLS_DIM, ridge=0.01
    )
    return (
        classifier.score_documents_micro(docs, w)
        .select("doc_id", "score_micro", "keep")
        .orderBy("doc_id")
    )


@register(
    "cms_merge_estimate",
    oracle=_cms_oracle(),
    doc="CMS sketch MERGE (the additive half of the sketch-merge "
    "triad beside the HLL register store's max-merge and Bloom's "
    "OR-merge): the corpus splits into two halves, each builds its "
    "own d x width counter table, and the merged sketch is the "
    "element-wise counter SUM — CMS counters are additive, so the "
    "merged sketch is BIT-IDENTICAL to the single-pass build, which "
    "is exactly what gating against cms_heavy_hitters' single-pass "
    "oracle proves (the faithful-rewrite convention applied to "
    "sketch algebra). At 100 TB this is why CMS works at all: "
    "per-partition/per-day sketches merge associatively into any "
    "rollup without touching raw data again.",
)
def cms_merge_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        "doc_id", F.explode(F.expr(PT.tokens("text", S))).alias("tok")
    )
    half_a = items.filter(F.col("doc_id") < 250)
    half_b = items.filter(F.col("doc_id") >= 250)
    sk_a = sketches.cms_build(half_a, "tok", d=_CMS_D, width=_CMS_WIDTH)
    sk_b = sketches.cms_build(half_b, "tok", d=_CMS_D, width=_CMS_WIDTH)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("h_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    truth = items.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    est = sketches.cms_estimate(
        merged, truth.select("tok"), "tok", d=_CMS_D, width=_CMS_WIDTH
    )
    return (
        est.join(truth, "tok")
        .select(
            "tok",
            F.col("est").cast("bigint").alias("est"),
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
        )
        .orderBy(F.desc("est"), "tok")
        .limit(20)
    )


@register(
    "domain_category_lpm",
    oracle="""
    WITH rules(suffix, category) AS (VALUES
      ('com', 'generic'),
      ('example.com', 'default'),
      ('src3.example.com', 'curated'),
      ('src7.example.com', 'blocked')),
    urls AS (SELECT doc_id, source || '.example.com' AS dom FROM documents),
    p AS (SELECT doc_id, string_split(dom, '.') AS parts FROM urls),
    suf AS (
      SELECT doc_id, unnest(list_transform(range(1, len(parts) + 1),
               i -> struct_pack(
                      n := len(parts) - i + 1,
                      s := array_to_string(list_slice(parts, i, len(parts)),
                                           '.')))) AS x
      FROM p),
    m AS (SELECT s.doc_id, s.x.n AS n_labels, r.category
          FROM suf s JOIN rules r ON r.suffix = s.x.s),
    best AS (SELECT doc_id, max(n_labels) AS n_labels FROM m
             GROUP BY doc_id)
    SELECT m.category, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(m.n_labels) AS BIGINT) AS match_labels
    FROM m JOIN best USING (doc_id, n_labels)
    GROUP BY m.category ORDER BY m.category
    """,
    doc="longest-suffix-match domain categorization — the "
    "routing-table join (CIDR longest-prefix match, Public Suffix "
    "List lookup, per-domain policy tiers all share this shape): "
    "each domain explodes into its O(label-count) suffix chain, "
    "suffixes hash-join the rule table, and the LONGEST match wins "
    "per document (argmax on label count — unambiguous because a "
    "domain's suffixes have distinct lengths). No per-rule LIKE "
    "scan, no regex union: fan-out is bounded by domain depth "
    "(~3-5), the join is an exact hash join on the suffix key, and "
    "the rule table broadcasts — O(docs x depth) regardless of rule "
    "count, which is the whole point versus the O(docs x rules) "
    "LIKE-chain a naive categorizer runs.",
)
def domain_category_lpm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rules = spark.createDataFrame(
        [
            ("com", "generic"),
            ("example.com", "default"),
            ("src3.example.com", "curated"),
            ("src7.example.com", "blocked"),
        ],
        "suffix: string, category: string",
    )
    p = docs.select(
        "doc_id",
        F.split(F.concat(F.col("source"), F.lit(".example.com")), "\\.").alias(
            "parts"
        ),
    )
    suf = p.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(parts)), i -> "
                "struct(size(parts) - i + 1 AS n_labels, "
                "array_join(slice(parts, i, size(parts) - i + 1), '.') "
                "AS suffix))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.n_labels").alias("n_labels"), F.col("x.suffix").alias("suffix"))
    m = suf.join(F.broadcast(rules), "suffix")
    best = (
        m.groupBy("doc_id")
        .agg(
            F.max(F.struct("n_labels", "category")).alias("_top")
        )
        .select(
            "doc_id",
            F.col("_top.n_labels").alias("n_labels"),
            F.col("_top.category").alias("category"),
        )
    )
    return (
        best.groupBy("category")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_labels").cast("bigint").alias("match_labels"),
        )
        .orderBy("category")
    )


def _confusion_oracle() -> str:
    from .driver_queries_similarity import _QUALITY_ORACLE

    score = classifier.oracle_score_sql("text", _CLS_WEIGHTS, _CLS_BIAS)
    return f"""
    WITH q AS ({_QUALITY_ORACLE}),
    c AS (SELECT doc_id, ({score}) >= 0.0 AS cls_keep FROM documents)
    SELECT c.cls_keep, q.quality >= 0.75 AS ts_keep,
           CAST(count(*) AS BIGINT) AS n
    FROM c JOIN q USING (doc_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@register(
    "quality_signal_confusion",
    oracle=_confusion_oracle(),
    doc="filter-agreement confusion matrix between two independent "
    "quality signals -- the hashing-trick classifier's keep decision "
    "vs the heuristic composite's 0.75 threshold -- the 2x2 table a "
    "curator reads before stacking filters (high off-diagonal mass "
    "means the signals disagree and an ensemble adds information; "
    "near-diagonal means one filter is redundant). Both signals are "
    "map-side scalar folds over the text, joined on doc_id and "
    "counted -- one shuffle, four output rows at any corpus size. "
    "Composes two separately-gated scoring paths into one gated "
    "cross-check, so a regression in EITHER scorer breaks this hash "
    "too.",
)
def quality_signal_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import textstats as TSF

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier.score_documents(
        barrier(docs), _CLS_WEIGHTS, bias=_CLS_BIAS, text_col="text"
    ).select("doc_id", (F.col("score") >= 0.0).alias("cls_keep"))
    q = TSF.quality_stats_arrow(barrier(docs), "text", "doc_id").select(
        "doc_id", (F.col("quality") >= 0.75).alias("ts_keep")
    )
    return (
        scored.join(q, "doc_id")
        .groupBy("cls_keep", "ts_keep")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("cls_keep", "ts_keep")
    )


#: A-Res priority, shared by both dialects: u = (h+1)/(P+1) in (0,1)
#: from the portable polynomial hash (exact rational -> identical
#: IEEE double), priority = ln(u)/w maximized — the Efraimidis-
#: Spirakis key u^(1/w) in log space. Snapped to PICO units (1e12):
#: priorities live in (-21/w_min, 0) and micro units would collapse
#: distinct keys to ties; pico keeps ~6 significant digits for the
#: largest weights while staying far inside int64.
_ARES_K = 50


def _ares_pri(dialect: str) -> str:
    cast = "VARCHAR" if dialect == D else "STRING"
    h = PT.poly_hash(f"concat('ares', CAST(doc_id AS {cast}))", dialect)
    return (
        f"CAST(floor(ln(CAST(({h}) + 1 AS DOUBLE) / 1000000008.0)"
        " / CAST(n_chars AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT)"
    )


@register(
    "weighted_reservoir_sample",
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           {_ares_pri(D)} AS pri_pico
    FROM documents
    WHERE n_chars > 0
    ORDER BY pri_pico DESC, doc_id LIMIT {_ARES_K}
    """,
    doc="Weighted sampling WITHOUT replacement via A-Res priorities "
    "(Efraimidis & Spirakis 2006) — the distributed reservoir: each "
    "row gets key u^(1/w) with u a hash-derived uniform, and the "
    "global top-k by key IS an exact weighted sample without "
    "replacement — no sequential reservoir state, no coordination; "
    "the same top-k machinery Spark already plans as "
    "TakeOrderedAndProject (per-partition heaps + driver merge of k, "
    "never a global sort). Beside systematic_weighted_sample (fixed-"
    "rate, WITH replacement semantics) this adds the exactly-k, "
    "no-replacement draw every eval-set builder needs. Determinism: "
    "u is an exact rational from the portable polynomial hash, ln "
    "applied once to an identical IEEE input, priority snapped to "
    "integer PICO units (micro would collapse distinct keys), "
    "(pri, doc_id) total ordering.",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.expr(_ares_pri(S)).alias(
                "pri_pico"
            ),
        )
        .orderBy(F.desc("pri_pico"), "doc_id")
        .limit(_ARES_K)
    )


_DSIR_ORACLE = f"""
    WITH t AS (SELECT doc_id, lang, {PT.tokens('text', D)} AS toks
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
           FROM t),
    uni_r AS (SELECT word, count(*) AS c1
              FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    v_r AS (SELECT count(*) AS vs FROM uni_r),
    bi_r AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    tt AS (SELECT toks FROM t WHERE lang = 'en'),
    bg_t AS (SELECT unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
             FROM tt),
    uni_t AS (SELECT word, count(*) AS c1
              FROM (SELECT unnest(toks) AS word FROM tt) GROUP BY word),
    v_t AS (SELECT count(*) AS vs FROM uni_t),
    bi_t AS (SELECT bigram, count(*) AS c2 FROM bg_t GROUP BY bigram),
    scored AS (
      SELECT g.doc_id,
             CAST(floor(-ln((coalesce(br.c2, 0) + 1)
                            / CAST(coalesce(ur.c1, 0) + vr.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp_r,
             CAST(floor(-ln((coalesce(bt.c2, 0) + 1)
                            / CAST(coalesce(ut.c1, 0) + vt.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp_t
      FROM bg g
      LEFT JOIN bi_r br USING (bigram)
      LEFT JOIN uni_r ur ON ur.word = string_split(g.bigram, chr(1))[1]
      LEFT JOIN bi_t bt ON bt.bigram = g.bigram
      LEFT JOIN uni_t ut ON ut.word = string_split(g.bigram, chr(1))[1]
      CROSS JOIN v_r vr CROSS JOIN v_t vt
    ),
    agg AS (SELECT doc_id, count(*) AS nb,
                   CAST(sum(nlp_r) AS BIGINT) AS s_r,
                   CAST(sum(nlp_t) AS BIGINT) AS s_t
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id, d.lang,
           coalesce(a.nb, 0) AS n_bigrams,
           CAST(coalesce(a.s_r, 0) AS BIGINT) AS sum_nlp_raw_micro,
           CAST(coalesce(a.s_t, 0) AS BIGINT) AS sum_nlp_target_micro,
           CAST(coalesce(a.s_r, 0) - coalesce(a.s_t, 0) AS BIGINT)
             AS importance_micro
    FROM (SELECT doc_id, lang FROM t) d LEFT JOIN agg a USING (doc_id)
    ORDER BY importance_micro DESC, d.doc_id LIMIT 100
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    doc="Data Selection with Importance Resampling (DSIR; Xie et al. "
    "2023): rank raw-corpus documents by log p_target(x) - "
    "log p_raw(x) under two cheap bigram LMs — one trained on the "
    "TARGET domain (lang='en'), one on the whole corpus — selecting "
    "documents that look most like the target relative to the raw "
    "distribution; the published recipe for scaling curated-domain "
    "data. In log space the importance weight is EXACT integer "
    "arithmetic: both sides are the micro-snapped -ln sums the LM "
    "family already produces, so importance = sum_raw - sum_target "
    "as BIGINTs. Scale: two vocabulary-scale LM builds + ONE shared "
    "corpus-scale bigram explode scored against both models in the "
    "same pass (four model-keyed joins), then the two-phase top-k. "
    "Held-out smoothing: target-unseen bigrams fall back to add-one "
    "over the target vocabulary (operators/lm.py coalesce contract).",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    uni_r, bi_r, v_r = lm.train_bigram_lm(docs)
    target = docs.filter(F.col("lang") == "en")
    uni_t, bi_t, v_t = lm.train_bigram_lm(target)
    raw = lm.perplexity_score(docs, uni_r, bi_r, v_r).select(
        "doc_id",
        F.col("n_bigrams"),
        F.col("sum_nlp_micro").alias("sum_nlp_raw_micro"),
    )
    tgt = lm.perplexity_score(docs, uni_t, bi_t, v_t).select(
        "doc_id", F.col("sum_nlp_micro").alias("sum_nlp_target_micro")
    )
    return (
        docs.select("doc_id", "lang")
        .join(raw, "doc_id")
        .join(tgt, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "sum_nlp_raw_micro",
            "sum_nlp_target_micro",
            (
                F.col("sum_nlp_raw_micro") - F.col("sum_nlp_target_micro")
            ).alias("importance_micro"),
        )
        .orderBy(F.desc("importance_micro"), "doc_id")
        .limit(100)
    )


_CCNET_ORACLE = f"""
    WITH t AS (SELECT doc_id, source, {PT.tokens('text', D)} AS toks
               FROM documents),
    uni AS (SELECT word, count(*) AS c1
            FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    v AS (SELECT count(*) AS vs FROM uni),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
           FROM t),
    bi AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    scored AS (
      SELECT g.doc_id,
             CAST(floor(-ln((coalesce(b.c2, 0) + 1)
                            / CAST(u.c1 + v.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp
      FROM bg g
      LEFT JOIN bi b USING (bigram)
      JOIN uni u ON u.word = string_split(g.bigram, chr(1))[1]
      CROSS JOIN v
    ),
    per_doc AS (
      SELECT d.doc_id, d.source,
             CAST(coalesce(a.s, 0) // greatest(coalesce(a.nb, 0), 1)
                  AS BIGINT) AS avg_nlp
      FROM (SELECT doc_id, source FROM t) d
      LEFT JOIN (SELECT doc_id, count(*) AS nb, sum(nlp) AS s
                 FROM scored GROUP BY doc_id) a USING (doc_id)),
    ranked AS (
      SELECT source, avg_nlp,
             row_number() OVER (PARTITION BY source
                                ORDER BY avg_nlp, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM per_doc)
    SELECT source, CAST(((rk - 1) * 3) // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(avg_nlp) AS BIGINT) AS min_avg_nlp_micro,
           CAST(max(avg_nlp) AS BIGINT) AS max_avg_nlp_micro
    FROM ranked GROUP BY 1, 2 ORDER BY source, bucket
"""


@register(
    "ccnet_perplexity_buckets",
    oracle=_CCNET_ORACLE,
    doc="CCNet's head/middle/tail split (Wenzek et al. 2020): rank "
    "every document WITHIN its source by LM perplexity and cut into "
    "terciles — bucket 0 (head) is the cleanest third that CCNet "
    "keeps outright, tail is what gets dropped or re-filtered. Ranks "
    "come from the band-parallel two-phase layer partitioned by "
    "source (operators/ranks.two_phase_rank — at 100 TB a single "
    "source is itself fact-scale, so even the within-source rank "
    "must never be one window task); the tercile is the exact-"
    "integer quantile rule ((rank-1)*3) DIV n (the RFM/quintile "
    "convention). Zero-bigram documents score avg 0 and land in the "
    "head — the survival contract; production would route them to a "
    "length filter first (curation_pipeline stages, gated).",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm, ranks

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    uni, bi, v = lm.train_bigram_lm(docs)
    scores = lm.perplexity_score(docs, uni, bi, v).select(
        "doc_id", F.col("avg_nlp_micro").alias("avg_nlp")
    )
    per_doc = docs.select("doc_id", "source").join(scores, "doc_id")
    # one-nat bands over the per-source rank domain (band contract)
    banded = per_doc.withColumn("_band", F.expr("avg_nlp DIV 1000000"))
    ranked = ranks.two_phase_rank(
        banded,
        ["avg_nlp", "doc_id"],
        "_band",
        part_cols=["source"],
        rank_name="rk",
    )
    n_per = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("_n")
    )
    return (
        ranked.join(F.broadcast(n_per), "source")
        .withColumn("bucket", F.expr("((rk - 1) * 3) DIV _n"))
        .groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("avg_nlp").cast("bigint").alias("min_avg_nlp_micro"),
            F.max("avg_nlp").cast("bigint").alias("max_avg_nlp_micro"),
        )
        .orderBy("source", "bucket")
    )

def _hrw_shard(n_shards: int) -> str:
    """Rendezvous winner among ``n_shards`` over a precomputed base
    key hash column ``_h``: shard s's weight is the universal-hash
    permutation (a_s*h + b_s) mod P (the minhash family — the rolling
    poly_hash alone has NO avalanche: sequential ids hash near-
    sequentially and one shard would win everywhere), packed as w*16+s
    so one ``greatest`` carries both the max weight and its shard
    (hash ties, were they to occur, break to the higher shard id — a
    total rule); unpack with % 16.  Same arithmetic in both dialects
    (a*h < 1e18 stays in int64)."""
    packed = [
        f"((_h * {a} + {b}) % {PT.P}) * 16 + {s}"
        for s, (a, b) in enumerate(PT._perm_constants(n_shards))
    ]
    return "greatest(" + ", ".join(packed) + ") % 16"


@register(
    "rendezvous_sharding",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             {PT.poly_hash("concat('doc:', CAST(doc_id AS VARCHAR))", D)}
               AS _h
      FROM documents),
    a AS (
      SELECT doc_id, n_chars,
             CAST({_hrw_shard(8)} AS BIGINT) AS shard_8,
             CAST({_hrw_shard(7)} AS BIGINT) AS shard_7
      FROM h)
    SELECT shard_8, shard_7,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM a GROUP BY 1, 2 ORDER BY shard_8, shard_7
    """,
    doc="Rendezvous (highest-random-weight) sharding — the shard "
    "assignment a 100 TB corpus store wants (Thaler & Ravishankar "
    "1998): each key goes to argmax over shards of hash(shard, key), "
    "so when a shard LEAVES, exactly its own keys move and every "
    "other assignment is untouched (consistent-hashing's guarantee "
    "without the ring). The query assigns every document under 8 "
    "and under 7 shards and reports the movement matrix: the HRW "
    "property means off-diagonal rows exist ONLY for shard_8 = 7 — "
    "pinned in pytest and visible in the gated output. Pure map-side "
    "integer expressions: ONE base poly_hash per key, then the "
    "universal-hash permutation family per shard (the minhash "
    "constants — the rolling hash alone has no avalanche), packed "
    "w*16+s so one greatest() carries winner and id; one bounded "
    "aggregate ends the plan.",
)
def rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = docs.withColumn(
        "_h",
        F.expr(PT.poly_hash("concat('doc:', CAST(doc_id AS STRING))", S)),
    )
    a = h.select(
        F.expr(f"CAST({_hrw_shard(8)} AS BIGINT)").alias("shard_8"),
        F.expr(f"CAST({_hrw_shard(7)} AS BIGINT)").alias("shard_7"),
        "n_chars",
    )
    return (
        a.groupBy("shard_8", "shard_7")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard_8", "shard_7")
    )


_V6_BUDGET = 120


def _v6_oracle_sql() -> str:
    return f"""
    WITH t AS (SELECT doc_id, source, lang, n_chars,
                      {PT.tokens('text', D)} AS toks
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
           FROM t),
    uni_r AS (SELECT word, count(*) AS c1
              FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    v_r AS (SELECT count(*) AS vs FROM uni_r),
    bi_r AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    tt AS (SELECT toks FROM t WHERE lang = 'en'),
    bg_t AS (SELECT unnest(list_transform(
                    range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> toks[i] || chr(1) || toks[i + 1])) AS bigram
             FROM tt),
    uni_t AS (SELECT word, count(*) AS c1
              FROM (SELECT unnest(toks) AS word FROM tt) GROUP BY word),
    v_t AS (SELECT count(*) AS vs FROM uni_t),
    bi_t AS (SELECT bigram, count(*) AS c2 FROM bg_t GROUP BY bigram),
    scored AS (
      SELECT g.doc_id,
             CAST(floor(-ln((coalesce(br.c2, 0) + 1)
                            / CAST(coalesce(ur.c1, 0) + vr.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp_r,
             CAST(floor(-ln((coalesce(bt.c2, 0) + 1)
                            / CAST(coalesce(ut.c1, 0) + vt.vs AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nlp_t
      FROM bg g
      LEFT JOIN bi_r br USING (bigram)
      LEFT JOIN uni_r ur ON ur.word = string_split(g.bigram, chr(1))[1]
      LEFT JOIN bi_t bt ON bt.bigram = g.bigram
      LEFT JOIN uni_t ut ON ut.word = string_split(g.bigram, chr(1))[1]
      CROSS JOIN v_r vr CROSS JOIN v_t vt),
    agg AS (SELECT doc_id,
                   CAST(sum(nlp_r) AS BIGINT) AS s_r,
                   CAST(sum(nlp_t) AS BIGINT) AS s_t
            FROM scored GROUP BY doc_id),
    kept AS (
      SELECT d.doc_id, d.source, d.n_chars
      FROM (SELECT doc_id, source, n_chars FROM t) d
      JOIN agg a USING (doc_id)
      WHERE a.s_r - a.s_t > 0 AND d.n_chars > 0),
    m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
          FROM kept GROUP BY 1),
    w AS (SELECT source, {_TEMP_W} AS w_milli FROM m),
    tot AS (SELECT CAST(sum(w_milli) AS BIGINT) AS tw FROM w),
    q AS (SELECT source,
                 CAST(({_V6_BUDGET} * w_milli) // tw AS BIGINT) AS ba,
                 CAST(({_V6_BUDGET} * w_milli) % tw AS BIGINT) AS rem
          FROM w CROSS JOIN tot),
    l AS (SELECT CAST({_V6_BUDGET} - sum(ba) AS BIGINT) AS leftover FROM q),
    r AS (SELECT q.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q),
    alloc AS (SELECT source,
                     CAST(ba + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END
                          AS BIGINT) AS quota
              FROM r CROSS JOIN l),
    pri AS (SELECT doc_id, source, {_ares_pri(D)} AS pri_pico FROM kept),
    ranked AS (SELECT source, doc_id, pri_pico,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY pri_pico DESC, doc_id)
                        AS draw_rank
               FROM pri)
    SELECT ranked.source, doc_id, pri_pico,
           CAST(draw_rank AS BIGINT) AS draw_rank
    FROM ranked JOIN alloc USING (source)
    WHERE draw_rank <= alloc.quota
    ORDER BY source, draw_rank
    """


@register(
    "curation_pipeline_v6",
    oracle=_v6_oracle_sql(),
    doc="sixth curation composition — the session's new operators "
    "fused into the modern target-aware mixing recipe: (1) DSIR gate "
    "(keep documents whose en-target importance log-ratio is "
    "positive — Xie et al. 2023), (2) temperature tau=0.7 quota per "
    f"source over the kept mass, {_V6_BUDGET} slots by largest-"
    "remainder (the mT5 mixing rule, exact apportionment), (3) A-Res "
    "weighted draw WITHOUT replacement inside each source to fill "
    "its quota (Efraimidis-Spirakis priorities, char-weighted). "
    "Every stage is already gated on its own "
    "(dsir_importance_weights, temperature_mixture_weights, "
    "weighted_reservoir_sample); the composition adds one per-source "
    "mass aggregate and the band-parallel per-source rank "
    "(operators/ranks.two_phase_rank — no single-task window even "
    "within a source). Deterministic end-to-end: a pure function of "
    "the corpus, bit-identical on replay/retry — what a 100 TB "
    "mixing job needs to be resumable.",
)
def curation_pipeline_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import lm, ranks

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars", "text"
    )
    uni_r, bi_r, v_r = lm.train_bigram_lm(docs)
    target = docs.filter(F.col("lang") == "en")
    uni_t, bi_t, v_t = lm.train_bigram_lm(target)
    raw = lm.perplexity_score(docs, uni_r, bi_r, v_r).select(
        "doc_id", F.col("sum_nlp_micro").alias("_s_r")
    )
    tgt = lm.perplexity_score(docs, uni_t, bi_t, v_t).select(
        "doc_id", F.col("sum_nlp_micro").alias("_s_t")
    )
    kept = (
        docs.select("doc_id", "source", "n_chars")
        .join(raw, "doc_id")
        .join(tgt, "doc_id")
        .filter((F.col("_s_r") - F.col("_s_t") > 0) & (F.col("n_chars") > 0))
        .select("doc_id", "source", "n_chars")
    )
    m = kept.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    )
    w = m.withColumn("w_milli", F.expr(_TEMP_W))
    tot = w.agg(F.sum("w_milli").cast("bigint").alias("tw"))
    q = (
        w.crossJoin(F.broadcast(tot))
        .withColumn("ba", F.expr(f"({_V6_BUDGET} * w_milli) DIV tw"))
        .withColumn("rem", F.expr(f"({_V6_BUDGET} * w_milli) % tw"))
    )
    leftover = q.agg(
        (F.lit(_V6_BUDGET) - F.sum("ba")).cast("bigint").alias("leftover")
    )
    rk = F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    alloc = (
        q.withColumn("rk", rk)
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            (
                F.col("ba")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("quota"),
        )
    )
    pri = kept.select(
        "doc_id",
        "source",
        F.expr(_ares_pri(S)).alias("pri_pico"),
    ).withColumn("_band", F.expr("(-pri_pico) DIV 1000000000"))
    ranked = ranks.two_phase_rank(
        pri,
        [F.desc("pri_pico"), F.asc("doc_id")],
        "_band",
        part_cols=["source"],
        rank_name="draw_rank",
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("draw_rank") <= F.col("quota"))
        .select(
            "source",
            "doc_id",
            "pri_pico",
            F.col("draw_rank").cast("bigint").alias("draw_rank"),
        )
        .orderBy("source", "draw_rank")
    )


_UNI_VOCAB_TARGET = 256


def _unigram_pruned_oracle(sf_dir: str) -> str:
    from ..operators import unigram

    wc = unigram.word_counts_from_parquet(f"{sf_dir}/documents.parquet")
    counts = unigram.train_unigram_py(
        wc, vocab_target=_UNI_VOCAB_TARGET
    )
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    vals = ", ".join(
        f"('{p.replace(chr(39), chr(39) * 2)}', {len(p)}, {c})"
        for p, c in top
    )
    return (
        "SELECT piece, CAST(piece_len AS BIGINT) AS piece_len,"
        " CAST(cnt AS BIGINT) AS cnt"
        f" FROM (VALUES {vals}) AS t(piece, piece_len, cnt)"
        " ORDER BY cnt DESC, piece"
    )


@register(
    "unigram_vocab_pruned",
    oracle=_unigram_pruned_oracle,
    doc="the SentencePiece PRUNE round on top of the unigram-LM "
    f"trainer: cut the post-EM vocabulary to {_UNI_VOCAB_TARGET} "
    "pieces (single chars always survive — the segmentability "
    "floor; multi-char pieces keep by count DESC, piece ASC) and run "
    "ONE more distributed E-step so surviving pieces re-absorb the "
    "pruned pieces' probability mass — the seed -> EM -> prune -> EM "
    "shape real tokenizer training runs (Kudo 2018 sect. 3.2). "
    "Output: the final model's top-50 pieces. Same scale shape as "
    "unigram_lm_tokenize (one corpus pass, vocabulary-scale rounds); "
    "the prune itself is a pure function of the count table, shared "
    "with the sparkless twin.",
)
def unigram_vocab_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import unigram

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    counts = unigram.train_unigram(
        docs, vocab_target=_UNI_VOCAB_TARGET
    )
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    return spark.createDataFrame(
        [(p, len(p), c) for p, c in top],
        "piece string, piece_len bigint, cnt bigint",
    ).orderBy(F.desc("cnt"), "piece")


_HIST_STORE_SEQ = iter(range(1_000_000))


@register(
    "histogram_incremental_store",
    oracle=f"""
    WITH b AS (
      SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
             max(CAST(l_extendedprice AS DOUBLE)) AS hi
      FROM lineitem
    ),
    h AS (
      SELECT least(CAST({_HQ_BINS - 1} AS BIGINT),
                   greatest(CAST(0 AS BIGINT),
                     CAST(floor((CAST(l_extendedprice AS DOUBLE) - b.lo)
                                / (b.hi - b.lo) * {_HQ_BINS}) AS BIGINT)))
               AS bin,
             count(*) AS cnt
      FROM lineitem, b GROUP BY 1
    ),
    c AS (
      SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
             sum(cnt) OVER () AS total
      FROM h
    ),
    qs AS (SELECT unnest([{', '.join(str(q) for q in _HQ_QS)}]) AS q),
    sel AS (
      SELECT q, min(bin) AS b_
      FROM c, qs WHERE cum >= q * total GROUP BY q
    )
    SELECT q,
           CAST(b.lo + (b_ + 1) * ((b.hi - b.lo) / {_HQ_BINS}) AS DOUBLE)
             AS estimate,
           CAST((b.hi - b.lo) / {_HQ_BINS} AS DOUBLE) AS max_err
    FROM sel, b ORDER BY q
    """,
    doc="incremental quantiles through the STANDING histogram store "
    "(sketches.write_histogram / histogram_from_store): the "
    "pre-1996 lineitems write their (bin, cnt) batch once, the rest "
    "append their own, and quantiles read the ADDITIVE fold of all "
    "batches — counter addition is the histogram's merge operation "
    "the way register-max is the HLL's (hll_incremental_store), and "
    "gating the merged estimate against the single-pass full-corpus "
    "oracle proves merge == rebuild exactly. Per-batch state is "
    f"<= {_HQ_BINS} rows regardless of batch size; appending IS the "
    "update; any batch subset remains estimable after the fact. The "
    "bucketing domain is fixed across batches (the store contract).",
)
def histogram_incremental_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..operators import sketches

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("double")
    lo, hi = li.agg(F.min(x), F.max(x)).first()
    tag = (
        f"{hashlib.sha256(sf_dir.encode()).hexdigest()[:12]}"
        f"_{os.getpid()}_{next(_HIST_STORE_SEQ)}"
    )
    store = os.path.join(tempfile.gettempdir(), f"spark_graft_hist_{tag}")
    cut = "1996-01-01"
    sketches.write_histogram(
        li.filter(F.col("l_shipdate") < cut),
        "l_extendedprice",
        float(lo),
        float(hi),
        store,
        _HQ_BINS,
        mode="overwrite",
    )
    sketches.write_histogram(
        li.filter(F.col("l_shipdate") >= cut),
        "l_extendedprice",
        float(lo),
        float(hi),
        store,
        _HQ_BINS,
        mode="append",
    )
    merged = sketches.histogram_from_store(spark, store)
    return sketches.histogram_quantiles(
        merged, list(_HQ_QS), float(lo), float(hi), _HQ_BINS
    )


@register(
    "corpus_datacard",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             len({PT.tokens('text', D)}) AS n_toks,
             sha256(coalesce(text, '')) AS th
      FROM documents),
    dupg AS (SELECT th FROM d GROUP BY th HAVING count(*) > 1),
    base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(n_toks) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM d GROUP BY 1),
    dup AS (
      SELECT source, CAST(count(*) AS BIGINT) AS dup_docs
      FROM d JOIN dupg USING (th) GROUP BY 1),
    lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM d GROUP BY 1, 2),
    mx AS (SELECT source, max(c) AS mc FROM lc GROUP BY 1),
    mj AS (SELECT lc.source, min(lc.lang) AS majority_lang
           FROM lc JOIN mx ON mx.source = lc.source AND lc.c = mx.mc
           GROUP BY 1)
    SELECT base.source, n_docs, total_chars, total_tokens, n_langs,
           mj.majority_lang,
           CAST(mx.mc * 1000000 // n_docs AS BIGINT)
             AS majority_share_micro,
           CAST(coalesce(dup.dup_docs, 0) AS BIGINT) AS dup_docs
    FROM base
    JOIN mx ON mx.source = base.source
    JOIN mj ON mj.source = base.source
    LEFT JOIN dup ON dup.source = base.source
    ORDER BY base.source
    """,
    doc="the corpus DATA CARD: the per-source accounting table every "
    "dataset release publishes (docs, chars, whitespace tokens, "
    "language count, majority language + its share in exact "
    "micro-units, and exact-duplicate document count against the "
    "GLOBAL sha256 text-hash groups — cross-source duplicates "
    "count). One fact pass computes tokens+hash map-side; the dup "
    "leg is the sha2-keyed groupBy the dedup family gates; majority "
    "language is an argmax with a total (count DESC, lang ASC) tie "
    "rule via the max-count join, never a window over the corpus. "
    "Output rows = #sources — collectable at any scale.",
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(F.expr(PT.tokens("text", S))).cast("bigint").alias("n_toks"),
        F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("th"),
    )
    dupg = d.groupBy("th").count().filter(F.col("count") > 1).select("th")
    base = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    dup = (
        d.join(dupg, "th")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("dup_docs"))
    )
    lc = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("c")
    )
    mx = lc.groupBy("source").agg(F.max("c").alias("mc"))
    mj = (
        lc.join(F.broadcast(mx), "source")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("source")
        .agg(F.min("lang").alias("majority_lang"))
    )
    return (
        base.join(F.broadcast(mx), "source")
        .join(F.broadcast(mj), "source")
        .join(F.broadcast(dup), "source", "left")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "total_tokens",
            "n_langs",
            "majority_lang",
            F.expr("CAST(mc * 1000000 DIV n_docs AS BIGINT)").alias(
                "majority_share_micro"
            ),
            F.coalesce(F.col("dup_docs"), F.lit(0))
            .cast("bigint")
            .alias("dup_docs"),
        )
        .orderBy("source")
    )


@register(
    "good_turing_counts",
    oracle=f"""
    WITH t AS (SELECT {PT.tokens('text', D)} AS toks FROM documents),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    coc AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
            FROM wc GROUP BY c)
    SELECT a.r, a.n_r,
           CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_next,
           CAST((a.r + 1) * coalesce(b.n_r, 0) * 1000 // a.n_r AS BIGINT)
             AS r_star_milli
    FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
    ORDER BY a.r LIMIT 10
    """,
    doc="Good-Turing frequency re-estimation (Good 1953; the "
    "smoothing family's third member beside add-one and Kneser-Ney): "
    "the adjusted count r* = (r+1) * N_(r+1) / N_r from the "
    "count-of-counts table — the estimate of how much probability "
    "mass the SINGLETONS predict for unseen events, which is what "
    "vocabulary-growth and corpus-coverage planning read off N_1. "
    "Two nested aggregations (word counts, then counts-of-counts — "
    "the second over a table whose size is the number of DISTINCT "
    "frequencies, tiny by Zipf); the self-join on r+1 runs over that "
    "bounded table. r* reported as exact integer milli-units "
    "(floor division, both operands positive).",
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    wc = (
        docs.select(
            F.explode(F.expr(PT.tokens("text", S))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    coc = wc.groupBy(F.col("c").alias("r")).agg(
        F.count("*").cast("bigint").alias("n_r")
    )
    nxt = coc.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        coc.join(F.broadcast(nxt), "r", "left")
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r_next"), F.lit(0))
            .cast("bigint")
            .alias("n_r_next"),
            F.expr(
                "CAST((r + 1) * coalesce(n_r_next, 0) * 1000 DIV n_r"
                " AS BIGINT)"
            ).alias("r_star_milli"),
        )
        .orderBy("r")
        .limit(10)
    )


# --------------------------------------------------------------------------
# ctfidf_source_terms (round 8: class-based TF-IDF topic labeling)
# --------------------------------------------------------------------------

def _ctfidf_oracle() -> str:
    toks = PT.tokens("coalesce(text, '')", PT.DUCKDB)
    return f"""
    WITH tok AS (SELECT source, t.w
                 FROM documents, unnest({toks}) AS t(w)),
    tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS f
           FROM tok GROUP BY source, w),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS n_src FROM tf GROUP BY w),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS s FROM tf),
    tot AS (SELECT source, CAST(sum(f) AS BIGINT) AS n_terms
            FROM tf GROUP BY source),
    scored AS (
      SELECT tf.source, tf.w, tf.f, df.n_src,
             CAST(floor(
               (CAST(tf.f AS DOUBLE) / tot.n_terms)
               * ln(1.0 + CAST(ns.s AS DOUBLE) / df.n_src)
               * 1000000.0 + 0.5) AS BIGINT) AS ctfidf_micro
      FROM tf JOIN df ON df.w = tf.w
      JOIN tot ON tot.source = tf.source CROSS JOIN ns
    )
    SELECT source, w AS term, f, n_src, ctfidf_micro, rk FROM (
      SELECT scored.*, row_number() OVER (PARTITION BY source
               ORDER BY ctfidf_micro DESC, w) AS rk
      FROM scored
    ) WHERE rk <= 5
    ORDER BY source, rk
    """


@register(
    "ctfidf_source_terms",
    oracle=_ctfidf_oracle(),
    doc="class-based TF-IDF (the BERTopic c-TF-IDF recipe) labeling "
    "each SOURCE with its five most distinctive terms: term "
    "frequency normalizes within the source's token mass, the "
    "inverse frequency ln(1 + S/df) counts the SOURCES containing "
    "the term (not documents), and each score snaps to micro from "
    "exact integer counts — so the per-source topic labels are "
    "hash-portable. Scale: one token-count shuffle to a (source x "
    "vocab)-bounded table; df/totals broadcast; per-source top-5 is "
    "a source-partitioned window over that bounded table. The "
    "corpus-datacard complement that names WHAT each source "
    "contributes, not just how much.",
)
def ctfidf_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = PT.tokens("text", PT.SPARK)
    tok = docs.select("source", F.explode(F.expr(toks)).alias("w"))
    tf = tok.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("f")
    )
    df_t = tf.groupBy("w").agg(F.count("*").cast("bigint").alias("n_src"))
    ns = tf.agg(F.countDistinct("source").cast("bigint").alias("s"))
    tot = tf.groupBy("source").agg(F.sum("f").cast("bigint").alias("n_terms"))
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            F.col("w").alias("term"),
            "f",
            "n_src",
            F.expr(
                "CAST(floor((CAST(f AS DOUBLE) / n_terms)"
                " * ln(1.0 + CAST(s AS DOUBLE) / n_src)"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("ctfidf_micro"),
        )
    )
    from pyspark.sql import Window as W

    w_rk = W.partitionBy("source").orderBy(
        F.col("ctfidf_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 5)
        .select("source", "term", "f", "n_src", "ctfidf_micro", "rk")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# seasonal_naive_mape (round 8: forecast-evaluation primitive)
# --------------------------------------------------------------------------

@register(
    "seasonal_naive_mape",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    paired AS (
      SELECT a.d, a.y, f.y AS yhat
      FROM daily a JOIN daily f ON f.d = a.d - 7
    ),
    scored AS (
      SELECT d, y, yhat, abs(y - yhat) AS abs_err,
             abs(y - yhat) * 1000000 // y AS ape_micro,
             (2 * abs(y - yhat) * 1000000) // (y + yhat) AS sape_micro
      FROM paired
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
           CAST(sum(y) AS BIGINT) AS sum_actual,
           CAST(sum(ape_micro) AS BIGINT) // count(*) AS mape_micro,
           CAST(sum(sape_micro) AS BIGINT) // count(*) AS smape_micro,
           CAST(sum(abs_err) AS BIGINT) * 1000000
             // CAST(sum(y) AS BIGINT) AS wape_micro
    FROM scored
    """,
    doc="forecast-evaluation primitive: the seasonal-naive (lag-7) "
    "forecast of daily purchase counts scored by MAPE, sMAPE and "
    "WAPE — the baseline every forecasting pipeline must beat and "
    "the denominators every evaluation bakeoff argues about, all "
    "three reported so the reader sees how they diverge. Every "
    "per-day percentage error is one exact integer division to "
    "micro-units (counts are never zero on purchase days, y+yhat "
    "> 0 by construction); the aggregate means are exact BIGINT "
    "divisions. One groupBy builds the daily series; the lag join "
    "is calendar-bounded.",
)
def seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
        "event_type",
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    fore = daily.select(
        (F.col("d") + 7).alias("d"), F.col("y").alias("yhat")
    )
    paired = daily.join(fore, "d")
    scored = paired.select(
        "d",
        "y",
        "yhat",
        F.abs(F.col("y") - F.col("yhat")).alias("abs_err"),
        F.expr("abs(y - yhat) * 1000000 DIV y").alias("ape_micro"),
        F.expr("(2 * abs(y - yhat) * 1000000) DIV (y + yhat)").alias(
            "sape_micro"
        ),
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("abs_err").cast("bigint").alias("sum_abs_err"),
        F.sum("y").cast("bigint").alias("sum_actual"),
        F.expr("CAST(sum(ape_micro) AS BIGINT) DIV count(*)").alias(
            "mape_micro"
        ),
        F.expr("CAST(sum(sape_micro) AS BIGINT) DIV count(*)").alias(
            "smape_micro"
        ),
        F.expr(
            "CAST(sum(abs_err) AS BIGINT) * 1000000"
            " DIV CAST(sum(y) AS BIGINT)"
        ).alias("wape_micro"),
    )


# --------------------------------------------------------------------------
# pinball_loss_eval (round 8: quantile-forecast evaluation)
# --------------------------------------------------------------------------

@register(
    "pinball_loss_eval",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                  AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    paired AS (
      SELECT a.d, a.y, f.y AS yhat
      FROM daily a JOIN daily f ON f.d = a.d - 7
    ),
    q AS (SELECT unnest([1, 5, 9]) AS q_deci),
    losses AS (
      SELECT q.q_deci, p.d,
             CASE WHEN p.y >= p.yhat
                  THEN q.q_deci * (p.y - p.yhat)
                  ELSE (10 - q.q_deci) * (p.yhat - p.y)
             END AS loss_deci
      FROM paired p CROSS JOIN q
    )
    SELECT CAST(q_deci AS BIGINT) AS q_deci,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(loss_deci) AS BIGINT) AS sum_loss_deci,
           CAST(sum(loss_deci) AS BIGINT) // count(*) AS mean_loss_deci
    FROM losses GROUP BY q_deci ORDER BY q_deci
    """,
    doc="quantile-forecast evaluation: pinball (quantile) loss of the "
    "seasonal-naive lag-7 forecast of daily purchase revenue at "
    "q = 0.1 / 0.5 / 0.9.  All arithmetic is exact: revenue is "
    "summed in integer ten-thousandths (value has 4 decimals), the "
    "loss is scaled by 10 so q*(y-f) / (1-q)*(f-y) are integer "
    "products (loss_deci), and the mean is one exact BIGINT "
    "truncating division.  The q = 0.5 row is half the MAE — the "
    "cross-check against seasonal_naive_mape's sum_abs_err.  Scale: "
    "one fact groupBy to the daily series; everything after is "
    "calendar-bounded x 3 quantile rows.",
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
        ).alias("d"),
        "event_type",
        "value",
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("d")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("y")
        )
    )
    fore = daily.select(
        (F.col("d") + 7).alias("d"), F.col("y").alias("yhat")
    )
    paired = daily.join(fore, "d")
    qs = F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("q_deci")
    losses = paired.select("d", "y", "yhat", qs).select(
        "q_deci",
        F.expr(
            "CASE WHEN y >= yhat THEN q_deci * (y - yhat)"
            " ELSE (10 - q_deci) * (yhat - y) END"
        ).alias("loss_deci"),
    )
    return (
        losses.groupBy(F.col("q_deci").cast("bigint").alias("q_deci"))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("loss_deci").cast("bigint").alias("sum_loss_deci"),
            F.expr("CAST(sum(loss_deci) AS BIGINT) DIV count(*)").alias(
                "mean_loss_deci"
            ),
        )
        .orderBy("q_deci")
    )


# --------------------------------------------------------------------------
# chao1_vocab_richness (round 8: species-richness estimate of the
# vocabulary — how many word types the corpus has NOT shown yet)
# --------------------------------------------------------------------------

@register(
    "chao1_vocab_richness",
    oracle=f"""
    WITH t AS (SELECT {PT.tokens('text', D)} AS toks FROM documents),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_d,
             CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
             CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
      FROM wc
    )
    SELECT n_tokens, vocab_d, f1, f2,
           vocab_d * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1))
             AS chao1_milli,
           1000000 - (f1 * 1000000) // n_tokens AS coverage_micro
    FROM s
    """,
    doc="Chao1 species-richness estimate of the word vocabulary "
    "(Chao 1984, bias-corrected form D + f1(f1-1)/(2(f2+1)) — "
    "defined even when no doubletons exist) plus Good's sample "
    "coverage 1 - f1/N — together the datacard numbers for 'how "
    "much vocabulary is still unseen' and 'what fraction of the "
    "next token's mass is already covered'.  Reads the same "
    "count-of-counts singleton/doubleton cells good_turing_counts "
    "re-estimates; all arithmetic exact integer (milli/micro floor "
    "divisions on positive operands).  Scale: one word-count "
    "shuffle; the f1/f2 cells aggregate from it map-side.",
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    wc = (
        docs.select(
            F.explode(F.expr(PT.tokens("text", S))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    s = wc.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab_d"),
        F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("f1"),
        F.count(F.when(F.col("c") == 2, 1)).cast("bigint").alias("f2"),
    )
    return s.select(
        "n_tokens",
        "vocab_d",
        "f1",
        "f2",
        F.expr(
            "vocab_d * 1000 + (f1 * (f1 - 1) * 1000) DIV (2 * (f2 + 1))"
        ).alias("chao1_milli"),
        F.expr("1000000 - (f1 * 1000000) DIV n_tokens").alias(
            "coverage_micro"
        ),
    )


# --------------------------------------------------------------------------
# cohens_kappa_agreement (round 8: chance-corrected agreement of the
# two quality signals the confusion query tabulates)
# --------------------------------------------------------------------------

def _kappa_oracle() -> str:
    from .driver_queries_similarity import _QUALITY_ORACLE

    score = classifier.oracle_score_sql("text", _CLS_WEIGHTS, _CLS_BIAS)
    return f"""
    WITH q AS ({_QUALITY_ORACLE}),
    c AS (SELECT doc_id, ({score}) >= 0.0 AS cls_keep FROM documents),
    j AS (SELECT c.cls_keep, q.quality >= 0.75 AS ts_keep
          FROM c JOIN q USING (doc_id)),
    cells AS (
      SELECT CAST(count(*) FILTER (WHERE cls_keep AND ts_keep) AS BIGINT)
               AS n11,
             CAST(count(*) FILTER (WHERE cls_keep AND NOT ts_keep)
                  AS BIGINT) AS n10,
             CAST(count(*) FILTER (WHERE NOT cls_keep AND ts_keep)
                  AS BIGINT) AS n01,
             CAST(count(*) FILTER (WHERE NOT cls_keep AND NOT ts_keep)
                  AS BIGINT) AS n00,
             CAST(count(*) AS BIGINT) AS n
      FROM j
    )
    SELECT n11, n10, n01, n00, n,
           ((n11 + n00) * 1000000) // n AS po_micro,
           (((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
            * 1000000) // (n * n) AS pe_micro,
           CAST(floor(
             CAST(n * (n11 + n00)
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00)) AS DOUBLE)
             / CAST(n * n
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00)) AS DOUBLE)
             * 1000000.0 + 0.5) AS BIGINT) AS kappa_micro
    FROM cells
    """


@register(
    "cohens_kappa_agreement",
    oracle=_kappa_oracle(),
    doc="Cohen's kappa of the two quality signals "
    "quality_signal_confusion tabulates — chance-corrected "
    "agreement, the number a curator quotes instead of raw percent "
    "agreement when both filters keep most docs anyway.  The 2x2 "
    "cells are exact BIGINTs; po/pe are exact micro floor-divisions "
    "(operands non-negative); kappa itself can be NEGATIVE, so it "
    "is computed as ONE double division of exact integer numerator "
    "over denominator and floor(x*1e6+0.5)-snapped — never an "
    "integer division, whose floor-vs-truncate semantics diverge "
    "between engines below zero.  Same two map-side scoring passes "
    "as the confusion query, one join, constant-size output.",
)
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import textstats as TSF

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier.score_documents(
        barrier(docs), _CLS_WEIGHTS, bias=_CLS_BIAS, text_col="text"
    ).select("doc_id", (F.col("score") >= 0.0).alias("cls_keep"))
    q = TSF.quality_stats_arrow(barrier(docs), "text", "doc_id").select(
        "doc_id", (F.col("quality") >= 0.75).alias("ts_keep")
    )
    cells = scored.join(q, "doc_id").agg(
        F.count(F.when(F.col("cls_keep") & F.col("ts_keep"), 1))
        .cast("bigint")
        .alias("n11"),
        F.count(F.when(F.col("cls_keep") & ~F.col("ts_keep"), 1))
        .cast("bigint")
        .alias("n10"),
        F.count(F.when(~F.col("cls_keep") & F.col("ts_keep"), 1))
        .cast("bigint")
        .alias("n01"),
        F.count(F.when(~F.col("cls_keep") & ~F.col("ts_keep"), 1))
        .cast("bigint")
        .alias("n00"),
        F.count("*").cast("bigint").alias("n"),
    )
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        "n",
        F.expr("((n11 + n00) * 1000000) DIV n").alias("po_micro"),
        F.expr(
            "(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
            " * 1000000) DIV (n * n)"
        ).alias("pe_micro"),
        F.expr(
            "CAST(floor("
            "CAST(n * (n11 + n00)"
            " - ((n11 + n10) * (n11 + n01)"
            "    + (n01 + n00) * (n10 + n00)) AS DOUBLE)"
            " / CAST(n * n"
            " - ((n11 + n10) * (n11 + n01)"
            "    + (n01 + n00) * (n10 + n00)) AS DOUBLE)"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("kappa_micro"),
    )


# --------------------------------------------------------------------------
# source_unigram_kl (round 8: domain-shift datacard number)
# --------------------------------------------------------------------------

@register(
    "source_unigram_kl",
    oracle=f"""
    WITH t AS (SELECT source, {PT.tokens('text', D)} AS toks
               FROM documents),
    w AS (SELECT source, unnest(toks) AS word FROM t),
    sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c_sw
           FROM w GROUP BY 1, 2),
    stot AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s,
                    CAST(count(*) AS BIGINT) AS n_types
             FROM sw GROUP BY 1),
    cw AS (SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
    ctot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM cw),
    cells AS (
      SELECT sw.source,
             CAST(floor(
               (CAST(sw.c_sw AS DOUBLE) / st.n_s)
               * ln(CAST(sw.c_sw AS DOUBLE) * ct.n
                    / (CAST(st.n_s AS DOUBLE) * cw.c_w))
               * 1000000.0 + 0.5) AS BIGINT) AS term_micro
      FROM sw JOIN stot st USING (source)
      JOIN cw USING (word) CROSS JOIN ctot ct
    )
    SELECT st.source, st.n_s AS n_tokens, st.n_types,
           CAST(sum(c.term_micro) AS BIGINT) AS kl_micro
    FROM cells c JOIN stot st USING (source)
    GROUP BY st.source, st.n_s, st.n_types
    ORDER BY kl_micro DESC, st.source
    """,
    doc="per-source unigram KL divergence against the corpus "
    "distribution — the domain-shift number a mixture datacard "
    "quotes per slice (how far does this source's word usage sit "
    "from the blend it feeds): KL(P_s || Q) = sum_w (c_sw/N_s) * "
    "ln(c_sw*N / (N_s*c_w)), every cell's ln applied once to a "
    "ratio of exact BIGINT counts and the whole cell micro-snapped "
    "BEFORE summation (the NMI/information-gain convention; Q's "
    "support contains P_s's by construction, so no smoothing term). "
    "The divergence sibling of class_tfidf_source_terms (which "
    "names the words; this prices the shift).  Scale: one word "
    "shuffle to (source, word) cells; marginals join back "
    "broadcast.",
)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    w = docs.select(
        "source", F.explode(F.expr(PT.tokens("text", S))).alias("word")
    )
    sw = w.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("c_sw")
    )
    sw = barrier(sw)
    stot = sw.groupBy("source").agg(
        F.sum("c_sw").cast("bigint").alias("n_s"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    cw = sw.groupBy("word").agg(F.sum("c_sw").cast("bigint").alias("c_w"))
    ctot = cw.agg(F.sum("c_w").cast("bigint").alias("n"))
    cells = (
        sw.join(F.broadcast(stot), "source")
        .join(cw, "word")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            F.expr(
                "CAST(floor((CAST(c_sw AS DOUBLE) / n_s)"
                " * ln(CAST(c_sw AS DOUBLE) * n"
                " / (CAST(n_s AS DOUBLE) * c_w))"
                " * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    return (
        cells.groupBy("source")
        .agg(F.sum("term_micro").cast("bigint").alias("kl_micro"))
        .join(F.broadcast(stot), "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_types",
            "kl_micro",
        )
        .orderBy(F.desc("kl_micro"), "source")
    )


# --------------------------------------------------------------------------
# curation_pipeline_v7 (round 8 capstone: leakage-safe training export)
# --------------------------------------------------------------------------

_V7_CAP = 20
_V7_Q = "0.75"


def _v7_oracle() -> str:
    from .driver_queries_similarity import (
        _QUALITY_ORACLE,
        _split_expr,
        _LEAK_EST,
    )

    return f"""
    WITH t0 AS (SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents),
    g AS (SELECT doc_id, {PT.hash_array('toks', D)} AS tok_hashes FROM t0),
    h AS (SELECT doc_id, {PT.word_ngram_hashes('tok_hashes', 3, D)} AS gram_hashes
          FROM g WHERE len(tok_hashes) >= 3),
    s AS (SELECT doc_id, {PT.minhash_from_hashes('gram_hashes', 32, D)} AS mh FROM h),
    banded AS (
      SELECT doc_id, mh, b AS band_idx,
             list_slice(mh, b*2 + 1, b*2 + 2) AS band_sig
      FROM s, unnest(range(16)) AS tt(b)
    ),
    capped AS (
      SELECT doc_id, mh, band_idx, band_sig FROM (
        SELECT banded.*, count(*) OVER (PARTITION BY band_idx, band_sig)
                 AS bucket_n
        FROM banded) t
      WHERE bucket_n <= 1000
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.mh AS mh_a, b.mh AS mh_b
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    near AS (
      SELECT id_a, id_b FROM pairs
      WHERE len(list_filter(range(1, 33), i -> mh_a[i] = mh_b[i])) / 32.0
            >= {_LEAK_EST}
    ),
    sp AS (SELECT doc_id, {_split_expr(D)} AS split FROM documents),
    leaked AS (
      SELECT DISTINCT CASE WHEN sa.split = 'train' THEN n.id_a
                           ELSE n.id_b END AS doc_id
      FROM near n
      JOIN sp sa ON sa.doc_id = n.id_a
      JOIN sp sb ON sb.doc_id = n.id_b
      WHERE (sa.split = 'train' AND sb.split <> 'train')
         OR (sa.split <> 'train' AND sb.split = 'train')
    ),
    q AS ({_QUALITY_ORACLE}),
    train AS (
      SELECT d.doc_id, d.source,
             CASE WHEN lk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_leaked,
             CASE WHEN q.quality >= {_V7_Q} THEN 1 ELSE 0 END AS is_q
      FROM documents d
      JOIN sp ON sp.doc_id = d.doc_id AND sp.split = 'train'
      LEFT JOIN leaked lk ON lk.doc_id = d.doc_id
      JOIN q ON q.doc_id = d.doc_id
    ),
    kept AS (
      SELECT source, doc_id, row_number() OVER (PARTITION BY source
               ORDER BY doc_id) AS rn
      FROM train WHERE is_leaked = 0 AND is_q = 1
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(t.is_leaked) AS BIGINT) AS n_leaked,
           CAST(sum(CASE WHEN t.is_leaked = 0 AND t.is_q = 0 THEN 1
                    ELSE 0 END) AS BIGINT) AS n_lowq,
           CAST(coalesce((SELECT count(*) FROM kept k
                          WHERE k.source = t.source
                            AND k.rn <= {_V7_CAP}), 0) AS BIGINT)
             AS n_kept,
           CAST(coalesce((SELECT min(doc_id) FROM kept k
                          WHERE k.source = t.source
                            AND k.rn <= {_V7_CAP}), -1) AS BIGINT)
             AS first_kept,
           CAST(coalesce((SELECT max(doc_id) FROM kept k
                          WHERE k.source = t.source
                            AND k.rn <= {_V7_CAP}), -1) AS BIGINT)
             AS last_kept
    FROM train t GROUP BY t.source ORDER BY t.source
    """


@register(
    "curation_pipeline_v7",
    oracle=_v7_oracle(),
    doc="curation capstone v7 — the LEAKAGE-SAFE training export: "
    "train-split documents (portable-hash 80/10/10) minus every doc "
    "with a MinHash-LSH near-dup in val/test (decontaminating the "
    "TRAINING side so eval numbers stay honest — the complement of "
    "eval_split_decontaminated), minus docs under the 0.75 "
    "heuristic-quality bar, then a flat per-source cap of 20 "
    "(deterministic doc_id order) — split, leakage, quality and "
    "quota machinery, all individually gated, composed in ONE lazy "
    "plan.  Output: per-source export accounting (train/leaked/"
    "low-quality/kept + kept id range).  Scale: one signature "
    "build + banded self-join (the audit's shape), one Arrow "
    "quality pass, one source-partitioned cap window over "
    "already-filtered rows.",
)
def curation_pipeline_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import textstats as TSF
    from ..operators import dedup
    from .driver_queries_similarity import _split_expr, _LEAK_EST

    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select("doc_id", F.expr(_split_expr(PT.SPARK)).alias("split"))
    sigs = dedup.with_minhash(
        docs, "text", "doc_id", n_hashes=32, shingle_words=3
    )
    near = (
        dedup.lsh_candidate_pairs(
            sigs, "doc_id", n_hashes=32, bands=16, max_bucket_size=1000
        )
        .filter(F.col("est_jaccard") >= _LEAK_EST)
        .select("id_a", "id_b")
    )
    j = (
        near.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("s_a")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("s_b")),
            "id_b",
        )
    )
    leaked = (
        j.filter(
            ((F.col("s_a") == "train") & (F.col("s_b") != "train"))
            | ((F.col("s_a") != "train") & (F.col("s_b") == "train"))
        )
        .select(
            F.when(F.col("s_a") == "train", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("doc_id")
        )
        .distinct()
    )
    q = TSF.quality_stats_arrow(barrier(docs), "text", "doc_id").select(
        "doc_id", (F.col("quality") >= F.expr(_V7_Q)).alias("is_q_b")
    )
    train = (
        docs.select("doc_id", "source")
        .join(sp.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .join(leaked.withColumn("lk", F.lit(1)), "doc_id", "left")
        .join(q, "doc_id")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("lk"), F.lit(0)).alias("is_leaked"),
            F.when(F.col("is_q_b"), 1).otherwise(0).alias("is_q"),
        )
    )
    train = barrier(train)
    kept = (
        train.filter((F.col("is_leaked") == 0) & (F.col("is_q") == 1))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") <= _V7_CAP)
    )
    kept_agg = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.min("doc_id").cast("bigint").alias("first_kept"),
        F.max("doc_id").cast("bigint").alias("last_kept"),
    )
    return (
        train.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.sum("is_leaked").cast("bigint").alias("n_leaked"),
            F.sum(
                F.when(
                    (F.col("is_leaked") == 0) & (F.col("is_q") == 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_lowq"),
        )
        .join(kept_agg, "source", "left")
        .select(
            "source",
            "n_train",
            "n_leaked",
            "n_lowq",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias(
                "n_kept"
            ),
            F.coalesce(F.col("first_kept"), F.lit(-1))
            .cast("bigint")
            .alias("first_kept"),
            F.coalesce(F.col("last_kept"), F.lit(-1))
            .cast("bigint")
            .alias("last_kept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# source_vocab_jaccard (round 8: source-pair interchangeability)
# --------------------------------------------------------------------------

@register(
    "source_vocab_jaccard",
    oracle=f"""
    WITH t AS (SELECT source, {PT.tokens('text', D)} AS toks
               FROM documents),
    sw AS (SELECT DISTINCT source, unnest(toks) AS word FROM t),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types
              FROM sw GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           sa.n_types AS types_a, sb.n_types AS types_b,
           n_common * 1000 // (sa.n_types + sb.n_types - n_common)
             AS jaccard_milli
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY jaccard_milli DESC, src_a, src_b LIMIT 30
    """,
    doc="source-pair vocabulary Jaccard — the interchangeability "
    "matrix beside source_unigram_kl (KL prices each source's "
    "distance from the BLEND; this says which PAIRS overlap): "
    "distinct word-type sets per source, pairwise intersection "
    "through one word-keyed join (words are the join key, so the "
    "shuffle is vocabulary-scale — the source-pair matrix never "
    "materializes beyond actual co-occurring pairs), exact integer "
    "milli floor-division, top-30 by similarity.  The mixture "
    "designer merges near-duplicate sources before tuning quotas.",
)
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    sw = docs.select(
        "source", F.explode(F.expr(PT.tokens("text", S))).alias("word")
    ).distinct()
    sw = barrier(sw)
    sizes = sw.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_types")
    )
    a = sw.select(F.col("source").alias("src_a"), "word")
    b = sw.select(F.col("source").alias("src_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("src_a"),
                    F.col("n_types").alias("types_a"),
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("src_b"),
                    F.col("n_types").alias("types_b"),
                )
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "types_a",
            "types_b",
            F.expr(
                "n_common * 1000 DIV (types_a + types_b - n_common)"
            ).alias("jaccard_milli"),
        )
        .orderBy(F.desc("jaccard_milli"), "src_a", "src_b")
        .limit(30)
    )


# --------------------------------------------------------------------------
# split_quality_invariance (round 8: split-fairness audit)
# --------------------------------------------------------------------------

def _sqi_oracle() -> str:
    from .driver_queries_similarity import _QUALITY_ORACLE, _split_expr

    return f"""
    WITH q AS ({_QUALITY_ORACLE}),
    sp AS (SELECT doc_id, {_split_expr(D)} AS split FROM documents),
    cells AS (
      SELECT sp.split,
             CAST(floor(q.quality * 1000000.0 + 0.5) AS BIGINT) AS q_micro
      FROM sp JOIN q USING (doc_id)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q_micro) AS BIGINT) AS sum_q_micro,
           CAST(sum(q_micro) // count(*) AS BIGINT) AS mean_q_micro,
           CAST(min(q_micro) AS BIGINT) AS min_q_micro,
           CAST(max(q_micro) AS BIGINT) AS max_q_micro,
           CAST(count(*) FILTER (WHERE q_micro >= 750000) AS BIGINT)
             AS n_above_bar
    FROM cells GROUP BY split ORDER BY split
    """


@register(
    "split_quality_invariance",
    oracle=_sqi_oracle(),
    doc="split-fairness audit: the heuristic quality signal's "
    "distribution per train/val/test split (n, exact micro sum/mean/"
    "min/max, count above the 0.75 curation bar) — the check that "
    "the portable-hash split didn't correlate with quality (it "
    "can't, being a pure function of the id, but the AUDIT is what "
    "a pipeline records; near-equal mean_q_micro and above-bar "
    "RATES across splits certify the eval set measures the same "
    "distribution training saw).  Per-doc quality micro-snapped "
    "BEFORE the split aggregate, so sums are exact BIGINTs.  One "
    "Arrow quality pass + one split groupBy.",
)
def split_quality_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import textstats as TSF
    from .driver_queries_similarity import _split_expr

    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select("doc_id", F.expr(_split_expr(PT.SPARK)).alias("split"))
    q = TSF.quality_stats_arrow(barrier(docs), "text", "doc_id").select(
        "doc_id",
        F.expr(
            "CAST(floor(quality * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("q_micro"),
    )
    return (
        sp.join(q, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("q_micro").cast("bigint").alias("sum_q_micro"),
            F.expr(
                "CAST(sum(q_micro) DIV count(*) AS BIGINT)"
            ).alias("mean_q_micro"),
            F.min("q_micro").cast("bigint").alias("min_q_micro"),
            F.max("q_micro").cast("bigint").alias("max_q_micro"),
            F.count(F.when(F.col("q_micro") >= 750000, 1))
            .cast("bigint")
            .alias("n_above_bar"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# zipf_slope_fit / heaps_law_fit (round 9: the two power-law corpus
# datacard exponents beside chao1_vocab_richness)
# --------------------------------------------------------------------------

_ZIPF_K = 1000

#: shared exact-integer OLS over milli-snapped (x, y) log points:
#: each ln is applied once to an exact BIGINT and the RESULT snapped
#: to milli BEFORE any aggregation (kills the 1-ulp libm-vs-JVM ln
#: divergence), so sx/sy/sxy/sxx/syy are exact BIGINTs on both
#: engines; slope and r2 are then single double expressions of those
#: integers, micro-snapped.  Magnitudes: |x|,|y| <= ~21000 milli
#: (ln of anything below e^21 ~ 1.3e9), k <= 1024 points, so
#: k*sxy <= 1024 * 1024 * 21000^2 ~ 4.6e14 — 4 decimal orders of
#: BIGINT headroom.
_OLS_SUMS = (
    "CAST(count(*) AS BIGINT) AS k, "
    "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
    "CAST(sum(x * y) AS BIGINT) AS sxy, "
    "CAST(sum(x * x) AS BIGINT) AS sxx, "
    "CAST(sum(y * y) AS BIGINT) AS syy"
)
_OLS_SLOPE = (
    "CAST(floor(CAST(k * sxy - sx * sy AS DOUBLE)"
    " / CAST(k * sxx - sx * sx AS DOUBLE)"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_OLS_R2 = (
    "CAST(floor("
    "CAST(k * sxy - sx * sy AS DOUBLE) * CAST(k * sxy - sx * sy AS DOUBLE)"
    " / (CAST(k * sxx - sx * sx AS DOUBLE)"
    "    * CAST(k * syy - sy * sy AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_MLN = "CAST(floor(ln(CAST({v} AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT)"


@register(
    "zipf_slope_fit",
    oracle=f"""
    WITH t AS (SELECT {PT.tokens('text', D)} AS toks FROM documents),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, word) AS r
            FROM wc ORDER BY c DESC, word LIMIT {_ZIPF_K}),
    pts AS (SELECT {_MLN.format(v='r')} AS x, {_MLN.format(v='c')} AS y
            FROM top),
    s AS (SELECT {_OLS_SUMS} FROM pts)
    SELECT k AS n_points, {_OLS_SLOPE} AS slope_micro, {_OLS_R2} AS r2_micro
    FROM s
    """,
    doc="Zipf rank-frequency exponent of the corpus vocabulary: the "
    "log-log OLS slope over the top-1000 (count DESC, word) ranked "
    "types — the datacard number that says how head-heavy the word "
    "distribution is (natural corpora sit near -1; synthetic or "
    "templated text drifts shallow).  Each ln is applied once to an "
    "exact BIGINT rank/count and milli-snapped BEFORE aggregation "
    "(the source_unigram_kl convention — kills cross-engine libm "
    "1-ulp drift); the five OLS sums are exact BIGINTs with 4 "
    "orders of headroom (analysis at _OLS_SUMS), and slope/r2 are "
    "single double divisions micro-snapped (floor(x*1e6+0.5) — the "
    "negative-safe kappa convention, since the slope IS negative).  "
    "Scale: one word-count shuffle; top-K is TakeOrderedAndProject "
    "(per-partition heaps, the corpus is never globally sorted); "
    "the rank window runs on the K=1000 bounded survivors only.",
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    wc = (
        docs.select(F.explode(F.expr(PT.tokens("text", S))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    top = wc.orderBy(F.desc("c"), "word").limit(_ZIPF_K)
    w = Window.orderBy(F.desc("c"), "word")  # bounded: K rows survive
    pts = top.select(
        F.row_number().over(w).cast("bigint").alias("r"), "c"
    ).select(
        F.expr(_MLN.format(v="r")).alias("x"),
        F.expr(_MLN.format(v="c")).alias("y"),
    )
    s = pts.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("k"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("sx"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("sy"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("sxy"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(y * y) AS BIGINT)").alias("syy"),
    )
    return s.select(
        F.col("k").alias("n_points"),
        F.expr(_OLS_SLOPE).alias("slope_micro"),
        F.expr(_OLS_R2).alias("r2_micro"),
    )


_HEAPS_PTS = 1024
_HEAPS_BAND = 1024  # docs per prefix band


@register(
    "heaps_law_fit",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      {PT.tokens("coalesce(text, '')", D)} AS toks
               FROM documents),
    pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
    fw AS (SELECT word, min(doc_id) AS fd
           FROM (SELECT doc_id, unnest(toks) AS word FROM t) GROUP BY word),
    nn AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS n_new
           FROM fw GROUP BY fd),
    base AS (SELECT pd.doc_id, pd.n_tok, coalesce(nn.n_new, 0) AS n_new
             FROM pd LEFT JOIN nn USING (doc_id)),
    run AS (SELECT doc_id,
                   CAST(sum(n_tok) OVER w AS BIGINT) AS n_tok_run,
                   CAST(sum(n_new) OVER w AS BIGINT) AS n_new_run,
                   CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
            FROM base
            WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
    pts AS (SELECT {_MLN.format(v='n_tok_run')} AS x,
                   {_MLN.format(v='n_new_run')} AS y
            FROM run, nd
            WHERE rn % greatest(1, n_docs // {_HEAPS_PTS}) = 0
              AND n_tok_run >= 1 AND n_new_run >= 1),
    s AS (SELECT {_OLS_SUMS} FROM pts),
    tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   CAST(sum(n_new) AS BIGINT) AS vocab_d
            FROM base)
    SELECT nd.n_docs, tot.n_tokens, tot.vocab_d, s.k AS n_points,
           {_OLS_SLOPE} AS beta_micro, {_OLS_R2} AS r2_micro
    FROM s, tot, nd
    """,
    doc="Heaps'-law vocabulary-growth exponent: V(N) ~ K * N^beta "
    "fit as the log-log OLS slope of (cumulative tokens, cumulative "
    "distinct types) over the doc_id corpus order — the datacard "
    "number that prices how fast new vocabulary keeps arriving "
    "(natural text sits near beta ~ 0.5; a saturating/templated "
    "corpus falls toward 0).  First occurrences are doc-granular "
    "(the word's min doc_id), the standard batch formulation.  "
    "Determinism: the same milli-snapped-ln / exact-BIGINT-OLS / "
    "micro-snapped-division ladder as zipf_slope_fit.  Scale: one "
    "word shuffle to (word -> min doc) + one per-doc count; BOTH "
    "running sums are band-parallel two-phase prefix sums over "
    "doc_id bands (operators/ranks.py — never a global sort); the "
    "fit reads at most {} decimated rank points (rn %% "
    "greatest(1, n_docs DIV {}) == 0), so OLS stays exact-BIGINT "
    "bounded at ANY corpus size — fitting on every doc would "
    "overflow the sums past ~230k docs and add nothing to a "
    "2-parameter fit.".format(_HEAPS_PTS, _HEAPS_PTS),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ranks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = barrier(
        docs.select(
            "doc_id", F.expr(PT.tokens("coalesce(text, '')", S)).alias("toks")
        )
    )
    pd_ = t.select("doc_id", F.size("toks").cast("bigint").alias("n_tok"))
    nn = (
        t.select("doc_id", F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy("fd")
        .agg(F.count("*").cast("bigint").alias("n_new"))
    )
    base = (
        pd_.join(nn, pd_.doc_id == nn.fd, "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn("band", F.expr(f"doc_id DIV {_HEAPS_BAND}"))
    )
    run = ranks.two_phase_prefix_sum(
        base, ["doc_id"], "band", ["n_tok", "n_new"]
    )
    run = ranks.two_phase_rank(run, ["doc_id"], "band", rank_name="rn")
    nd = base.agg(F.count("*").cast("bigint").alias("n_docs"))
    tot = base.agg(
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_new").cast("bigint").alias("vocab_d"),
    )
    pts = (
        run.join(F.broadcast(nd), F.lit(True))
        .filter(
            (F.expr(f"rn % greatest(1, n_docs DIV {_HEAPS_PTS})") == 0)
            & (F.col("n_tok_run") >= 1)
            & (F.col("n_new_run") >= 1)
        )
        .select(
            F.expr(_MLN.format(v="n_tok_run")).alias("x"),
            F.expr(_MLN.format(v="n_new_run")).alias("y"),
        )
    )
    s = pts.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("k"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("sx"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("sy"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("sxy"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr("CAST(sum(y * y) AS BIGINT)").alias("syy"),
    )
    return (
        s.join(F.broadcast(nd), F.lit(True))
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "n_docs",
            "n_tokens",
            "vocab_d",
            F.col("k").alias("n_points"),
            F.expr(_OLS_SLOPE).alias("beta_micro"),
            F.expr(_OLS_R2).alias("r2_micro"),
        )
    )


# --------------------------------------------------------------------------
# ngram_novelty_curve (round 9): marginal verbatim novelty per doc in
# corpus order — the data-ordering / memorization datacard.
# --------------------------------------------------------------------------

@register(
    "ngram_novelty_curve",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents),
    g0 AS (SELECT doc_id, {PT.hash_array('toks', D)} AS tok_hashes FROM t0),
    g AS (SELECT DISTINCT doc_id, unnest(
            {PT.word_ngram_hashes('tok_hashes', 3, D)}) AS gram
          FROM g0 WHERE len(tok_hashes) >= 3),
    pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           FROM g GROUP BY doc_id),
    fw AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram),
    nv AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
           FROM fw GROUP BY fd)
    SELECT pd.doc_id, pd.n_grams,
           coalesce(nv.n_novel, 0) AS n_novel,
           coalesce(nv.n_novel, 0) * 1000 // pd.n_grams AS novelty_milli
    FROM pd LEFT JOIN nv USING (doc_id)
    ORDER BY pd.doc_id
    """,
    doc="per-document n-gram novelty in corpus (doc_id) order: of each "
    "document's DISTINCT word-3-gram hashes, the fraction never seen "
    "in any earlier document (gram's min doc_id == this doc) — the "
    "marginal-new-content curve a curator reads for data ordering "
    "and memorization risk (documents near 0 novelty late in the "
    "stream are verbatim rehash; a corpus whose curve plateaus high "
    "keeps teaching).  The doc-granular first-occurrence convention "
    "of heaps_law_fit applied at n-gram resolution; exact integer "
    "milli fraction (operands non-negative).  Scale: ONE gram-keyed "
    "shuffle serves both the per-doc distinct counts and the "
    "min-doc first-occurrence table; assembly is a doc-keyed left "
    "join of two aggregates — the corpus text itself never moves "
    "twice.  Docs under 3 tokens have no grams and are absent (the "
    "minhash len>=3 convention).",
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t0 = docs.select(
        "doc_id", F.expr(PT.tokens("text", S)).alias("toks")
    ).select(
        "doc_id", F.expr(PT.hash_array("toks", S)).alias("tok_hashes")
    )
    g = barrier(
        t0.filter(F.size("tok_hashes") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(PT.word_ngram_hashes("tok_hashes", 3, S))
            ).alias("gram"),
        )
        .distinct()
    )
    pd_ = g.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    nv = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy("fd")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
        .withColumnRenamed("fd", "doc_id")
    )
    return (
        pd_.join(nv, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "coalesce(n_novel, 0) * 1000 DIV n_grams"
            ).alias("novelty_milli"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# wordpiece_encode_corpus (round 10): the THIRD subword recipe — greedy
# longest-match with start/continuation vocabulary (operators/wordpiece).
# ---------------------------------------------------------------------------

def _wordpiece_oracle(sf_dir: str) -> str:
    """Sparkless twin: word counts from the parquet, the same pure
    seeding/selection/greedy-encode functions, per-doc stats as VALUES
    (the bpe/unigram convention — Spark and the twin share only the
    pure integer functions; every AGGREGATION runs through a
    different engine)."""
    from ..operators import wordpiece

    path = f"{sf_dir}/documents.parquet"
    wc = wordpiece.word_counts_from_parquet(path)
    vocab = wordpiece.train_wordpiece_py(wc)
    stats = wordpiece.encode_stats_from_parquet(path, vocab)
    values = ",\n             ".join(
        f"({d}, {a}, {b}, {c}, {e})"
        for d, (a, b, c, e) in sorted(stats.items())
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(n_unk_words AS BIGINT) AS n_unk_words,
           CAST(n_continuations AS BIGINT) AS n_continuations
    FROM (VALUES {values})
      AS t(doc_id, n_words, n_pieces, n_unk_words, n_continuations)
    ORDER BY doc_id
    """


@register(
    "wordpiece_encode_corpus",
    oracle=_wordpiece_oracle,
    doc="WordPiece subword tokenizer (the BERT vocab family; Wu et "
    "al. 2016) — the THIRD subword recipe beside the gated BPE and "
    "unigram-LM queries, completing the tokenizer bake-off triple: "
    "a position-aware vocabulary (word-START units vs ## "
    "CONTINUATION units, counted separately over the distinct-word "
    "table), greedy longest-match-first encoding (HF algorithm — NO "
    "backtracking; a word with no matching unit at some position is "
    "[UNK] wholesale, which makes n_unk_words a vocabulary-quality "
    "signal Viterbi tokenizers cannot report), and per-document "
    "fertility stats (n_words, n_pieces, n_unk_words, "
    "n_continuations).  Scale (operators/wordpiece.py): corpus "
    "touched ONCE (word_frequencies, shared with BPE); seeding is a "
    "vocabulary-scale position-tagged substring explode + one "
    "groupBy; encoding is one Arrow pandas_udf pass with the "
    "vocabulary in the closure (constant plan size) and a per-batch "
    "distinct-word memo.  All counts exact integers; vocabulary "
    "selection has a total (count DESC, unit ASC) order — the "
    "pyarrow twin is bit-equal, emitted as the VALUES oracle.",
)
def wordpiece_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import wordpiece

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = wordpiece.train_wordpiece(docs)
    return wordpiece.encode_stats(docs, vocab).orderBy("doc_id")


# ---------------------------------------------------------------------------
# tokenizer_bakeoff (round 10): BPE vs unigram-LM vs WordPiece on one
# corpus — the side-by-side a tokenizer decision actually reads.
# ---------------------------------------------------------------------------

def _bakeoff_oracle(sf_dir: str) -> str:
    from ..operators import bpe, unigram, wordpiece

    path = f"{sf_dir}/documents.parquet"

    def totals(stats_vals):
        nw = sum(v[0] for v in stats_vals)
        np_ = sum(v[1] for v in stats_vals)
        return nw, np_, (np_ * 1000 // nw if nw else 0)

    merges = bpe.train_merges_from_parquet(path, _ENC_N_MERGES)
    b = totals(
        [(v[0], v[1]) for v in bpe.encode_stats_from_parquet(path, merges).values()]
    )
    wc = unigram.word_counts_from_parquet(path)
    u = totals(
        [
            (v[0], v[1])
            for v in unigram.encode_stats_from_parquet(
                path, unigram.train_unigram_py(wc)
            ).values()
        ]
    )
    w = totals(
        [
            (v[0], v[1])
            for v in wordpiece.encode_stats_from_parquet(
                path, wordpiece.train_wordpiece_py(
                    wordpiece.word_counts_from_parquet(path)
                )
            ).values()
        ]
    )
    rows = [("bpe", *b), ("unigram", *u), ("wordpiece", *w)]
    values = ", ".join(f"('{t}', {a}, {b_}, {c})" for t, a, b_, c in rows)
    return f"""
    SELECT tokenizer, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(fertility_milli AS BIGINT) AS fertility_milli
    FROM (VALUES {values})
      AS t(tokenizer, n_words, n_pieces, fertility_milli)
    ORDER BY tokenizer
    """


@register(
    "tokenizer_bakeoff",
    oracle=_bakeoff_oracle,
    doc="the tokenizer bake-off: BPE (150 merges), unigram-LM "
    "(seed + 2 hard-EM rounds), and WordPiece (greedy longest-match) "
    "each trained on the SAME corpus and compared on the numbers a "
    "tokenizer decision reads — corpus word count (equal across rows "
    "by construction: one shared tokenization, a built-in "
    "cross-check), total pieces, and fertility (pieces per word, "
    "exact milli) — the corpus-level composition of the three gated "
    "per-document encoders (bpe_encode_corpus, unigram_lm_tokenize, "
    "wordpiece_encode_corpus).  Scale: three independent "
    "distinct-word-table training passes + three map-side encode "
    "passes, each already individually scale-shaped; the result is "
    "three rows.  Oracle: the three bit-equal sparkless twins, "
    "totaled, as VALUES.",
)
def tokenizer_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe, unigram, wordpiece

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # BPE: parquet-twin trainer (pinned equal to the Spark trainer by
    # bpe_train_merges), Arrow encoder, corpus totals
    merges = bpe.train_merges_from_parquet(
        f"{sf_dir}/documents.parquet", _ENC_N_MERGES
    )
    words = docs.select(
        F.explode(F.expr(PT.tokens("text", S))).alias("word")
    ).withColumn("syms", F.expr("split(word, '')"))
    b = bpe.apply_merges(words, merges, "syms", mode="arrow").agg(
        F.lit("bpe").alias("tokenizer"),
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.size("syms")).cast("bigint").alias("n_pieces"),
    )
    u = unigram.encode_stats(docs, unigram.train_unigram(docs)).agg(
        F.lit("unigram").alias("tokenizer"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_pieces").cast("bigint").alias("n_pieces"),
    )
    w = wordpiece.encode_stats(docs, wordpiece.train_wordpiece(docs)).agg(
        F.lit("wordpiece").alias("tokenizer"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_pieces").cast("bigint").alias("n_pieces"),
    )
    return (
        b.unionAll(u)
        .unionAll(w)
        .select(
            "tokenizer",
            "n_words",
            "n_pieces",
            F.expr("n_pieces * 1000 DIV n_words").alias("fertility_milli"),
        )
        .orderBy("tokenizer")
    )


# ---------------------------------------------------------------------------
# mink_prob_contamination (round 10): Min-K% Prob membership signal —
# the modern pretraining-data audit (Shi et al. 2023) on the KN LM.
# ---------------------------------------------------------------------------

_MINK_PCT = 20


@register(
    "mink_prob_contamination",
    oracle=f"""{_KN_SCORED_CTES},
    k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM scored GROUP BY doc_id),
    r AS (SELECT doc_id, nlp,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY nlp DESC) AS rk
          FROM scored),
    m AS (SELECT r.doc_id, CAST(sum(r.nlp) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS kc
          FROM r JOIN k USING (doc_id)
          WHERE r.rk <= greatest(1, k.n * {_MINK_PCT} // 100)
          GROUP BY r.doc_id)
    SELECT d.doc_id,
           coalesce(k.n, 0) AS n_bigrams,
           coalesce(m.kc, 0) AS k_count,
           CAST(coalesce(m.s, 0) AS BIGINT) AS mink_sum_nlp_micro,
           CAST(coalesce(m.s, 0) // greatest(coalesce(m.kc, 0), 1)
                AS BIGINT) AS mink_avg_nlp_micro
    FROM (SELECT doc_id FROM t) d
    LEFT JOIN k USING (doc_id) LEFT JOIN m USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Min-K%% Prob membership / contamination signal (Shi et al. "
    "2023, 'Detecting Pretraining Data from Large Language Models') "
    "on the repo's Kneser-Ney LM: per document, the mean NLL of its "
    f"{_MINK_PCT}%% LEAST-probable bigrams — a member (memorized/"
    "duplicated) document has few surprising tokens, so its min-K "
    "tail average sits LOW; scoring only the average (lm_perplexity/"
    "kneser_ney rows) washes that tail out.  The audit a pretraining "
    "pipeline runs against a benchmark suite before release, beside "
    "the n-gram decontamination family (which needs the benchmark "
    "text; this needs only the model).  Mechanics: the per-bigram "
    "exact-micro NLL frame (operators/lm.kneser_ney_row_scores) "
    "ranked DESC within each document (a per-DOCUMENT window — "
    "bounded by document length, never a global sort), top "
    "ceil-by-floor k = max(1, n*20 DIV 100) rows summed exactly; "
    "boundary ties carry equal nlp values so the sum is invariant "
    "to tie order.  <2-token documents survive with zeros.",
)
def mink_prob_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bi, w1s, w2s, b = lm.train_kneser_ney_lm(docs)
    rows = lm.kneser_ney_row_scores(docs, bi, w1s, w2s, b).filter(
        F.col("_nlp").isNotNull()
    )
    k = rows.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("_nlp"))
    m = (
        rows.withColumn("rk", F.row_number().over(w))
        .join(k, "doc_id")
        .filter(F.col("rk") <= F.greatest(F.lit(1), F.expr(f"n * {_MINK_PCT} DIV 100")))
        .groupBy("doc_id")
        .agg(
            F.sum("_nlp").cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("kc"),
        )
    )
    return (
        docs.select("doc_id")
        .join(k, "doc_id", "left")
        .join(m, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("kc"), F.lit(0)).cast("bigint").alias("k_count"),
            F.coalesce(F.col("s"), F.lit(0))
            .cast("bigint")
            .alias("mink_sum_nlp_micro"),
            F.expr(
                "CAST(coalesce(s, 0) DIV greatest(coalesce(kc, 0), 1)"
                " AS BIGINT)"
            ).alias("mink_avg_nlp_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dsir_importance_resampling (round 11): DSIR — importance-weighted
# data selection under hashed bag-of-words models (Xie et al. 2023).
# ---------------------------------------------------------------------------

_DSIR_TARGET = ("src0", "src1", "src2")
_DSIR_TOPK = 40


def _dsir_oracle() -> str:
    from ..operators import dsir

    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    b = dsir.bucket_sql("word", D)
    lr = dsir.log_ratio_micro_sql("t_c", "s_c", "t_tot", "s_tot")
    return f"""
    WITH d AS (
      SELECT doc_id, source, {PT.tokens('text', D)} AS toks,
             source IN ({tgt}) AS is_t
      FROM documents
    ),
    tok AS (SELECT doc_id, is_t, unnest(toks) AS word FROM d),
    tb AS (SELECT doc_id, is_t, {b} AS b FROM tok),
    bs AS (SELECT b,
                  CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_c,
                  CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS s_c
           FROM tb GROUP BY b),
    tt AS (SELECT CAST(sum(t_c) AS BIGINT) AS t_tot,
                  CAST(sum(s_c) AS BIGINT) AS s_tot FROM bs),
    lr AS (SELECT b, {lr} AS lr_micro FROM bs CROSS JOIN tt),
    sc AS (SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(lr_micro) AS BIGINT) AS w
           FROM tb JOIN lr USING (b) WHERE NOT is_t GROUP BY tb.doc_id)
    SELECT p.doc_id, p.source,
           CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(sc.w, 0) AS BIGINT) AS dsir_weight_micro
    FROM (SELECT doc_id, source FROM d WHERE NOT is_t) p
    LEFT JOIN sc USING (doc_id)
    ORDER BY dsir_weight_micro DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """


@register(
    "dsir_importance_resampling",
    oracle=_dsir_oracle(),
    bench=True,
    doc="DSIR data selection (Xie et al. 2023): importance weights "
    "p_target/p_source under two hashed bag-of-words unigram models — "
    f"target model fit on the curated sources {_DSIR_TARGET}, source "
    "model on the raw pool — and the top-"
    f"{_DSIR_TOPK} raw documents by weight selected for the training "
    "mix.  The no-training alternative to the quality-classifier "
    "family: two exact count passes + one broadcast-scored pass.  "
    "Exactness: the smoothed ratio ((t_c+1)(S+NB))/((s_c+1)(T+NB)) "
    "is ONE ratio of exact BIGINT products so the ln() input is "
    "bit-identical across engines (the KN convention); per-bucket "
    "log-ratios snap to micro; document weights are exact BIGINT "
    "sums; ties break on doc_id.  Scale: one tokenize pass feeds "
    "both models (membership is a predicate, not a second scan); "
    "the bucket shuffle is bounded by NB=256; the NB-row log-ratio "
    "table broadcasts so the raw pool is scored map-side; top-k is "
    "TakeOrderedAndProject (operators/dsir.py).",
)
def dsir_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dsir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    w = dsir.dsir_weights(docs, F.col("source").isin(*_DSIR_TARGET))
    return (
        w.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_tokens", "dsir_weight_micro")
        .orderBy(F.desc("dsir_weight_micro"), "doc_id")
        .limit(_DSIR_TOPK)
    )


# ---------------------------------------------------------------------------
# sequence_packing_stats (round 11): next-fit-decreasing context-window
# packing — the padding-efficiency report every pretraining run reads.
# ---------------------------------------------------------------------------


def _packing_oracle(sf_dir: str) -> str:
    from ..operators import packing

    rows = packing.pack_stats_py(sf_dir)
    vals = ", ".join(f"({s}, {d}, {b}, {t}, {p}, {f})" for s, d, b, t, p, f in rows)
    return f"""
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_bins AS BIGINT) AS n_bins,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(padding_tokens AS BIGINT) AS padding_tokens,
           CAST(fill_milli AS BIGINT) AS fill_milli
    FROM (VALUES {vals})
      AS t(shard, n_docs, n_bins, total_tokens, padding_tokens, fill_milli)
    ORDER BY shard
    """


@register(
    "sequence_packing_stats",
    oracle=_packing_oracle,
    bench=True,
    doc="sequence packing for pretraining (operators/packing.py): "
    "next-fit-decreasing assignment of documents into "
    f"{packing_mod.CAPACITY}-token context windows within "
    f"{packing_mod.N_SHARDS} hash shards, reported as the per-shard "
    "padding-efficiency datacard (docs, bins, total tokens, padding, "
    "fill per-mille) — the number that is pure wasted compute if it "
    "drifts (Krell et al. 2021).  NFD keeps O(1) packing state (one "
    "open bin), which is what makes the pass streamable; shards make "
    "it embarrassingly parallel (one shuffle on the shard key, then "
    "a grouped Arrow pass — FlatMapGroupsInPandas, no row-wise "
    "Python).  Oracle: the bit-equal sparkless twin as VALUES (the "
    "sequential-algorithm convention).",
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = packing.pack_assignments(docs)
    cap = packing.CAPACITY
    return (
        a.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            (F.max("bin_id") + 1).cast("bigint").alias("n_bins"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "n_bins",
            "total_tokens",
            (F.col("n_bins") * cap - F.col("total_tokens"))
            .cast("bigint")
            .alias("padding_tokens"),
            F.expr(f"CAST(total_tokens * 1000 DIV (n_bins * {cap}) AS BIGINT)")
            .alias("fill_milli"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# tfidf_keyphrases (round 11): per-document top-k salient terms — the
# datacard / faceting signal every corpus browser needs.
# ---------------------------------------------------------------------------

_KP_TOPK = 3


@register(
    "tfidf_keyphrases",
    oracle=f"""
    WITH t AS (SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
             SELECT doc_id, unnest(toks) AS term FROM t
           ) GROUP BY doc_id, term),
    dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(floor(
               ln(CAST(n.n_docs AS DOUBLE) / CAST(dfs.df AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS tfidf_micro
      FROM tf JOIN dfs USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf_micro DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
           CAST(tfidf_micro AS BIGINT) AS tfidf_micro
    FROM ranked WHERE rank <= {_KP_TOPK}
    ORDER BY doc_id, rank
    """,
    doc="per-document tf-idf keyphrase extraction: top-"
    f"{_KP_TOPK} terms by exact tf * micro-floored ln(N/df) — the "
    "salience signal corpus datacards, faceted browsers, and "
    "weak-label taggers read.  Exactness: idf snaps to micro once "
    "per TERM (ln input is one ratio of exact BIGINTs), the score "
    "is BIGINT tf * idf_micro, ties break (score DESC, term ASC).  "
    "Scale: one (doc,term) count shuffle; document frequencies are "
    "a vocabulary-scale aggregate whose join strategy is left to AQE "
    "(broadcast when small, term-key shuffle at vocabulary sizes a "
    "driver can't hold); the rank window partitions BY DOCUMENT "
    "(bounded by doc length, never global).",
)
def tfidf_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        docs.select(
            "doc_id", F.explode(F.expr(PT.tokens("text", S))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        # dfs is VOCABULARY-scale: small enough to broadcast on most
        # corpora but not guaranteed at 100 TB — leave the strategy to
        # AQE (broadcasts when under threshold, term-key shuffle when
        # not) instead of forcing a driver-sized build
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.expr(
                "tf * CAST(floor(ln(CAST(n_docs AS DOUBLE) / "
                "CAST(df AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _KP_TOPK)
        .select("doc_id", "rank", "term", "tfidf_micro")
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# doremi_domain_weights (round 11): DoReMi-style mixture reweighting —
# per-domain EXCESS proxy-model loss becomes the upsampling weight.
# ---------------------------------------------------------------------------


@register(
    "doremi_domain_weights",
    oracle=f"""{_KN_SCORED_CTES},
    ds AS (SELECT doc_id, source FROM documents),
    perdoc AS (SELECT doc_id, count(*) AS nb, sum(nlp) AS s
               FROM scored GROUP BY doc_id),
    dom AS (
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(p.nb), 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(sum(p.s), 0) AS BIGINT) AS sum_nlp
      FROM ds d LEFT JOIN perdoc p USING (doc_id) GROUP BY d.source
    ),
    m AS (SELECT source, n_docs, n_bigrams,
                 CAST(sum_nlp // greatest(n_bigrams, 1) AS BIGINT)
                   AS mean_nlp_micro
          FROM dom),
    g AS (SELECT CAST(sum(n_bigrams) AS BIGINT) AS gb,
                 CAST(sum(sum_nlp) AS BIGINT) AS gs FROM dom),
    x AS (SELECT m.source, m.n_docs, m.n_bigrams, m.mean_nlp_micro,
                 CAST(greatest(m.mean_nlp_micro
                               - (g.gs // greatest(g.gb, 1)), 0)
                   AS BIGINT) AS excess_micro
          FROM m CROSS JOIN g),
    tw AS (SELECT CAST(sum(excess_micro) AS BIGINT) AS tot FROM x)
    SELECT x.source, x.n_docs, x.n_bigrams, x.mean_nlp_micro,
           x.excess_micro,
           CAST(CASE WHEN tw.tot > 0
                     THEN x.excess_micro * 1000 // tw.tot
                     ELSE 0 END AS BIGINT) AS weight_milli
    FROM x CROSS JOIN tw
    ORDER BY x.source
    """,
    doc="DoReMi-style domain reweighting (Xie et al. 2023, 'DoReMi: "
    "Optimizing Data Mixtures Speeds Up Language Model "
    "Pretraining'), the deterministic one-round rendering: the "
    "in-plan Kneser-Ney bigram LM is the proxy model, each domain's "
    "EXCESS mean NLL over the corpus mean (clamped at 0) is its "
    "upsampling signal, normalized to milli weights — domains the "
    "proxy finds hardest get upsampled, the core DoReMi move "
    "(one excess-loss round instead of the minimax training loop; "
    "same sign structure).  Completes the mixture suite: token "
    "budgets (mixture.py), importance resampling (dsir), "
    "difficulty-driven reweighting (this).  All arithmetic exact: "
    "per-bigram micro NLLs sum as BIGINTs, means are integer DIV, "
    "the weight normalization is integer milli.  Scale: one "
    "corpus-scale bigram scoring pass (the gated KN machinery), one "
    "domain-key aggregation; domain count is small by construction. "
    " Oracle: composes the SAME shared _KN_SCORED_CTES constant as "
    "kneser_ney_perplexity and mink_prob_contamination — the "
    "advice-item refactor paying off.",
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import lm

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    bi, w1s, w2s, b = lm.train_kneser_ney_lm(docs)
    rows = lm.kneser_ney_row_scores(docs, bi, w1s, w2s, b).filter(
        F.col("_nlp").isNotNull()
    )
    perdoc = rows.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("nb"),
        F.sum("_nlp").cast("bigint").alias("s"),
    )
    dom = (
        docs.select("doc_id", "source")
        .join(perdoc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("nb"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.sum("s"), F.lit(0)).cast("bigint").alias("sum_nlp"),
        )
        .withColumn(
            "mean_nlp_micro",
            F.expr("CAST(sum_nlp DIV greatest(n_bigrams, 1) AS BIGINT)"),
        )
    )
    g = dom.agg(
        F.sum("n_bigrams").cast("bigint").alias("gb"),
        F.sum("sum_nlp").cast("bigint").alias("gs"),
    )
    x = dom.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_bigrams",
        "mean_nlp_micro",
        F.expr(
            "CAST(greatest(mean_nlp_micro - (gs DIV greatest(gb, 1)), 0)"
            " AS BIGINT)"
        ).alias("excess_micro"),
    )
    t = x.agg(F.sum("excess_micro").cast("bigint").alias("tot"))
    return (
        x.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            "mean_nlp_micro",
            "excess_micro",
            F.expr(
                "CAST(CASE WHEN tot > 0 THEN excess_micro * 1000 DIV tot"
                " ELSE 0 END AS BIGINT)"
            ).alias("weight_milli"),
        )
        .orderBy("source")
    )
