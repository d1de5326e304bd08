"""Text-analysis expressions for large-scale training-data pipelines.

All pure built-in Column expressions (whole-stage codegen; zero Python
in the executor hot path):

- token counting: whitespace tokens and a BPE-ish regex token count
- quality scoring: length / punctuation ratio / stopword ratio /
  mean word length combined into a [0,1] score
- language ID: tiny stopword-evidence heuristic over a fixed lexicon
- document fingerprint: min-of-rolling-polynomial-hash over character
  shingles (winnowing-style), portable to the DuckDB oracle
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from . import portable

#: Tiny per-language stopword evidence sets for the heuristic language
#: classifier.  Deliberately small and fixed so the oracle SQL can
#: reproduce them verbatim.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}

EN_STOPWORDS = (
    "the", "and", "of", "to", "in", "is", "a", "that", "it", "on",
    "for", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)

#: BPE-ish tokenizer regex: word pieces, numbers, or single non-space
#: symbols — a public GPT-2-style approximation without lookaheads so
#: both regex engines (Java in Spark, RE2 in DuckDB) agree.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: str) -> Column:
    return F.size(F.expr(portable.tokens(c, portable.SPARK)))


def bpe_token_count(c: str) -> Column:
    """Count of BPE-ish regex tokens via regexp_count (Spark >= 3.5)."""
    return F.regexp_count(F.col(c), F.lit(BPE_TOKEN_RE))


def punct_ratio(c: str) -> Column:
    n_punct = F.length(F.regexp_replace(F.col(c), r"[^.,;:!?'\"()\[\]-]", ""))
    return n_punct / F.greatest(F.length(F.col(c)), F.lit(1))


def stopword_ratio(c_tokens: str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (English) stopwords; expects a
    pre-computed token-array column name."""
    toks = F.col(c_tokens)
    quoted = ", ".join("'" + w + "'" for w in stopwords)
    hits = F.size(F.expr(f"filter({c_tokens}, t -> t in ({quoted}))"))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_len(c_tokens: str) -> Column:
    total = F.expr(
        f"aggregate({c_tokens}, CAST(0 AS BIGINT), (acc, t) -> acc + length(t))"
    )
    return total / F.greatest(F.size(F.col(c_tokens)), F.lit(1))


def quality_score(text_col: str, tokens_col: str) -> Column:
    """Composite [0,1] quality heuristic: rewards reasonable length,
    word sizes and stopword presence; penalizes punctuation soup.
    Deterministic arithmetic shared with the oracle."""
    n_tok = F.size(F.col(tokens_col))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    sw = stopword_ratio(tokens_col)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    mwl = mean_word_len(tokens_col)
    word_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.least(punct_ratio(text_col) * 4.0, F.lit(1.0))
    return round6(
        0.35 * len_score + 0.25 * sw_score + 0.2 * word_score + 0.2 * (1.0 - punct_pen)
    )


def round6(c: Column) -> Column:
    """Engine-independent 6-decimal rounding (see portable.round6)."""
    return F.floor(c * 1000000.0 + 0.5) / 1000000.0


def lang_scores(tokens_col: str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID evidence)."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        quoted = ", ".join("'" + w + "'" for w in words)
        out[lang] = F.size(F.expr(f"filter({tokens_col}, t -> t in ({quoted}))"))
    return out


def lang_id(tokens_col: str) -> Column:
    """argmax over lang_scores with deterministic tie-break (language
    code ascending); 'und' when no evidence at all."""
    scores = lang_scores(tokens_col)
    # sort ascending by (-score, lang): element 0 is then the highest
    # score with the lexicographically smallest language code on ties.
    pairs = [
        F.struct((-scores[lang]).alias("neg_score"), F.lit(lang).alias("lang"))
        for lang in sorted(scores)
    ]
    top = F.sort_array(F.array(*pairs))[0]
    return F.when(top["neg_score"] < 0, top["lang"]).otherwise(F.lit("und"))


def quality_stats_arrow(df, text_col: str, id_col: str):
    """Arrow-batched fast path for the full quality-stats projection
    (n_tokens, bpe_tokens, punct_ratio, stopword_ratio, mean_word_len,
    quality) producing BIT-IDENTICAL values to the Column-expression
    path: same tokenization, same IEEE double ops in the same order,
    same floor(x*1e6+0.5)/1e6 rounding. The expression path is the
    spec (and what the DuckDB oracle mirrors); this one removes the
    higher-order-function interpretation and its multi-second codegen
    from the per-batch hot loop.
    """
    import math
    import re

    import pandas as pd
    from pyspark.sql import types as T

    ws = re.compile(r"\s+")
    bpe = re.compile(BPE_TOKEN_RE)
    punct = set(".,;:!?'\"()[]-")
    stops = set(EN_STOPWORDS)

    def _r6(x: float) -> float:
        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("n_tokens", T.LongType(), True),
            T.StructField("bpe_tokens", T.LongType(), True),
            T.StructField("punct_ratio", T.DoubleType(), True),
            T.StructField("stopword_ratio", T.DoubleType(), True),
            T.StructField("mean_word_len", T.DoubleType(), True),
            T.StructField("quality", T.DoubleType(), True),
        ]
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                toks = [w for w in ws.split(t.lower()) if w]
                n_tok = len(toks)
                n_bpe = len(bpe.findall(t))
                pr = sum(1 for c in t if c in punct) / max(len(t), 1)
                sw = sum(1 for w in toks if w in stops) / max(n_tok, 1)
                mwl = sum(len(w) for w in toks) / max(n_tok, 1)
                len_score = min(n_tok / 64.0, 1.0)
                sw_score = min(sw * 4.0, 1.0)
                word_score = 1.0 if 3 <= mwl <= 10 else 0.5
                punct_pen = min(pr * 4.0, 1.0)
                q = _r6(
                    0.35 * len_score
                    + 0.25 * sw_score
                    + 0.2 * word_score
                    + 0.2 * (1.0 - punct_pen)
                )
                rows.append((doc_id, n_tok, n_bpe, _r6(pr), _r6(sw), _r6(mwl), q))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_tokens", "bpe_tokens", "punct_ratio",
                    "stopword_ratio", "mean_word_len", "quality",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(_batches, schema)


def curation_stats_arrow(df, text_col: str, id_col: str):
    """One Arrow pass emitting (id, quality, lang_pred) — the fused
    form of quality_stats_arrow + lang_id for selection pipelines.
    Bit-identical to the expression specs: same quality arithmetic,
    same stopword-evidence argmax with (score desc, lang asc)
    tie-break, 'und' when no evidence."""
    import math
    import re

    import pandas as pd
    from pyspark.sql import types as T

    ws = re.compile(r"\s+")
    punct = set(".,;:!?'\"()[]-")
    stops = set(EN_STOPWORDS)
    lang_sets = {lang: set(words) for lang, words in LANG_STOPWORDS.items()}
    langs = sorted(lang_sets)

    def _r6(x: float) -> float:
        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("quality", T.DoubleType(), True),
            T.StructField("lang_pred", T.StringType(), True),
        ]
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                toks = [w for w in ws.split(t.lower()) if w]
                n_tok = len(toks)
                pr = sum(1 for c in t if c in punct) / max(len(t), 1)
                sw = sum(1 for w in toks if w in stops) / max(n_tok, 1)
                mwl = sum(len(w) for w in toks) / max(n_tok, 1)
                q = _r6(
                    0.35 * min(n_tok / 64.0, 1.0)
                    + 0.25 * min(sw * 4.0, 1.0)
                    + 0.2 * (1.0 if 3 <= mwl <= 10 else 0.5)
                    + 0.2 * (1.0 - min(pr * 4.0, 1.0))
                )
                neg, lang = min(
                    (-sum(1 for w in toks if w in lang_sets[lg]), lg)
                    for lg in langs
                )
                rows.append((doc_id, q, lang if neg < 0 else "und"))
            yield pd.DataFrame(rows, columns=[id_col, "quality", "lang_pred"])

    return df.select(id_col, text_col).mapInPandas(_batches, schema)


def fingerprint(text_col: str, shingle: int = 8) -> Column:
    """Winnowing-style document fingerprint: min polynomial hash over
    character shingles.  Portable with the DuckDB oracle."""
    grams = portable.char_ngrams(text_col, shingle, portable.SPARK)
    hashed = portable.transform(grams, f"g -> {portable.poly_hash('g', portable.SPARK)}", portable.SPARK)
    return F.expr(portable.array_min(hashed, portable.SPARK))


def compression_ratio_arrow(df, text_col: str, id_col: str, level: int = 6):
    """Per-document zlib compression ratio — the Gopher/CCNet
    "compressibility" quality proxy: highly compressible text
    (ratio << 1) is boilerplate/repetition; near-incompressible text
    (ratio ~ 1) is often binary junk or gibberish. The middle band is
    natural language.

    Arrow-batched mapInPandas; each batch compresses its documents
    with a FIXED zlib level, so the output is deterministic for a
    given zlib build — the oracle twin (plans/driver_queries_pretrain)
    runs the identical compression in the same interpreter, making
    even this non-SQL signal value-hash-gateable. NULL text reports 0
    bytes and ratio 0.0 (the every-doc-survives contract). Ratio is
    floor(x*1e6+0.5)/1e6 micro-rounded, the textstats convention.
    Map-side only: no shuffle at all.
    """
    import math as _math
    import zlib as _zlib

    schema = (
        f"{id_col} bigint, raw_bytes bigint, compressed_bytes bigint, "
        "compression_ratio double"
    )

    def _batches(it):
        import pandas as pd

        for pdf in it:
            ids, raws, comps, ratios = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = (text or "").encode("utf-8")
                c = len(_zlib.compress(b, level)) if b else 0
                r = (
                    0.0
                    if not b
                    else _math.floor(c / len(b) * 1e6 + 0.5) / 1e6
                )
                ids.append(did)
                raws.append(len(b))
                comps.append(c)
                ratios.append(r)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "raw_bytes": raws,
                    "compressed_bytes": comps,
                    "compression_ratio": ratios,
                }
            )

    return df.select(id_col, text_col).mapInPandas(_batches, schema)
