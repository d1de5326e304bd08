"""Byte-pair-encoding merge training, Spark-first.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the GPT-2/RoBERTa vocab recipe): repeatedly find the most
frequent adjacent symbol pair over the word-frequency table and merge
it.  The iterative structure mirrors kmeans_two_iterations: per
round, ONE distributed aggregation over the vocabulary plus a 1-row
driver collect (the argmax pair) — the corpus itself is touched once
to build word frequencies and never again.

Scale notes (100 TB):
- word-frequency table construction is the only corpus-scale pass
  (explode tokens -> groupBy word), identical to vocab building;
- each merge round shuffles only (pair, count) partials over the
  VOCABULARY, which is millions of rows, not the corpus; production
  trainers (fastBPE, HF tokenizers) further sample words — pass a
  pre-sampled docs DF for that;
- merge application is a codegen'd fold per word — no UDFs anywhere.

Determinism: pair argmax tie-breaks (count DESC, pair ASC), greedy
left-to-right non-overlapping merge application — the pure-Python
twin (train_merges_py) reproduces the trained merge table exactly,
which is how the driver gate hash-checks an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: symbol-pair separator — never appears in whitespace-split tokens
SEP = "\x1f"


def _q(s: str) -> str:
    """Escape a symbol for inlining in a Spark SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def q_duck(s: str) -> str:
    """Escape a symbol for inlining in a DuckDB (standard-SQL) string
    literal — quote doubling, no backslash escapes."""
    return s.replace("'", "''")


def _adjacent_pairs(syms: str) -> str:
    """SQL: array of 'left<SEP>right' strings for adjacent symbols."""
    n = f"greatest(size({syms}) - 1, 0)"
    return (
        f"zip_with(slice({syms}, 1, {n}), slice({syms}, 2, {n}), "
        f"(a, b) -> concat(a, '{SEP}', b))"
    )


def _merge_fold(syms: str, p1: str, p2: str) -> str:
    """SQL: greedy left-to-right merge of adjacent (p1, p2) into
    p1||p2 via a fold — the canonical BPE application order."""
    l, r, m = _q(p1), _q(p2), _q(p1 + p2)
    return (
        f"aggregate({syms}, CAST(array() AS array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, size(acc)) = '{l}' "
        f"AND x = '{r}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{m}')), "
        f"concat(acc, array(x))))"
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus-scale pass, done once.

    Words containing SEP are dropped: SEP is the pair-encoding
    delimiter for the argmax round-trip, and a token carrying it
    (it is not whitespace, so tokenization keeps it) would split at
    the wrong boundary and silently corrupt the merge table.  The
    Python twin applies the identical filter."""
    return (
        docs.select(
            F.explode(F.expr(PT.tokens(text_col, PT.SPARK))).alias("word")
        )
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns
    [(left, right, pair_count), ...] in rank order.  Stops early when
    no adjacent pair remains."""
    words = word_frequencies(docs, text_col).withColumn(
        "syms", F.expr("split(word, '')")
    )
    words = words.persist()
    parent: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                words.select(
                    F.explode(F.expr(_adjacent_pairs("syms"))).alias("pair"),
                    "cnt",
                )
                .groupBy("pair")
                .agg(F.sum("cnt").alias("pair_cnt"))
                .orderBy(F.desc("pair_cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            # the argmax scanned every partition of `words`, so its
            # cache is now fully materialized; the previous round's
            # cache (this frame's parent) can be dropped.  Deferring
            # the unpersist one round replaces the old explicit
            # materialize-count job — ONE job per round instead of two
            # (at most two generations cached at once, same as before).
            if parent is not None:
                parent.unpersist()
                parent = None
            if not top:
                break
            p1, p2 = top[0].pair.split(SEP, 1)
            merges.append((p1, p2, top[0].pair_cnt))
            nxt = words.select(
                "word", "cnt", F.expr(_merge_fold("syms", p1, p2)).alias("syms")
            ).persist()
            parent, words = words, nxt
    finally:
        if parent is not None:
            parent.unpersist()
        words.unpersist()
    return merges


#: Above this many merges the chained-fold encode path is a plan-size
#: cliff: each merge wraps the symbol column in another aggregate()
#: expression, and CollapseProject nests them — Catalyst analysis
#: blows up and codegen hits janino's 64 KB method limit long before a
#: production-size (30k+) merge table.  Past the threshold we switch
#: to an Arrow-batched pandas_udf encoder — the same convention as the
#: IVF GEMM fallback (operators/ann.py IVF_INLINE_MAX_TERMS).
FOLD_MAX_MERGES = 100


def _rank_encode_py(
    syms: list[str],
    ranks: dict[tuple[str, str], int],
    pairs: list[tuple[str, str]],
) -> list[str]:
    """Encode one word by repeatedly applying the lowest-rank merge
    whose pair is present (each application is the same greedy
    left-to-right pass as the fold path).

    For a CONSISTENTLY TRAINED merge table this is bit-equal to
    applying every merge sequentially in rank order: a merge's
    operands can only be produced by lower-rank merges (the pair was
    counted during training, so its symbols existed then), hence a
    higher-rank merge can never create a pair that a lower-rank merge
    consumes.  Pinned by tests/test_pretrain_ops.py parity tests
    against the fold path and the sequential Python twin.  Cost is
    O(applied_merges x len) per word instead of
    O(table_size x len)."""
    while True:
        best = -1
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b), -1)
            if r >= 0 and (best < 0 or r < best):
                best = r
        if best < 0:
            return syms
        syms = _merge_word_py(syms, *pairs[best])


def _apply_merges_arrow(
    df: DataFrame, merges: list[tuple[str, str, int]], syms_col: str
) -> DataFrame:
    """Arrow-batched encoder: ONE vectorized pandas_udf regardless of
    merge-table size (the model rides along in the closure — a 30k
    merge table is ~1 MB, broadcast once per executor).  A per-batch
    word cache exploits Zipf: most batches are dominated by a few
    thousand distinct words."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    pairs = [(l, r) for l, r, _ in merges]

    @pandas_udf("array<string>")
    def _encode(s):  # pd.Series[array<string>] -> same
        import pandas as pd

        cache: dict[str, list[str]] = {}
        out = []
        for syms in s:
            if syms is None:
                # fold path: aggregate(NULL, ...) is NULL — match it
                out.append(None)
                continue
            key = SEP.join(syms)
            got = cache.get(key)
            if got is None:
                got = _rank_encode_py(list(syms), ranks, pairs)
                cache[key] = got
            out.append(got)
        return pd.Series(out)

    return df.withColumn(syms_col, _encode(F.col(syms_col)))


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    syms_col: str = "syms",
    mode: str | None = None,
) -> DataFrame:
    """Encode: apply the learned merges to a symbol-array column in
    rank order (the BPE encode convention).

    Small tables (<= FOLD_MAX_MERGES) compile to pure codegen folds;
    larger ones use the Arrow pandas_udf encoder, whose plan size is
    constant in the table size.  ``mode`` ('fold' | 'arrow') forces a
    path — used by the parity tests."""
    if mode is None:
        mode = "arrow" if len(merges) > FOLD_MAX_MERGES else "fold"
    if mode == "arrow":
        return _apply_merges_arrow(df, merges, syms_col)
    out = df
    for p1, p2, _ in merges:
        out = out.withColumn(syms_col, F.expr(_merge_fold(syms_col, p1, p2)))
    return out


# ---------------------------------------------------------------------------
# Pure-Python twin — the oracle path for the driver's hash gate, and
# the fuzz reference.  Reads the SAME parquet, reproduces train_merges
# bit-for-bit.
# ---------------------------------------------------------------------------

def _merge_word_py(syms: list[str], p1: str, p2: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == p1 and x == p2:
            out[-1] = p1 + p2
        else:
            out.append(x)
    return out


def train_merges_py(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    words = {w: (list(w), c) for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # (count DESC, pair ASC) — the Spark orderBy tie-break; the
        # pair string compares as left + SEP + right
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1]))
        (p1, p2), cnt = best
        merges.append((p1, p2, cnt))
        words = {
            w: (_merge_word_py(syms, p1, p2), c)
            for w, (syms, c) in words.items()
        }
    return merges


def train_merges_from_parquet(path: str, n_merges: int) -> list[tuple[str, str, int]]:
    """Sparkless twin over a documents parquet — used to render the
    driver oracle with data-derived literals (the ann_pq_trained
    convention)."""
    import re

    import pyarrow.parquet as pq_

    counts: dict[str, int] = {}
    for batch in pq_.ParquetFile(path).iter_batches(columns=["text"]):
        for text in batch.column("text").to_pylist():
            if not text:
                continue
            for w in re.split(PT.PY_WS, text.lower()):
                if w and SEP not in w:  # mirror word_frequencies
                    counts[w] = counts.get(w, 0) + 1
    return train_merges_py(counts, n_merges)


def encode_stats_from_parquet(
    path: str, merges: list[tuple[str, str, int]]
) -> dict[int, tuple[int, int]]:
    """Sparkless encode twin: doc_id -> (n_words, n_syms) after
    applying ``merges``.  Deliberately uses the SEQUENTIAL
    rank-order application (the fold-path ground truth), NOT the
    rank-dict shortcut the Arrow encoder uses — so an oracle built
    from this cross-checks the equivalence argument in
    _rank_encode_py, not just the plumbing."""
    import re

    import pyarrow.parquet as pq_

    cache: dict[str, int] = {}

    def enc_len(w: str) -> int:
        got = cache.get(w)
        if got is None:
            syms = list(w)
            for p1, p2, _ in merges:
                syms = _merge_word_py(syms, p1, p2)
            got = len(syms)
            cache[w] = got
        return got

    stats: dict[int, tuple[int, int]] = {}
    pf = pq_.ParquetFile(path)
    for batch in pf.iter_batches(columns=["doc_id", "text"]):
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if not text:
                continue
            words = [w for w in re.split(PT.PY_WS, text.lower()) if w]
            if not words:
                continue
            nw, ns = len(words), sum(enc_len(w) for w in words)
            cur = stats.get(doc_id)
            stats[doc_id] = (
                (nw, ns) if cur is None else (cur[0] + nw, cur[1] + ns)
            )
    return stats
