"""Deduplication family for large-scale training-data pipelines.

Five strategies, all shuffle-disciplined for 100 TB operation:

- exact: sha256 over canonical content, groupBy hash (one shuffle on
  the hash — uniformly distributed, no skew).
- MinHash + LSH: shingles -> portable polynomial minhash signature ->
  band buckets -> self-join per bucket. The join key is (band, band
  hash) so only candidate pairs materialize — never the n^2 cross.
- SimHash: 30-bit signature; near-dups share bucket prefixes.
- n-gram Jaccard (exact): inverted-index join on shared grams with a
  document-frequency cap to keep hot grams from exploding the join.
- embedding cosine: see operators/ann.py (same pair-generation
  discipline via LSH buckets at scale; exact for oracle-sized data).

Hash arithmetic is the portable polynomial family (functions/portable)
so every strategy is oracle-checkable bit-for-bit in DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT
from ..session import barrier


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per identical content.

    Returns (hash, keep_id, n_dups) — callers join back on keep_id to
    materialize the surviving rows.
    """
    h = F.sha2(F.concat_ws("\x01", *[F.col(c).cast("string") for c in content_cols]), 256)
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def with_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    shingle_words: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """(id, minhash array<bigint>[n_hashes]) per document.

    Two engines producing BIT-IDENTICAL signatures (same polynomial
    arithmetic — tests assert equality, the DuckDB oracle gates both):

    - "arrow": mapInPandas + numpy (default). The char/gram folds and
      the 32 permutation-mins run vectorized per Arrow batch; ~5-10x
      the SQL-expression path, and the per-query codegen cost (the
      32-slot expression tree is expensive to compile) disappears.
    - "sql": pure Catalyst higher-order-function expressions — zero
      Python in the plan; the formulation the oracle SQL mirrors
      1:1. Kept as the reference semantics and for pure-JVM deploys.

    Map-side only either way: no shuffle until the caller's LSH join.
    """
    if engine == "arrow":
        return _minhash_arrow(df, text_col, id_col, n_hashes, shingle_words)
    hashed = barrier(
        barrier(df)  # spread the (often single-file) input across cores
        .withColumn("tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
        .withColumn("tok_hashes", F.expr(PT.hash_array("tokens", PT.SPARK)))
        .withColumn(
            "gram_hashes",
            F.expr(PT.word_ngram_hashes("tok_hashes", shingle_words, PT.SPARK)),
        )
        .filter(F.size("gram_hashes") > 0)
        .select(id_col, "gram_hashes")
    )
    out = hashed.withColumn(
        "minhash",
        F.expr(PT.minhash_from_hashes("gram_hashes", n_hashes, PT.SPARK)),
    )
    return out.select(id_col, "minhash")


def _minhash_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    shingle_words: int,
) -> DataFrame:
    """Arrow-batched MinHash replicating functions/portable arithmetic
    exactly: tok_hash = fold(codepoints, 7, acc*31+cp mod P);
    gram_hash = fold(n tok_hashes, 7, acc*31+h mod P);
    slot_k = min((a_k*g + b_k) mod P). All int64; a*g < P^2 ~ 1e18.
    Docs with fewer than `shingle_words` tokens are dropped (same as
    the SQL path's size(gram_hashes) > 0 filter)."""
    import pyspark.sql.types as T

    P = PT.P
    consts = PT._perm_constants(n_hashes)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("minhash", T.ArrayType(T.LongType()), True),
        ]
    )

    def _batches(it):
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+")
        A = np.array([c[0] for c in consts], dtype=np.int64)[:, None]
        B = np.array([c[1] for c in consts], dtype=np.int64)[:, None]
        k = shingle_words
        for pdf in it:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                if len(toks) < k:
                    continue
                th = []
                for t in toks:
                    acc = 7
                    for c in t:
                        acc = (acc * 31 + ord(c)) % P
                    th.append(acc)
                h = np.asarray(th, dtype=np.int64)
                m = len(h) - k + 1
                g = np.full(m, 7, dtype=np.int64)
                for j in range(k):
                    g = (g * 31 + h[j : j + m]) % P
                sig = ((A * g[None, :] + B) % P).min(axis=1)
                ids.append(doc_id)
                sigs.append(sig.tolist())
            yield pd.DataFrame({id_col: ids, "minhash": sigs})

    # spread the (often single-file) input before the Python stage so
    # every core gets an Arrow batch
    return barrier(df.select(id_col, text_col)).mapInPandas(_batches, out_schema)


#: Default hot-bucket cap for :func:`lsh_candidate_pairs`.  Round-9
#: change (verdict r8 ask #8): the cap is now ON by default — at
#: 100 TB a forgotten cap is a job-killer (one boilerplate bucket of B
#: docs emits B^2/2 pairs in a single task).  Pass
#: ``max_bucket_size=None`` to explicitly opt out (full recall).
DEFAULT_LSH_BUCKET_CAP = 1000


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
    materialize_input: bool = True,
    max_bucket_size: int | None = DEFAULT_LSH_BUCKET_CAP,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair; estimated Jaccard = matching-slot fraction.

    Scale: the self-join is keyed on (band_idx, band signature) — the
    shuffle moves each doc `bands` times, and only same-bucket pairs
    are generated.  A bucket of B docs still produces B^2/2 pairs in
    ONE task, so the hot-bucket guard `max_bucket_size` defaults ON
    (``DEFAULT_LSH_BUCKET_CAP``): any bucket larger than the cap
    (boilerplate/viral content) is dropped
    from pair generation before the self-join — the same discipline as
    ``ngram_jaccard_pairs``' `max_doc_freq`.  Docs in a dropped bucket
    still pair through their other `bands - 1` bands, and truly
    identical docs belong in the exact-dedup pass anyway.  Use
    :func:`lsh_oversized_buckets` to audit what was dropped.  Passing
    ``max_bucket_size=None`` is the explicit full-recall opt-out and
    warns.  The count
    window partitions by the same key the join shuffles on, so the cap
    adds no extra shuffle of the signatures.

    The signature input feeds BOTH sides of the self-join; without a
    materialization barrier Spark recomputes the whole signature
    lineage twice. In a deployment signatures are a written table;
    here localCheckpoint plays that role (signatures are ids + 32
    int64s — tiny next to the text they summarize).
    """
    if max_bucket_size is None:
        import warnings

        # explicit full-recall opt-out — allowed, but never SILENT:
        # one boilerplate bucket of B docs produces B^2/2 pairs in a
        # single task.
        warnings.warn(
            "lsh_candidate_pairs called with max_bucket_size=None: a single "
            "hot bucket of B docs generates B^2/2 candidate pairs in one "
            "task. At scale keep the default cap and audit "
            "dropped buckets with lsh_oversized_buckets.",
            stacklevel=2,
        )
    if materialize_input:
        sig_df = sig_df.localCheckpoint(eager=True)
    rows_per_band = n_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.col("minhash"),
        F.posexplode(
            F.array(
                *[
                    F.slice("minhash", b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_sig"),
    )
    if max_bucket_size is not None:
        bucket_w = Window.partitionBy("band_idx", "band_sig")
        banded = (
            banded.withColumn("_bucket_n", F.count("*").over(bucket_w))
            .filter(F.col("_bucket_n") <= max_bucket_size)
            .drop("_bucket_n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band_idx") == F.col(f"b.band_idx"))
            & (F.col(f"a.band_sig") == F.col(f"b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.minhash").alias("mh_a"),
            F.col("b.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(n_hashes))
    return pairs.withColumn("est_jaccard", est).drop("mh_a", "mh_b")


def lsh_oversized_buckets(
    sig_df: DataFrame,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Accounting twin of the `max_bucket_size` guard: the buckets that
    :func:`lsh_candidate_pairs` drops, with their sizes — callers log
    or persist this next to the dedup output so coverage loss from hot
    buckets is visible, never silent.
    """
    rows_per_band = n_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.slice("minhash", b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_sig"),
    )
    return (
        banded.groupBy("band_idx", "band_sig")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
        .orderBy(F.desc("bucket_n"), "band_idx")
    )


def lsh_band_index(
    sig_df: DataFrame,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """The STANDING near-dup index a production deployment
    materializes: (band_idx, band_sig, id, minhash), one row per
    (doc, band).  At 100 TB this is a bucketed table keyed on
    (band_idx, band_sig) so incremental probes join shuffle-free on
    the index side; the full signature rides along for the verify
    step (32 int64s — tiny next to the text it summarizes)."""
    if n_hashes % bands != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop trailing signature values "
            "from the index while lsh_probe_index still estimates Jaccard "
            "over the full signature"
        )
    rows_per_band = n_hashes // bands
    return sig_df.select(
        F.col(id_col),
        F.col("minhash"),
        F.posexplode(
            F.array(
                *[
                    F.slice("minhash", b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_sig"),
    )


def lsh_probe_index(
    batch_sigs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental NEAR-dup: match a new batch against the standing
    band index without re-deduping the world (the minhash complement
    of the exact-dedup incremental flow).

    The batch's bands inner-join the index on (band_idx, band_sig);
    per batch doc the BEST corpus match survives (max estimated
    Jaccard, min match_id tie-break — a groupBy struct-max, no window
    over the candidates).  Only the batch is banded at query time —
    the corpus side is the pre-materialized index.  Returns
    (id_col, match_id, est_jaccard) for batch docs whose best match
    reaches ``threshold``."""
    banded = lsh_band_index(batch_sigs, id_col, n_hashes, bands)
    ix = index.select(
        "band_idx",
        "band_sig",
        F.col(id_col).alias("match_id"),
        F.col("minhash").alias("_mh_ix"),
    )
    cand = banded.join(ix, ["band_idx", "band_sig"]).dropDuplicates(
        [id_col, "match_id"]
    )
    est = F.size(
        F.filter(
            F.zip_with("minhash", "_mh_ix", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(n_hashes))
    scored = cand.withColumn("est_jaccard", est).filter(
        F.col("est_jaccard") >= threshold
    )
    best = F.max(
        F.struct(F.col("est_jaccard"), (-F.col("match_id")).alias("_neg"))
    ).alias("_best")
    return (
        scored.groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            (-F.col("_best._neg")).alias("match_id"),
            F.col("_best.est_jaccard").alias("est_jaccard"),
        )
    )


def semdedup_flags(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup bounded by k-means
    clusters.  Within each cluster, a point whose cosine to ANY
    lower-id clustermate reaches ``threshold`` is a semantic
    duplicate; the lowest id per near-identical group survives.

    ``assigned`` is (id, vec, cluster) — the output of
    ``ann.ivf_assign`` over trained centroids, so assignment is the
    same shuffle-free broadcast argmax the IVF family gates.  The
    pairwise stage self-joins ONLY within a cluster: cost is
    sum(c_i^2), and the SemDeDup contract is that k grows with the
    corpus so E[c] = n/k stays bounded (the paper runs k=50k on
    LAION) — never all-pairs on the corpus.  max() over the pair
    cosines is exactly order-independent, so the output is
    hash-stable.  Returns every input point:
    (id, cluster, max_prior_cos, is_dup) — scoring never drops rows.
    """
    from .ann import _dot

    a = assigned.select(
        cluster_col,
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
    )
    b = assigned.select(
        cluster_col,
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = a.join(b, cluster_col).filter(F.col("_idb") < F.col("_ida"))
    per = (
        pairs.select(
            cluster_col,
            F.col("_ida").alias(id_col),
            _dot("_va", "_vb").alias("_cos"),
        )
        .groupBy(cluster_col, id_col)
        .agg(F.max("_cos").alias("max_prior_cos"))
    )
    return (
        assigned.select(id_col, cluster_col)
        .join(per, [cluster_col, id_col], "left")
        .select(
            id_col,
            cluster_col,
            "max_prior_cos",
            F.coalesce(
                F.col("max_prior_cos") >= threshold, F.lit(False)
            ).alias("is_dup"),
        )
    )


def simhash_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 30,
    engine: str = "arrow",
) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (portable arithmetic).

    engine="arrow" (default) computes the identical bit votes in a
    numpy mapInPandas batch; engine="sql" is the pure-expression spec
    the oracle mirrors (30 fold-votes — costly to interpret/compile)."""
    if engine == "arrow":
        return _simhash_arrow(df, text_col, id_col, bits)
    hashed = barrier(
        barrier(df)
        .withColumn("tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
        .filter(F.size("tokens") > 0)
        .withColumn("tok_hashes", F.expr(PT.hash_array("tokens", PT.SPARK)))
        .select(id_col, "tok_hashes")
    )
    return (
        hashed.withColumn(
            "simhash", F.expr(PT.simhash_from_hashes("tok_hashes", bits, PT.SPARK))
        )
        .select(id_col, "simhash")
    )


def _simhash_arrow(
    df: DataFrame, text_col: str, id_col: str, bits: int
) -> DataFrame:
    """Arrow SimHash, bit-identical to portable.simhash_from_hashes:
    bit j set iff sum over token hashes of (2*((h>>j)&1) - 1) > 0."""
    import pyspark.sql.types as T

    P = PT.P

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )

    def _batches(it):
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+")
        shifts = np.arange(bits, dtype=np.int64)
        for pdf in it:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                if not toks:
                    continue
                th = []
                for t in toks:
                    acc = 7
                    for c in t:
                        acc = (acc * 31 + ord(c)) % P
                    th.append(acc)
                h = np.asarray(th, dtype=np.int64)[:, None]
                votes = (2 * ((h >> shifts) & 1) - 1).sum(axis=0)
                sig = int(((votes > 0).astype(np.int64) << shifts).sum())
                ids.append(doc_id)
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, "simhash": sigs})

    return barrier(df.select(id_col, text_col)).mapInPandas(_batches, out_schema)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_jaccard: float = 0.1,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact word-n-gram Jaccard via an inverted-index join.

    distinct grams per doc -> explode -> (df-capped) join on gram ->
    per-pair intersection counts -> |A∩B| / (|A|+|B|-|A∩B|).

    max_doc_freq drops grams appearing in more than that many docs —
    they contribute little discrimination but quadratic join fan-out
    (the classic hot-key guard; at 100 TB this cap is what keeps the
    shuffle bounded).
    """
    grams = (
        barrier(df)
        .withColumn("tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
        .withColumn("grams", F.expr(PT.word_ngrams("tokens", n, PT.SPARK)))
        .select(F.col(id_col).alias("doc"), F.explode_outer("grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    sizes = grams.groupBy("doc").agg(F.count("*").alias("n_grams"))
    df_counts = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    filtered = grams.join(
        F.broadcast(df_counts.filter(F.col("gram_df") > max_doc_freq)),
        "gram",
        "left_anti",
    )
    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_grams").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_grams").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def contamination_overlap(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    probe_id: str = "bench_id",
    n: int = 3,
    min_common: int = 2,
    exclude_self_ids: bool = False,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= min_common
    word-n-grams with any eval-set item.

    The scan every serious training pipeline runs before release:
    probe items (eval benchmarks — SMALL, thousands of rows) are
    broadcast as distinct grams; the corpus grams stream map-side into
    the broadcast-hash join, so the 100 TB side is never shuffled for
    the match itself — only the surviving (corpus_doc, bench_item)
    hits aggregate. No doc-frequency cap is applied on the PROBE side
    (dropping a common gram could hide real contamination); fan-out is
    bounded by the probe set's size instead.

    Output: (bench_id, doc_id, n_common, frac) with
    frac = n_common / probe_n_grams (containment of the probe in the
    corpus doc's gram set).

    ``exclude_self_ids`` drops hits where ``doc_id == bench_id``. It
    is ONLY meaningful when probes are sampled from the corpus itself
    (same id namespace) — corpus ids and benchmark ids are normally
    unrelated namespaces, and an equality there is coincidence, not
    identity, so the default keeps every hit.
    """
    def grams_of(df: DataFrame, id_col: str, out_id: str, dedup_grams: bool) -> DataFrame:
        g = (
            df.withColumn("tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
            .withColumn("grams", F.expr(PT.word_ngrams("tokens", n, PT.SPARK)))
            .select(F.col(id_col).alias(out_id), F.explode_outer("grams").alias("gram"))
            .filter(F.col("gram").isNotNull())
        )
        # distinct() is a shuffle — afford it only on the SMALL probe
        # side; the corpus side stays raw and dedups inside the final
        # aggregate (count(DISTINCT gram)), so the corpus is never
        # shuffled before the broadcast match.
        return g.distinct() if dedup_grams else g

    pg = grams_of(probes, probe_id, probe_id, dedup_grams=True)
    cg = grams_of(corpus, corpus_id, "doc_id", dedup_grams=False)
    probe_sizes = pg.groupBy(probe_id).agg(F.count("*").alias("probe_n_grams"))
    matched = cg.join(F.broadcast(pg), "gram")
    if exclude_self_ids:
        matched = matched.filter(F.col("doc_id") != F.col(probe_id))
    hits = (
        matched.groupBy(probe_id, "doc_id")
        .agg(F.countDistinct("gram").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return hits.join(F.broadcast(probe_sizes), probe_id).withColumn(
        "frac",
        F.expr(PT.round6("n_common / CAST(probe_n_grams AS DOUBLE)", PT.SPARK)),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-document duplicated-span accounting — the Spark-first form
    of exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): every k-token window that
    occurs ``min_occurrences``+ times anywhere in the corpus
    (including twice in the SAME document) marks its [pos, pos+k)
    token span as duplicated; overlapping spans are merged and each
    document reports its covered-token count and fraction — the
    signal the ExactSubstr pipeline thresholds on.

    The suffix-array construction of the paper is replaced by rolling
    window hashes, which distribute: gram hashing is map-side
    (functions/portable.word_ngram_hashes — position-indexed), the
    occurrence count is ONE shuffle on the uniform 8-byte gram key,
    the mark-back join reuses that same key, and the interval merge is
    a per-document window (bounded by document length) using the
    prev-max-end gaps-and-islands increment — so only (id, pos, hash)
    rows ever shuffle, never text. Every document survives to the
    output (NULL/short texts report 0 coverage); fraction rounds to
    micro-units for cross-engine hashing.

    The gram table feeds THREE consumers (occurrence count, mark-back
    join, final per-doc n_tokens), so it localCheckpoints — the
    lsh_candidate_pairs convention: in production the (id, n_tokens,
    grams) table is a written artifact; recomputing the text scan +
    hash folds once per consumer would triple the dominant cost.
    """
    toks = PT.tokens(f"coalesce({text_col}, '')", PT.SPARK)
    th = PT.hash_array("_toks", PT.SPARK)
    grams_expr = PT.word_ngram_hashes("_th", k, PT.SPARK)
    base = (
        barrier(df.select(F.col(id_col), F.expr(toks).alias("_toks")))
        .select(
            id_col,
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.expr(th).alias("_th"),
        )
        .select(id_col, "n_tokens", F.expr(grams_expr).alias("_grams"))
        .localCheckpoint(eager=True)
    )
    g = base.select(
        id_col, F.posexplode("_grams").alias("pos", "gram_hash")
    )
    dup = (
        g.groupBy("gram_hash")
        .count()
        .filter(F.col("count") >= min_occurrences)
        .select("gram_hash")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = (
        g.join(dup, "gram_hash")
        .withColumn("_prev_end", F.max(F.col("pos") + F.lit(k)).over(w))
        .withColumn(
            "_inc",
            F.greatest(
                F.lit(0),
                F.col("pos")
                + F.lit(k)
                - F.greatest(F.coalesce("_prev_end", "pos"), F.col("pos")),
            ).cast("bigint"),
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.count("*").alias("_n_dup"),
        F.sum("_inc").alias("_covered"),
    )
    frac = PT.round6(
        "CAST(covered_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)", PT.SPARK
    )
    return (
        base.select(id_col, "n_tokens")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("_n_dup", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce("_covered", F.lit(0)).cast("bigint").alias("covered_tokens"),
        )
        .withColumn(
            "dup_fraction",
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(F.expr(frac)),
        )
    )


def cluster_keep_best(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Keeper-policy selection over near-dup clusters: one survivor
    per cluster, the HIGHEST-scoring member (ties -> min id) — real
    curation keeps the most complete/highest-quality duplicate, not
    the arbitrarily-first one (min-id keeping discards the better
    copy whenever it arrived later).

    ``labels`` is (vertex, label) from connected_components over the
    candidate pairs; ``docs`` must carry ``score_col``. The argmax is
    a struct-max aggregate (max score, then max(-id) = min id) — one
    shuffle on the cluster label, no window, deterministic under any
    partitioning. Documents outside every cluster are implicitly kept
    (they are their own best version); the output lists only
    clustered docs with keep/drop resolved.
    """
    joined = labels.join(
        docs.select(F.col(id_col).alias("vertex"), F.col(score_col)),
        "vertex",
    )
    best = joined.groupBy("label").agg(
        F.max(
            F.struct(
                F.col(score_col).alias("s"),
                (-F.col("vertex")).alias("negid"),
            )
        ).alias("_best"),
        F.count("*").alias("n_members"),
    )
    return best.select(
        F.col("label").alias("cluster_id"),
        (-F.col("_best.negid")).cast("long").alias("keep_id"),
        F.col("_best.s").alias("keep_score"),
        "n_members",
    )


# ---------------------------------------------------------------------------
# Standing gram artifact: incremental exact-substring dedup
# ---------------------------------------------------------------------------
#
# duplicate_spans derives its (id, pos, gram_hash) table in-plan; in
# production that table is a WRITTEN artifact (its own docstring's
# claim, now made real): grams are appended batch-by-batch like
# lsh_band_index rows, and the probe reads hashes from parquet —
# the text scan + token-hash folds are never re-paid for standing
# documents.  At 100 TB the artifact is ~8 bytes per token position
# and the probe's occurrence count is a single column-pruned scan of
# gram_hash (sorted within files, so min/max stats support selective
# gram lookups too).


def gram_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(id, n_tokens, pos, gram_hash): the position-indexed rolling
    k-gram table duplicate_spans marks spans from, factored out as the
    writable unit.  Zero-gram documents (short/NULL text) contribute
    no rows — pair with doc_lengths for the every-doc-survives
    contract."""
    toks = PT.tokens(f"coalesce({text_col}, '')", PT.SPARK)
    th = PT.hash_array("_toks", PT.SPARK)
    grams_expr = PT.word_ngram_hashes("_th", k, PT.SPARK)
    base = (
        barrier(df.select(F.col(id_col), F.expr(toks).alias("_toks")))
        .select(
            id_col,
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.expr(th).alias("_th"),
        )
        .select(id_col, "n_tokens", F.expr(grams_expr).alias("_grams"))
    )
    return base.select(
        id_col, "n_tokens", F.posexplode("_grams").alias("pos", "gram_hash")
    )


def doc_lengths(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens) for every document, including zero-token ones."""
    toks = PT.tokens(f"coalesce({text_col}, '')", PT.SPARK)
    return df.select(
        F.col(id_col), F.size(F.expr(toks)).cast("bigint").alias("n_tokens")
    )


def write_gram_artifact(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    mode: str = "append",
) -> None:
    """Append one batch of documents to the standing gram artifact:
    ``path/grams`` gains (id, pos, gram_hash) rows sorted by gram_hash
    within files (min/max footer stats), ``path/doclen`` gains
    (id, n_tokens).  Batch-incremental by construction — appending is
    the whole update, nothing is rewritten (the lsh_band_index
    convention)."""
    gt = gram_table(df, id_col, text_col, k).localCheckpoint(eager=True)
    gt.select(id_col, "pos", "gram_hash").sortWithinPartitions(
        "gram_hash"
    ).write.mode(mode).parquet(f"{path}/grams")
    doc_lengths(df, id_col, text_col).write.mode(mode).parquet(f"{path}/doclen")


def duplicate_spans_from_artifact(
    spark,
    path: str,
    k: int = 8,
    min_occurrences: int = 2,
    probe_ids=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """duplicate_spans' counting + span-marking stages read ENTIRELY
    from the standing artifact — no text is scanned, no gram is
    recomputed.  Occurrence counts cover every document ever appended;
    ``probe_ids`` (an optional Column predicate over ``id_col``)
    restricts which documents REPORT spans (the incremental shape:
    count against everything, account only the new batch).  Output
    schema is identical to duplicate_spans."""
    g = spark.read.parquet(f"{path}/grams")
    dl = spark.read.parquet(f"{path}/doclen")
    out_g = g.filter(probe_ids) if probe_ids is not None else g
    out_dl = dl.filter(probe_ids) if probe_ids is not None else dl
    dup = (
        g.groupBy("gram_hash")
        .count()
        .filter(F.col("count") >= min_occurrences)
        .select("gram_hash")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = (
        out_g.join(dup, "gram_hash")
        .withColumn("_prev_end", F.max(F.col("pos") + F.lit(k)).over(w))
        .withColumn(
            "_inc",
            F.greatest(
                F.lit(0),
                F.col("pos")
                + F.lit(k)
                - F.greatest(F.coalesce("_prev_end", "pos"), F.col("pos")),
            ).cast("bigint"),
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.count("*").alias("_n_dup"),
        F.sum("_inc").alias("_covered"),
    )
    frac = PT.round6(
        "CAST(covered_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)", PT.SPARK
    )
    return (
        out_dl.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("_n_dup", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce("_covered", F.lit(0)).cast("bigint").alias("covered_tokens"),
        )
        .withColumn(
            "dup_fraction",
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(F.expr(frac)),
        )
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_jaccard: float = 0.4,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the PPJoin /
    AllPairs family, Xiao et al. 2008; Bayardo et al. 2007) — the
    third pair-generation discipline beside LSH banding (approximate)
    and the df-capped inverted index (exact but joins EVERY shared
    gram):

    order every document's distinct gram set by GLOBAL rarity
    (df ASC, gram ASC) and keep only the first
    floor((1-t)*|d|) + 1 grams as its prefix — two sets with
    Jaccard >= t MUST share a prefix gram (pigeonhole on the
    (1-t)|d| grams a t-similar set may miss), so joining on prefix
    grams alone generates a complete candidate set while the shuffle
    carries ~(1-t) of the index volume, concentrated on RARE grams
    (low fan-out by construction — rare-first ordering is what makes
    the filter effective, not just correct).  Candidates verify with
    exact array intersection per pair; no df cap needed, no recall
    loss.

    Determinism: per-doc gram order is sort_array over (df, gram)
    structs; jaccard micro-rounds; ties ordered by (id_a, id_b).
    """
    t = float(min_jaccard)
    grams = (
        barrier(df)
        .withColumn("tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
        .withColumn("grams", F.expr(PT.word_ngrams("tokens", n, PT.SPARK)))
        .select(F.col(id_col).alias("doc"), F.explode_outer("grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    dfc = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    per_doc = (
        grams.join(dfc, "gram")
        .groupBy("doc")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("gram_df", "gram"))
            ).alias("_sorted"),
        )
        .select(
            "doc",
            F.expr("transform(_sorted, s -> s.gram)").alias("glist"),
            F.size("_sorted").cast("bigint").alias("n_grams"),
        )
        .localCheckpoint(eager=True)  # feeds prefix explode AND both verify legs
    )
    # n_grams rides along on every prefix row (one extra BIGINT per
    # row) so the candidate aggregation below yields the sizes
    # directly — the two post-groupBy size joins (sza/szb) this
    # operator used to run are gone, two stages shorter on the
    # sequential cascade (r14; guide §2.4 — the sizes are functionally
    # dependent on the group key, so min() recovers them exactly)
    prefix = per_doc.select(
        "doc",
        "n_grams",
        F.posexplode(
            F.expr(
                f"slice(glist, 1, CAST(floor((1.0 - {t}) * n_grams) + 1 AS INT))"
            )
        ).alias("pos", "gram"),
    )
    # Candidate pairs keep the MINIMUM matched prefix position on each
    # side (groupBy replaces the old distinct — same shuffle key,
    # two extra min partials): PPJoin's POSITIONAL filter bounds the
    # overlap by ubound = min(na - i0, nb - j0) (everything from the
    # first shared prefix gram onward, under the shared global gram
    # order), and Jaccard >= t needs overlap >= t*(na+nb)/(1+t).
    # Taking min positions across different shared grams can only
    # OVERestimate ubound (each side's true position is >= its min),
    # so the prune is conservative — zero recall loss.  Both filters
    # run on the SIZE-ONLY pair table before the gram arrays join, so
    # pruned pairs never shuffle their arrays at all (measured at
    # sf0.1: 4.7 s -> 3.2 s warm for the full operator, hash-equal;
    # PERFORMANCE.md round 8).
    pairs = (
        prefix.alias("a")
        .join(prefix.alias("b"), "gram")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.pos").alias("_pa"),
            F.col("b.pos").alias("_pb"),
            F.col("a.n_grams").alias("_na"),
            F.col("b.n_grams").alias("_nb"),
        )
    )
    cands = pairs.groupBy("id_a", "id_b").agg(
        F.min("_pa").alias("_i0"),
        F.min("_pb").alias("_j0"),
        # constant within the group (size is a function of the doc id)
        F.min("_na").alias("na"),
        F.min("_nb").alias("nb"),
    )
    # PPJoin length filter: J(a,b) >= t forces t*|a| <= |b| <= |a|/t,
    # then the positional bound above.  Exact integer micro-units
    # with one micro of slack on the required side (t_micro - 1) and
    # a full micro of headroom on the have side, so the float t can
    # never exclude a pair the micro-rounded verify would accept —
    # pure candidate reduction, zero recall loss.
    t_micro = int(math.floor(t * 1_000_000 + 0.5))
    kept = (
        cands
        .filter(
            (F.col("nb") * 1_000_000 >= F.col("na") * (t_micro - 1))
            & (F.col("na") * 1_000_000 >= F.col("nb") * (t_micro - 1))
        )
        .filter(
            F.expr(
                f"least(na - _i0, nb - _j0) * (1000000 + {t_micro})"
                f" >= ({t_micro} - 1) * (na + nb)"
            )
        )
        .select("id_a", "id_b", "na", "nb")
    )
    a = per_doc.select(
        F.col("doc").alias("id_a"), F.col("glist").alias("ga")
    )
    b = per_doc.select(
        F.col("doc").alias("id_b"), F.col("glist").alias("gb")
    )
    verified = (
        kept.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("ga", "gb")).cast("bigint")
        )
        .withColumn(
            "jaccard",
            F.expr(
                PT.round6(
                    "CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)",
                    PT.SPARK,
                )
            ),
        )
        .filter(F.col("jaccard") >= t)
    )
    return verified.select("id_a", "id_b", "inter", "jaccard")
