"""Record hashing and locality-sensitive signatures as Spark Columns.

- canonical record hash: parity with the reference's ``canonical_json``
  + ``sha256_hex`` (ingest.py:42-49) — JSON with sorted keys, compact
  separators, nulls preserved.
- polynomial hash / MinHash / SimHash: portable arithmetic shared with
  the DuckDB oracle (see functions/portable.py for why).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import portable


def canonical_record_hash(df_or_cols, cols: list[str] | None = None) -> Column:
    """sha256 hex of the canonical JSON of the given columns.

    Key order is sorted to match Python ``json.dumps(sort_keys=True)``;
    ``ignoreNullFields=false`` keeps explicit nulls, matching the
    reference's canonical form for null values.  Spark's to_json uses
    compact separators already.

    ENGINE-LOCAL, by design: the reference hashes only the keys present
    in each raw dict (ingest.py:42-49), so a record *omitting* a key and
    one carrying an explicit null hash differently there.  After
    ``spark.read.json`` those two states are one and the same (missing
    key == null column), so this hash fixes the full column set and
    keeps explicit nulls.  Within this engine the hash is stable and
    collision-behaviour matches the reference for records that carry
    all keys; cross-system hash equality is NOT guaranteed for records
    with omitted keys, and dedup/retry_count semantics here are defined
    over this engine's hash only.
    """
    if cols is None:
        cols = list(df_or_cols.columns) if isinstance(df_or_cols, DataFrame) else list(df_or_cols)
    ordered = sorted(cols)
    payload = F.to_json(
        F.struct(*[F.col(c).alias(c) for c in ordered]),
        {"ignoreNullFields": "false"},
    )
    return F.sha2(payload, 256)


def poly_hash(col: Column | str) -> Column:
    """Portable polynomial string hash -> bigint in [0, 1e9+7)."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("poly_hash needs a column *name* (built via F.expr)")
    return F.expr(portable.poly_hash(name, portable.SPARK))


def tokens_col(col_name: str) -> Column:
    """Lowercased whitespace tokens, empties removed (portable)."""
    return F.expr(portable.tokens(col_name, portable.SPARK))


def word_ngrams_col(tokens_col_name: str, n: int) -> Column:
    return F.expr(portable.word_ngrams(tokens_col_name, n, portable.SPARK))


def char_ngrams_col(col_name: str, n: int) -> Column:
    return F.expr(portable.char_ngrams(col_name, n, portable.SPARK))


def minhash_signature_col(grams_col_name: str, n_hashes: int = 32) -> Column:
    """array<bigint> MinHash signature over a gram-array column."""
    return F.expr(portable.minhash_signature(grams_col_name, n_hashes, portable.SPARK))


def simhash_col(tokens_col_name: str, bits: int = 30) -> Column:
    """SimHash (<=30-bit) over a token-array column."""
    return F.expr(portable.simhash64(tokens_col_name, bits, portable.SPARK))


def hamming_distance(a: Column | str, b: Column | str, bits: int = 30) -> Column:
    """Hamming distance between two simhash ints via popcount of XOR."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    x = ca.bitwiseXOR(cb)
    return F.bit_count(x) if hasattr(F, "bit_count") else sum(
        (F.shiftright(x, j).bitwiseAND(F.lit(1))) for j in range(bits)
    )
