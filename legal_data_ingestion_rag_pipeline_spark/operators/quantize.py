"""Embedding quantization for 100 TB vector storage.

Per-vector affine int8 quantization (the faiss SQ8 / IVF_SQ8 scheme):
store (vmin, vmax, bytes) instead of float32/64 — a 4-8x footprint
cut on the largest column a training-data lake carries, at a bounded
reconstruction error of (vmax - vmin) / 510 per element. ANN recall
on SQ8-reconstructed vectors is within noise for IVF-style search,
which is why it is the default storage tier in production vector
systems.

Pure element-wise expressions (transform/floor/least/greatest), so
quantization runs map-side inside whole-stage codegen on both engines
and the gate query is oracle-checkable bit-for-bit: every step is
IEEE double arithmetic with floor-based rounding (round6 discipline —
no engine-dependent HALF_UP/half-even divergence).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..functions import portable as PT


def _array_max(arr: str, dialect: str) -> str:
    fn = "array_max" if dialect == PT.SPARK else "list_max"
    return f"{fn}({arr})"


def quantize_int8_sql(vec: str, dialect: str) -> dict[str, str]:
    """SQL fragments {vmin, vmax, q} for affine int8 quantization.

    q[i] = clamp(floor((x[i] - vmin) / scale + 0.5), 0, 255) with
    scale = (vmax - vmin) / 255; a constant vector (scale 0) maps to
    all-zeros. Returned ``q`` is an int array expression — serialize
    with array_join for gate-facing output.
    """
    doubles = PT.transform(vec, "x -> CAST(x AS DOUBLE)", dialect)
    vmin = PT.array_min(doubles, dialect)
    vmax = _array_max(doubles, dialect)
    scale = f"(({vmax}) - ({vmin})) / 255.0"
    q = PT.transform(
        doubles,
        f"x -> CAST(least(255.0, greatest(0.0, "
        f"floor(CASE WHEN {scale} = 0.0 THEN 0.0 "
        f"ELSE (x - ({vmin})) / ({scale}) END + 0.5))) AS BIGINT)",
        dialect,
    )
    return {"vmin": vmin, "vmax": vmax, "q": q}


def dequantize_max_err_sql(vec: str, dialect: str) -> str:
    """Max |x - dequant(quant(x))| over the vector, round6-stabilized.

    dequant(b) = vmin + b * scale. The bound is scale/2; this measures
    the realized error so a pipeline can gate on it.
    """
    parts = quantize_int8_sql(vec, dialect)
    vmin, vmax, q = parts["vmin"], parts["vmax"], parts["q"]
    scale = f"(({vmax}) - ({vmin})) / 255.0"
    deq = PT.transform(q, f"b -> ({vmin}) + CAST(b AS DOUBLE) * ({scale})", dialect)
    doubles = PT.transform(vec, "x -> CAST(x AS DOUBLE)", dialect)
    if dialect == PT.SPARK:
        errs = f"zip_with({doubles}, {deq}, (x, y) -> abs(x - y))"
    else:
        errs = PT.transform(
            f"list_zip({doubles}, {deq})",
            "p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))",
            dialect,
        )
    return PT.round6(_array_max(errs, dialect), dialect)


def quantize_int8(vec_col: str) -> dict[str, Column]:
    """Spark Columns {vmin, vmax, q_csv, max_err} for a vector column."""
    parts = quantize_int8_sql(vec_col, PT.SPARK)
    return {
        "vmin": F.expr(PT.round6(parts["vmin"], PT.SPARK)),
        "vmax": F.expr(PT.round6(parts["vmax"], PT.SPARK)),
        "q_csv": F.expr(PT.array_join(parts["q"], ",", PT.SPARK)),
        "max_err": F.expr(dequantize_max_err_sql(vec_col, PT.SPARK)),
    }
