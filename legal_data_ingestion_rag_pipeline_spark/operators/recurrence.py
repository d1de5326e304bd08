"""Per-key sequential recurrences — the operator class window
functions genuinely CANNOT express.

A running sum is a linear recurrence, so `SUM() OVER` handles it; a
CLAMPED balance (``bal = max(0, bal + delta)``), an EWMA, or any
state machine whose next state is a non-linear function of the
previous one has no prefix-decomposition, so the only faithful batch
form is a per-key ordered walk.  Spark's shape for that is
applyInPandas: one shuffle on the key, then each key's rows walk
sequentially inside an Arrow batch — state is O(1) per key, keys are
embarrassingly parallel, and nothing ever serializes globally (the
same contract as applyInPandasWithState on the streaming side, batch
edition).

Arithmetic is integer cents so the walk is exact and engine-portable:
the gate oracle replays the identical recurrence with a recursive
CTE — a genuinely independent row-by-row SQL evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: str,
) -> DataFrame:
    """Walk each key's rows in ``order_cols`` order applying
    ``bal = max(0, bal + delta)`` from 0, counting clamp events
    (steps where the unclamped balance would have gone negative).
    Returns (key, final_balance, n_clamps, n_steps) — BIGINT cents.

    ``order_cols`` must be a total order per key (the l_linenumber
    lesson); ties would make the walk nondeterministic.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField("final_balance", T.LongType(), True),
            T.StructField("n_clamps", T.LongType(), True),
            T.StructField("n_steps", T.LongType(), True),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        bal = 0
        clamps = 0
        for d in pdf[delta_col]:
            nxt = bal + int(d)
            if nxt < 0:
                clamps += 1
                bal = 0
            else:
                bal = nxt
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "final_balance": [bal],
                "n_clamps": [clamps],
                "n_steps": [len(pdf)],
            }
        )

    return (
        df.select(key_col, *order_cols, delta_col)
        .groupBy(key_col)
        .applyInPandas(walk, out_schema)
    )


def halving_ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
) -> DataFrame:
    """Integer EWMA with alpha = 1/2 over each key's ordered series:
    ``y_1 = x_1``, ``y_t = (y_{t-1} + x_t) DIV 2`` (floor division, so
    the walk is exact BIGINT and engine-portable — the clamped-balance
    contract).  Returns every step: (key, order, x, ewma).

    alpha = 1/2 is the one EWMA whose integer form needs no scaling:
    each step is one add and one shift, the state is a single BIGINT,
    and the floor bias is bounded by 1 per step.  ``order_col`` must
    be a total order per key (dense day indexes from a calendar
    spine, never raw timestamps with possible ties).
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField(order_col, T.LongType(), True),
            T.StructField(x_col, T.LongType(), True),
            T.StructField("ewma", T.LongType(), True),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        ys: list[int] = []
        y: int | None = None
        for x in pdf[x_col]:
            xi = int(x)
            y = xi if y is None else (y + xi) // 2
            ys.append(y)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                order_col: pdf[order_col].astype("int64").to_numpy(),
                x_col: pdf[x_col].astype("int64").to_numpy(),
                "ewma": pd.Series(ys, dtype="int64").to_numpy(),
            }
        )

    return (
        df.select(key_col, order_col, x_col)
        .groupBy(key_col)
        .applyInPandas(walk, out_schema)
    )


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) with
    alpha = beta = 1/2 in exact integer arithmetic, per key:

        l_1 = x_1,  b_1 = 0
        l_t = trunc((x_t + l_{t-1} + b_{t-1}) / 2)
        b_t = trunc((b_{t-1} + (l_t - l_{t-1})) / 2)

    Halving TRUNCATES TOWARD ZERO — the semantics of SQL integer
    division in BOTH gate engines (Spark ``DIV`` and DuckDB ``//``
    truncate; Python ``//`` floors, so the walk must not use it on
    the possibly-negative trend).  Returns every step:
    (key, order, x, level, trend); the one-step-ahead forecast is
    ``level + trend`` by the reader.

    Two coupled states is exactly what makes this a recurrence and
    not a window: the trend feeds back into the next level, so no
    prefix decomposition exists (the clamped-balance argument, now
    with a 2-dimensional state vector).
    """
    import pandas as pd

    def _trunc_half(a: int) -> int:
        q = abs(a) // 2
        return q if a >= 0 else -q

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField(order_col, T.LongType(), True),
            T.StructField(x_col, T.LongType(), True),
            T.StructField("level", T.LongType(), True),
            T.StructField("trend", T.LongType(), True),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        levels: list[int] = []
        trends: list[int] = []
        lv: int | None = None
        tr = 0
        for x in pdf[x_col]:
            xi = int(x)
            if lv is None:
                lv, tr = xi, 0
            else:
                nl = _trunc_half(xi + lv + tr)
                tr = _trunc_half(tr + (nl - lv))
                lv = nl
            levels.append(lv)
            trends.append(tr)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                order_col: pdf[order_col].astype("int64").to_numpy(),
                x_col: pdf[x_col].astype("int64").to_numpy(),
                "level": pd.Series(levels, dtype="int64").to_numpy(),
                "trend": pd.Series(trends, dtype="int64").to_numpy(),
            }
        )

    return (
        df.select(key_col, order_col, x_col)
        .groupBy(key_col)
        .applyInPandas(walk, out_schema)
    )
