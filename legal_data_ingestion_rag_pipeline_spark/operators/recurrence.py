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
