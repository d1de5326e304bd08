"""Incremental view maintenance (IVM) for join views.

A materialized join view over 100 TB inputs cannot be recomputed per
batch; the algebra of insert-only delta propagation is

    d(A |><| B) = (dA |><| B_old) + (A_old |><| dB) + (dA |><| dB)

so the maintenance cost is O(|delta| x join fan-out), independent of
|A| and |B|.  The three delta legs each join a SMALL delta against
one stored side (broadcast the delta when it fits — the usual case),
and the update is a pure append for insert-only sources; updates and
deletes generalize by carrying +1/-1 multiplicities (not implemented
here — the driver data is insert-shaped, and the CDC diff operator
already supplies the signed deltas a full implementation would
consume).

The complementary aggregate-view maintenance (additive partial-state
merge) is `incremental_rollup_maintenance`; this module covers the
join side of the IVM story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The insert-only delta of the inner-join view A |><| B: exactly
    the new rows the refreshed view gains when ``a_delta`` and
    ``b_delta`` arrive.  Append the result to the stored view to
    refresh it; never touches a_old |><| b_old.

    Correctness identity (what the gate proves):
        (A_old + dA) |><| (B_old + dB)
            == (A_old |><| B_old) + join_view_delta(...)
    with disjoint legs, so the append introduces no duplicates.
    """
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    leg1 = da.join(b_old, on)
    leg2 = a_old.join(db, on)
    leg3 = da.join(db, on)
    cols = leg1.columns
    return (
        leg1.select(cols)
        .unionByName(leg2.select(cols))
        .unionByName(leg3.select(cols))
    )
