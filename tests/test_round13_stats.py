"""Round-13 stats-family pins: corr matrix, ridge-Cramer, BH-FDR.

Each query is oracle-gated for bit-equality; these tests pin the
SEMANTICS through independent computational paths (DuckDB's built-in
corr(), numpy's linear solver, an erfc-based BH twin) so a formula
typo that happened to be mirrored into the oracle would still fail.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_corr_matrix_matches_duckdb_builtin(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        corr_matrix_lineitem,
    )

    rows = corr_matrix_lineitem(spark, SF).collect()
    assert len(rows) == 6
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        ref = con.execute(
            f"SELECT corr({r.col_a}, {r.col_b}) FROM lineitem"
        ).fetchone()[0]
        # independent float path (Welford-style in DuckDB) vs exact
        # decimal moments: agreement to 1e-6 proves the formula, the
        # snap keeps ours reproducible where the builtin is not
        assert abs(r.corr - ref) < 1e-6, (r.col_a, r.col_b, r.corr, ref)
    con.close()


def test_corr_matrix_one_shuffle_of_moments(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        corr_matrix_lineitem,
    )

    plan = (
        corr_matrix_lineitem(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE scan of the fact table (the stack() unpivot, not a 6-arm
    # union of re-scans) and a partial/final aggregate pair shuffling
    # a single moment row
    assert plan.count("FileScan parquet") == 1, plan
    assert "HashAggregate" in plan
    assert "Generate stack" in plan or "stack" in plan


def test_ridge_matches_numpy_solve(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _RIDGE_LAMBDA,
        ridge_regression_cramer,
    )

    row = ridge_regression_cramer(spark, SF).collect()[0]
    con = duckdb.connect()
    q, d, y = (
        np.array(c, dtype=np.float64)
        for c in zip(
            *con.execute(
                "SELECT l_quantity, l_discount, l_extendedprice FROM "
                f"read_parquet('{SF}/lineitem.parquet')"
            ).fetchall()
        )
    )
    con.close()
    X = np.column_stack([np.ones_like(q), q, d])
    A = X.T @ X + _RIDGE_LAMBDA * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y)
    # independent solver (LAPACK LU vs Cramer determinants): relative
    # agreement to 1e-6 on a well-conditioned 3x3
    for got, want in zip((row.beta0, row.beta1, row.beta2), beta):
        assert abs(got - want) <= 1e-6 * max(1.0, abs(want)), (got, want)
    assert row.n == len(y)


def _bh_twin(z_micros, m, q):
    """Classic BH on erfc-computed p-values — an independent libm path
    from the query's Acklam literal table."""
    ps = sorted(
        (math.erfc(abs(z) / 1e6 / math.sqrt(2.0)), i)
        for i, z in enumerate(z_micros)
    )
    i_max = 0
    for rank, (p, _i) in enumerate(ps, start=1):
        if p <= q * rank / m:
            i_max = rank
    return {i for _, (p, i) in zip(range(i_max), ps)}


def test_bh_fdr_discovery_set_matches_erfc_twin(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _BH_M,
        _BH_Q,
        bh_fdr_price_cells,
    )

    rows = bh_fdr_price_cells(spark, SF).collect()
    assert rows, "no cells at sf0.001?"
    # ranks are 1..n with a total order
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    # discoveries form a prefix of the ranking (BH step-up property)
    flags = [r.discovery for r in rows]
    assert flags == sorted(flags, reverse=True)
    twin = _bh_twin([r.z_micro for r in rows], _BH_M, _BH_Q)
    got = {i for i, r in enumerate(rows) if r.discovery}
    assert got == twin


def test_bh_crit_table_is_monotone_and_sane():
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _BH_CRIT_MICRO,
        _BH_M,
        _inv_norm_cdf,
    )

    assert len(_BH_CRIT_MICRO) == _BH_M
    # step-up thresholds loosen with rank
    assert _BH_CRIT_MICRO == sorted(_BH_CRIT_MICRO, reverse=True)
    # spot-check Acklam against known quantiles
    assert abs(_inv_norm_cdf(0.975) - 1.959964) < 1e-5
    assert abs(_inv_norm_cdf(0.5)) < 1e-9
