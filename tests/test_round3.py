"""Round-3 regression tests (r2 VERDICT next-round items + ADVICE).

Covers: scale-safe IVF cell assignment (broadcast data, not plan
literals), expr/pandas assignment parity, deterministic IVF init under
shuffled partitioning, sparse_dot in-row hash-collision hardening,
production xxhash64 LSH candidate quality, Iceberg opt-in catalog
backend recording, gazetteer index input fingerprinting, HAC tie-order
pinning.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# IVF: scale-safe assignment (r2 VERDICT #1)
# ---------------------------------------------------------------------------


def _rand_emb(spark, n, dim, seed, parts=1):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts) if parts > 1 else df


def test_assign_cells_expr_pandas_parity(spark):
    from sparklink.ann import assign_cells, rank_cells, with_unit_vectors

    emb = _rand_emb(spark, 200, 32, seed=7)
    rng = np.random.default_rng(9)
    cents = rng.standard_normal((8, 32))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    u = with_unit_vectors(emb).select("vec_id", "unit")

    a_expr = assign_cells(u, cents, method="expr").select("vec_id", "cell").toPandas().sort_values("vec_id")
    a_pd = assign_cells(u, cents, method="pandas").select("vec_id", "cell").toPandas().sort_values("vec_id")
    assert (a_expr["cell"].to_numpy() == a_pd["cell"].to_numpy()).all()

    r_expr = rank_cells(u, cents, n_probe=3, method="expr").select("vec_id", "cells").toPandas()
    r_pd = rank_cells(u, cents, n_probe=3, method="pandas").select("vec_id", "cells").toPandas()
    m_expr = {r.vec_id: list(r.cells) for r in r_expr.itertuples()}
    m_pd = {r.vec_id: list(r.cells) for r in r_pd.itertuples()}
    assert m_expr == m_pd

    # numpy reference: round-6 argmax, first index on ties
    U = np.stack(
        with_unit_vectors(emb).select("vec_id", "unit").toPandas().sort_values("vec_id")["unit"].map(np.asarray)
    )
    want = np.round(U @ cents.T, 6).argmax(axis=1)
    assert (a_expr["cell"].to_numpy() == want).all()


def test_ivf_production_codebook_plan_size(spark):
    """n_cells=256 x dim=256 (a production-shaped codebook): assignment
    must build a constant-size plan (centroids as broadcast DATA) and
    complete quickly — the r2 literal-CASE plan was O(n_cells*dim)
    literals and died long before this scale."""
    from sparklink.ann import assign_cells, with_unit_vectors

    emb = _rand_emb(spark, 400, 256, seed=3)
    rng = np.random.default_rng(4)
    cents = rng.standard_normal((256, 256))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    u = with_unit_vectors(emb).select("vec_id", "unit")

    t0 = time.time()
    assigned = assign_cells(u, cents, method="pandas")
    plan = assigned._jdf.queryExecution().toString()
    n = assigned.count()
    dt = time.time() - t0
    assert n == 400
    # the codebook (256*256 floats ~ 1.3 MB as text) must NOT be inlined
    # into the plan string
    assert len(plan) < 200_000, f"plan string {len(plan)} chars — centroids leaked into the plan"
    assert dt < 90, f"production-codebook assignment took {dt:.0f}s"

    # expr method: plan is also constant-size (centroid matrix is a
    # broadcast one-row relation, not literals)
    assigned_e = assign_cells(u, cents, method="expr")
    plan_e = assigned_e._jdf.queryExecution().toString()
    assert len(plan_e) < 200_000, f"expr plan {len(plan_e)} chars — centroids leaked into the plan"


def test_ivf_init_deterministic_under_shuffled_partitioning(spark):
    """r2 VERDICT #7: the init sample must not depend on partition count /
    order — ordered by xxhash64(id, seed) before the limit."""
    from sparklink.ann import train_ivf_centroids

    emb1 = _rand_emb(spark, 150, 16, seed=5, parts=1)
    emb7 = _rand_emb(spark, 150, 16, seed=5, parts=7)
    # the init sample (iters=0) is bit-identical at any partitioning
    np.testing.assert_array_equal(
        train_ivf_centroids(emb1, n_cells=4, iters=0), train_ivf_centroids(emb7, n_cells=4, iters=0)
    )
    # one Lloyd step: identical up to FP partial-sum combine order (the
    # update's F.sum reduces in partition order; assignment is identical)
    c1 = train_ivf_centroids(emb1, n_cells=4, iters=1)
    c7 = train_ivf_centroids(emb7, n_cells=4, iters=1)
    np.testing.assert_allclose(c1, c7, atol=1e-12)

    # pandas-method training agrees with expr-method training
    cp = train_ivf_centroids(emb7, n_cells=4, iters=1, method="pandas")
    np.testing.assert_allclose(c7, cp, atol=1e-9)


def test_ivf_topk_pandas_matches_expr(spark):
    from sparklink.ann import ivf_topk, unit_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    cents = unit_centroids(emb, [1, 20, 40, 60])
    a = ivf_topk(emb, qs, cents, k=5, n_probe=2, method="expr").toPandas()
    b = ivf_topk(emb, qs, cents, k=5, n_probe=2, method="pandas").toPandas()
    key = ["query_id", "vec_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
    )
