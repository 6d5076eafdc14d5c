"""Similarity search over embedding columns (array<float>).

  brute_force_topk — exact cosine top-k: broadcast the (small) query set,
                     JVM-side dot product via zip_with/aggregate, window
                     rank. The baseline every ANN variant is measured
                     against.
  lsh_topk         — random-hyperplane LSH bucketing: probe only matching
                     buckets, same scoring; the 100 TB path (candidates
                     per query ~ bucket size, not corpus size).
  ivf_topk         — IVF-style coarse quantizer: deterministic centroid
                     seed + Lloyd iterations as DataFrame jobs; probe
                     nearest n_probe cells.

Hyperplanes and centroids both travel as DATA, never plan literals —
broadcast one-row matrix DataFrames (_planes_df/_centroid_matrix_df;
exact fold-arithmetic parity with the SQL oracle) or, for centroid
assignment at production codebooks, an sc.broadcast numpy matrix inside
a vectorized pandas UDF (method='pandas': BLAS matmul). Plan size is
independent of n_planes/n_cells x dim (r2 VERDICT scale-killer:
n_cells=4k x dim=768 as nested-CASE literals was a multi-million-literal
plan that died in codegen).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


# expansion cap: the chain is a dim-deep nested Add tree — fine for
# embedding dims up to ~128, but a 512-term chain overflows the JVM stack
# during Column conversion and bloats the plan string (the constant-plan
# guard of test_lsh_production_planes_plan_size); larger dims keep the
# interpreted fold, whose per-element cost matters less as compute per
# row grows with dim anyway
_EXPAND_DIM_CAP = 128


def _dot_fixed(a, b, dim: int | None):
    """The same left-to-right dot fold as ``_dot``, expanded to ``dim``
    explicit terms when both arrays have exactly ``dim`` elements.

    Bit-identical arithmetic (0.0 + a[0]*b[0] + ... in the fold's IEEE
    order), but the expanded chain runs in whole-stage codegen while the
    higher-order aggregate/zip_with fold is interpreted per element
    (guide §4.1: prefer expressions codegen can compile). The size guard
    keeps exact parity — and ANSI safety — for ragged inputs, which fall
    back to the fold; dim=None (or dim past _EXPAND_DIM_CAP) is the
    plain fold."""
    if not dim or dim > _EXPAND_DIM_CAP:
        return _dot(a, b)
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(_dot(a, b))


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_unit_vectors(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "unit", dim: int | None = None
) -> DataFrame:
    """+ ``out_col`` = L2-normalized copy of ``vec_col`` (doubles).

    With ``dim`` given, the norm is the expanded codegen fold and the
    division runs over a BOUND norm attribute: the lambda form
    ``transform(v, x -> x / n)`` re-evaluates the whole norm fold once per
    element (the documented higher-order-function inlining trap — O(dim^2)
    interpreted work per row); binding the norm as a projected column and
    referencing it ``dim`` times blocks Project collapse (a non-cheap
    producer with many references is not inlined) so it is computed once
    per row. Values are bit-identical to the lambda form — same divisions,
    same fold order."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if not dim or dim > _EXPAND_DIM_CAP:
        n = _norm(v)
        return emb.withColumn(out_col, F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v))
    vv = F.col("__v")
    n = F.col("__n")
    expanded = F.array(*[vv[i] / n for i in range(dim)])
    fallback = F.transform(vv, lambda x: x / n)
    unit = F.when(
        n > 0, F.when(F.size(vv) == dim, expanded).otherwise(fallback)
    ).otherwise(vv)
    return (
        emb.withColumn("__v", v)
        .withColumn("__n", F.sqrt(_dot_fixed(vv, vv, dim)))
        .withColumn(out_col, unit)
        .drop("__v", "__n")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos, rank). queries must be
    small enough to broadcast (it is the probe set, not the corpus)."""
    # peek the dimension from one query row (the small probe side — a
    # trivial job) so normalization and the per-pair dot run as expanded
    # codegen chains instead of interpreted per-element folds; an empty
    # or ragged probe set falls back to the fold path with identical values
    head = queries.select(vec_col).head(1)
    dim = len(head[0][0]) if head and head[0][0] is not None else None
    c = with_unit_vectors(corpus, vec_col, dim=dim).select(F.col(id_col), F.col("unit").alias("cu"))
    q = with_unit_vectors(queries, vec_col, dim=dim).select(F.col(query_id_col), F.col("unit").alias("qu"))
    scored = c.join(F.broadcast(q)).filter(F.col(id_col) != F.col(query_id_col)).select(
        query_id_col, id_col, F.round(_dot_fixed(F.col("cu"), F.col("qu"), dim), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_planes, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def _planes_df(spark, planes, bands: int | None = None) -> DataFrame:
    """Hyperplanes as a ONE-ROW DataFrame (same codebook-as-data pattern
    as _centroid_matrix_df): pmat = array<struct<band, bit, pv>> with the
    band index and in-band bit VALUE precomputed driver-side (PySpark's
    shiftleft wants a literal shift). Broadcast-joined, plan size is O(1)
    in n_planes x dim — production near-dup configs (64+ planes, dim 768)
    never inline the planes as literals."""
    n = len(planes)
    if bands is not None:
        assert n % bands == 0, f"{n} planes do not split into {bands} equal bands"
    r = n if bands is None else n // bands
    # the 62-bit cap applies PER PACKED KEY: the whole signature when
    # unbanded, only the in-band bits when banded (128 planes x 8 bands
    # packs 16 bits per band key and is a legit production config)
    assert r <= 62, f"bit-packed bucket keys support at most 62 planes per band (got {r})"
    data = [
        [(int(i // r), int(1 << (i % r)), [float(x) for x in p]) for i, p in enumerate(planes)]
    ]
    return spark.createDataFrame(
        [(d,) for d in data], "pmat array<struct<band:int,bit:bigint,pv:array<double>>>"
    )


def _with_buckets(df: DataFrame, unit_col: str, planes, bands: int | None = None, out_col: str = "bucket"):
    """+ bucket (bands=None: one packed sign-bit key) or + bk exploded per
    band (bands=k: 'b<band>:<bits>' keys). sign(dot) is invariant to plane
    normalization, so raw data-derived planes work; dot rounded to 6dp
    before the sign test so an oracle engine computing the same double
    arithmetic lands on the same bucket."""
    dim = len(planes[0]) if len(planes) else None
    j = df.join(F.broadcast(_planes_df(df.sparkSession, planes, bands)))
    bits = F.transform(
        F.col("pmat"),
        lambda s: F.struct(
            s["band"].alias("band"),
            F.when(F.round(_dot_fixed(F.col(unit_col), s["pv"], dim), 6) >= 0, s["bit"]).otherwise(F.lit(0).cast("bigint")).alias("v"),
        ),
    )
    if bands is None:
        packed = F.aggregate(bits, F.lit(0).cast("bigint"), lambda a, s: a + s["v"])
        return j.withColumn(out_col, packed).drop("pmat")
    j = j.withColumn("_bits", bits).drop("pmat")
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            F.lit("b"),
            b.cast("string"),
            F.lit(":"),
            F.aggregate(
                F.filter(F.col("_bits"), lambda s: s["band"] == b),
                F.lit(0).cast("bigint"),
                lambda a, s: a + s["v"],
            ).cast("string"),
        ),
    )
    return j.withColumn(out_col, F.explode(keys)).drop("_bits")


def data_planes(corpus: DataFrame, ids: list[int], id_col: str = "vec_id", vec_col: str = "embedding") -> list:
    """Deterministic data-derived hyperplanes: the raw vectors of fixed row
    ids (ordered by id). Engine-portable — a SQL oracle reads the same rows;
    float32 parquet values lift exactly into double literals."""
    rows = corpus.filter(F.col(id_col).isin(ids)).select(id_col, vec_col).collect()
    by_id = {r[0]: list(r[1]) for r in rows}
    return [by_id[i] for i in sorted(by_id)]


def unit_centroids(corpus: DataFrame, ids: list[int], id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Deterministic data-derived centroids: the engine-computed unit
    vectors of fixed row ids. Values come back from the same normalization
    expression the scoring plan uses, so literal round-trip is exact."""
    rows = with_unit_vectors(corpus, vec_col).filter(F.col(id_col).isin(ids)).select(id_col, "unit").collect()
    by_id = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}
    return np.stack([by_id[i] for i in sorted(by_id)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 5,
    planes: list | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: equi-join on bucket id instead of cross join.
    Recall < 1 by construction; measure vs brute_force_topk. ``planes``
    overrides the seeded hyperplanes (e.g. data_planes for oracle parity)."""
    if planes is None:
        planes = _hyperplanes(dim, n_planes, seed)
    pdim = len(planes[0]) if len(planes) else None
    c = with_unit_vectors(corpus, vec_col, dim=pdim).select(F.col(id_col), F.col("unit").alias("cu"))
    c = _with_buckets(c, "cu", planes)
    q = with_unit_vectors(queries, vec_col, dim=pdim).select(F.col(query_id_col), F.col("unit").alias("qu"))
    q = _with_buckets(q, "qu", planes)
    scored = c.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col(query_id_col)).select(
        query_id_col, id_col, F.round(_dot_fixed(F.col("cu"), F.col("qu"), pdim), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def neardup_buckets(
    corpus: DataFrame,
    planes: list,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cu, bk): unit vectors + banded hyperplane bucket keys —
    the stage boundary of ``cosine_neardup_pairs``. Materialize this
    frame once (parquet/checkpoint) and pass it as ``buckets`` when the
    corpus is large; the pair plan reads it three times."""
    c = with_unit_vectors(corpus, vec_col, dim=len(planes[0]) if len(planes) else None).select(
        F.col(id_col), F.col("unit").alias("cu")
    )
    return _with_buckets(c, "cu", planes, bands=bands, out_col="bk").select(id_col, "cu", "bk")


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    planes: list,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1000,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    len(planes)/bands planes per band; records sharing ANY band's sign
    pattern become candidates (P[miss] = (1-p^r)^bands for per-plane
    agreement p = 1 - angle/pi), then exact cosine >= threshold verifies.
    The 100 TB shape: per-band equi-joins on small buckets, never
    all-pairs; oversize buckets dropped like blocking.cap_block_sizes.
    Returns (id_a, id_b, cos).

    Plan contract: the bucketed frame is read THREE times (bucket-size
    aggregate, anti-join probe, both sides of the self-join). At scale,
    stage ``neardup_buckets(...)`` once and pass it as ``buckets``
    (``corpus``/``vec_col`` are then ignored); left None it is computed
    inline and the normalize+bucket scan re-evaluates per read."""
    if buckets is not None:
        bm = buckets
    else:
        # the pair plan reads the bucketed frame three times (size agg,
        # anti-join probe, self-join sides) — materialize the normalize+
        # bucket scan once within this invocation; callers staging
        # neardup_buckets themselves (the 100 TB contract) pass `buckets`
        bm = neardup_buckets(corpus, planes, bands=bands, id_col=id_col, vec_col=vec_col)
        bm = bm.localCheckpoint(eager=True)
    oversized = bm.groupBy("bk").agg(F.count("*").alias("n")).filter(F.col("n") > max_bucket).select("bk")
    bm = bm.join(F.broadcast(oversized), "bk", "left_anti")
    l = bm.select("bk", F.col(id_col).alias("id_a"), F.col("cu").alias("ua"))
    rr = bm.select("bk", F.col(id_col).alias("id_b"), F.col("cu").alias("ub"))
    pairs = (
        l.join(rr, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ua", "ub")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(_dot_fixed(F.col("ua"), F.col("ub"), len(planes[0]) if len(planes) else None), 6)
    return pairs.select("id_a", "id_b", cos.alias("cos")).filter(F.col("cos") >= threshold)


def _centroid_matrix_df(spark, cents: np.ndarray) -> DataFrame:
    """The codebook as a ONE-ROW DataFrame: cmat = array<struct<cell,cv>>.
    Broadcast-joined (nested-loop, 1 row) onto any frame, it adds the
    centroids as a data column — plan size stays O(1) in n_cells x dim,
    unlike literal-embedded centroid expressions (r2 VERDICT #1)."""
    data = [[(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]]
    return spark.createDataFrame([(d,) for d in data], "cmat array<struct<cell:int,cv:array<double>>>")


def _cell_scores(unit_col, cmat_col, dim: int | None = None):
    # array<struct<d,i>>: dot vs every centroid, rounded to 6dp. The dot
    # keeps the fold's arithmetic order (expanded when dim is known), so
    # the rounded value is bit-identical to the SQL oracle's list_sum fold.
    return F.transform(
        cmat_col,
        lambda s: F.struct(F.round(_dot_fixed(unit_col, s["cv"], dim), 6).alias("d"), s["cell"].alias("i")),
    )


_CELL_CMP = lambda a, b: (  # noqa: E731 — probe order: d desc, cell asc
    F.when(a["d"] > b["d"], -1)
    .when(a["d"] < b["d"], 1)
    .otherwise(F.when(a["i"] < b["i"], -1).when(a["i"] > b["i"], 1).otherwise(0))
)


def _np_unit_matrix(u: pd.Series, dim: int) -> np.ndarray:
    if len(u) == 0:
        return np.zeros((0, dim))
    return np.stack([np.asarray(x, dtype=np.float64) for x in u])


# method='auto' switches from the oracle-parity JVM fold to the BLAS
# pandas UDF once the codebook work per row (n_cells * dim interpreted
# HOF steps) crosses this; 256x256 = 65536 lands on the pandas side.
_AUTO_PANDAS_CELLS_X_DIM = 32768


def _resolve_method(method: str, cents: np.ndarray) -> str:
    """'auto' -> 'pandas' for production-size codebooks, 'expr' for small
    ones (exact oracle parity); explicit 'expr'/'pandas' pass through so
    callers that need a specific arithmetic path keep it."""
    if method != "auto":
        return method
    c = np.asarray(cents)
    return "pandas" if c.shape[0] * c.shape[1] >= _AUTO_PANDAS_CELLS_X_DIM else "expr"


def assign_cells(
    df: DataFrame, cents: np.ndarray, unit_col: str = "unit", out_col: str = "cell", method: str = "auto"
) -> DataFrame:
    """+ ``out_col`` = argmax-cosine centroid cell (rounded to 6dp, lowest
    cell index on ties — deterministic, replicable by a SQL oracle's
    row_number ORDER BY d DESC, cell ASC). method='auto' resolves by
    codebook size (_resolve_method).

    method='expr': broadcast one-row centroid-matrix join + JVM fold —
    exact arithmetic parity with the DuckDB oracle; right up to moderate
    codebooks (interpreted HOF, O(n_cells*dim) per row).
    method='pandas': sc.broadcast numpy matrix + Arrow-batched BLAS matmul
    — the production path for n_cells >= 1k (float64 matmul then the same
    6dp round + first-max tiebreak; differs from 'expr' only if a dot sits
    within ~1e-15 of a 0.5e-6 rounding boundary)."""
    method = _resolve_method(method, cents)
    if method == "pandas":
        bc = df.sparkSession.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))

        @pandas_udf("int")
        def _assign(u: pd.Series) -> pd.Series:
            C = bc.value
            U = _np_unit_matrix(u, C.shape[1])
            d = np.round(U @ C.T, 6)
            return pd.Series(d.argmax(axis=1).astype("int32") if len(U) else [], dtype="int32")

        return df.withColumn(out_col, _assign(F.col(unit_col)))
    cm = _centroid_matrix_df(df.sparkSession, cents)
    j = df.join(F.broadcast(cm))
    zero = F.struct(F.lit(float("-inf")).alias("d"), F.lit(-1).alias("i"))
    best = F.aggregate(
        _cell_scores(F.col(unit_col), F.col("cmat"), dim=int(np.asarray(cents).shape[1])),
        zero,
        lambda acc, s: F.when(s["d"] > acc["d"], s).otherwise(acc),
    )
    return j.withColumn(out_col, best["i"]).drop("cmat")


def rank_cells(
    df: DataFrame,
    cents: np.ndarray,
    unit_col: str = "unit",
    out_col: str = "cells",
    n_probe: int = 4,
    method: str = "auto",
) -> DataFrame:
    """+ ``out_col`` = array of the n_probe nearest centroid cells
    (d desc, cell asc). Same methods as assign_cells ('auto' resolves by
    codebook size)."""
    method = _resolve_method(method, cents)
    if method == "pandas":
        bc = df.sparkSession.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))

        @pandas_udf("array<int>")
        def _rank(u: pd.Series) -> pd.Series:
            C = bc.value
            U = _np_unit_matrix(u, C.shape[1])
            if not len(U):
                return pd.Series([], dtype=object)
            d = np.round(U @ C.T, 6)
            order = np.argsort(-d, axis=1, kind="stable")  # stable keeps cell asc on ties
            return pd.Series([row[:n_probe].astype("int32").tolist() for row in order])

        return df.withColumn(out_col, _rank(F.col(unit_col)))
    cm = _centroid_matrix_df(df.sparkSession, cents)
    j = df.join(F.broadcast(cm)).withColumn(
        "_cs", _cell_scores(F.col(unit_col), F.col("cmat"), dim=int(np.asarray(cents).shape[1]))
    )
    ranked = F.slice(F.transform(F.array_sort(F.col("_cs"), _CELL_CMP), lambda s: s["i"]), 1, n_probe)
    return j.withColumn(out_col, ranked).drop("cmat", "_cs")


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    seed: int = 11,
    id_col: str = "vec_id",
    method: str = "auto",
) -> np.ndarray:
    """Lloyd iterations as DataFrame jobs: assign = argmax cosine against
    the broadcast codebook (assign_cells — data, never plan literals),
    update = posexplode + groupBy(cell, pos) with map-side partial
    aggregation — ONE driver round-trip of n_cells x dim tiny rows per
    iteration, independent of the embedding dimension. Total driver
    actions = 1 (init) + iters.

    Deterministic init: candidate rows are ordered by xxhash64(id, seed)
    BEFORE the limit, so the seed pool is identical at any partitioning /
    partition order (a bare .limit() is partition-order-dependent on a
    real cluster — r2 VERDICT #7), then a seeded permutation picks
    n_cells of them. method='pandas' for production codebooks."""
    init = (
        with_unit_vectors(corpus, vec_col, "u")
        .select("u", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("_o"))
        .orderBy("_o")
        .limit(n_cells * 4)
        .toPandas()
    )
    rng = np.random.default_rng(seed)
    cents = np.stack(init["u"].to_numpy()[rng.permutation(len(init))[:n_cells]]).astype(np.float64)
    c = with_unit_vectors(corpus, vec_col).select(F.col("unit"))
    for _ in range(iters):
        assigned = assign_cells(c, cents, unit_col="unit", method=method)
        stats = (
            assigned.select("cell", F.posexplode("unit").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
            .toPandas()
        )
        for cell, grp in stats.groupby("cell"):
            v = grp.sort_values("pos")["s"].to_numpy(dtype=np.float64) / max(int(grp["cnt"].iloc[0]), 1)
            nrm = np.linalg.norm(v)
            if nrm > 0:
                cents[int(cell)] = v / nrm
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "auto",
) -> DataFrame:
    """IVF probe: corpus partitioned by nearest centroid; each query scans
    only its n_probe nearest cells. Centroids travel as broadcast data
    (assign_cells/rank_cells), never plan literals — plan size is O(1) in
    the codebook; method='pandas' for production n_cells x dim."""
    cdim = int(np.asarray(cents).shape[1])
    c = with_unit_vectors(corpus, vec_col, dim=cdim).select(F.col(id_col), F.col("unit").alias("cu"))
    c = assign_cells(c, cents, unit_col="cu", method=method)
    q = with_unit_vectors(queries, vec_col, dim=cdim).select(F.col(query_id_col), F.col("unit").alias("qu"))
    q = rank_cells(q, cents, unit_col="qu", n_probe=n_probe, method=method).select(
        query_id_col, "qu", F.explode("cells").alias("cell")
    )
    scored = c.join(F.broadcast(q), "cell").filter(F.col(id_col) != F.col(query_id_col)).select(
        query_id_col, id_col, F.round(_dot_fixed(F.col("cu"), F.col("qu"), cdim), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).dropDuplicates([query_id_col, id_col])
