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


# ---------------------------------------------------------------------------
# LSH hyperplanes as broadcast data, not plan literals (r3: same scale
# fix as IVF centroids, applied to lsh_topk / cosine_neardup_pairs)
# ---------------------------------------------------------------------------


def test_lsh_bucket_keys_match_numpy(spark):
    """_with_buckets packed + banded keys vs a numpy sign-bit reference on
    the same unit vectors (band b owns planes [b*r, (b+1)*r), bit j of a
    band is plane b*r+j)."""
    from sparklink.ann import _hyperplanes, _with_buckets, with_unit_vectors

    dim, n_planes, bands = 16, 12, 3
    planes = _hyperplanes(dim, n_planes, seed=21)
    emb = _rand_emb(spark, 40, dim, seed=22)
    u = with_unit_vectors(emb).select("vec_id", F.col("unit").alias("cu"))

    got_packed = {r.vec_id: r.bucket for r in _with_buckets(u, "cu", planes).collect()}
    got_bands = {}
    for r in _with_buckets(u, "cu", planes, bands=bands, out_col="bk").collect():
        got_bands.setdefault(r.vec_id, set()).add(r.bk)

    uv = {r.vec_id: np.array(r.cu, dtype=np.float64) for r in u.collect()}
    r_per = n_planes // bands
    for vid, vec in uv.items():
        signs = [np.round(float(np.dot(vec, p)), 6) >= 0 for p in planes]
        packed = sum(1 << i for i, s in enumerate(signs) if s)
        assert got_packed[vid] == packed, f"vec {vid}: packed key mismatch"
        want = {
            f"b{b}:{sum(1 << j for j in range(r_per) if signs[b * r_per + j])}"
            for b in range(bands)
        }
        assert got_bands[vid] == want, f"vec {vid}: band keys mismatch"


def test_lsh_banded_cap_is_per_band(spark):
    """128 planes in 8 bands packs 16 bits per band key — legal; the same
    128 planes as ONE packed key must assert (>62 bits)."""
    from sparklink.ann import _hyperplanes, _planes_df, cosine_neardup_pairs

    planes = _hyperplanes(32, 128, seed=9)
    emb = _rand_emb(spark, 80, 32, seed=10)
    nd = cosine_neardup_pairs(emb, threshold=0.99, planes=list(planes), bands=8, max_bucket=50)
    assert nd.count() >= 0  # plan builds and runs
    with pytest.raises(AssertionError):
        _planes_df(spark, list(planes))  # unbanded: 128 bits in one key
    with pytest.raises(AssertionError):
        _planes_df(spark, list(planes), bands=7)  # 128 % 7 != 0


def test_lsh_production_planes_plan_size(spark):
    """62 planes x dim 512 (a production near-dup config): lsh_topk and
    cosine_neardup_pairs must build constant-size plans — pre-r3 code
    inlined every plane component as a Column literal (O(n_planes*dim)
    literals per band expression)."""
    from sparklink.ann import _hyperplanes, cosine_neardup_pairs, lsh_topk

    dim = 512
    planes = _hyperplanes(dim, 62, seed=5)
    emb = _rand_emb(spark, 300, dim, seed=13)
    qs = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")

    t0 = time.time()
    top = lsh_topk(emb, qs, k=3, dim=dim, planes=planes)
    plan = top._jdf.queryExecution().toString()
    top.count()
    assert len(plan) < 200_000, f"lsh_topk plan {len(plan)} chars — planes leaked into the plan"

    nd = cosine_neardup_pairs(emb, threshold=0.8, planes=list(planes), bands=31, max_bucket=50)
    plan_nd = nd._jdf.queryExecution().toString()
    nd.count()
    dt = time.time() - t0
    assert len(plan_nd) < 200_000, f"neardup plan {len(plan_nd)} chars — planes leaked into the plan"
    assert dt < 120, f"production-plane LSH took {dt:.0f}s"


# ---------------------------------------------------------------------------
# sparse_dot in-row hash-collision hardening (r2 VERDICT #3)
# ---------------------------------------------------------------------------


def test_tfidf_arrays_collapse_in_row_hash_collisions(spark):
    from sparklink.distances import sparse_dot, tfidf_token_arrays_from_stats

    # force collisions: hash = token length, so "aa" and "bb" collide
    tf = spark.createDataFrame(
        [("r1", "aa", 2), ("r1", "bb", 1), ("r1", "ccc", 1), ("r2", "bb", 3), ("r2", "ddd", 1)],
        "record_id string, token string, tf int",
    )
    dfreq = spark.createDataFrame(
        [("aa", 1), ("bb", 2), ("ccc", 1), ("ddd", 1)], "token string, df int"
    )
    got = (
        tfidf_token_arrays_from_stats(tf, dfreq, n_docs=10, hash_expr=lambda c: F.length(c).cast("int"))
        .toPandas()
        .set_index("record_id")
    )
    # r1 had two length-2 tokens -> ONE surviving entry per hash
    assert list(got.loc["r1", "tfh"]) == [2, 3]
    assert list(got.loc["r2", "tfh"]) == [2, 3]
    for rid in ("r1", "r2"):
        tfh = np.asarray(got.loc[rid, "tfh"])
        assert len(np.unique(tfh)) == len(tfh), "per-row hashes must be unique by construction"
        np.testing.assert_allclose(np.sum(np.square(got.loc[rid, "tfw"]), dtype=np.float64), 1.0, atol=1e-6)
    # the surviving weight for hash 2 in r1 is the MAX-weight colliding
    # token ("aa": tf=2, df=1 outweighs "bb": tf=1, df=2)
    import math

    w_aa = 2 * math.log(11.0 / 2.0)
    w_ccc = 1 * math.log(11.0 / 2.0)
    expect = w_aa / math.sqrt(w_aa**2 + w_ccc**2)
    np.testing.assert_allclose(got.loc["r1", "tfw"][0], expect, atol=1e-6)

    # sparse_dot over the deduped arrays: assume_unique holds, value sane
    d = sparse_dot(
        pd.Series([list(got.loc["r1", "tfh"])]),
        pd.Series([[float(x) for x in got.loc["r1", "tfw"]]]),
        pd.Series([list(got.loc["r2", "tfh"])]),
        pd.Series([[float(x) for x in got.loc["r2", "tfw"]]]),
    )
    manual = float(
        np.dot(
            np.asarray(got.loc["r1", "tfw"], dtype=np.float64),
            np.asarray(got.loc["r2", "tfw"], dtype=np.float64),
        )
    )
    np.testing.assert_allclose(d[0], manual, atol=1e-9)


def test_tfidf_arrays_default_hash_unchanged(spark):
    """No-collision inputs produce identical arrays to the r2 layout
    (sorted by hash, L2-normalized float32 weights)."""
    from sparklink.distances import tfidf_token_arrays

    recs = spark.createDataFrame(
        [("c1", "alpha beta gamma"), ("c2", "beta gamma delta")], "conv_id string, conv_text string"
    )
    out = tfidf_token_arrays(recs, "conv_text").toPandas().set_index("record_id")
    for rid in ("c1", "c2"):
        tfh = np.asarray(out.loc[rid, "tfh"])
        assert (np.diff(tfh) > 0).all(), "tfh must be strictly sorted"
        np.testing.assert_allclose(np.sum(np.square(out.loc[rid, "tfw"]), dtype=np.float64), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# HAC tie-order pin (r2 ADVICE: NN-chain vs greedy tie behavior)
# ---------------------------------------------------------------------------


def test_hac_tie_heavy_fixture_pinned():
    """Unscored pairs initialize AT the cut, so ties are the common case;
    NN-chain's tie order is deterministic but differs from the removed
    r1 greedy loop (a valid alternative dendrogram). Pin the flat-cut
    output on a tie-heavy fixture so future refactors that change tie
    behavior fail loudly instead of silently re-clustering."""
    from sparklink.cluster import _avg_linkage_labels

    n, cut = 12, 0.5
    d = np.full((n, n), cut)
    np.fill_diagonal(d, 0.0)
    for i, j, v in [(0, 1, 0.05), (1, 2, 0.08), (3, 4, 0.1), (4, 5, 0.12), (6, 7, 0.05), (8, 9, 0.49), (9, 10, 0.51), (0, 11, 0.9)]:
        d[i, j] = d[j, i] = v
    labels = _avg_linkage_labels(d.copy(), cut)
    canon: dict = {}
    for k, lab in enumerate(labels):
        canon.setdefault(lab, k)
    assert [canon[l] for l in labels] == [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10, 10]


# ---------------------------------------------------------------------------
# Catalog: Iceberg strictly opt-in + backend recorded in lineage (r2 ADVICE)
# ---------------------------------------------------------------------------


def test_catalog_backend_mismatch_refuses_resume(spark, tmp_path):
    """A warehouse written as parquet must NOT resume under an Iceberg
    catalog (and vice versa): the data lives in the other storage system,
    so a fingerprint-only check would load a missing/stale table."""
    from sparklink.checkpoints import Catalog

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    params = {"p": 1}
    df = cat.stage("s1", params, lambda: spark.range(5).withColumnRenamed("id", "v"))
    assert df.count() == 5
    assert cat.has_stage("s1", params)
    # same warehouse re-opened with an (unconfigured-is-fine: constructor
    # is side-effect free) Iceberg catalog -> backend mismatch -> recompute
    cat_ice = Catalog(spark, wh, iceberg_catalog="somecat")
    assert cat_ice.backend == "iceberg"
    assert not cat_ice.has_stage("s1", params)
    # original parquet catalog still resumes
    assert Catalog(spark, wh).has_stage("s1", params)
    # lineage records the backend explicitly
    recs = [r for r in cat._lineage() if r.get("event") == "write"]
    assert recs and all(r["backend"] == "parquet" for r in recs)


def test_catalog_never_autodetects_iceberg(spark, tmp_path):
    """Sessions carrying spark.sql.catalog.* confs for unrelated tables
    must not reroute stage I/O (r2 ADVICE: _detect_iceberg removed)."""
    from sparklink.checkpoints import Catalog

    spark.conf.set("spark.sql.catalog.unrelated", "org.apache.iceberg.spark.SparkCatalog")
    try:
        cat = Catalog(spark, str(tmp_path / "wh2"))
        assert cat.iceberg_catalog is None and cat.backend == "parquet"
        out = cat.stage("s", {"p": 2}, lambda: spark.range(3))
        assert out.count() == 3  # wrote parquet, not a (broken) catalog table
    finally:
        spark.conf.unset("spark.sql.catalog.unrelated")


@pytest.mark.skipif(
    "SPARKLINK_ICEBERG_SESSION" not in __import__("os").environ,
    reason="requires an Iceberg-runtime jar on the session classpath "
    "(spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v>, "
    "spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog, "
    "spark.sql.catalog.ice.type=hadoop, spark.sql.catalog.ice.warehouse=<dir>); "
    "no jar / no network in this sandbox — set SPARKLINK_ICEBERG_SESSION=1 "
    "on a configured session to exercise the branch end-to-end",
)
def test_catalog_iceberg_branch_end_to_end(spark, tmp_path):
    from sparklink.checkpoints import Catalog

    cat = Catalog(spark, str(tmp_path / "whi"), iceberg_catalog="ice")
    params = {"p": 3}
    df = cat.stage("s_ice", params, lambda: spark.range(7))
    assert df.count() == 7
    assert cat.has_stage("s_ice", params)
    assert cat.load("s_ice").count() == 7
    # MERGE write-back (SparkGazetteer.merge_matches) needs this catalog too
    recs = [r for r in cat._lineage() if r.get("event") == "write"]
    assert all(r["backend"] == "iceberg" for r in recs)


# ---------------------------------------------------------------------------
# Gazetteer: index identity includes the input fingerprint (r2 ADVICE)
# ---------------------------------------------------------------------------


def test_gazetteer_reindex_different_canonical_invalidates(spark, tmp_path):
    from sparklink.checkpoints import Catalog
    from sparklink.linkage import SparkGazetteer
    from sparklink.synth import make_transcripts

    t1, _ = make_transcripts(n_entities=12, seed=1)
    t2, _ = make_transcripts(n_entities=12, seed=2)
    from sparklink.canonicalize import canonicalize

    c1 = canonicalize(spark.createDataFrame(t1))
    c2 = canonicalize(spark.createDataFrame(t2))
    # materialize as parquet so _input_fingerprint sees distinct files
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    c1.write.parquet(p1)
    c2.write.parquet(p2)
    c1, c2 = spark.read.parquet(p1), spark.read.parquet(p2)

    wh = str(tmp_path / "gwh")
    gaz = SparkGazetteer()
    gaz.index(c1, catalog=Catalog(spark, wh))
    n1 = gaz._index.count()
    ids1 = {r.record_id for r in gaz._canonical.select(F.col("conv_id").alias("record_id")).collect()}

    # same predicates, DIFFERENT canonical records: must NOT resume stale
    gaz2 = SparkGazetteer()
    cat2 = Catalog(spark, wh)
    gaz2.index(c2, catalog=cat2)
    ids2 = {r.record_id for r in gaz2._canonical.select(F.col("conv_id").alias("record_id")).collect()}
    assert ids2 != ids1, "stale gazetteer_canonical resumed despite new input"
    resume_hits = [m for m in cat2.metrics() if m.get("event") == "resume_hit"]
    assert not resume_hits, "different canonical input must invalidate the index stage"

    # identical input DOES resume
    gaz3 = SparkGazetteer()
    cat3 = Catalog(spark, wh)
    gaz3.index(c2, catalog=cat3)
    assert gaz3._index.count() == gaz2._index.count()
    assert [m for m in cat3.metrics() if m.get("event") == "resume_hit"]
    assert n1 >= 0


# ---------------------------------------------------------------------------
# Production (xxhash64) LSH candidate quality vs exact ground truth
# (r2 VERDICT "What's missing" #1)
# ---------------------------------------------------------------------------


def _exact_shingle_jaccard(rows, n=5):
    """Driver-side exact char-n-gram Jaccard over all pairs — the ground
    truth the production hash path is measured against (engine-independent:
    pure set arithmetic on the same normalization the operator applies)."""
    import itertools
    import re

    def sh(t):
        t = re.sub(r"\s+", " ", t.lower())
        return set(t[i : i + n] for i in range(max(len(t) - n + 1, 1)))

    ss = {d: sh(t) for d, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(ss), 2):
        sa, sb = ss[a], ss[b]
        inter = len(sa & sb)
        out[(a, b)] = inter / (len(sa) + len(sb) - inter)
    return out


def test_xxhash_minhash_lsh_candidate_quality(spark):
    """The path bench.py measures and a user deploys (hash_mode='xxhash')
    — the portable-hash oracle twin verifies the operator logic, this
    verifies the production hash's candidate QUALITY: recall >= 0.9 of
    true pairs at exact Jaccard >= 0.7 (k=32, bands=8, r=4: collision
    prob at J=0.7 is 1-(1-0.7^4)^8 ~ 0.91), and estimates that are not
    wildly off on the surfaced pairs."""
    from sparklink import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    truth = _exact_shingle_jaccard(rows)
    true_pairs = {p for p, j in truth.items() if j >= 0.7}
    assert len(true_pairs) >= 10, "fixture must contain real near-dups"

    cand = dedup.minhash_lsh_pairs(docs, k=32, bands=8, hash_mode="xxhash").collect()
    cand_pairs = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.est_jaccard for r in cand}
    recall = len(true_pairs & set(cand_pairs)) / len(true_pairs)
    assert recall >= 0.9, f"production minhash candidate recall {recall:.2f} < 0.9"
    # estimate sanity on surfaced true pairs: |est - exact| bounded
    errs = [abs(cand_pairs[p] - truth[p]) for p in true_pairs & set(cand_pairs)]
    assert sum(errs) / len(errs) < 0.15, f"mean |est-exact| {sum(errs)/len(errs):.3f}"


def test_xxhash_simhash_blocking_complete(spark):
    """Production simhash path: the operator's contract is hamming-based
    (NOT Jaccard — near-identical char-shingle docs can still differ in a
    few tokens and land past hamming 3). Verify the pigeonhole blocking
    is COMPLETE: every pair whose exact 64-bit simhash hamming distance
    is <= max_hamming=3 must be surfaced (a pair within hamming 3 must
    agree on >= 1 of the 4 16-bit chunks), with the exact hamming value."""
    from sparklink import dedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sims = {r.doc_id: r.simhash for r in dedup.simhash(docs, hash_mode="xxhash").collect()}
    ids = sorted(sims)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert len(want) >= 10, "fixture must contain simhash near-dups"
    cand = dedup.simhash_near_pairs(docs, max_hamming=3, hash_mode="xxhash").collect()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.hamming for r in cand}
    assert got == want, f"missing={set(want) - set(got)} extra={set(got) - set(want)}"


# ---------------------------------------------------------------------------
# Oversized-component skips are logged to the metrics table (r2 VERDICT #8)
# ---------------------------------------------------------------------------


def test_oversized_component_skip_logged(spark, tmp_path, fixture_dfs):
    from sparklink.checkpoints import Catalog
    from sparklink.pipeline import SparkDedupe

    transcripts, _, labeled = fixture_dfs
    cat = Catalog(spark, str(tmp_path / "wh_big"))
    # max_component=3: the fixture's true clusters (4-6 members) exceed it,
    # so refinement must skip them AND say so in _metrics.jsonl
    dd = SparkDedupe(catalog=cat, max_component=3)
    records = dd.canonical_records(transcripts)
    dd.fit(records, labeled)
    dd.partition(transcripts)
    skips = [m for m in cat.metrics() if m.get("event") == "oversized_skipped"]
    assert skips, "no oversized_skipped metric logged"
    assert skips[0]["count"] >= 1 and skips[0]["max_size"] > 3


# ---------------------------------------------------------------------------
# Learned name/address component weights + street normalization (VERDICT #6)
# ---------------------------------------------------------------------------


def test_street_type_and_directional_normalization(spark):
    from sparklink.score import FieldModel, Variable

    pairs = spark.createDataFrame(
        [
            ("123 Main St", "123 Main Street"),
            ("9 N Oak Ave.", "9 North Oak Avenue"),
            ("77 Sunset Blvd Apt 2", "77 Sunset Boulevard unit 2"),
        ],
        "addr_a string, addr_b string",
    )
    m = FieldModel(variables=[Variable("addr", "address", has_missing=False)])
    d = m.distance_frame(pairs).toPandas()
    # abbreviation vs expansion must be a PERFECT street match
    assert (d["d_address_addr__street"] > 0.999).all(), d["d_address_addr__street"].tolist()
    assert (d["d_address_addr__number"] == 1.0).all()


def test_name_suffix_stripped(spark):
    from sparklink.score import FieldModel, Variable

    pairs = spark.createDataFrame(
        [("JOHN SMITH JR", "SMITH, JOHN"), ("MARY DOE III", "DOE, MARY")],
        "name_a string, name_b string",
    )
    m = FieldModel(variables=[Variable("name", "name", has_missing=False)])
    d = m.distance_frame(pairs).toPandas()
    assert (d["d_name_name__first"] > 0.999).all()
    assert (d["d_name_name__last"] > 0.999).all()


def test_learned_component_weights_beat_fixed_blend(spark):
    """Officers-shaped fixture where the 0.35/0.55/0.10 blend INVERTS the
    ranking (a match with a street typo scores below a non-match that
    shares number+unit by coincidence) while per-component LR separates
    perfectly — the reason components are separate features."""
    from sparklink.score import FieldModel, Variable

    rows = [
        # label=1: same street (slight typo), different number/unit
        ("101 Maple Road", "105 Marple Road Apt 9", 1),
        ("22 Birch Lane Apt 3", "28 Birch Lne", 1),
        ("7 Cedar Court", "9 Cedar Cuort Apt 1", 1),
        ("444 Spruce Drive Apt 5", "441 Spruce Drve", 1),
        # label=0: same number+unit by coincidence, unrelated street
        ("63 Willow Street Apt 2", "63 Kingsway Apt 2", 0),
        ("17 Harbor View", "17 Quarry Hill", 0),
        ("85 Sunset Parkway Apt 4", "85 Northgate Apt 4", 0),
        ("30 Old Mill Road", "30 New Farm Terrace", 0),
    ]
    pairs = spark.createDataFrame(rows, "addr_a string, addr_b string, label int")
    m = FieldModel(variables=[Variable("addr", "address", has_missing=False)])
    feats = m.distance_frame(pairs).select("label", m.variables[0].dist_col, *m.feature_cols()).toPandas()

    blend = feats[m.variables[0].dist_col]
    worst_match = blend[feats["label"] == 1].min()
    best_non = blend[feats["label"] == 0].max()
    assert worst_match < best_non, "fixture must invert the fixed blend's ranking"

    m.fit(feats, iters=2000, lr=1.0)
    p = m.predict_proba(feats)
    assert p[feats["label"] == 1].min() > p[feats["label"] == 0].max(), (
        "learned component weights must rank all matches above all non-matches"
    )
    # street must carry the dominant learned weight
    w = dict(zip(m.feature_cols(), m.weights))
    assert w["d_address_addr__street"] > w["d_address_addr__number"]
    assert w["d_address_addr__street"] > w["d_address_addr__unit"]

    # JSON roundtrip preserves the component feature layout
    m2 = FieldModel.from_json(m.to_json())
    assert m2.feature_cols() == m.feature_cols()
    np.testing.assert_allclose(m2.weights, m.weights)


# ---------------------------------------------------------------------------
# Active-learning uncertainty sampling (r2 VERDICT "What's missing" #4)
# ---------------------------------------------------------------------------


def test_most_uncertain_orders_by_distance_from_half(spark):
    from sparklink.learn import most_uncertain

    scored = spark.createDataFrame(
        [("a", "b", 0.97), ("a", "c", 0.51), ("b", "c", 0.08), ("c", "d", 0.49), ("a", "d", 0.5)],
        "id_a string, id_b string, score double",
    )
    got = most_uncertain(scored, n=3).toPandas()
    assert list(zip(got["id_a"], got["id_b"])) == [("a", "d"), ("a", "c"), ("c", "d")]
    # plan shape: a top-k, not a global sort
    plan = most_uncertain(scored, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Incremental dedupe: match_new (r3 — the daily-ingest operation)
# ---------------------------------------------------------------------------


def test_match_new_incremental_assignment(spark):
    """Split a small corpus into a base era and a delta batch (late
    records of existing entities + entirely new entities, some
    multi-record); match_new's delta map unioned with the base map must
    (a) cover exactly the delta records, (b) leave the base map
    untouched, (c) give near-batch pairwise F1 on the full corpus, and
    (d) route late records of existing entities back to their existing
    clusters."""
    from sparklink.evaluate import pairwise_prf
    from sparklink.pipeline import SparkDedupe
    from sparklink.synth import make_labeled_pairs, make_transcripts

    tpd, tru = make_transcripts(n_entities=40, seed=11)
    transcripts = spark.createDataFrame(tpd).cache()
    truth = spark.createDataFrame(tru).cache()
    tp = tru  # conv_id, true_entity_id
    ent_col = [c for c in tp.columns if c != "conv_id"][0]

    # 'x' rows are unmatched distractors (evaluate drops them from truth);
    # scatter them across eras by conv hash
    new_entities = {e for e in tp[ent_col].unique() if e != "x" and int(e[1:]) % 4 == 0}
    delta_ids = set(tp[tp[ent_col].isin(new_entities)]["conv_id"])
    delta_ids |= {c for c in tp[tp[ent_col] == "x"]["conv_id"] if int(c[1:]) % 4 == 0}
    # late arrivals: the max conv of every 3rd multi-record old entity
    old = tp[(~tp[ent_col].isin(new_entities)) & (tp[ent_col] != "x")]
    late_ids = set()
    for i, (e, gr) in enumerate(sorted(old.groupby(ent_col), key=lambda kv: kv[0])):
        if i % 3 == 0 and len(gr) >= 2:
            late_ids.add(gr["conv_id"].max())
    delta_ids |= late_ids
    assert late_ids and len(delta_ids) < len(tp)

    base_t = transcripts.filter(~F.col("conv_id").isin(list(delta_ids)))
    delta_t = transcripts.filter(F.col("conv_id").isin(list(delta_ids)))

    # StaticDedupe path: the shipped artifact was trained on this synth
    # distribution — no fit in the test hot path
    import json

    from sparklink.score import FieldModel

    art = json.load(open("models/transcript_model.json"))
    dd = SparkDedupe(model=FieldModel.from_json(json.dumps(art)), threshold=float(art["threshold"]))
    # production daily-ingest reads the existing map back from the
    # warehouse — localCheckpoint stands in for that plan truncation
    em_base = dd.partition(base_t).localCheckpoint(eager=True)
    base_records = dd.canonical_records(base_t)

    em_delta = dd.match_new(delta_t, base_records, em_base).cache()

    got_delta = {r.record_id for r in em_delta.select("record_id").collect()}
    assert got_delta == delta_ids  # exactly the new records, each once
    base_ids = {r.record_id for r in em_base.select("record_id").collect()}
    assert not (got_delta & base_ids)

    full = em_base.unionByName(em_delta)
    prf = pairwise_prf(full, truth)
    assert prf["f1"] >= 0.95, prf

    # late records of existing entities overwhelmingly rejoin their cluster
    base_canons = {r.canon_id for r in em_base.select("canon_id").collect()}
    late_assign = {r.record_id: r.canon_id for r in em_delta.collect() if r.record_id in late_ids}
    rejoined = sum(1 for c in late_assign.values() if c in base_canons)
    assert rejoined >= 0.8 * len(late_assign), (rejoined, len(late_assign))


def test_cli_match_new_in_process(spark, tmp_path):
    """cli `match-new` plumbing: runs against parquet inputs and writes
    the delta map (semantics covered by test_match_new_incremental_
    assignment; the base map here is a valid singleton map so no base
    partition is needed)."""
    from sparklink import cli
    from sparklink.canonicalize import canonicalize
    from sparklink.synth import write_fixture

    paths = write_fixture(spark, str(tmp_path / "data"), n_entities=24, seed=5)
    t = spark.read.parquet(paths["transcripts"])
    ids = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    delta_ids = set(ids[:: 4])
    base_t, delta_t = str(tmp_path / "base_t"), str(tmp_path / "delta_t")
    t.filter(~F.col("conv_id").isin(list(delta_ids))).write.parquet(base_t)
    t.filter(F.col("conv_id").isin(list(delta_ids))).write.parquet(delta_t)
    em_path = str(tmp_path / "em_base")
    canonicalize(spark.read.parquet(base_t)).select(
        F.col("conv_id").alias("record_id"),
        F.col("conv_id").alias("canon_id"),
        F.lit(None).cast("double").alias("cluster_score"),
    ).write.parquet(em_path)

    out = str(tmp_path / "delta_out")
    cli.main(
        [
            "match-new",
            "--transcripts-new", delta_t,
            "--transcripts-existing", base_t,
            "--entity-map", em_path,
            "--model", "models/transcript_model.json",
            "--out", out,
        ]
    )
    delta = spark.read.parquet(out)
    got = {r.record_id for r in delta.collect()}
    assert got == delta_ids
    assert set(delta.columns) == {"record_id", "canon_id", "cluster_score"}
