"""Round-5 hardening: simhash/ngram candidate-generator skew caps, the
closed active-learning label->refit loop, the JVM-native levenshtein
comparator, and stream_match_new duplicate re-arrival."""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


# ---------------------------------------------------------------------------
# simhash_near_pairs bucket cap (r4 VERDICT #1)
# ---------------------------------------------------------------------------


def _hot_docs(spark):
    # 30 byte-identical docs -> identical simhash -> all four 16-bit chunk
    # buckets have 30 members (the boilerplate hot-key square); plus one
    # identical pair outside the hot group whose buckets stay size 2
    rows = [
        (f"d{i:03d}", "the same boilerplate legal disclaimer text repeated for every document in this hot group")
        for i in range(30)
    ]
    rows += [
        ("n001", "completely different content about apples and oranges in the quiet orchard"),
        ("n002", "completely different content about apples and oranges in the quiet orchard"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_simhash_hot_chunk_capped(spark, tmp_path):
    from sparklink.checkpoints import Catalog
    from sparklink.dedup import simhash_near_pairs

    docs = _hot_docs(spark)
    uncapped = simhash_near_pairs(docs, max_bucket=10**9)
    assert uncapped.count() >= 30 * 29 // 2  # the hot group squared
    cat = Catalog(spark, str(tmp_path / "wh"))
    capped = simhash_near_pairs(
        docs,
        max_bucket=20,
        on_oversized=lambda n, mx: cat.log_metric(
            "simhash_near_pairs", event="oversized_dropped", count=n, max_bucket=mx
        ),
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # hot-group pairs no longer explode the candidate count...
    assert not any(a.startswith("d") and b.startswith("d") for a, b in got)
    # ...while small buckets still pair
    assert ("n001", "n002") in got
    # and the drop is visible in the catalog's metrics table
    ms = [m for m in cat.metrics() if m["stage"] == "simhash_near_pairs"]
    assert ms and ms[0]["event"] == "oversized_dropped"
    assert ms[0]["count"] >= 4 and ms[0]["max_bucket"] == 20


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs: capped first-token blocks + composed LSH path
# (r4 VERDICT #2)
# ---------------------------------------------------------------------------


def test_ngram_first_token_hot_block_capped(spark):
    from sparklink.dedup import ngram_jaccard_pairs

    # 25 mutually-dissimilar docs all starting with the stopword 'the'
    # (the near-cartesian block), plus a small genuine near-dup block
    rows = [
        (f"d{i:03d}", f"the alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(25)
    ]
    rows += [
        ("z1", "zebra stripe pattern on the wall today"),
        ("z2", "zebra stripe pattern on the wall tonight"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    drops = []
    out = ngram_jaccard_pairs(
        docs,
        blocking="first_token",
        max_block=10,
        min_jaccard=0.5,
        on_oversized=lambda n, mx: drops.append((n, mx)),
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert drops == [(1, 10)]  # exactly the 'the' block was dropped
    assert ("z1", "z2") in got and got[("z1", "z2")] >= 0.5


def test_ngram_lsh_composed_finds_neardups_across_blocks(spark):
    from sparklink.dedup import ngram_jaccard_pairs

    # near-dup pairs that do NOT share a first token (first-token blocking
    # would miss both); fillers are mutually dissimilar
    rows = [
        ("a1", "shared story about a fox crossing the frozen river at dawn"),
        ("a2", "the shared story about a fox crossing the frozen river at dawn"),
        ("b1", "instructions for assembling the oak bookshelf with wooden pegs"),
        ("b2", "my instructions for assembling the oak bookshelf with wooden pegs"),
    ]
    rows += [(f"f{i:02d}", f"filler{i} unrelated{i} prose{i} entirely{i} different{i} words{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = ngram_jaccard_pairs(docs, min_jaccard=0.5)  # blocking='lsh' default
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert ("a1", "a2") in got and ("b1", "b2") in got
    assert not any(a.startswith("f") or b.startswith("f") for a, b in got)


def test_ngram_accepts_staged_candidates(spark):
    from sparklink.dedup import ngram_jaccard_pairs

    rows = [
        ("x1", "the cat sat on the warm mat near the door"),
        ("x2", "the cat sat on the warm mat near the stove"),
        ("y1", "unrelated text about sailing across the open sea"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    cands = spark.createDataFrame([("x1", "x2"), ("x1", "y1")], "id_a string, id_b string")
    out = ngram_jaccard_pairs(docs, candidates=cands, min_jaccard=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {("x1", "x2")}  # verify stage filters the staged candidates


# ---------------------------------------------------------------------------
# JVM-native levenshtein comparator (r4 VERDICT #4)
# ---------------------------------------------------------------------------

_LEV_CASES = [
    ("kitten", "sitting"),
    ("", ""),
    ("a", ""),
    ("", "abc"),
    ("abc", "abc"),
    ("café", "cafe"),
    ("naïve résumé", "naive resume"),
    ("x" * 80, "x" * 79 + "y"),  # both truncate to the same 64-char prefix
    ("the quick brown fox", "the quack brown fax"),
    ("short", "a much much longer string than the other side"),
]


def test_levenshtein_expr_matches_kernel(spark):
    """The pure-Column comparator must compute the identical normalized
    rational as the numpy DP kernel (which er_pair_levenshtein proves
    equal to DuckDB's native levenshtein)."""
    from sparklink.distances import levenshtein

    a = pd.Series([c[0][:64] for c in _LEV_CASES])
    b = pd.Series([c[1][:64] for c in _LEV_CASES])
    kernel_sim = 1.0 - levenshtein(a, b)
    df = spark.createDataFrame(list(zip(a, b)), "l string, r string")
    tl, tr = F.substring("l", 1, 64), F.substring("r", 1, 64)
    expr = 1.0 - F.levenshtein(tl, tr).cast("double") / F.greatest(
        F.length(tl), F.length(tr), F.lit(1)
    ).cast("double")
    got = [r.s for r in df.select(expr.alias("s")).collect()]
    assert np.allclose(got, kernel_sim, atol=1e-12)


def test_levenshtein_only_model_has_no_arrow_stage(spark):
    """A model using only Column-expressible kinds must keep the whole
    distance stage in the JVM — no ArrowEvalPython / BatchEvalPython."""
    from sparklink.score import FieldModel, Variable

    model = FieldModel(variables=[Variable("f", "levenshtein"), Variable("g", "exact")])
    hyd = spark.createDataFrame(
        [("1", "2", "abc", "abd", "x", "x")],
        "id_a string, id_b string, f_a string, f_b string, g_a string, g_b string",
    )
    model.weights = np.ones(len(model.feature_cols()))
    out = model.score(model.distance_frame(hyd))
    plan = _plan(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    row = out.collect()[0]
    expect = 1.0 - 1.0 / 3.0
    assert abs(row["d_levenshtein_f"] - expect) < 1e-12


# ---------------------------------------------------------------------------
# closed active-learning loop (r4 VERDICT #3)
# ---------------------------------------------------------------------------


def test_label_session_recovers_f1_from_misweighted_model(fixture_dfs):
    """Two label rounds on a deliberately mis-weighted (sign-inverted)
    starting model must recover F1 >= 0.99 — the reference's defining
    console_label -> train -> partition workflow, closed."""
    from sparklink.evaluate import pairwise_prf
    from sparklink.pipeline import SparkDedupe

    transcripts, truth, labeled = fixture_dfs
    dd = SparkDedupe()
    records = dd.canonical_records(transcripts).cache()
    dd.fit(records, labeled)
    good_w = dd.model.weights.copy()
    # sabotage: invert every weight (the anti-model scores matches low)
    dd.model.weights = -good_w
    dd.model.bias = -dd.model.bias
    dd.threshold = 0.5

    truth_pd = truth.toPandas()
    tm = dict(zip(truth_pd["conv_id"], truth_pd["true_entity_id"]))

    def oracle(batch):
        out = []
        for _, r in batch.iterrows():
            ta, tb = tm.get(r["id_a"], "x"), tm.get(r["id_b"], "x")
            out.append(None if "x" in (ta, tb) else ta == tb)
        return out

    result = dd.label_session(records, oracle, rounds=2, per_round=150, seed=7)
    assert len(result["rounds"]) == 2
    assert result["n_labeled"] >= 100
    em = dd.partition(transcripts)
    m = pairwise_prf(em, truth)
    assert m["f1"] >= 0.99, (m, result["rounds"])
    # and the recovered weights point the right way again
    w = dict(zip(dd.model.feature_cols(), dd.model.weights))
    assert w["d_string_conv_text"] > 0


def test_label_session_stop_labeling_keeps_partial_batch(fixture_dfs):
    from sparklink.learn import StopLabeling
    from sparklink.pipeline import SparkDedupe

    transcripts, truth, labeled = fixture_dfs
    dd = SparkDedupe()
    records = dd.canonical_records(transcripts)
    dd.fit(records, labeled)
    calls = []

    def quitter(batch):
        calls.append(len(batch))
        # answer the first two pairs, then hit 'f'
        raise StopLabeling([True, False])

    result = dd.label_session(records, quitter, rounds=5, per_round=10, seed=7)
    assert len(calls) == 1  # session ended after the stop
    assert len(result["rounds"]) == 1
    assert result["rounds"][0]["answered"] == 2


def test_file_labeler_and_console_labeler(tmp_path):
    from sparklink.learn import StopLabeling, console_labeler, file_labeler

    p = tmp_path / "answers.csv"
    p.write_text("conv_id_a,conv_id_b,label\nc1,c2,true\nc3,c4,0\n")
    lab = file_labeler(str(p))
    batch = pd.DataFrame({"id_a": ["c1", "c4", "c9"], "id_b": ["c2", "c3", "c10"]})
    assert lab(batch) == [True, False, None]  # reversed pair resolved too

    answers = iter(["y", "n", "u", "f"])
    out_lines = []
    lab2 = console_labeler(["f1"], input_fn=lambda _: next(answers), output=out_lines.append)
    batch2 = pd.DataFrame(
        {"id_a": ["a", "b", "c", "d"], "id_b": ["w", "x", "y", "z"], "f1_a": ["1"] * 4, "f1_b": ["2"] * 4}
    )
    with pytest.raises(StopLabeling) as ei:
        lab2(batch2)
    assert ei.value.args[0] == [True, False, None]
    assert any("f1:" in ln for ln in out_lines)


def test_cli_label_batch_mode(spark, fixture_dfs, tmp_path):
    """The `sparklink label` driver end-to-end in batch answers-file mode:
    labels consumed, model refit, artifact written with threshold."""
    from sparklink.cli import main as cli_main
    from sparklink.score import FieldModel

    transcripts, truth, labeled = fixture_dfs
    tdir = str(tmp_path / "transcripts")
    transcripts.write.mode("overwrite").parquet(tdir)
    # answers file from gold: label EVERY truth-known pair both ways
    truth_pd = truth.toPandas()
    tm = dict(zip(truth_pd["conv_id"], truth_pd["true_entity_id"]))
    ids = sorted(tm)
    lines = ["conv_id_a,conv_id_b,label"]
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if tm[a] != "x" and tm[b] != "x":
                lines.append(f"{a},{b},{str(tm[a] == tm[b]).lower()}")
    answers = tmp_path / "answers.csv"
    answers.write_text("\n".join(lines) + "\n")
    model_out = str(tmp_path / "model.json")
    cli_main(
        [
            "label",
            "--transcripts", tdir,
            "--labels-file", str(answers),
            "--model-out", model_out,
            "--rounds", "2",
            "--per-round", "50",
        ]
    )
    art = json.load(open(model_out))
    m = FieldModel.from_json(json.dumps(art))
    assert m.weights is not None and 0.0 < art["threshold"] < 1.0


# ---------------------------------------------------------------------------
# stream_match_new: duplicate re-arrival is dropped, not double-mapped
# (r4 ADVICE)
# ---------------------------------------------------------------------------


def test_stream_match_new_duplicate_rearrival(spark, tmp_path_factory):
    import os
    import time

    from sparklink.pipeline import SparkDedupe
    from sparklink.score import FieldModel
    from sparklink.streaming import stream_match_new
    from sparklink.synth import write_fixture

    root = str(tmp_path_factory.mktemp("smn_dup"))
    paths = write_fixture(spark, f"{root}/data", n_entities=16, seed=13)
    t = spark.read.parquet(paths["transcripts"])

    art = json.load(open("models/transcript_model.json"))
    dd = SparkDedupe(model=FieldModel.from_json(json.dumps(art)), threshold=float(art["threshold"]))

    all_ids = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    a, b = all_ids[0], all_ids[1]
    base_t = t.where(~F.col("conv_id").isin([a, b]))
    em0 = dd.partition(base_t).localCheckpoint(eager=True)

    src = f"{root}/src"
    os.makedirs(src, exist_ok=True)
    t.where(F.col("conv_id") == a).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    # batch 2 RE-SENDS conversation a alongside the new b
    t.where(F.col("conv_id").isin([a, b])).coalesce(1).write.mode("append").parquet(src)

    out, ckpt = f"{root}/deltas", f"{root}/ckpt"
    q = stream_match_new(spark, dd, src, t.schema, base_t, em0, out, ckpt, max_files_per_trigger=1)
    assert q.awaitTermination(600)

    deltas = spark.read.parquet(out)
    rows = deltas.collect()
    # exactly one entity-map row per conversation: the re-sent 'a' was
    # anti-joined out of batch 2 instead of landing a second row
    assert sorted(r.record_id for r in rows) == sorted([a, b])
