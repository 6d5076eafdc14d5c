"""RecordLink + Gazetteer modes on the two-source fixture
(record_linkage_example / gazetteer_example protocols)."""

import pytest
from pyspark.sql import functions as F

from sparklink.linkage import SparkGazetteer, SparkRecordLink
from sparklink.synth import make_labeled_pairs, make_transcripts


@pytest.fixture(scope="module")
def two_source(spark):
    tp, truth = make_transcripts(n_entities=80, seed=11, two_sources=True)
    labeled = make_labeled_pairs(truth, tp, seed=11)
    t = spark.createDataFrame(tp).cache()
    return t, spark.createDataFrame(truth).cache(), spark.createDataFrame(labeled).cache()


@pytest.fixture(scope="module")
def linked(spark, two_source):
    transcripts, truth, labeled = two_source
    rl = SparkRecordLink()
    records = rl.canonical(transcripts, extra_cols=["source"]).cache()
    rl.fit(records, labeled)
    left = records.filter(F.col("source") == "a").drop("source").cache()
    right = records.filter(F.col("source") == "b").drop("source").cache()
    matches = rl.join(left, right).cache()
    return rl, records, left, right, matches, truth


def _truth_pairs(truth):
    labeled = truth.filter(F.col("true_entity_id") != "x")
    a = labeled.filter(F.col("source") == "a").select(
        F.col("true_entity_id").alias("e"), F.col("conv_id").alias("id_a")
    )
    b = labeled.filter(F.col("source") == "b").select(
        F.col("true_entity_id").alias("e"), F.col("conv_id").alias("id_b")
    )
    return a.join(b, "e").select("id_a", "id_b")


def test_recordlink_cross_source_only(linked):
    rl, records, left, right, matches, truth = linked
    left_ids = {r.conv_id for r in left.select("conv_id").collect()}
    right_ids = {r.conv_id for r in right.select("conv_id").collect()}
    for row in matches.collect():
        assert row.id_a in left_ids and row.id_b in right_ids


def test_recordlink_one_to_one(linked):
    *_, matches, truth = linked
    assert matches.groupBy("id_a").count().filter(F.col("count") > 1).count() == 0
    assert matches.groupBy("id_b").count().filter(F.col("count") > 1).count() == 0


def test_recordlink_f1(linked):
    *_, matches, truth = linked
    tp_df = _truth_pairs(truth)
    n_true = tp_df.count()
    # restrict to labeled records on both sides (x excluded)
    labeled_ids = {r.conv_id for r in truth.filter(F.col("true_entity_id") != "x").select("conv_id").collect()}
    found = matches.filter(F.col("id_a").isin(labeled_ids) & F.col("id_b").isin(labeled_ids))
    n_found = found.count()
    n_hit = found.join(tp_df, ["id_a", "id_b"]).count()
    precision = n_hit / n_found if n_found else 1.0
    recall = n_hit / n_true if n_true else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (precision, recall, f1)


def test_gazetteer_search_and_match(spark, two_source, linked):
    transcripts, truth, labeled = two_source
    rl, records, left, right, matches, _ = linked
    gaz = SparkGazetteer(model=rl.model, threshold=rl.threshold)
    gaz.index(right)  # canonical side
    top2 = gaz.search(left, n_matches=2)
    assert top2.groupBy("messy_id").count().agg(F.max("count")).first()[0] <= 2
    assert top2.filter(F.col("rank") == 1).count() > 0
    m = gaz.match(left)
    # match = rank-1 above threshold; every matched pair must also be a
    # top-1 search result
    joined = m.join(top2.filter(F.col("rank") == 1), ["messy_id", "canonical_id"], "left_semi")
    assert joined.count() == m.count()
    # gazetteer match quality vs truth (same protocol as recordlink)
    tp_df = _truth_pairs(truth).withColumnRenamed("id_a", "messy_id").withColumnRenamed("id_b", "canonical_id")
    labeled_ids = {r.conv_id for r in truth.filter(F.col("true_entity_id") != "x").select("conv_id").collect()}
    found = m.filter(F.col("messy_id").isin(labeled_ids) & F.col("canonical_id").isin(labeled_ids))
    n_hit = found.join(tp_df, ["messy_id", "canonical_id"]).count()
    prec = n_hit / max(found.count(), 1)
    rec = n_hit / max(tp_df.count(), 1)
    assert prec >= 0.98 and rec >= 0.95, (prec, rec)
    gaz.unindex()


def test_gazetteer_write_back(spark, two_source, linked):
    transcripts, truth, labeled = two_source
    rl, records, left, right, matches, _ = linked
    gaz = SparkGazetteer(model=rl.model, threshold=rl.threshold)
    gaz.index(right)
    m = gaz.match(left)
    updated, unmatched = gaz.apply_matches(left, m)
    assert updated.count() == left.count()
    n_matched = m.count()
    assert updated.filter(F.col("canonical_id").isNotNull()).count() == n_matched
    assert unmatched.count() == left.count() - n_matched
    gaz.unindex()
