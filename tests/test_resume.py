"""Resumability (FIXTURES.md §5.3, north_rule): stage checkpoints resume;
deleting a downstream checkpoint reproduces an identical entity_map."""

import json

import pytest
from pyspark.sql import functions as F

from sparklink.checkpoints import Catalog
from sparklink.pipeline import SparkDedupe
from sparklink.score import FieldModel


@pytest.fixture(scope="module")
def warehouse(spark, fixture_dfs, tmp_path_factory):
    transcripts, truth, labeled = fixture_dfs
    wh = str(tmp_path_factory.mktemp("wh"))
    dd = SparkDedupe(catalog=Catalog(spark, wh))
    records = dd.canonical_records(transcripts)
    dd.fit(records, labeled)
    em = dd.partition(transcripts).toPandas().sort_values("record_id").reset_index(drop=True)
    return wh, dd.model.to_json(), dd.threshold, em, transcripts


def test_rerun_hits_all_checkpoints(spark, warehouse):
    wh, model_json, threshold, em1, transcripts = warehouse
    cat = Catalog(spark, wh)
    dd = SparkDedupe(model=FieldModel.from_json(model_json), threshold=threshold, catalog=cat)
    before = len([m for m in cat.metrics() if m.get("event") == "resume_hit"])
    em2 = dd.partition(transcripts).toPandas().sort_values("record_id").reset_index(drop=True)
    hits = [m for m in cat.metrics() if m.get("event") == "resume_hit"]
    assert len(hits) > before
    stages_hit = {m["stage"] for m in hits}
    assert {"records", "blocking_map", "scored_pairs", "entity_map"} <= stages_hit
    assert em1[["record_id", "canon_id"]].equals(em2[["record_id", "canon_id"]])


def test_invalidate_downstream_reproduces_identical(spark, warehouse):
    wh, model_json, threshold, em1, transcripts = warehouse
    cat = Catalog(spark, wh)
    cat.invalidate("entity_map")
    dd = SparkDedupe(model=FieldModel.from_json(model_json), threshold=threshold, catalog=cat)
    em2 = dd.partition(transcripts).toPandas().sort_values("record_id").reset_index(drop=True)
    assert em1[["record_id", "canon_id"]].equals(em2[["record_id", "canon_id"]])


def test_model_change_invalidates_fingerprint(spark, warehouse):
    wh, model_json, threshold, em1, transcripts = warehouse
    cat = Catalog(spark, wh)
    d = json.loads(model_json)
    d["weights"] = [w * 1.1 for w in d["weights"]]
    dd = SparkDedupe(model=FieldModel.from_json(json.dumps(d)), threshold=threshold, catalog=cat)
    assert not cat.has_stage("scored_pairs", {"model": dd.model.to_json()})


def test_lineage_records_per_stage_metrics(spark, warehouse):
    wh, *_ = warehouse
    lineage = [json.loads(l) for l in open(f"{wh}/_lineage.jsonl")]
    writes = {r["stage"]: r for r in lineage if r["event"] == "write"}
    for stage in ("records", "blocking_map", "scored_pairs", "entity_map"):
        assert stage in writes
        assert writes[stage]["rows"] > 0
        assert writes[stage]["n_files"] >= 1
        assert "fingerprint" in writes[stage]
