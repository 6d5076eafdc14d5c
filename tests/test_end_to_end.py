"""End-to-end dedupe on the synthetic labeled fixture: pairwise F1 >= 0.99
(BASELINE.json metric; protocol of csv_example/csv_evaluation.py)."""

import pytest
from pyspark.sql import functions as F

from sparklink.evaluate import pairwise_prf
from sparklink.pipeline import SparkDedupe


@pytest.fixture(scope="module")
def fitted(fixture_dfs):
    transcripts, truth, labeled = fixture_dfs
    dd = SparkDedupe()
    records = dd.canonical_records(transcripts).cache()
    dd.fit(records, labeled)
    return dd, records, transcripts, truth


def test_model_learned_sensible_weights(fitted):
    dd, *_ = fitted
    w = dict(zip(dd.model.feature_cols(), dd.model.weights))
    assert w["d_string_conv_text"] > 0
    assert w["d_text_conv_text"] > 0
    assert 0.0 < dd.threshold < 1.0


def test_f1_at_least_099(fitted):
    dd, records, transcripts, truth = fitted
    em = dd.partition(transcripts).cache()
    assert em.count() == records.count()
    m = pairwise_prf(em, truth)
    assert m["f1"] >= 0.99, m


def test_f1_restricted_to_shared_blocking_keys(fitted):
    """The BASELINE metric variant: eval restricted to candidate pairs at
    shared blocking keys."""
    from sparklink.pairs import candidate_pairs

    dd, records, transcripts, truth = fitted
    bm = dd.blocking_map(records)
    cands = candidate_pairs(bm)
    em = dd.partition(transcripts)
    m = pairwise_prf(em, truth, restrict_to=cands)
    assert m["f1"] >= 0.99, m


def test_model_roundtrip(fitted):
    from sparklink.score import FieldModel

    dd, *_ = fitted
    m2 = FieldModel.from_json(dd.model.to_json())
    assert [v.name for v in m2.variables] == [v.name for v in dd.model.variables]
    assert abs(m2.bias - dd.model.bias) < 1e-12
    assert list(m2.weights) == list(dd.model.weights)


def test_empty_corpus_partition(fitted):
    """Degenerate input: a fitted pipeline over zero transcripts must
    produce an empty entity_map with the normal schema, not crash — the
    shape a scheduled production run hits on a day with no arrivals."""
    dd, records, transcripts, truth = fitted
    em = dd.partition(transcripts.limit(0))
    assert em.count() == 0
    assert {"record_id", "canon_id"} <= set(em.columns)
