"""Probabilistic name/address tagging (sparklink/nameparse.py) — the CRF-style
upgrade of the regex component splitters, re-creating the reference's
dedupe-variable-name / dedupe-variable-address plugin behavior
(extended-variables/officers.py:109-110 [lib])."""

import json

import pandas as pd
import pytest

from sparklink import nameparse as NP
from sparklink.score import FieldModel, Variable


def _names(*texts):
    return NP.tag_names(pd.Series(list(texts)))


def _addrs(*texts):
    return NP.tag_addresses(pd.Series(list(texts)))


def test_name_tagger_standard_forms():
    out = _names("John Smith", "Smith, John R", "JOHNSON, ROBERT", "Bill Smith Jr")
    assert list(out["first"]) == ["john", "john", "robert", "bill"]
    assert list(out["last"]) == ["smith", "smith", "johnson", "smith"]
    assert out["middle"][1] == "r"
    assert out["middle"][0] is None and out["middle"][3] is None


def test_name_tagger_adversarial_orderings():
    # the orderings the regex splitter cannot represent (r4 VERDICT missing
    # #3): honorific + LAST FIRST [MIDDLE] without a comma is resolved by
    # lexicon features, not position
    out = _names("Dr Smith John R", "dr garcia maria")
    assert list(out["first"]) == ["john", "maria"]
    assert list(out["last"]) == ["smith", "garcia"]
    assert out["middle"][0] == "r"


def test_name_tagger_particle_surname_and_oov():
    out = _names("Maria Van Helsing", "xqzvw yblk")
    assert out["last"][0] == "van helsing"  # multi-token surname
    assert out["first"][0] == "maria"
    # off-lexicon tokens fall back to the FIRST LAST positional prior
    assert out["first"][1] == "xqzvw" and out["last"][1] == "yblk"


def test_name_tagger_null_and_empty():
    out = _names(None, "", "   ")
    assert out["first"].isna().all() and out["last"].isna().all()


def test_addr_tagger_components():
    out = _addrs(
        "100 N Main St Apt 4B",
        "unit b 12 oak ave",          # LEADING unit — regex path can't
        "221 baker street suite 100 b",
        "12 chester st #4b",          # marker-inside-word hazard words
        "77 western ave",
        "9 broadway",
    )
    assert list(out["number"]) == ["100", "12", "221", "12", "77", "9"]
    assert out["street"][0] == "n main st"
    assert out["street"][1] == "oak ave"
    assert out["unit"][0] == "4b"
    assert out["unit"][1] == "b"
    assert out["unit"][2] == "100b"   # space/hyphen-insensitive join
    assert out["unit"][3] == "4b"     # '#' stripped
    assert out["street"][4] == "western ave" and out["unit"][4] is None
    assert out["street"][5] == "broadway"


def test_crf_matches_regex_on_standard_forms(spark):
    """On the forms BOTH parsers handle, components must agree — parser
    choice never changes feature layout or standard-form semantics."""
    from pyspark.sql import functions as F

    from sparklink.score import _name_components

    df = spark.createDataFrame(
        [
            ("john smith",),
            ("smith, john r",),
            ("mary ann doe",),
            ("doe, mary",),
            ("robert johnson jr",),
        ],
        "name string",
    )
    crf = NP.name_struct_udf()
    got = (
        df.select(
            _name_components(F.col("name")).alias("rx"), crf(F.col("name")).alias("crf")
        )
        .toPandas()
    )
    for rx, cf in zip(got["rx"], got["crf"]):
        assert rx["first"] == cf["first"]
        assert rx["last"] == cf["last"]
        assert (rx["middle"] or None) == (cf["middle"] or None)


def test_crf_name_variable_scores_adversarial_swap(spark):
    """A name variable with parser='crf' scores 'Dr Smith John R' vs
    'John R Smith' as the same person; the regex parser mis-splits the
    honorific form and scores it low."""
    pairs = spark.createDataFrame(
        [
            ("Dr Smith John R", "John R Smith"),
            ("Dr Smith John R", "Jane Doe"),
        ],
        "name_a string, name_b string",
    )
    crf = FieldModel(variables=[Variable("name", "name", has_missing=False, parser="crf")])
    rx = FieldModel(variables=[Variable("name", "name", has_missing=False)])
    d_crf = crf.distance_frame(pairs).toPandas()["d_name_name"]
    d_rx = rx.distance_frame(pairs).toPandas()["d_name_name"]
    assert d_crf[0] > 0.99          # full component agreement
    assert d_crf[0] > d_rx[0] + 0.1  # regex mis-split penalized the match
    assert d_crf[1] < 0.6            # different person still scores low


def test_crf_address_variable_leading_unit(spark):
    pairs = spark.createDataFrame(
        [
            ("unit b 12 oak ave", "12 Oak Avenue Apt B"),
            ("unit b 12 oak ave", "99 Elm St"),
        ],
        "addr_a string, addr_b string",
    )
    m = FieldModel(variables=[Variable("addr", "address", has_missing=False, parser="crf")])
    d = m.distance_frame(pairs).toPandas()
    assert d["d_address_addr__number"][0] == 1.0
    assert d["d_address_addr__street"][0] > 0.95  # 'oak ave' ≡ 'oak avenue'
    assert d["d_address_addr__unit"][0] == 1.0
    assert d["d_address_addr"][1] < d["d_address_addr"][0]


def test_parser_field_serialization_roundtrip():
    m = FieldModel(
        variables=[
            Variable("name", "name", has_missing=False, parser="crf"),
            Variable("addr", "address", has_missing=False),
        ]
    )
    m2 = FieldModel.from_json(m.to_json())
    assert m2.variables[0].parser == "crf"
    assert m2.variables[1].parser == "regex"
    # pre-parser artifacts (no 'parser' key) load as regex
    d = json.loads(m.to_json())
    for v in d["variables"]:
        v.pop("parser", None)
    m3 = FieldModel.from_json(json.dumps(d))
    assert all(v.parser == "regex" for v in m3.variables)
    with pytest.raises(ValueError):
        Variable("name", "name", parser="nope")


def test_fast_emissions_match_dense_path():
    """The production decode composes emissions from per-unique-token
    features (factorize + one matmul over the vocab); the dense [n, L, F]
    tensor path is the training/reference implementation. Same emissions,
    same tags."""
    import numpy as np

    texts = pd.Series(
        ["john smith", "smith, john r", "dr smith john r", "maria van helsing", "bill smith jr"]
    )
    tg = NP.name_tagger()
    raw, lens = NP._tokenize_matrix(texts, NP.NAME_MAX_LEN)
    E_fast, _ = NP._name_emissions(raw, lens, tg.W)
    tok, comma, lens2 = NP._name_tokenize(texts)
    W = raw.shape[1]
    feats = NP._name_features(tok, comma, lens2)[:, :W, :]
    E_dense = feats @ tg.W
    assert np.allclose(E_fast, E_dense, rtol=1e-4, atol=1e-4)
    t_fast = NP._viterbi(E_fast, tg.T, lens)
    t_dense = tg.decode_batch(NP._name_features(tok, comma, lens2), lens2)
    assert (t_fast == t_dense[:, :W]).all()

    addrs = pd.Series(["100 n main st apt 4b", "unit b 12 oak ave", "9 broadway"])
    ta = NP.addr_tagger()
    raw_a, lens_a = NP._tokenize_matrix(addrs, NP.ADDR_MAX_LEN)
    E_fa, _ = NP._addr_emissions(raw_a, lens_a, ta.W)
    tok_a, lens_a2 = NP._addr_tokenize(addrs)
    Wd = raw_a.shape[1]
    E_da = NP._addr_features(tok_a, lens_a2)[:, :Wd, :] @ ta.W
    assert np.allclose(E_fa, E_da, rtol=1e-4, atol=1e-4)


def test_crf_recordlink_officers_end_to_end(spark):
    """The reference's extended-variables/officers.py workflow: link two
    person-record sources whose names and addresses are rendered in
    DIFFERENT surface forms (comma order, honorific + LAST FIRST MIDDLE,
    nicknames, suffixes, street-type abbreviation + unit-marker variants)
    with a RecordLink model built on CRF name/address variables."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparklink import blocking as B
    from sparklink.linkage import SparkRecordLink

    rng = np.random.default_rng(5)
    given = sorted(set(NP._GIVEN) - set(NP._SURNAME))
    sur = sorted(set(NP._SURNAME) - set(NP._GIVEN))
    nick_rev = {}  # canonical -> one diminutive
    from sparklink.score import _NICKNAMES

    for k, v in _NICKNAMES.items():
        nick_rev.setdefault(v, k)
    rows, truth = [], []
    n_ent = 50
    for i in range(n_ent):
        first, last = given[i * 3 % len(given)], sur[i * 5 % len(sur)]
        mi = chr(97 + i % 26)
        number = 100 + i
        street = NP._STREET_WORDS[i % len(NP._STREET_WORDS)]
        unit = (i % 4 == 0) and str(i % 9 + 1) or None
        a_addr = f"{number} {street} st" + (f" apt {unit}" if unit else "")
        b_addr = f"{number} {street} street" + (f" unit {unit}" if unit else "")
        rows.append((f"a{i}", "a", f"{first} {last}", a_addr))
        b_name = [
            f"dr {last} {first} {mi}",          # adversarial ordering
            f"{last}, {first} {mi}",            # comma form
            f"{nick_rev.get(first, first)} {last}",  # diminutive
            f"{first} {mi} {last} jr",          # suffix
        ][i % 4]
        rows.append((f"b{i}", "b", b_name, b_addr))
        truth.append((f"a{i}", f"b{i}"))
    # unmatched distractors on each side
    for j in range(8):
        i = n_ent + j
        rows.append(
            (f"a{i}", "a", f"{given[(i * 7 + 1) % len(given)]} {sur[(i * 11 + 3) % len(sur)]}",
             f"{900 + j} {NP._STREET_WORDS[(i + 5) % len(NP._STREET_WORDS)]} rd")
        )
        rows.append(
            (f"b{i+100}", "b", f"{given[(i * 13 + 2) % len(given)]} {sur[(i * 17 + 7) % len(sur)]}",
             f"{950 + j} {NP._STREET_WORDS[(i + 9) % len(NP._STREET_WORDS)]} ln")
        )
    records = spark.createDataFrame(rows, "conv_id string, source string, name string, addr string").cache()
    # labeled pairs: 30 positives + negatives from shuffled misalignment
    lab = [(f"a{i}", f"b{i}", True) for i in range(30)]
    lab += [(f"a{i}", f"b{(i + 7) % n_ent}", False) for i in range(30)]
    lab += [(f"a{i}", f"b{(i + 13) % n_ent}", False) for i in range(20)]
    labeled = spark.createDataFrame(lab, "conv_id_a string, conv_id_b string, label boolean")
    model = FieldModel(
        variables=[
            Variable("name", "name", has_missing=False, parser="crf"),
            Variable("addr", "address", has_missing=False, parser="crf"),
        ]
    )
    preds = [
        B.Predicate("tok(name)", "name", B.token_field),
        B.Predicate("ints(addr)", "addr", B.common_integers),
    ]
    rl = SparkRecordLink(model=model, predicates=preds)
    rl.fit(records, labeled)
    left = records.filter(F.col("source") == "a").drop("source")
    right = records.filter(F.col("source") == "b").drop("source")
    matches = {(r.id_a, r.id_b) for r in rl.join(left, right).collect()}
    tp = len(matches & set(truth))
    precision = tp / len(matches) if matches else 0.0
    recall = tp / len(truth)
    f1 = 2 * precision * recall / (precision + recall) if tp else 0.0
    assert f1 >= 0.95, (precision, recall, f1, sorted(set(truth) - matches)[:5])


def test_tagger_training_is_deterministic():
    NP.name_tagger.cache_clear()
    t1 = NP.name_tagger()
    NP.name_tagger.cache_clear()
    t2 = NP.name_tagger()
    assert (t1.W == t2.W).all() and (t1.T == t2.T).all()
