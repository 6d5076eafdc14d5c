"""MIGRATING.md is an API contract: every name the migration guide tells
a dedupe-examples user to call must exist with the documented shape.
Pure import/introspection — no Spark session — so doc rot fails fast.
"""

import inspect


def test_documented_migration_surface_exists():
    # (module, attribute) for every sparklink call named in MIGRATING.md
    surface = [
        ("sparklink.pipeline", "SparkDedupe"),
        ("sparklink.pipeline", "default_transcript_model"),
        ("sparklink.canonicalize", "canonicalize"),
        ("sparklink.sources", "read_csv_repair"),
        ("sparklink.preprocess", "clean_text"),
        ("sparklink.preprocess", "set_field"),
        ("sparklink.preprocess", "parse_price"),
        ("sparklink.preprocess", "null_if_zero_latlong"),
        ("sparklink.score", "FieldModel"),
        ("sparklink.score", "Variable"),
        ("sparklink.score", "select_threshold"),
        ("sparklink.learn", "sample_training_pairs"),
        ("sparklink.learn", "console_labeler"),
        ("sparklink.learn", "file_labeler"),
        ("sparklink.learn", "learn_predicates"),
        ("sparklink.learn", "most_uncertain"),
        ("sparklink.cluster", "entity_map"),
        ("sparklink.sinks", "clustered_output"),
        ("sparklink.sinks", "linked_output"),
        ("sparklink.sinks", "write_csv"),
        ("sparklink.evaluate", "pairwise_prf"),
        ("sparklink.evaluate", "cluster_pairs"),
        ("sparklink.linkage", "SparkRecordLink"),
        ("sparklink.linkage", "SparkGazetteer"),
        ("sparklink.streaming", "stream_match_new"),
        ("sparklink.checkpoints", "Catalog"),
    ]
    for mod_name, attr in surface:
        mod = __import__(mod_name, fromlist=[attr])
        assert hasattr(mod, attr), f"MIGRATING.md names {mod_name}.{attr}, which no longer exists"

    # methods the guide shows being called on the facade classes
    from sparklink.linkage import SparkGazetteer, SparkRecordLink
    from sparklink.pipeline import SparkDedupe
    from sparklink.score import FieldModel

    for cls, methods in [
        (SparkDedupe, ["canonical_records", "blocking_map", "scored_pairs", "fit",
                       "label_session", "partition", "match_new"]),
        (SparkRecordLink, ["fit", "join", "one_to_one"]),
        (SparkGazetteer, ["index", "load_index", "unindex", "search", "match",
                          "apply_matches", "merge_matches"]),
        (FieldModel, ["to_json", "from_json", "fit", "predict_proba"]),
    ]:
        for m in methods:
            assert callable(getattr(cls, m, None)), f"MIGRATING.md names {cls.__name__}.{m}"

    # documented keyword arguments
    assert "interactions" in {f.name for f in __import__("dataclasses").fields(FieldModel)}
    sig = inspect.signature(SparkDedupe.label_session)
    for kw in ("labeler", "rounds", "per_round", "recall_weight"):
        assert kw in sig.parameters
    sig = inspect.signature(SparkGazetteer.search)
    assert "n_matches" in sig.parameters

    # documented Variable kinds all dispatch
    from sparklink.score import Variable

    for kind in ("string", "shortstring", "levenshtein", "exact", "jaccard",
                 "price", "relnum", "text", "latlong", "categorical", "name", "address"):
        v = Variable("col", kind)
        assert v.name == f"{kind}(col)"
    for parser in ("regex", "crf"):
        Variable("col", "name", parser=parser)
