"""Predicate learning: greedy recall-constrained cover (SURVEY §2.7)."""

from pyspark.sql import functions as F

from sparklink import blocking as B
from sparklink.learn import learn_predicates, predicate_costs


def _catalog():
    return [
        B.Predicate("first_tok(first_user_text)", "first_user_text", B.first_token),
        B.Predicate("pre6(first_user_text)", "first_user_text", lambda c: B.first_n_chars(c, 6)),
        B.Predicate("acronym(first_user_text)", "first_user_text", B.sorted_acronym),
        B.Predicate("ints(conv_text)", "conv_text", B.common_integers),
        B.Predicate("tok(first_user_text)", "first_user_text", B.token_field),
    ]


def test_learned_predicates_meet_recall(spark, fixture_dfs):
    from sparklink.canonicalize import canonicalize

    transcripts, truth, labeled = fixture_dfs
    records = canonicalize(transcripts).cache()
    selected, report = learn_predicates(records, _catalog(), labeled, recall=0.9)
    assert report["achieved_recall"] >= 0.9, report
    assert 1 <= len(selected) <= 4
    # the cover must actually block the positive pairs it claims: rebuild
    # blocking with selected predicates and check coverage of positives
    from sparklink.blocking import build_blocking_map
    from sparklink.pairs import candidate_pairs

    bm = build_blocking_map(records, selected)
    cands = candidate_pairs(bm)
    pos = labeled.filter(F.col("label")).select(
        F.col("conv_id_a").alias("id_a"), F.col("conv_id_b").alias("id_b")
    )
    covered = pos.join(cands, ["id_a", "id_b"], "left_semi").count()
    assert covered / pos.count() >= 0.9


def test_costs_prefer_selective_predicates(spark):
    rows = [(f"c{i}", "common prefix " + ("x" if i % 2 else "y"), f"uniq{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "conv_id string, first_user_text string, conv_text string")
    preds = [
        B.Predicate("pre6(first_user_text)", "first_user_text", lambda c: B.first_n_chars(c, 6)),
        B.Predicate("whole(conv_text)", "conv_text", B.whole_field),
    ]
    costs = predicate_costs(df, preds)
    assert costs["pre6(first_user_text)"] > costs.get("whole(conv_text)", 0)
