"""Pairwise precision / recall / F1 evaluation (SURVEY §2.9).

Protocol of ``csv_example/csv_evaluation.py``: expand predicted and true
clusters to unordered pair sets (self-join of membership with id_a < id_b,
the DataFrame form of ``itertools.combinations``,
csv_evaluation.py:31-37), drop records labeled "x" (unlabeled,
csv_evaluation.py:28-29), then
    precision = 1 - |found - true| / |found|   (csv_evaluation.py:6-10)
    recall    = |found ∩ true| / |true|        (csv_evaluation.py:13-17)
plus F1 (the BASELINE.json metric). Optionally restricted to pairs sharing
a blocking key ("at shared blocking keys", BASELINE.json metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pairs(membership: DataFrame, id_col: str, cluster_col: str) -> DataFrame:
    """membership -> all unordered within-cluster pairs (id_a < id_b)."""
    a = membership.select(F.col(cluster_col).alias("_c"), F.col(id_col).alias("id_a"))
    b = membership.select(F.col(cluster_col).alias("_c"), F.col(id_col).alias("id_b"))
    return a.join(b, "_c").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()


def pairwise_prf(
    predicted: DataFrame,
    truth: DataFrame,
    restrict_to: DataFrame | None = None,
    id_col: str = "record_id",
    pred_cluster_col: str = "canon_id",
    truth_id_col: str = "conv_id",
    truth_cluster_col: str = "true_entity_id",
) -> dict:
    """predicted(record_id, canon_id) vs truth(conv_id, true_entity_id).

    Records with true_entity_id == 'x' are excluded entirely (both sides).
    restrict_to: optional (id_a, id_b) DataFrame (e.g. candidate pairs at
    shared blocking keys) intersected into both pair sets.
    """
    labeled = truth.filter(F.col(truth_cluster_col) != "x").select(
        F.col(truth_id_col).alias("record_id"), F.col(truth_cluster_col).alias("true_id")
    )
    pred_m = predicted.select(F.col(id_col).alias("record_id"), F.col(pred_cluster_col).alias("cid")).join(
        labeled.select("record_id"), "record_id"
    )
    found = cluster_pairs(pred_m, "record_id", "cid")
    true = cluster_pairs(labeled, "record_id", "true_id")
    if restrict_to is not None:
        r = restrict_to.select("id_a", "id_b").distinct()
        found = found.join(r, ["id_a", "id_b"], "inner")
        true = true.join(r, ["id_a", "id_b"], "inner")
    # three actions read found/true: materialize once (small id-pair
    # frames), not once per count
    found = found.persist()
    true = true.persist()
    n_found = found.count()
    n_true = true.count()
    n_tp = found.join(true, ["id_a", "id_b"], "inner").count()
    found.unpersist()
    true.unpersist()
    precision = n_tp / n_found if n_found else 1.0
    recall = n_tp / n_true if n_true else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "found_pairs": n_found,
        "true_pairs": n_true,
        "true_positives": n_tp,
    }
