"""Predicate learning: recall-constrained greedy cover (SURVEY §2.7).

≙ ``deduper.train(recall=0.90)``'s blocking half
(mysql_example/mysql_example.py:169-174 [lib], the Bilenko/Kamath/Mooney
2006 adaptive-blocking idea): from a catalog of candidate predicates, pick
a small set whose union covers >= ``recall`` of the labeled positive pairs
while minimizing the candidate-pair volume it would generate on the full
dataset.

Two DataFrame jobs produce everything the greedy loop needs:
  1. coverage: per predicate, which labeled pairs share >= 1 key
     (one blocking-map build over the labeled records + self-join per key);
  2. cost: per predicate, sum over its blocks of C(n,2) on the FULL record
     set (the pair volume the predicate commits the candidate join to).
The greedy itself runs on the driver over a (|labeled_pairs| x |preds|)
boolean matrix — tiny (reference labeled sets are 300..15k pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklink.blocking import Predicate, build_blocking_map


def coverage_frame(records: DataFrame, predicates: list[Predicate], labeled_pairs: DataFrame) -> DataFrame:
    """(pid, id_a, id_b) — labeled pairs covered by each predicate."""
    ids = labeled_pairs.select(F.col("conv_id_a").alias("conv_id")).union(
        labeled_pairs.select(F.col("conv_id_b"))
    ).distinct()
    sub = records.join(ids, "conv_id", "left_semi")
    bm = build_blocking_map(sub, predicates)
    bm = bm.withColumn("pid", F.split(F.col("block_key"), ":", 2)[0])
    l = bm.select("pid", "block_key", F.col("record_id").alias("id_a"))
    r = bm.select("pid", "block_key", F.col("record_id").alias("id_b"))
    covered = (
        l.join(r, ["pid", "block_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("pid", "id_a", "id_b")
        .dropDuplicates()
    )
    lp = labeled_pairs.select(F.col("conv_id_a").alias("id_a"), F.col("conv_id_b").alias("id_b"))
    return covered.join(lp, ["id_a", "id_b"], "left_semi")


def predicate_costs(records: DataFrame, predicates: list[Predicate], max_block_size: int = 200) -> dict[str, int]:
    """pid -> sum over blocks of C(n,2) after the block-size cap (the pair
    volume the candidate self-join would produce)."""
    bm = build_blocking_map(records, predicates)
    bm = bm.withColumn("pid", F.split(F.col("block_key"), ":", 2)[0])
    sizes = bm.groupBy("pid", "block_key").agg(F.count("*").alias("n")).filter(F.col("n") <= max_block_size)
    costs = sizes.groupBy("pid").agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cost")).collect()
    return {row["pid"]: int(row["cost"]) for row in costs}


def learn_predicates(
    records: DataFrame,
    candidate_predicates: list[Predicate],
    labeled_pairs: DataFrame,
    recall: float = 0.9,
    max_predicates: int = 4,
    max_block_size: int = 200,
) -> tuple[list[Predicate], dict]:
    """Greedy recall-constrained cover; returns (selected, report).

    Greedy criterion: maximize newly-covered positive pairs per unit
    estimated cost (epsilon-smoothed), stop when recall target met or
    catalog/max_predicates exhausted.
    """
    pos = labeled_pairs.filter(F.col("label"))
    pos_pairs = {(r["conv_id_a"], r["conv_id_b"]) for r in pos.collect()}
    if not pos_pairs:
        raise ValueError("no positive labeled pairs")
    cov_rows = coverage_frame(records, candidate_predicates, pos.select("conv_id_a", "conv_id_b")).collect()
    by_pid: dict[str, set] = {p.pid: set() for p in candidate_predicates}
    for r in cov_rows:
        if (r["id_a"], r["id_b"]) in pos_pairs:
            by_pid.setdefault(r["pid"], set()).add((r["id_a"], r["id_b"]))
    costs = predicate_costs(records, candidate_predicates, max_block_size=max_block_size)
    selected: list[Predicate] = []
    covered: set = set()
    target = recall * len(pos_pairs)
    pool = {p.pid: p for p in candidate_predicates}
    while len(covered) < target and pool and len(selected) < max_predicates:
        best_pid, best_gain = None, -1.0
        for pid in pool:
            new = len(by_pid.get(pid, set()) - covered)
            gain = new / (1.0 + costs.get(pid, 0) ** 0.5)
            if new > 0 and gain > best_gain:
                best_pid, best_gain = pid, gain
        if best_pid is None:
            break
        selected.append(pool.pop(best_pid))
        covered |= by_pid.get(best_pid, set())
    report = {
        "achieved_recall": len(covered) / len(pos_pairs),
        "target_recall": recall,
        "selected": [p.pid for p in selected],
        "per_predicate_recall": {pid: len(s) / len(pos_pairs) for pid, s in by_pid.items()},
        "per_predicate_cost": costs,
    }
    return selected, report
