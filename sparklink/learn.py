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


def sample_training_pairs(
    records: DataFrame,
    predicates: list[Predicate],
    n_random: int = 500,
    n_blocked: int = 500,
    seed: int = 42,
    id_col: str = "conv_id",
) -> DataFrame:
    """≙ prepare_training's random + blocked candidate sampling
    (csv_example/csv_example.py:115-120 [lib]): returns unlabeled
    (conv_id_a, conv_id_b) pairs — random pairs teach the classifier what
    'obviously distinct' looks like, blocked pairs supply the near-misses.
    Deterministic via seeded sample/hash ordering."""
    spark = records.sparkSession
    # random pairs: seeded hash-ordered sample, paired consecutively on the
    # driver (sample size is a few hundred, like the reference's
    # prepare_training sample)
    sampled = [
        r[0]
        for r in records.select(F.col(id_col))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_random * 2)
        .collect()
    ]
    rp = [tuple(sorted((sampled[2 * i], sampled[2 * i + 1]))) for i in range(len(sampled) // 2)]
    rp = [(a_, b_) for a_, b_ in rp if a_ != b_]
    random_pairs = spark.createDataFrame(rp or [("", "")], "conv_id_a string, conv_id_b string").filter(
        F.col("conv_id_a") != ""
    )
    bm = build_blocking_map(records, predicates)
    l = bm.select("block_key", F.col("record_id").alias("conv_id_a"))
    r = bm.select("block_key", F.col("record_id").alias("conv_id_b"))
    blocked = (
        l.join(r, "block_key")
        .filter(F.col("conv_id_a") < F.col("conv_id_b"))
        .select("conv_id_a", "conv_id_b")
        .dropDuplicates()
        .orderBy(F.xxhash64("conv_id_a", "conv_id_b"))  # deterministic pseudo-shuffle
        .limit(n_blocked)
    )
    return random_pairs.unionByName(blocked).dropDuplicates()


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


class StopLabeling(Exception):
    """Raised by a labeler to end the active-learning session early —
    the 'f'(inished) key of the reference's console_label
    (csv_example/csv_example.py:130 [lib])."""


def console_labeler(fields: list[str], input_fn=input, output=print):
    """Interactive labeler for ``SparkDedupe.label_session`` — the
    console_label UX (csv_example/csv_example.py:130 [lib]): each
    candidate pair's field values are printed side by side and the user
    answers y(es) / n(o) / u(nsure) / f(inished).

    Returns labeler(batch_pd) -> list[bool|None]; raises StopLabeling on
    'f' (already-collected answers in the batch are kept by the session).
    """

    def labeler(batch):
        out: list[bool | None] = []
        for _, row in batch.iterrows():
            output("")
            for f_ in fields:
                output(f"{f_}:")
                output(f"  a: {row.get(f_ + '_a')}")
                output(f"  b: {row.get(f_ + '_b')}")
            while True:
                ans = input_fn("Do these records refer to the same thing? (y)es / (n)o / (u)nsure / (f)inished: ").strip().lower()
                if ans in ("y", "n", "u"):
                    out.append({"y": True, "n": False, "u": None}[ans])
                    break
                if ans == "f":
                    # partial answers travel on the exception; the session
                    # keeps them before ending
                    raise StopLabeling(out)
        return out

    return labeler


def file_labeler(answers: dict[tuple[str, str], bool] | str):
    """Batch-mode labeler: answers is {(id_a, id_b): bool} or a CSV path
    with header conv_id_a,conv_id_b,label. Pairs absent from the table are
    labeled None (skipped) — the workflow where a labeling team fills a
    spreadsheet between runs, replacing the reference's live console."""
    if isinstance(answers, str):
        table: dict[tuple[str, str], bool] = {}
        with open(answers) as f:
            header = f.readline()
            assert header.strip(), "empty labels file"
            for line in f:
                parts = [p.strip() for p in line.strip().split(",")]
                if len(parts) < 3 or not parts[0]:
                    continue
                table[(parts[0], parts[1])] = parts[2].lower() in ("1", "true", "t", "y", "yes")
        answers = table

    def labeler(batch):
        return [
            answers.get((row["id_a"], row["id_b"]), answers.get((row["id_b"], row["id_a"])))
            for _, row in batch.iterrows()
        ]

    return labeler


def most_uncertain(scored_pairs: DataFrame, n: int = 10) -> DataFrame:
    """The n candidate pairs the current model is LEAST sure about —
    uncertainty sampling, the heart of the reference's console_label
    active-learning loop (csv_example/csv_example.py:130 [lib]: dedupe
    surfaces the pair whose match probability is closest to 0.5 for the
    human to label). Batch-incremental workflow: score a sample, label
    these n pairs, append to the labeled set, refit.

    Deterministic: |score - 0.5| asc with (id_a, id_b) tiebreaks; a single
    TakeOrderedAndProject — no full sort of the scored frame."""
    return (
        scored_pairs.select("id_a", "id_b", "score")
        .withColumn("uncertainty", F.abs(F.col("score") - 0.5))
        .orderBy(F.asc("uncertainty"), F.asc("id_a"), F.asc("id_b"))
        .limit(n)
    )
