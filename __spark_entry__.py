"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full entity-resolution pipeline (canonicalize ->
                block -> pair -> score -> connected components -> entity_map)
                over transcripts derived from sf0.001 documents, scored by a
                static field model (the StaticDedupe path,
                csv_example/csv_example.py:94-97).
queries()     — one entry per implemented operator (SURVEY.md §2 + the
                training-data ops); see sparklink/queries.py.
oracle_sql()  — DuckDB-equivalent SQL for EVERY query: minhash /
                simhash / winnowing run with the engine-portable hash
                (sparklink/portable.py), ANN LSH/IVF use deterministic
                data-derived planes/centroids, multimodal derives its
                media table from the documents corpus — all exactly
                replicable in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F

    from sparklink.cluster import entity_map
    from sparklink.queries import ER_PREDICATES, er_records
    from sparklink.blocking import build_blocking_map, cap_block_sizes
    from sparklink.pairs import candidate_pairs, hydrate
    from sparklink.score import FieldModel, Variable
    import numpy as np

    sf_dir = "/root/testdata/sf0.001"
    records = er_records(spark, sf_dir)
    bm = cap_block_sizes(build_blocking_map(records, ER_PREDICATES), 200)
    pairs = candidate_pairs(bm)
    model = FieldModel(
        variables=[
            Variable("conv_text", "string", has_missing=False),
            Variable("first_user_text", "shortstring", has_missing=False),
            Variable("n_turns", "relnum", has_missing=False),
        ]
    )
    # static hand weights: near-identical conversations cluster, others don't
    model.weights = np.array([9.0, 3.0, -2.0])
    model.bias = -8.0
    hyd = hydrate(pairs, records, ["conv_text", "first_user_text", "n_turns"])
    scored = model.score(model.distance_frame(hyd)).select("id_a", "id_b", "score")
    return entity_map(scored, records, threshold=0.5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparklink.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparklink.queries import ORACLES

    return dict(ORACLES)
