"""End-to-end pipelines: Dedupe / RecordLink facades (SURVEY §2.7-2.8).

``SparkDedupe`` mirrors the reference lifecycle
(csv_example/csv_example.py:90-180):
  canonicalize (readData+preProcess) -> fit from labeled pairs (replaces
  console_label+train) -> blocking_map -> candidate pairs -> hydrate ->
  distances -> score -> threshold -> connected components -> entity_map.

Every stage can route through a checkpoints.Catalog for resumability; the
default transcript field model compares the canonical conversation surface
(conv_text affine-gap, first_user_text Jaro-Winkler, tools Jaccard,
n_turns relative diff, conv_text TF-IDF cosine).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklink import blocking as B
from sparklink import distances as D
from sparklink import pairs as P
from sparklink.canonicalize import canonicalize
from sparklink.checkpoints import Catalog
from sparklink.cluster import entity_map
from sparklink.score import FieldModel, Variable


def default_transcript_model() -> FieldModel:
    return FieldModel(
        variables=[
            Variable("conv_text", "string"),
            Variable("first_user_text", "shortstring"),
            Variable("last_assistant_text", "shortstring"),
            Variable("tools", "jaccard"),
            Variable("n_turns", "relnum", has_missing=False),
            Variable("conv_text", "text", has_missing=False),
        ]
    )


def default_transcript_predicates() -> list[B.Predicate]:
    return [
        B.Predicate("first_tok(first_user_text)", "first_user_text", B.first_token),
        B.Predicate("pre6(first_user_text)", "first_user_text", lambda c: B.first_n_chars(c, 6)),
        B.Predicate("acronym(first_user_text)", "first_user_text", B.sorted_acronym),
        B.Predicate("ints(conv_text)", "conv_text", B.common_integers),
    ]


@dataclass
class SparkDedupe:
    model: FieldModel = field(default_factory=default_transcript_model)
    predicates: list[B.Predicate] = field(default_factory=default_transcript_predicates)
    use_canopy: bool = True
    use_minhash: bool = True
    max_block_size: int = 200
    threshold: float = 0.5
    catalog: Catalog | None = None

    # ---- stages ----------------------------------------------------------
    def _stage(self, name: str, params: dict, thunk, partition_by=None) -> DataFrame:
        if self.catalog is None:
            return thunk()
        return self.catalog.stage(name, params, thunk, partition_by=partition_by)

    def canonical_records(self, transcripts: DataFrame) -> DataFrame:
        return self._stage("records", {"stage": "canonicalize"}, lambda: canonicalize(transcripts))

    def blocking_map(self, records: DataFrame) -> DataFrame:
        def thunk():
            bm = B.build_blocking_map(records, self.predicates)
            if self.use_canopy:
                bm = bm.unionByName(B.tfidf_canopy_keys(records, "conv_text", top_m=4))
            if self.use_minhash:
                # recall backstop: hard-noised members can lose first-turn
                # tokens entirely, defeating prefix/token predicates, and
                # canopy keys of common tokens die at the block cap;
                # minhash bands key on whole-text similarity instead
                # (measured: blocking recall .94 -> ~.99 on the bench corpus)
                bm = bm.unionByName(B.minhash_band_keys(records, "conv_text"))
            return B.cap_block_sizes(bm, self.max_block_size)

        return self._stage(
            "blocking_map",
            {
                "preds": [p.pid for p in self.predicates],
                "canopy": self.use_canopy,
                "minhash": self.use_minhash,
                "cap": self.max_block_size,
            },
            thunk,
        )

    def _pair_features(self, records: DataFrame, pairs: DataFrame) -> DataFrame:
        """pairs(id_a, id_b[, label]) -> + all model distance columns.

        One hydration join per side carrying (a) 64-char prefixes for the
        string kernels (full text never crosses the shuffle) and (b) top-m
        tf-idf token-hash/weight arrays for Text comparators, whose cosine
        is a per-row Arrow-batched sparse dot — no pairs-x-tokens shuffle.
        """
        from sparklink.score import sparse_dot_udf

        fields = sorted({v.column for v in self.model.variables if v.kind != "text"})
        string_cols = {v.column for v in self.model.variables if v.kind in ("string", "shortstring", "levenshtein")}
        slim = records.select(
            "conv_id",
            *[(F.substring(F.col(f), 1, 64).alias(f) if f in string_cols else F.col(f)) for f in fields],
        )
        # AQE coalesces by bytes; candidate pairs are byte-slim but
        # CPU-heavy downstream (DP kernels). Re-spread to full parallelism
        # so the scorer UDF stage uses every core — a ~MB shuffle buying a
        # 32x compute fan-out (same reasoning holds on a real cluster).
        sc = records.sparkSession.sparkContext
        pairs = pairs.repartition(sc.defaultParallelism * 2, "id_a", "id_b")
        text_vars = [v for v in self.model.variables if v.kind == "text"]
        vec_fields = []
        for v in text_vars:
            vecs = D.tfidf_token_arrays(records, v.column)
            slim = slim.join(
                vecs.withColumnRenamed("record_id", "conv_id")
                .withColumnRenamed("tfh", f"tfh_{v.column}")
                .withColumnRenamed("tfw", f"tfw_{v.column}"),
                "conv_id",
                "left",
            )
            vec_fields += [f"tfh_{v.column}", f"tfw_{v.column}"]
        hyd = P.hydrate(pairs, slim, fields + vec_fields)
        withd = self.model.distance_frame(hyd)
        for v in text_vars:
            withd = withd.withColumn(
                v.dist_col,
                sparse_dot_udf(
                    F.col(f"tfh_{v.column}_a"),
                    F.col(f"tfw_{v.column}_a"),
                    F.col(f"tfh_{v.column}_b"),
                    F.col(f"tfw_{v.column}_b"),
                ),
            )
        return withd

    def scored_pairs(self, records: DataFrame, bm: DataFrame) -> DataFrame:
        def thunk():
            cand = P.candidate_pairs(bm)
            withd = self._pair_features(records, cand)
            return self.model.score(withd).select("id_a", "id_b", *self.model.feature_cols(), "score")

        return self._stage("scored_pairs", {"model": self.model.to_json()}, thunk)

    def fit(self, records: DataFrame, labeled_pairs: DataFrame, recall_weight: float = 1.0) -> None:
        """Fit LR weights from labeled pairs (FIXTURES.md §4; replaces the
        interactive console_label loop, csv_example/csv_example.py:130),
        then pick the F-beta-optimal decision threshold from the labeled
        score distribution (≙ gazetteer.threshold, recall_weight semantics,
        gazetteer_example/gazetteer_postgres_example.py:303)."""
        import numpy as np

        from sparklink.score import select_threshold

        pairs = labeled_pairs.select(F.col("conv_id_a").alias("id_a"), F.col("conv_id_b").alias("id_b"), "label")
        withd = self._pair_features(records, pairs)
        feats: pd.DataFrame = withd.select("label", *self.model.feature_cols()).toPandas()
        self.model.fit(feats)
        probs = self.model.predict_proba(feats)
        self.threshold = select_threshold(probs, feats["label"].to_numpy(), recall_weight=recall_weight)

    def partition(self, transcripts: DataFrame) -> DataFrame:
        """The fused pipeline (≙ deduper.partition(data, 0.5),
        csv_example/csv_example.py:152) -> entity_map DataFrame."""
        records = self.canonical_records(transcripts)
        bm = self.blocking_map(records)
        scored = self.scored_pairs(records, bm)
        return self._stage(
            "entity_map",
            {"threshold": self.threshold, "model": self.model.to_json()},
            lambda: entity_map(scored, records, threshold=self.threshold),
        )
