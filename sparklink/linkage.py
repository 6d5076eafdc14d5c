"""RecordLink and Gazetteer modes (SURVEY §2.8).

SparkRecordLink — link two clean sources; only cross-source pairs are
compared (``linker.join(data_1, data_2, 0.0)``,
record_linkage_example/record_linkage_example.py:167): blocked cross join,
scored like dedupe, then greedy one-to-one-ish matching via mutual-rank-1
(the dedupe RecordLink clustering convention [lib]).

SparkGazetteer — incremental match of messy records against a canonical
index (gazetteer_example): persisted blocking index over the canonical
side, ``search(messy, n_matches)`` = blocked join + window top-n,
``match(threshold)`` = rank-1 above threshold
(gazetteer_example/gazetteer_postgres_example.py:303-309), plus the
write-back sinks (MERGE-equivalent update + insert-unmatched,
gazetteer_example/gazetteer_postgres_example.py:313-345).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparklink import blocking as B
from sparklink import pairs as P
from sparklink.canonicalize import canonicalize
from sparklink.pipeline import SparkDedupe, default_transcript_model, default_transcript_predicates
from sparklink.score import FieldModel


@dataclass
class SparkRecordLink:
    """Two-source linkage over canonicalized transcript records."""

    model: FieldModel = field(default_factory=default_transcript_model)
    predicates: list[B.Predicate] = field(default_factory=default_transcript_predicates)
    threshold: float = 0.0
    max_block_size: int = 200

    def _dd(self) -> SparkDedupe:
        return SparkDedupe(model=self.model, predicates=self.predicates, threshold=self.threshold)

    def canonical(self, transcripts: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
        return canonicalize(transcripts, extra_cols=extra_cols)

    def fit(self, records_all: DataFrame, labeled_pairs: DataFrame, recall_weight: float = 1.0) -> None:
        dd = self._dd()
        dd.fit(records_all, labeled_pairs, recall_weight=recall_weight)
        self.threshold = dd.threshold

    def scored_cross_pairs(self, left: DataFrame, right: DataFrame) -> DataFrame:
        """Cross-source candidate pairs + scores (never within-source)."""
        bm_l = B.cap_block_sizes(B.build_blocking_map(left, self.predicates), self.max_block_size)
        bm_r = B.cap_block_sizes(B.build_blocking_map(right, self.predicates), self.max_block_size)
        cand = P.candidate_pairs_cross(bm_l, bm_r)
        # hydrate each side from its own source (ids may collide across
        # sources; _pair_features_two applies internal per-source prefixes,
        # the synthetic-id trick of record_linkage_example.py:54-60, so a
        # shared id hydrates as left-row vs right-row — never contaminated)
        dd = self._dd()
        withd = dd._pair_features_two(left, right, cand)
        return dd.model.score(withd).select("id_a", "id_b", *dd.model.feature_cols(), "score")

    @staticmethod
    def one_to_one(scored: DataFrame, threshold: float = 0.0) -> DataFrame:
        """Greedy one-to-one matching: keep pairs that are rank-1 for BOTH
        sides (mutual best), score >= threshold. The Spark form of dedupe's
        greedy RecordLink matching [lib]; mutual-rank-1 is deterministic
        with (score desc, id) tiebreaks and removes the driver-side greedy
        loop.
        """
        wl = Window.partitionBy("id_a").orderBy(F.desc("score"), F.asc("id_b"))
        wr = Window.partitionBy("id_b").orderBy(F.desc("score"), F.asc("id_a"))
        return (
            scored.filter(F.col("score") >= threshold)
            .withColumn("rank_a", F.row_number().over(wl))
            .withColumn("rank_b", F.row_number().over(wr))
            .filter((F.col("rank_a") == 1) & (F.col("rank_b") == 1))
            .select("id_a", "id_b", "score")
        )

    def join(self, left: DataFrame, right: DataFrame, threshold: float | None = None) -> DataFrame:
        """≙ linker.join(data_1, data_2, threshold): (id_a, id_b, score)."""
        return self.one_to_one(self.scored_cross_pairs(left, right), threshold if threshold is not None else self.threshold)


@dataclass
class SparkGazetteer:
    """Index canonical records once; search/match messy batches against it.

    r6 cost model (the reference's own: gazetteer_postgres_example.py:58-76
    indexes ONCE, then every daily batch probes the persisted index):
    ``index()`` stages not just the blocking map but the canonical side's
    COMPLETE hydration payload (64-char prefixes + tf-idf arrays) and the
    corpus token statistics (per-token df + corpus size). ``search`` /
    ``match`` then launch no job over the canonical text at all — the
    messy delta is tokenized fresh, weighted against the STAGED index-time
    IDF, and joined to the staged payload. IDF is therefore an index-time
    constant of the canonical corpus (previously it was recomputed over
    union(messy, canonical) per batch — a full-corpus rescan per delta,
    the wrong cost model at 100 TB); a messy token absent from the index
    vocabulary carries no weight, exactly as a gazetteer index that has
    never seen the token.

    ``broadcast_messy=True`` (default) broadcasts the delta batch's
    blocking keys into the candidate join so the index side is never
    shuffled (a daily delta vs a 100 TB index); set False for bulk
    re-matching where the messy side is itself corpus-sized.
    """

    model: FieldModel = field(default_factory=default_transcript_model)
    predicates: list[B.Predicate] = field(default_factory=default_transcript_predicates)
    threshold: float = 0.5
    max_block_size: int = 200
    broadcast_messy: bool = True
    _canonical: DataFrame | None = None
    _index: DataFrame | None = None
    _slim: DataFrame | None = None
    _hyd_fields: list[str] | None = None
    _dfreq: dict | None = None
    _n_docs: int | None = None

    def _dd(self) -> SparkDedupe:
        return SparkDedupe(model=self.model, predicates=self.predicates, threshold=self.threshold)

    def _text_cols(self) -> list[str]:
        return sorted({v.column for v in self.model.variables if v.kind == "text"})

    def index(self, canonical_records: DataFrame, catalog=None) -> None:
        """≙ gazetteer.index(canonical) — build + persist the blocking index
        AND the canonical hydration payload + token statistics. With
        ``catalog`` (checkpoints.Catalog) everything is written as catalog
        tables — the durable ``indexed_records`` store of
        gazetteer_postgres_example.py:58-76 — so a new process calls
        load_index() and searches without touching the canonical corpus."""
        from sparklink import distances as D

        dd = self._dd()
        idx_thunk = lambda: B.cap_block_sizes(  # noqa: E731
            B.build_blocking_map(canonical_records, self.predicates), self.max_block_size
        )

        # ONE persisted (record, token, tf) frame per text column feeds both
        # the staged dfreq and the staged slim payload — the canonical
        # corpus is tokenized/exploded once per column at index build, in
        # the record_id-partitioned layout so the tf aggregate and the
        # vocab collect add no exchange over the corpus (the same shape
        # pipeline._token_stats uses)
        tf_cache: dict[str, DataFrame] = {}

        def tf_for(col: str) -> DataFrame:
            if col not in tf_cache:
                toks_c, t = B.partitioned_token_stats(canonical_records, col)
                tf_cache[col] = t
                tf_cache[f"__toks_{col}"] = toks_c
            return tf_cache[col]

        def dfreq_for(col: str) -> DataFrame:
            return tf_for(col).groupBy("token").agg(F.count("*").alias("df"))

        def slim_thunk() -> DataFrame:
            # reuses the already-staged/persisted dfreq (self._dfreq)
            vecs_by_col = {}
            for col in self._text_cols():
                vocab = B.record_token_vocab(tf_for(col), self._dfreq[col])
                vecs_by_col[col] = D.tfidf_token_arrays_from_vocab(vocab, self._n_docs)
            slim, self._hyd_fields = dd.slim_hydration_frame(canonical_records, vecs_by_col)
            return slim

        self._n_docs = canonical_records.count()
        if catalog is not None:
            from sparklink.pipeline import _input_fingerprint

            # the input fingerprint is part of the stage identity:
            # re-indexing DIFFERENT canonical records under the same
            # predicates must not resume the stale gazetteer tables
            # (r2 ADVICE, mirrored from SparkDedupe.canonical_records)
            params = {
                "preds": [p.pid for p in self.predicates],
                "cap": self.max_block_size,
                "model": self.model.to_json(),
                "input": _input_fingerprint(canonical_records),
            }
            self._canonical = catalog.stage("gazetteer_canonical", params, lambda: canonical_records)
            idx = catalog.stage("gazetteer_index", params, idx_thunk)
            spark = canonical_records.sparkSession
            catalog.stage(
                "gazetteer_meta",
                params,
                lambda: spark.createDataFrame([(int(self._n_docs),)], "n_docs bigint"),
            )
            self._dfreq = {}
            for col in self._text_cols():
                self._dfreq[col] = catalog.stage(f"gazetteer_dfreq_{col}", params, lambda c=col: dfreq_for(c))
            slim = catalog.stage("gazetteer_slim", params, slim_thunk)
            # the staged slim table's column list IS the hydration field
            # list (minus the id) — recover it so load_index() in a fresh
            # process needs no recomputation
            self._hyd_fields = [c for c in slim.columns if c != "conv_id"]
        else:
            # the canonical records stay referenced only for API
            # back-compat — the probe path reads ONLY the staged/persisted
            # index, slim payload and token stats below, so the records
            # themselves are no longer cached (at a 341k-record corpus the
            # old cache fill alone cost ~10s and held GBs for nothing)
            self._canonical = canonical_records
            self._own_canonical = False
            idx = idx_thunk()
            self._dfreq = {}
            for col in self._text_cols():
                d = dfreq_for(col).persist()
                d.count()
                self._dfreq[col] = d
            slim = slim_thunk().persist()
            slim.count()
        self._slim = slim
        self._index = idx.persist()
        self._index.count()
        for t in tf_cache.values():
            t.unpersist()

    def load_index(self, catalog) -> None:
        """Resume a previously indexed gazetteer from the catalog (new
        process, no re-blocking, no canonical-corpus scan — the
        incremental-matching workflow the reference runs against its
        indexed_records table)."""
        self._canonical = catalog.load("gazetteer_canonical")
        self._index = catalog.load("gazetteer_index").persist()
        self._index.count()
        self._slim = catalog.load("gazetteer_slim")
        self._hyd_fields = [c for c in self._slim.columns if c != "conv_id"]
        self._n_docs = int(catalog.load("gazetteer_meta").collect()[0]["n_docs"])
        self._dfreq = {col: catalog.load(f"gazetteer_dfreq_{col}") for col in self._text_cols()}

    def unindex(self) -> None:
        if self._index is not None:
            self._index.unpersist()
            self._index = None
        for d in (self._dfreq or {}).values():
            d.unpersist()
        self._dfreq = None
        if self._slim is not None:
            self._slim.unpersist()
            self._slim = None
        if getattr(self, "_own_canonical", False) and self._canonical is not None:
            self._canonical.unpersist()
            self._own_canonical = False

    def _scored(self, messy_records: DataFrame) -> DataFrame:
        from sparklink import distances as D

        assert self._index is not None, "call index(canonical) first"
        bm_messy = B.cap_block_sizes(B.build_blocking_map(messy_records, self.predicates), self.max_block_size)
        if self.broadcast_messy:
            # the messy side is a delta batch probing a (potentially
            # 100 TB) index: broadcast its keys so the index is never
            # shuffled by the candidate join (guide §3.1)
            bm_messy = F.broadcast(bm_messy)
        cand = (
            bm_messy.withColumnRenamed("record_id", "id_a")
            .join(self._index.withColumnRenamed("record_id", "id_b"), "block_key")
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        dd = self._dd()
        # messy-side payload only: fresh tf over the delta, weighted by the
        # STAGED canonical df / corpus size — no canonical-side job
        vecs_by_col = {
            col: D.tfidf_token_arrays_from_stats(
                B.token_stats(messy_records, col)[1], self._dfreq[col], self._n_docs
            )
            for col in self._text_cols()
        }
        slim_m, fields_m = dd.slim_hydration_frame(messy_records, vecs_by_col)
        assert self._hyd_fields is not None and fields_m == self._hyd_fields, (
            f"staged index hydration fields {self._hyd_fields} do not match this "
            f"model's layout {fields_m} — re-index with the current model"
        )
        hyd = P.hydrate_two(cand, slim_m, self._slim, self._hyd_fields)
        withd = dd._features_from_hydrated(hyd)
        return dd.model.score(withd).select("id_a", "id_b", "score")

    def search(self, messy_records: DataFrame, n_matches: int = 2) -> DataFrame:
        """≙ gazetteer.search(messy, n_matches) — top-n canonical matches per
        messy record (gazetteer_example/gazetteer_example.py:159).
        Returns (messy_id, canonical_id, score, rank)."""
        w = Window.partitionBy("id_a").orderBy(F.desc("score"), F.asc("id_b"))
        return (
            self._scored(messy_records)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_matches)
            .select(
                F.col("id_a").alias("messy_id"), F.col("id_b").alias("canonical_id"), "score", "rank"
            )
        )

    def match(self, messy_records: DataFrame, threshold: float | None = None) -> DataFrame:
        """≙ gazetteer.match — best match above threshold
        (gazetteer_postgres_example.py:309). (messy_id, canonical_id, score)."""
        t = self.threshold if threshold is None else threshold
        return (
            self.search(messy_records, n_matches=1)
            .filter(F.col("score") >= t)
            .select("messy_id", "canonical_id", "score")
        )

    def apply_matches(self, messy_records: DataFrame, matches: DataFrame) -> tuple[DataFrame, DataFrame]:
        """The write-back pair of gazetteer_postgres_example.py:313-345:
        (updated, unmatched). ``updated`` = messy records + canonical_id
        (MERGE-shaped left join); ``unmatched`` = anti-join, the rows the
        reference INSERTs into the gazetteer."""
        m = matches.select(F.col("messy_id").alias("conv_id"), "canonical_id", F.col("score").alias("link_score"))
        updated = messy_records.join(m, "conv_id", "left")
        unmatched = messy_records.join(m.select("conv_id"), "conv_id", "left_anti")
        return updated, unmatched

    @staticmethod
    def merge_matches_sql(target_table: str, updates_view: str = "gaz_matches") -> str:
        """The MERGE statement equivalent of the reference's UPDATE
        write-back (gazetteer_postgres_example.py:313-326), executable
        against any MERGE-capable catalog table (Iceberg/Delta)."""
        return (
            f"MERGE INTO {target_table} t USING {updates_view} u ON t.conv_id = u.conv_id "
            "WHEN MATCHED THEN UPDATE SET t.canonical_id = u.canonical_id, t.link_score = u.link_score"
        )

    def merge_matches(self, target_table: str, matches: DataFrame) -> None:
        """Execute the MERGE write-back against an Iceberg/Delta table.
        Requires a MERGE-capable catalog (not available in the jar-less
        sandbox — apply_matches returns the equivalent join frames there;
        the statement itself is unit-tested for shape)."""
        m = matches.select(
            F.col("messy_id").alias("conv_id"), "canonical_id", F.col("score").alias("link_score")
        )
        m.createOrReplaceTempView("gaz_matches")
        m.sparkSession.sql(self.merge_matches_sql(target_table))
