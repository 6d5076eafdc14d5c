"""Blocking: predicate key generation -> inverted (block_key, record_id) map.

The reference's ``deduper.fingerprinter(records)`` emits (block_key, id)
pairs per learned predicate (``mysql_example/mysql_example.py:217-224``;
predicate catalog is the public dedupe ``predicates.py`` family, observed
via ``train()`` at ``csv_example/csv_example.py:134``). Here each predicate
is a pure Column expression producing ``array<string>`` of keys; blocking is

    df.select(id, explode(flatten(array(pred_1, ..., pred_k)))) -> distinct

i.e. one narrow projection + one explode — no Python, no shuffle until the
dedup/candidate join. Keys are namespaced ``"<pid>:<key>"`` so different
predicates never collide (same convention as dedupe's fingerprinter).

Scale controls (BASELINE.json north_rule: "skew handled explicitly"):
- ``cap_block_sizes``: drop or salt oversized blocks before the self-join
  squares them (dedupe drops oversized blocks internally [lib]).
- TF-IDF canopy index predicates are a two-pass DataFrame job (IDF agg ->
  broadcast-join -> per-record top-m tokens), SURVEY.md §2.3.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparklink.preprocess import tokens

# --------------------------------------------------------------------------
# Predicate catalog (dedupe predicates.py family, re-expressed as Columns)
# --------------------------------------------------------------------------


def _nonnull_array(*items: Column) -> Column:
    return F.filter(F.array(*items), lambda x: x.isNotNull() & (x != ""))


def whole_field(col: Column) -> Column:
    return _nonnull_array(col)


def token_field(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def first_token(col: Column) -> Column:
    return _nonnull_array(F.element_at(tokens(col), 1))


def first_two_tokens(col: Column) -> Column:
    return _nonnull_array(F.array_join(F.slice(tokens(col), 1, 2), " "))


def first_n_chars(col: Column, n: int) -> Column:
    return _nonnull_array(F.substring(col, 1, n))


def char_ngrams(col: Column, n: int) -> Column:
    """Distinct character n-grams via sequence+transform (no UDF)."""
    c = F.regexp_replace(col, r"\s+", "")
    return F.when(F.length(c) < n, _nonnull_array(c)).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.length(c) - (n - 1)), lambda i: c.substr(i, F.lit(n)))
        )
    )


def common_integers(col: Column) -> Column:
    return F.array_distinct(F.regexp_extract_all(col, F.lit(r"\d+"), 0))


def sorted_acronym(col: Column) -> Column:
    return _nonnull_array(
        F.array_join(F.array_sort(F.transform(tokens(col), lambda t: F.substring(t, 1, 1))), "")
    )


def array_field(col: Column) -> Column:
    """Each element of an array column is a key (Set fields / tools)."""
    return F.array_distinct(col)


def exact_hash(col: Column) -> Column:
    """md5 of the whole field — equality blocking for long text."""
    return _nonnull_array(F.md5(col))


@dataclass(frozen=True)
class Predicate:
    """A named blocking predicate over one record column."""

    pid: str
    column: str
    keys: Callable[[Column], Column]

    def expr(self) -> Column:
        ks = self.keys(F.col(self.column))
        ks = F.coalesce(ks, F.array())
        return F.transform(ks, lambda k: F.concat(F.lit(self.pid + ":"), k))


def default_predicates(columns: dict[str, str]) -> list[Predicate]:
    """A reasonable starter set; the learner (learn.py) selects a subset.

    columns: logical role -> column name, e.g. {"text": "conv_text",
    "short": "first_user_text", "set": "tools"}.
    """
    preds: list[Predicate] = []
    if "short" in columns:
        c = columns["short"]
        preds += [
            Predicate(f"first_tok({c})", c, first_token),
            Predicate(f"tokens({c})", c, token_field),
            Predicate(f"pre4({c})", c, lambda x: first_n_chars(x, 4)),
            Predicate(f"acronym({c})", c, sorted_acronym),
        ]
    if "text" in columns:
        c = columns["text"]
        preds += [
            Predicate(f"ints({c})", c, common_integers),
            Predicate(f"first2tok({c})", c, first_two_tokens),
        ]
    if "set" in columns:
        c = columns["set"]
        preds += [Predicate(f"arr({c})", c, array_field)]
    return preds


# --------------------------------------------------------------------------
# Blocking map builder
# --------------------------------------------------------------------------


def block_keys_column(predicates: list[Predicate]) -> Column:
    return F.flatten(F.array(*[p.expr() for p in predicates]))


def build_blocking_map(records: DataFrame, predicates: list[Predicate], id_col: str = "conv_id") -> DataFrame:
    """records -> (block_key, record_id), the reference's ``blocking_map``
    table (mysql_example/mysql_example.py:190-196). Distinct mirrors its
    UNIQUE INDEX (mysql_example/mysql_example.py:233-234)."""
    return (
        records.select(F.col(id_col).alias("record_id"), F.explode(block_keys_column(predicates)).alias("block_key"))
        .dropDuplicates(["block_key", "record_id"])
    )


# --------------------------------------------------------------------------
# TF-IDF canopy index predicate (two-pass job; SURVEY §2.3 index predicates)
# --------------------------------------------------------------------------


def tfidf_canopy_keys(
    records: DataFrame,
    column: str,
    id_col: str = "conv_id",
    top_m: int = 3,
    min_df: int = 1,
    max_df_frac: float = 0.2,
) -> DataFrame:
    """Per-record canopy keys = its top-m TF-IDF tokens.

    Pass 1: token document frequencies (one agg). Pass 2: rank tokens per
    record by tf*idf, keep top-m. Tokens above ``max_df_frac`` document
    frequency are stop-worded out (they would create huge, useless blocks —
    the skew source). Mirrors dedupe's TfidfTextCanopyPredicate index build
    (mysql_example/mysql_example.py:202-211 [lib]).
    Returns (block_key, record_id).
    """
    n_docs = records.count()
    records = records.repartition(records.sparkSession.sparkContext.defaultParallelism)
    tok = records.select(F.col(id_col).alias("record_id"), F.explode(F.array_distinct(tokens(F.col(column)))).alias("token"))
    df_counts = tok.groupBy("token").agg(F.count("*").alias("df"))
    df_counts = df_counts.filter((F.col("df") >= min_df) & (F.col("df") <= int(max(1, max_df_frac * n_docs))))
    tf = records.select(F.col(id_col).alias("record_id"), F.explode(tokens(F.col(column))).alias("token")).groupBy(
        "record_id", "token"
    ).agg(F.count("*").alias("tf"))
    scored = tf.join(F.broadcast(df_counts), "token").withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1.0))
    )
    w = Window.partitionBy("record_id").orderBy(F.desc("w"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_m)
        .select(F.concat(F.lit(f"canopy({column})") , F.lit(":"), F.col("token")).alias("block_key"), "record_id")
    )


def minhash_band_keys(
    records: DataFrame,
    column: str,
    id_col: str = "conv_id",
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    shingle: str = "word",
) -> DataFrame:
    """MinHash-band blocking keys: records agreeing on any band of their
    minhash signature share a key. The recall backstop for noisy text where
    token/prefix predicates miss (scattered word drops/typos): with k=32,
    bands=8 (r=4), a pair at word-shingle Jaccard 0.7 bands together with
    p≈0.89 while random pairs rarely collide. This is dedupe's LSH
    index-predicate idea [lib] executed as the same explode/groupBy plan as
    dedup.minhash_lsh_pairs. Returns (block_key, record_id).
    """
    from sparklink.dedup import minhash_signatures

    sigs = minhash_signatures(
        records.select(F.col(id_col), F.col(column)),
        text_col=column,
        id_col=id_col,
        k=k,
        shingle_n=shingle_n,
        shingle=shingle,
    )
    r = k // bands
    band_keys = F.array(
        *[
            F.concat(F.lit(f"mh{b}:"), F.xxhash64(F.slice("sig", b * r + 1, r).cast("array<string>")).cast("string"))
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col).alias("record_id"), F.explode(band_keys).alias("block_key")).dropDuplicates(
        ["block_key", "record_id"]
    )


# --------------------------------------------------------------------------
# Skew control
# --------------------------------------------------------------------------


def cap_block_sizes(blocking_map: DataFrame, max_block_size: int = 200) -> DataFrame:
    """Drop blocks larger than max_block_size (a block of size s yields
    s*(s-1)/2 pairs; one hot key — a ubiquitous token — squares the join).
    dedupe applies the same internal guard [lib]; the north_rule requires it
    explicitly. The oversize list is tiny -> broadcast anti-join."""
    oversized = (
        blocking_map.groupBy("block_key").agg(F.count("*").alias("n")).filter(F.col("n") > max_block_size).select("block_key")
    )
    return blocking_map.join(F.broadcast(oversized), "block_key", "left_anti")


def salt_block_sizes(blocking_map: DataFrame, salt_threshold: int = 64, n_salts: int = 8) -> DataFrame:
    """Alternative to dropping: split a hot block into n_salts sub-blocks.

    Within-sub-block pairs are preserved; cross-sub-block pairs are traded
    for bounded skew (recall loss is measured, not silent — see
    metrics.py). Use for keys between salt_threshold and the hard cap.
    """
    sizes = blocking_map.groupBy("block_key").agg(F.count("*").alias("n"))
    bm = blocking_map.join(F.broadcast(sizes.filter(F.col("n") > salt_threshold)), "block_key", "left")
    return bm.withColumn(
        "block_key",
        F.when(
            F.col("n").isNotNull(),
            F.concat(F.col("block_key"), F.lit("#"), (F.abs(F.hash("record_id")) % n_salts).cast("string")),
        ).otherwise(F.col("block_key")),
    ).drop("n")
