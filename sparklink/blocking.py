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
from sparklink.util import widen_to_parallelism

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
    # array_distinct makes the per-record key set unique BEFORE the explode:
    # the (block_key, record_id) relation is then distinct by construction
    # (keys can only repeat within one record — across records the
    # record_id differs), so no global dropDuplicates shuffle is needed
    # downstream (guide §2.4: remove shuffles outright). Per-predicate key
    # arrays are already distinct for every predicate in the catalog; the
    # array_distinct also guards custom predicates and cross-predicate
    # pid collisions at per-row cost instead of a full exchange.
    return F.array_distinct(F.flatten(F.array(*[p.expr() for p in predicates])))


def build_blocking_map(records: DataFrame, predicates: list[Predicate], id_col: str = "conv_id") -> DataFrame:
    """records -> (block_key, record_id), the reference's ``blocking_map``
    table (mysql_example/mysql_example.py:190-196). Uniqueness mirrors its
    UNIQUE INDEX (mysql_example/mysql_example.py:233-234) and is enforced
    per row (array_distinct in block_keys_column) rather than with a
    global dropDuplicates — one less full shuffle of the map, identical
    relation."""
    return records.select(
        F.col(id_col).alias("record_id"), F.explode(block_keys_column(predicates)).alias("block_key")
    )


def blocking_stats(blocking_map: DataFrame, key_col: str = "block_key", id_col: str = "record_id") -> DataFrame:
    """Per-predicate blocking report: how many keys each predicate emits,
    how many (key, record) entries, the largest block, and the candidate
    pairs the predicate implies (sum over blocks of n*(n-1)/2) — the
    numbers a user reads before letting a predicate loose on 100 TB (the
    reference tunes predicates by eyeballing exactly these counts on the
    blocking_map table, mysql_example/mysql_example.py:190-234).

    Predicate = the namespace prefix ``build_blocking_map`` bakes into
    every key (``<pid>:<value>``). Two map-side-combining aggregations
    (per key, then per namespace) — no driver-side state at any scale;
    pair counts use integer arithmetic (n DIV 2 after n*(n-1)) so they
    stay exact past 2^53 where doubles would drift."""
    per_key = blocking_map.groupBy(key_col).agg(F.count(id_col).alias("n"))
    return (
        per_key.withColumn("predicate", F.split_part(F.col(key_col), F.lit(":"), F.lit(1)))
        .groupBy("predicate")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("n").alias("n_entries"),
            F.max("n").alias("max_block"),
            F.sum(F.expr("n * (n - 1) DIV 2")).alias("n_candidate_pairs"),
        )
    )


# --------------------------------------------------------------------------
# Shared token-stats frame: canopy keys, minhash band keys, and the
# scorer's tf-idf vectors all derive from ONE token explode + aggregation
# (r1 bench: three separate explode jobs over the same conv_text were 56%
# of pipeline wall time; this collapses them into one shared shuffle)
# --------------------------------------------------------------------------


def token_stats(records: DataFrame, column: str, id_col: str = "conv_id") -> tuple[DataFrame, DataFrame, DataFrame]:
    """ONE tokenization over ``column`` -> (toks, tf, dfreq):
    toks(record_id, toks array<string>) — the materialized ordered token
    array (shingle builders derive from it without re-tokenizing);
    tf(record_id, token, tf); dfreq(token, df). Persist toks and tf at the
    call site when more than one consumer derives from them.

    Lowercases before tokenizing: tokens() splits on [^0-9a-z]+, so
    uppercase letters would act as separators and mangle tokens/shingles
    for any caller whose column is not pre-lowercased (r2 ADVICE — the
    pipeline's conv_text happens to be lowered by clean_text, which masked
    this for other callers). Idempotent on already-lowered input."""
    recs = widen_to_parallelism(records)
    toks = recs.select(F.col(id_col).alias("record_id"), tokens(F.lower(F.col(column))).alias("toks"))
    tf = (
        toks.select("record_id", F.explode("toks").alias("token"))
        .groupBy("record_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    return toks, tf, dfreq


def partitioned_token_stats(
    records: DataFrame, column: str, id_col: str = "conv_id"
) -> tuple[DataFrame, DataFrame]:
    """(toks, tf) persisted HASH-PARTITIONED BY record_id and eagerly
    materialized — the r6 layout both the batch pipeline and the
    gazetteer index build share.

    Partitioning the token arrays BEFORE the explode means the
    (record, token) tf aggregate, the per-record vocab collect
    (record_token_vocab) and the minhash band k-min aggregate all satisfy
    their clustered distributions from the cache and add no exchange:
    the one exchange moves ~n_records array rows instead of shuffling the
    exploded token rows (~30-200x more of them) once per consumer. The
    eager counts matter — an unmaterialized AQE-cached plan reports
    unknown partitioning, and consumers planned against it would
    re-insert the exchanges. Callers own unpersisting both frames.
    """
    toks = records.select(
        F.col(id_col).alias("record_id"), tokens(F.lower(F.col(column))).alias("toks")
    ).repartition("record_id")
    toks = toks.persist()
    toks.count()
    ex = toks.select("record_id", F.explode("toks").alias("token"))
    tf = ex.groupBy("record_id", "token").agg(F.count("*").alias("tf"))
    tf = tf.persist()
    tf.count()
    return toks, tf


def record_token_vocab(tf: DataFrame, dfreq: DataFrame) -> DataFrame:
    """(record_id, vocab array<struct<token,tf,df>>): each record's token
    stats collected into ONE row — the shared base for canopy keys and the
    scorer's tf-idf arrays.

    Why: both consumers rank a record's tokens by tf*idf, which the r1-r5
    shape did with a window (partitionBy record_id + sort) EACH — two
    full shuffles + sorts of the (record, token) frame. Collecting once
    per record (one exchange, hash aggregate, no sort) and ranking
    array-side replaces both (guide §2.4: operations keyed the same way
    share one exchange). Selection and weights are bit-identical: the
    array comparators replicate the windows' (w desc, token asc) order.
    """
    return (
        tf.join(F.broadcast(dfreq), "token")
        .groupBy("record_id")
        .agg(F.collect_list(F.struct("token", "tf", "df")).alias("vocab"))
    )


def tfidf_canopy_keys_from_vocab(
    vocab: DataFrame,
    n_docs: int,
    column_label: str,
    top_m: int = 3,
    min_df: int = 1,
    max_df_frac: float = 0.2,
) -> DataFrame:
    """Canopy keys from the collected per-record vocab (no window, no new
    shuffle): filter df bounds, weight by tf*idf, sort (w desc, token asc),
    keep top_m — the exact selection tfidf_canopy_keys_from_stats makes
    with its window."""
    max_df = int(max(1, max_df_frac * n_docs))
    eligible = F.filter("vocab", lambda s: (s["df"] >= min_df) & (s["df"] <= max_df))
    wt = F.transform(
        eligible,
        lambda s: F.struct(
            s["token"].alias("token"),
            (s["tf"] * F.log(F.lit(float(n_docs + 1)) / (s["df"] + 1.0))).alias("w"),
        ),
    )
    ranked = F.array_sort(
        wt,
        lambda a, b: F.when(a["w"] > b["w"], -1)
        .when(a["w"] < b["w"], 1)
        .otherwise(F.when(a["token"] < b["token"], -1).when(a["token"] > b["token"], 1).otherwise(0)),
    )
    keys = F.transform(
        F.slice(ranked, 1, top_m),
        lambda s: F.concat(F.lit(f"canopy({column_label})"), F.lit(":"), s["token"]),
    )
    return vocab.select("record_id", F.explode(keys).alias("block_key"))


def tfidf_canopy_keys_from_stats(
    tf: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    column_label: str,
    top_m: int = 3,
    min_df: int = 1,
    max_df_frac: float = 0.2,
) -> DataFrame:
    """Canopy keys from a shared token-stats frame (no new explode)."""
    d = dfreq.filter((F.col("df") >= min_df) & (F.col("df") <= int(max(1, max_df_frac * n_docs))))
    scored = tf.join(F.broadcast(d), "token").withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1.0))
    )
    w = Window.partitionBy("record_id").orderBy(F.desc("w"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_m)
        .select(
            F.concat(F.lit(f"canopy({column_label})"), F.lit(":"), F.col("token")).alias("block_key"), "record_id"
        )
    )


def minhash_band_keys_from_tokens(
    toks: DataFrame, k: int = 32, bands: int = 8, shingle_n: int = 3
) -> DataFrame:
    """MinHash band keys over word n-gram shingles, derived from the shared
    materialized token-array frame (blocking.token_stats) — identical
    semantics to minhash_band_keys but with no re-tokenization pass.

    Word-shingle (not token-set) minhash is deliberate: token-set bands at
    equal (k, bands) collide far more readily — measured 5.8x the candidate
    pairs at the bench corpus for the same F1 — so shingles are the right
    precision point for the recall-backstop role; the cost of their explode
    is small once the token array is already materialized.
    Returns (block_key, record_id).
    """
    from sparklink.dedup import _MERSENNE, _perm_params, word_shingles_from_tokens

    r = k // bands
    sh = toks.select(
        "record_id", F.explode(word_shingles_from_tokens(F.col("toks"), shingle_n)).alias("s")
    ).select("record_id", (F.abs(F.xxhash64("s")) % F.lit(_MERSENNE)).alias("x"))
    mins = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(k))
    ]
    sigs = sh.groupBy("record_id").agg(*mins).select(
        "record_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )
    band_keys = F.array(
        *[
            F.concat(F.lit(f"mh{b}:"), F.xxhash64(F.slice("sig", b * r + 1, r).cast("array<string>")).cast("string"))
            for b in range(bands)
        ]
    )
    # one band key per (record, band) with a distinct 'mh<band>:' prefix —
    # the (block_key, record_id) relation is distinct by construction, so
    # the former dropDuplicates was a no-op shuffle (guide §2.4)
    return sigs.select(F.col("record_id"), F.explode(band_keys).alias("block_key"))


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
    records = widen_to_parallelism(records)
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
    explicitly. The oversize list is tiny -> broadcast anti-join.

    Plan contract: the input is read TWICE (the sizes aggregate and the
    anti-join probe). Callers whose map is an expensive plan should
    persist/stage it first (pipeline.blocking_map does). This shape is
    deliberate over a count-over-window filter: the groupBy combines
    map-side so a degenerate hot key never ships its rows to one task,
    whereas a window would shuffle the entire hot block to a single
    partition — the exact skew this cap exists to remove."""
    oversized = (
        blocking_map.groupBy("block_key").agg(F.count("*").alias("n")).filter(F.col("n") > max_block_size).select("block_key")
    )
    return blocking_map.join(F.broadcast(oversized), "block_key", "left_anti")


def salt_block_sizes(blocking_map: DataFrame, salt_threshold: int = 64, n_salts: int = 8) -> DataFrame:
    """Alternative to dropping: split a hot block into n_salts sub-blocks.

    Within-sub-block pairs are preserved; cross-sub-block pairs are traded
    for bounded skew (recall loss is measured, not silent — see
    metrics.py). Use for keys between salt_threshold and the hard cap.
    Same plan contract as cap_block_sizes: the input is read twice
    (sizes aggregate + salt join) — persist or stage an expensive map
    before calling.
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
