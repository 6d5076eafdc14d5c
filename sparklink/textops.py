"""Text analysis operators for training-data pipelines (all Column exprs).

  token_stats     — token count (whitespace + BPE-ish regex), char stats
  quality_score   — length/punct/stopword-ratio heuristic quality
  language_scores — per-language stopword-hit ratios + argmax language id
  fingerprint     — md5 content fingerprint + rolling-hash winnowing

Everything stays in whole-stage codegen (no UDFs) so these run at scan
speed over 100 TB; the winnowing fingerprint uses sequence/transform
array ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparklink.preprocess import tokens

# BPE-ish token regex: words, numbers, or single non-space symbols
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "de", "et", "est", "en", "un", "que", "pour", "dans"],
}


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), 0))


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    toks = tokens(F.lower(c))
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        whitespace_token_count(F.lower(c)).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.length(F.regexp_replace(c, r"[^ ]", "")) + 1).alias("n_words_ws"),
    )


def quality_features(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    digits = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in _STOPWORDS["en"]])))
    return {
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0)),
        "upper_ratio": F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(0.0)),
        "distinct_ratio": F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0)),
        "en_stopword_hits": stop_hits.cast("double"),
    }


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: penalize very short/very
    repetitive/punct-heavy text. Deterministic closed form (documented so
    the DuckDB oracle replicates it exactly)."""
    fx = quality_features(F.col(text_col))
    length_term = F.least(fx["n_tokens"] / F.lit(20.0), F.lit(1.0))
    diversity_term = fx["distinct_ratio"]
    punct_term = F.lit(1.0) - F.least(fx["punct_ratio"] * 4.0, F.lit(1.0))
    score = F.round((length_term * 0.4 + diversity_term * 0.4 + punct_term * 0.2), 6)
    return docs.select(F.col(id_col), *[v.alias(k) for k, v in fx.items()], score.alias("quality"))


def language_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-ratio per language + argmax language id (n-gram-free
    heuristic language ID; ties broken by language code order)."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    cols = [F.col(id_col)]
    for lang, words in sorted(_STOPWORDS.items()):
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        cols.append((hits.cast("double") / F.lit(float(len(words)))).alias(f"score_{lang}"))
    out = docs.select(*cols)
    langs = sorted(_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return out.select(id_col, *[f"score_{lang}" for lang in langs], F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"))


def content_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content md5 fingerprint (whitespace/case-insensitive)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, window: int = 4,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """Winnowing (Schleimer et al. 2003): min hash per sliding window of
    k-gram hashes -> distinct fingerprint set per doc. Array ops only.
    hash_mode='portable' swaps xxhash64 for the engine-portable md5-derived
    60-bit k-gram hash (see sparklink.portable) so a DuckDB oracle
    matches. (A per-char polynomial fold was tried first: at one lambda
    eval per char per gram it is interpreted-expression-bound and ~100x
    slower than native md5 at equal output.)"""
    from sparklink.portable import md5_hash60

    # materialize the normalized text and the gram array as real columns
    # BEFORE the per-element lambdas: an expression inlined into a
    # higher-order-function lambda re-evaluates per element (the
    # regexp_replace would run once per gram -> quadratic in doc length)
    norm = docs.select(
        F.col(id_col), F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")).alias("c")
    )
    c = F.col("c")
    hash_fn = md5_hash60 if hash_mode == "portable" else F.xxhash64
    grams_expr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: hash_fn(c.substr(i, F.lit(k))),
    )
    g = norm.select(F.col(id_col), grams_expr.alias("grams"))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("grams") - window, F.lit(0))),
        lambda i: F.array_min(F.slice("grams", i + 1, window)),
    )
    return g.select(F.col(id_col), F.array_distinct(wins).alias("fingerprints"))
