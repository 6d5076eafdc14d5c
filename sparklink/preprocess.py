"""Cleaning / normalization expressions — the reference's ``preProcess``.

Reference: ``csv_example/csv_example.py:26-38`` (unidecode -> collapse
whitespace -> strip newlines/quotes -> lower -> empty->None); stricter
variant also deletes ``-'/,:`` punctuation
(``record_linkage_example/record_linkage_example.py:20-37``).

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — no Python in the hot path. Unidecode is approximated by a
``translate`` table covering Latin-1 + Latin-Extended-A accents, which is
the full accent surface the fixtures (and the reference corpora) contain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Latin-1 Supplement + Latin Extended-A fold table (ASCII transliteration).
_ACCENTED = (
    "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝýÿÑñÇçÐðÞþß"
    "ĀāĂăĄąĆćĈĉĊċČčĎďĐđĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĦħĨĩĪīĬĭĮįİıĴĵĶķĹĺĻļĽľŁł"
    "ŃńŅņŇňŌōŎŏŐőŒœŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŦŧŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽž"
)
_PLAIN = (
    "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOOooooooUUUUuuuuYyyNnCcDdTts"
    "AaAaAaCcCcCcCcDdDdEeEeEeEeEeGgGgGgGgHhHhIiIiIiIiIiJjKkLlLlLlLl"
    "NnNnNnOoOoOoEeRrRrRrSsSsSsSsTtTtTtUuUuUuUuUuUuWwYyYZzZzZz"
)
assert len(_ACCENTED) == len(_PLAIN)


def fold_accents(col: Column) -> Column:
    """ASCII transliteration of accented Latin characters (≈ unidecode for
    the character classes the pipeline encounters)."""
    return F.translate(col, _ACCENTED, _PLAIN)


def clean_text(col: Column, strict: bool = False) -> Column:
    """The preProcess chain as one composable expression.

    strict=True additionally removes ``-'/,:`` punctuation
    (record_linkage_example/record_linkage_example.py:29-31).
    Empty after cleaning -> NULL (csv_example/csv_example.py:35-38).
    """
    c = fold_accents(col)
    c = F.regexp_replace(c, r'[\n\r"\']+', " ")
    if strict:
        c = F.regexp_replace(c, r"[-/,:]", " ")
    c = F.lower(F.trim(F.regexp_replace(c, r"\s{2,}", " ")))
    return F.nullif(c, F.lit(""))


def parse_price(col: Column) -> Column:
    """Strip '$' and cast (record_linkage_example/record_linkage_example.py:52-53)."""
    return F.regexp_replace(col, r"^\$", "").cast("double")


def null_if_zero_latlong(lat: Column, lng: Column) -> Column:
    """(lat,lng) struct, NULL when both are 0.0 — the reference's missing
    sentinel (patent_example/patent_example.py:29-32)."""
    return F.when((lat == 0.0) & (lng == 0.0), F.lit(None)).otherwise(
        F.struct(lat.cast("double").alias("lat"), lng.cast("double").alias("lng"))
    )


def set_field(col: Column, sep: str = r"\*\*", drop: str = "none") -> Column:
    """tuple(sorted(x.split('**'))) minus 'none'
    (patent_example/patent_example.py:33-44) as a sorted array column."""
    return F.array_sort(F.filter(F.split(col, sep), lambda x: (x != drop) & (x != "")))


def tokens(col: Column) -> Column:
    """Whitespace/punct tokenization used by token predicates and TF-IDF."""
    return F.filter(F.split(col, r"[^0-9a-z]+"), lambda x: x != "")
