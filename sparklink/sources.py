"""Source-side utilities (SURVEY §2.1).

read_csv_repair — the reference's ragged-row repair scan
(pgsql_big_dedupe_example/pgsql_big_dedupe_example_init_db.py:51-65):
tab-split lines, drop rows with the wrong column count, transliterate to
ASCII. Spark form: csv reader in DROPMALFORMED mode + cleaning exprs —
malformed rows never reach the pipeline, no Python in the scan.

repair_filters — the DELETE-based data repairs of
mysql_example/mysql_init_db.py:101-119 as composable filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklink.preprocess import fold_accents


def read_csv_repair(
    spark: SparkSession,
    path: str,
    schema,
    sep: str = "\t",
    ascii_fold_cols: list[str] | None = None,
) -> DataFrame:
    """Schema-enforced CSV scan dropping ragged rows; optional ASCII
    transliteration per column (the unidecode step, pgsql init:60)."""
    df = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    for c in ascii_fold_cols or []:
        df = df.withColumn(c, fold_accents(F.col(c)))
    return df


def repair_filters(df: DataFrame, date_col: str | None = None, key_col: str | None = None, key_max_len: int = 9) -> DataFrame:
    """≙ the init-db DELETE/UPDATE repairs: drop short/empty keys, NULLify
    short dates (mysql_example/mysql_init_db.py:101-119)."""
    out = df
    if key_col:
        out = out.filter((F.col(key_col).isNotNull()) & (F.col(key_col) != "") & (F.length(key_col) <= key_max_len))
    if date_col:
        out = out.withColumn(date_col, F.when(F.length(F.col(date_col)) >= 10, F.col(date_col)))
    return out
