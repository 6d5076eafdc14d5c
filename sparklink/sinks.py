"""Result sinks (SURVEY §2.1).

The reference rewrites its input CSV with ``Cluster ID`` and
``confidence_score`` prepended (csv_example/csv_example.py:169-180); the
two-source variant adds ``source file`` and ``Link Score``
(record_linkage_example/record_linkage_example.py:183-211). Here the same
shape is a left join against entity_map and a columnar write — CSV for
parity, parquet for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clustered_output(
    input_df: DataFrame,
    entity_map: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "Cluster ID",
    score_col: str = "confidence_score",
) -> DataFrame:
    """input rows + [Cluster ID, confidence_score] (singletons keep their
    own id and NULL score, matching the reference's unmatched handling)."""
    em = entity_map.select(
        F.col("record_id").alias(id_col),
        F.col("canon_id").alias(cluster_col),
        F.col("cluster_score").alias(score_col),
    )
    return input_df.join(em, id_col, "left").select(cluster_col, score_col, *input_df.columns)


def linked_output(
    left: DataFrame,
    right: DataFrame,
    matches: DataFrame,
    id_col: str = "conv_id",
) -> DataFrame:
    """Two-source output: union of both inputs with [Cluster ID, Link Score,
    source file]; matched cross-source rows share a cluster id
    (record_linkage_example/record_linkage_example.py:183-211)."""
    m = matches.select("id_a", "id_b", F.col("score").alias("Link Score"))
    l = left.withColumn("source file", F.lit("a")).join(
        m.select(F.col("id_a").alias(id_col), F.col("id_a").alias("Cluster ID"), "Link Score"), id_col, "left"
    )
    r = right.withColumn("source file", F.lit("b")).join(
        m.select(F.col("id_b").alias(id_col), F.col("id_a").alias("Cluster ID"), "Link Score"), id_col, "left"
    )
    out = l.unionByName(r)
    # unmatched rows become their own singleton cluster
    return out.withColumn("Cluster ID", F.coalesce(F.col("Cluster ID"), F.col(id_col)))


def money_display(cents) -> F.Column:
    """Locale-style money string from integer cents (the reference's
    display formatting of payoff totals, mysql_example/mysql_example.py:
    330-358 analogue): thousands-grouped dollars + 2-digit cents, built
    from integer arithmetic so it is exact and engine-portable."""
    c = F.col(cents) if isinstance(cents, str) else cents
    return F.concat(
        F.format_number((c - (c % 100)) / F.lit(100), 0),
        F.lit("."),
        F.lpad((c % 100).cast("string"), 2, "0"),
    )


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink; complex columns (arrays/structs) are JSON-encoded since the
    CSV datasource only takes atomics."""
    cols = [
        F.to_json(F.col(f.name)).alias(f.name) if f.dataType.typeName() in ("array", "struct", "map") else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(cols).coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
