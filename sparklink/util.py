"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_to_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` ONLY if it is
    currently narrower than that — widen, never reshuffle.

    Rationale: byte-small local inputs (and AQE byte-coalesced frames)
    collapse to 1-2 partitions, serializing downstream explode/UDF stages;
    re-spreading them is essential in the sandbox. But a 100 TB parquet scan
    already arrives with thousands of splits — an unconditional
    ``repartition()`` there is a gratuitous full shuffle of the raw input
    (the single biggest avoidable I/O in the deploy path). The partition
    count probe (``df.rdd.getNumPartitions()``) only triggers plan
    translation, never job execution.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
