"""Small shared DataFrame utilities."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# logical operators that put a shuffle (exchange) under the plan; their
# presence means AQE owns the output partitioning AND that finalizing the
# plan would execute stages. `Repartition n, false` (coalesce) is NOT a
# shuffle and stays probeable.
_SHUFFLE_NODE_RE = re.compile(
    r"(?m)^[\s:+-]*(Aggregate|Join|Window|Sort|Distinct|Deduplicate|"
    r"Repartition \d+, true|RepartitionByExpression|Expand|GlobalLimit|CoGroup|"
    r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|Intersect|Except)(?=[\s\[,]|$)"
)


def _partition_probe_is_free(df: DataFrame) -> bool:
    """True when ``df.rdd`` cannot launch jobs: the frame is cache-backed
    (InMemoryRelation leaf in the consumer plan) or a pure
    scan/filter/projection with no shuffle-inducing operator.

    Under AQE, ``.rdd`` on a shuffle-bearing un-materialized plan calls
    ``getFinalPhysicalPlan()``, which EXECUTES every upstream query stage
    as untracked side jobs — the whole upstream runs once for the probe
    and again for the real action (measured in-session: a groupBy probe
    ran its shuffle job before any user action). In that case the probe
    is not worth it and AQE owns the partitioning anyway.
    """
    try:
        if df.is_cached:
            return True
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - py4j edge
        return False
    # spark.sql.maxPlanStringLength truncates toString(): a shuffle node
    # past the cap would be invisible to the regex, so a near-cap string
    # is treated as unsafe (scan-only plans never get that large)
    if len(plan) >= 90_000:
        return False
    return _SHUFFLE_NODE_RE.search(plan) is None


def widen_to_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` ONLY if it is
    currently narrower than that — widen, never reshuffle.

    Rationale: byte-small local inputs collapse to 1-2 partitions,
    serializing downstream explode/UDF stages; re-spreading them is
    essential in the sandbox. But a 100 TB parquet scan already arrives
    with thousands of splits — an unconditional ``repartition()`` there is
    a gratuitous full shuffle of the raw input (the single biggest
    avoidable I/O in the deploy path).

    The partition-count probe is only taken when it is free
    (:func:`_partition_probe_is_free`): cache-backed or scan-only frames.
    A shuffle-derived, un-materialized frame is returned unchanged — its
    output partitioning is AQE's decision, and probing it would execute
    the upstream as side jobs.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if not _partition_probe_is_free(df):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
