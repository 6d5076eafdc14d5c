"""Stage checkpointing + metrics/lineage tables (north_star resumability).

Thin catalog: Iceberg when the runtime jar is configured (``writeTo`` +
MERGE paths), else a Parquet-directory warehouse with `_metrics.jsonl` and
`_lineage.jsonl` sidecar tables. The sandbox has no Iceberg jar, so tests
run on the fallback; the API is identical either way (SURVEY §7).

Resumability contract (≙ the reference's settings-file skip,
csv_example/csv_example.py:94-97, generalized per-stage): a stage is
(name, fingerprint). If `<warehouse>/<name>` exists with a matching
fingerprint in the lineage log, the stage re-loads instead of recomputing;
otherwise it computes, writes, and appends lineage (inputs, fingerprint,
row count, per-partition file metrics).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fingerprint(payload: dict) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()[:16]


class Catalog:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        iceberg_catalog: str | None = None,
        namespace: str = "sparklink",
    ):
        """``iceberg_catalog``: name of a configured Iceberg catalog
        (spark.sql.catalog.<name> = org.apache.iceberg...). Strictly
        OPT-IN — never auto-detected from the session conf: a session that
        happens to carry an Iceberg catalog for unrelated tables must not
        silently reroute a warehouse previously written as parquet (the
        lineage would still match while load() reads a non-existent
        Iceberg table — r2 ADVICE). When set, stage tables write through
        ``df.writeTo(<catalog>.<namespace>.<stage>).createOrReplace()``
        (the namespace is created if absent) and load via the same
        identifier, giving snapshot-isolated stages; the jar-less sandbox
        always exercises the Parquet-directory branch (identical API and
        lineage/metrics sidecars either way). The storage backend is
        recorded in lineage, and has_stage() refuses to resume a stage
        written by a DIFFERENT backend."""
        self.spark = spark
        self.warehouse = warehouse
        self.iceberg_catalog = iceberg_catalog
        self.namespace = namespace
        os.makedirs(warehouse, exist_ok=True)
        self._lineage_path = os.path.join(warehouse, "_lineage.jsonl")
        self._metrics_path = os.path.join(warehouse, "_metrics.jsonl")
        self._namespace_ready = False

    @property
    def backend(self) -> str:
        return "iceberg" if self.iceberg_catalog else "parquet"

    def _table_ident(self, name: str) -> str:
        return f"{self.iceberg_catalog}.{self.namespace}.{name}"

    # -- lineage / metrics ---------------------------------------------------
    def _lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append(self, path: str, rec: dict) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def log_metric(self, stage: str, **kv) -> None:
        self._append(self._metrics_path, {"stage": stage, "ts": time.time(), **kv})

    def metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- stage API -------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def has_stage(self, name: str, params: dict) -> bool:
        fp = _fingerprint(params)
        done = {
            r["stage"]: (r["fingerprint"], r.get("backend", "parquet"))
            for r in self._lineage()
            if r.get("event") == "write"
        }
        got = done.get(name)
        # backend mismatch = the stage data lives in the OTHER storage
        # system; resuming would read a missing/stale table — recompute
        return got == (fp, self.backend) and os.path.exists(self.table_path(name))

    def load(self, name: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(self._table_ident(name))
        return self.spark.read.parquet(self.table_path(name))

    def stage(self, name: str, params: dict, compute, partition_by: list[str] | None = None) -> DataFrame:
        """Resume-or-compute. ``compute`` is a thunk -> DataFrame."""
        if self.has_stage(name, params):
            self.log_metric(name, event="resume_hit")
            return self.load(name)
        t0 = time.time()
        df = compute()
        path = self.table_path(name)
        if self.iceberg_catalog:
            if not self._namespace_ready:
                self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.iceberg_catalog}.{self.namespace}")
                self._namespace_ready = True
            w = df.writeTo(self._table_ident(name))
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            # keep the warehouse marker so has_stage's existence check and
            # the file-metrics walk stay uniform across branches
            os.makedirs(path, exist_ok=True)
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(path)
        out = self.load(name)
        n = out.count()
        elapsed = time.time() - t0
        # per-partition file metrics (lineage at file granularity)
        files = []
        for root, _, fs in os.walk(path):
            for fn in fs:
                if fn.endswith(".parquet"):
                    files.append({"file": os.path.relpath(os.path.join(root, fn), path), "bytes": os.path.getsize(os.path.join(root, fn))})
        self._append(
            self._lineage_path,
            {
                "event": "write",
                "stage": name,
                "backend": self.backend,
                "fingerprint": _fingerprint(params),
                "params": params,
                "rows": n,
                "seconds": elapsed,
                "n_files": len(files),
                "files": files[:64],
            },
        )
        self.log_metric(name, event="write", rows=n, seconds=elapsed)
        return out

    def invalidate(self, name: str) -> None:
        """Drop a stage's lineage entry (forces recompute downstream)."""
        rows = [r for r in self._lineage() if not (r.get("stage") == name and r.get("event") == "write")]
        with open(self._lineage_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r, default=str) + "\n")
