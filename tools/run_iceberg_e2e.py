"""Driver script for tools/bootstrap_iceberg.sh: exercises the Iceberg
branch of checkpoints.Catalog end-to-end on a session whose classpath
carries the runtime jar (stage write via writeTo/createOrReplace, resume,
backend-recorded lineage) — the executable form of the jar-gated pytest
skip (tests/test_round3.py::test_catalog_iceberg_branch_end_to_end)."""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparklink.checkpoints import Catalog  # noqa: E402
from sparklink.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="sparklink-iceberg-e2e")
    wh = tempfile.mkdtemp(prefix="sparklink_ice_stage_")
    cat = Catalog(spark, wh, iceberg_catalog="ice")
    params = {"p": 3}
    df = cat.stage("s_ice", params, lambda: spark.range(7))
    assert df.count() == 7, "stage write/load through the Iceberg catalog"
    assert cat.has_stage("s_ice", params), "lineage fingerprint recorded"
    assert cat.load("s_ice").count() == 7
    writes = [r for r in cat._lineage() if r.get("event") == "write"]
    assert writes and all(r["backend"] == "iceberg" for r in writes), writes
    # resume path: same params -> load, no recompute
    df2 = cat.stage("s_ice", params, lambda: (_ for _ in ()).throw(AssertionError("must resume")))
    assert df2.count() == 7
    print(json.dumps({"iceberg_e2e": "pass", "warehouse": wh, "stages": len(writes)}))


if __name__ == "__main__":
    main()
