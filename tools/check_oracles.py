"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if "datetime" in dt:
            df[c] = pd.to_datetime(df[c], utc=True).astype("datetime64[us, UTC]").astype(str)
        elif "float" in dt:
            v = df[c].astype("float64").round(6)
            if len(v) and v.notna().all() and (v % 1 == 0).all():
                v = v.astype("int64")
            df[c] = v
        elif "int" in dt or "bool" in dt:
            df[c] = df[c].astype("int64")
        else:
            # DuckDB HUGEINT (sum of BIGINT) arrives as object dtype
            coerced = pd.to_numeric(df[c], errors="coerce")
            if coerced.notna().all() and len(df):
                if (coerced % 1 == 0).all():
                    df[c] = coerced.astype("int64")
                else:
                    df[c] = coerced.astype("float64").round(6)
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from sparklink.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        try:
            want = con.execute(os_[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns differ: spark={list(g.columns)} duck={list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: row counts differ: spark={len(g)} duck={len(w)}")
            failures += 1
            continue
        eq = g.equals(w)
        if not eq:
            diff_mask = (g != w) & ~(g.isna() & w.isna())
            ndiff = int(diff_mask.any(axis=1).sum())
            print(f"[FAIL] {name}: {ndiff}/{len(g)} rows differ")
            idx = diff_mask.any(axis=1)
            print("spark:", g[idx].head(3).to_dict("records"))
            print("duck :", w[idx].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"[OK]   {name}: {len(g)} rows match")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
