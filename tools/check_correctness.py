#!/usr/bin/env python
"""Self-check harness mimicking the driver's t2 gate: run each declared
query on Spark AND its oracle SQL on DuckDB, compare row count + columns +
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, round floats, stringify, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from orion_spark.plans.queries import ORACLES, QUERIES
    from orion_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures, passed, no_oracle = [], [], []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in ORACLES:
            no_oracle.append(name)
            print(f"SKIP  {name}: no oracle ({len(sdf)} rows, rows-only check)")
            continue
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(
                (name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            )
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            diff_mask = (cs != co).any(axis=1)
            sample = pd.concat(
                [cs[diff_mask].head(3), co[diff_mask].head(3)], keys=["spark", "oracle"]
            )
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch; sample:\n{sample}")
            continue
        passed.append(name)
        print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(
        f"\n== {len(passed)} passed, {len(failures)} failed, "
        f"{len(no_oracle)} rows-only =="
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
