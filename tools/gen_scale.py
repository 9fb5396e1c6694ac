#!/usr/bin/env python
"""Scale-up generator: replicate an existing testdata SF directory N times
with key offsets that preserve FK integrity, producing a larger scale
point for bench runs (e.g. sf0.1 x10 -> sf1).

The driver's testdata is read-only, so the output goes to a local dir
(default /root/repo/testdata_sf1, gitignored). Dims (region, nation) are
copied once; fact/bridge tables get per-replica key offsets so join
cardinalities scale linearly, as a real 10x data volume would. events get
offset ids but keep their timestamps (10x concurrent load, same window);
documents/embeddings keep their payloads — replicated text/vectors are
exact duplicates, which is what a dedup pass sees at scale.

Usage: python tools/gen_scale.py [src_dir] [dest_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# table -> {column: offset-base column}  (offset = replica * 10^ceil)
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey", "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventkey"},
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    con = duckdb.connect()
    # offset bases: next power of ten above each key domain so replica
    # keyspaces never collide
    bases: dict[str, int] = {}
    probes = {
        "custkey": ("customer", "c_custkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "partkey": ("part", "p_partkey"),
        "orderkey": ("orders", "o_orderkey"),
        "eventkey": ("events", "event_id"),
        "dockey": ("documents", "doc_id"),
        "veckey": ("embeddings", "vec_id"),
    }
    for base, (table, col) in probes.items():
        hi = con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        p = 1
        while p <= int(hi):
            p *= 10
        bases[base] = p

    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        out = f"{dest}/{t}.parquet"
        if os.path.exists(out):
            print(f"skip {t} (exists)")
            continue
        src_sql = f"read_parquet('{src}/{t}.parquet')"
        if t not in KEYED:
            sql = f"SELECT * FROM {src_sql}"
        else:
            cols = con.execute(f"SELECT * FROM {src_sql} LIMIT 0").df().columns
            exprs = []
            for c in cols:
                if c in KEYED[t]:
                    b = bases[KEYED[t][c]]
                    exprs.append(f"{c} + r.i * {b} AS {c}")
                else:
                    exprs.append(c)
            sql = (
                f"SELECT {', '.join(exprs)} FROM {src_sql}, "
                f"(SELECT unnest(range({factor})) AS i) r"
            )
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, "
            "COMPRESSION ZSTD, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"wrote {t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
