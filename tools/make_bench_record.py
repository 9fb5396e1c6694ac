#!/usr/bin/env python
"""Assemble the round's canonical local bench record with its comparison
block (the one-canonical-record discipline, round 9): take the fresh
bench JSON line, pair it against the previous round's canonical record
on the common-query basis, name new queries and their cost, and write
BENCH_local_r{N}.json.

Usage: python tools/make_bench_record.py <fresh_bench.json> <prev_record.json> <out.json>
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    fresh_path, prev_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    fresh = json.load(open(fresh_path))
    prev = json.load(open(prev_path))
    fq, pq = fresh["queries"], prev["queries"]
    common = sorted(set(fq) & set(pq))
    new = sorted(set(fq) - set(pq))
    basis_new = round(sum(fq[q] for q in common), 3)
    basis_old = round(sum(pq[q] for q in common), 3)
    worst = max(common, key=lambda q: fq[q] / pq[q] if pq[q] else 0)
    fresh["comparison"] = {
        "pairing": (
            f"{out_path.rsplit('/', 1)[-1]} vs "
            f"{prev_path.rsplit('/', 1)[-1]} (the canonical local record of "
            f"each round; different boots, same harness, "
            f"{fresh.get('estimator', 'median')} per query)"
        ),
        "common_queries": len(common),
        "common_basis_sec_now": basis_new,
        "common_basis_sec_prev": basis_old,
        "ratio_now_over_prev": round(basis_new / basis_old, 2) if basis_old else None,
        "worst_common_query": {
            "name": worst,
            "now_sec": fq[worst],
            "prev_sec": pq[worst],
            "ratio": round(fq[worst] / pq[worst], 2),
        },
        "new_queries_this_round": new,
        "new_queries_cost_sec": round(sum(fq[q] for q in new), 2),
        "dropped_queries": sorted(set(pq) - set(fq)),
    }
    with open(out_path, "w") as fh:
        json.dump(fresh, fh, indent=1)
    print(json.dumps(fresh["comparison"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
