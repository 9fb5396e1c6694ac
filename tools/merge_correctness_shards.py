#!/usr/bin/env python
"""Merge sharded check_correctness --json outputs into one sweep artifact.

Large-scale sweeps (sf0.1: ~250 queries x Spark+DuckDB) are run as N
concurrent shards of the registry (round-robin split, so slow query
families spread across shards) to overlap single-core DuckDB oracle
phases on a many-core box.  This tool reassembles the per-shard records
into a single CORRECTNESS_*.json in canonical registry order, verifies
the union covers the full registry exactly once, and recomputes the
summary counts so the committed artifact is equivalent to a single
end-to-end run of tools/check_correctness.py --json.

Usage: python tools/merge_correctness_shards.py [--note TEXT] OUT.json SHARD.json [...]

--note prepends a run-topology description to the artifact note (e.g. when a
slow shard was killed and re-fanned into sub-shards, say so — the committed
artifact should describe the run that actually happened).
"""

from __future__ import annotations

import json
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    argv = sys.argv[1:]
    note_prefix = ""
    if argv and argv[0] == "--note":
        note_prefix = argv[1] + "; "
        argv = argv[2:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    out_path, shard_paths = argv[0], argv[1:]

    from orion_spark.plans.queries import QUERIES

    merged: dict[str, dict] = {}
    sf_dirs = set()
    for p in shard_paths:
        shard = json.loads(Path(p).read_text())
        sf_dirs.add(shard["sf_dir"])
        for name, rec in shard["results"].items():
            if name in merged:
                print(f"ERROR: {name} present in more than one shard")
                return 1
            merged[name] = rec

    if len(sf_dirs) != 1:
        print(f"ERROR: shards disagree on sf_dir: {sorted(sf_dirs)}")
        return 1
    missing = [q for q in QUERIES if q not in merged]
    extra = [q for q in merged if q not in QUERIES]
    if missing or extra:
        print(f"ERROR: registry mismatch; missing={missing} extra={extra}")
        return 1

    ordered = {q: merged[q] for q in QUERIES}
    hm = sum(1 for v in ordered.values() if v.get("hash_match"))
    bo = sum(1 for v in ordered.values() if v.get("bound_ok"))
    fails = [
        k for k, v in ordered.items()
        if not v.get("hash_match") and not v.get("bound_ok")
        and not (v.get("err") and "rows-only" in str(v["err"]))
    ]
    note = (
        f"{note_prefix}fresh end-to-end sweep, run as {len(shard_paths)} "
        f"concurrent registry shards and merged; "
        f"{hm} hash-match + {bo} bound-checked, {len(fails)} failed"
    )
    Path(out_path).write_text(
        json.dumps({"sf_dir": sf_dirs.pop(), "results": ordered, "note": note},
                   indent=2)
    )
    print(f"wrote {out_path}: {len(ordered)} queries, {note}")
    if fails:
        print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
