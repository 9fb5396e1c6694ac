#!/usr/bin/env python
"""Assemble the round's canonical local bench record with its comparison
block (the one-canonical-record discipline, round 9): take the fresh
bench JSON line, pair it against the previous round's canonical record
on the common-query basis, name new queries and their cost, and write
BENCH_local_r{N}.json.

Regression tripwire (round 11): any common query slower than
--threshold (default 1.5x) versus the previous canonical record FAILS
the assembly unless it carries an explicit --declare entry — the check
that would have caught the 4952bac minhash_band_keys 8x regression
before the slow spread got archived unexamined. Declared entries are
recorded verbatim as comparison.deliberate_plan_changes, so every
accepted slowdown is named, measured, and justified inside the artifact
itself.

Usage:
  python tools/make_bench_record.py <fresh_bench.json> <prev_record.json> <out.json> \
      [--threshold 1.5] [--declare "query=reason" ...]
"""

from __future__ import annotations

import json
import sys


def assemble(
    fresh: dict,
    prev: dict,
    out_name: str,
    prev_name: str,
    threshold: float = 1.5,
    declared: dict[str, str] | None = None,
) -> tuple[dict, list[str]]:
    """Build the record + comparison block. Returns (record, violations);
    violations is the list of common queries beyond `threshold` with no
    deliberate_plan_changes declaration — callers must not write the
    record if it is non-empty."""
    declared = declared or {}
    fq, pq = fresh["queries"], prev["queries"]
    common = sorted(set(fq) & set(pq))
    new = sorted(set(fq) - set(pq))
    basis_new = round(sum(fq[q] for q in common), 3)
    basis_old = round(sum(pq[q] for q in common), 3)
    worst = max(common, key=lambda q: fq[q] / pq[q] if pq[q] else 0)
    regressed = [
        q for q in common if pq[q] and fq[q] / pq[q] > threshold
    ]
    violations = [q for q in regressed if q not in declared]
    unused = sorted(set(declared) - set(fq))
    fresh["comparison"] = {
        "pairing": (
            f"{out_name} vs {prev_name} (the canonical local record of "
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
        "regression_gate": {
            "threshold": threshold,
            "checked": len(common),
            "over_threshold": {
                q: {
                    "now_sec": fq[q],
                    "prev_sec": pq[q],
                    "ratio": round(fq[q] / pq[q], 2),
                }
                for q in regressed
            },
        },
    }
    if declared:
        fresh["comparison"]["deliberate_plan_changes"] = {
            q: declared[q] for q in sorted(declared) if q in fq
        }
    if unused:
        fresh["comparison"]["regression_gate"]["unknown_declarations"] = unused
    return fresh, violations


def main() -> int:
    argv = sys.argv[1:]
    threshold = 1.5
    declared: dict[str, str] = {}
    pos: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--threshold":
            threshold = float(argv[i + 1]); i += 2
        elif argv[i] == "--declare":
            name, _, reason = argv[i + 1].partition("=")
            if not reason:
                print(f"--declare wants query=reason, got {argv[i + 1]!r}")
                return 2
            declared[name] = reason; i += 2
        else:
            pos.append(argv[i]); i += 1
    fresh_path, prev_path, out_path = pos[0], pos[1], pos[2]
    fresh = json.load(open(fresh_path))
    prev = json.load(open(prev_path))
    record, violations = assemble(
        fresh, prev,
        out_path.rsplit("/", 1)[-1], prev_path.rsplit("/", 1)[-1],
        threshold, declared,
    )
    if violations:
        gate = record["comparison"]["regression_gate"]["over_threshold"]
        print(
            f"REGRESSION GATE: {len(violations)} common quer"
            f"{'y' if len(violations) == 1 else 'ies'} beyond {threshold}x "
            f"with no --declare entry — record NOT written:"
        )
        for q in violations:
            g = gate[q]
            print(f"  {q}: {g['prev_sec']}s -> {g['now_sec']}s ({g['ratio']}x)")
        print(
            "Either fix the regression, or declare it deliberately:\n"
            f'  --declare "{violations[0]}=<measured scale rationale>"'
        )
        return 1
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record["comparison"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
