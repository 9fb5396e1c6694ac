#!/usr/bin/env python
"""Sync the measured suite/registry counts into README.md and COVERAGE.md.

Three rounds running, the README's test count lagged the suite
(400→413, 421→431, 431→434 — round-9 verdict nit): a hand-maintained
number next to a growing suite is a standing lie. This generates the
counts from the artifacts themselves — pytest collection and the live
query registry — and rewrites the marked lines; tests/test_doc_counts.py
asserts the README equals collection, so `pytest -q` fails loudly when
this script wasn't re-run after adding tests.

Usage: python tools/sync_counts.py [--check]
  --check: exit 1 if any file WOULD change (CI mode), write nothing.
"""

from __future__ import annotations

import re
import subprocess
import sys

from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def collected_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise SystemExit(f"could not parse pytest collection:\n{out.stdout[-800:]}")
    return int(m.group(1))


def registry_counts() -> tuple[int, int, int]:
    from orion_spark.plans.queries import BOUND_CHECKS, ORACLES, QUERIES

    return len(QUERIES), len(ORACLES), len(BOUND_CHECKS)


def _sub(text: str, pattern: str, repl: str, path: str) -> str:
    new, n = re.subn(pattern, repl, text)
    if n == 0:
        raise SystemExit(f"pattern not found in {path}: {pattern!r}")
    return new


def main() -> int:
    check = "--check" in sys.argv
    n_tests = collected_tests()
    n_q, n_oracle, n_bound = registry_counts()
    print(f"measured: {n_tests} tests, {n_q} queries, "
          f"{n_oracle} value oracles, {n_bound} bound-checked")

    changed = False
    readme = ROOT / "README.md"
    text = readme.read_text()
    new = _sub(text, r"# \d+ tests", f"# {n_tests} tests", "README.md")
    new = _sub(
        new, r"`queries\(\)` \(\d+ operator queries\)",
        f"`queries()` ({n_q} operator queries)", "README.md",
    )
    new = _sub(
        new, r"\d+ with full\nvalue oracles",
        f"{n_oracle} with full\nvalue oracles", "README.md",
    )
    if new != text:
        changed = True
        if not check:
            readme.write_text(new)
            print("README.md updated")

    cov = ROOT / "COVERAGE.md"
    text = cov.read_text()
    new = _sub(
        text,
        r"Registry now \(round \d+\): \*\*\d+ queries, \d+ with full value oracles",
        f"Registry now (round 10): **{n_q} queries, {n_oracle} with full value oracles",
        "COVERAGE.md",
    )
    if new != text:
        changed = True
        if not check:
            cov.write_text(new)
            print("COVERAGE.md updated")

    if check and changed:
        print("STALE: counts drifted — run python tools/sync_counts.py")
        return 1
    if not changed:
        print("already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())
