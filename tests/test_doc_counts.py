"""README/COVERAGE count drift guard (round-9 verdict: the README test
count lagged the suite three rounds running — 400→413, 421→431,
431→434). The suite now refuses to pass with a stale README: the claimed
counts must equal pytest's own collection and the live registry.
Regenerate with `python tools/sync_counts.py`."""

import re
import subprocess
import sys

from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_readme_counts_match_reality():
    readme = (ROOT / "README.md").read_text()
    m = re.search(r"# (\d+) tests", readme)
    assert m, "README lost its '# N tests' marker"
    claimed_tests = int(m.group(1))

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    cm = re.search(r"(\d+) tests collected", out.stdout)
    assert cm, f"collection failed:\n{out.stdout[-500:]}"
    assert claimed_tests == int(cm.group(1)), (
        f"README claims {claimed_tests} tests, collection finds "
        f"{cm.group(1)} — run python tools/sync_counts.py"
    )


def test_readme_and_coverage_query_counts_match_registry():
    from orion_spark.plans.queries import ORACLES, QUERIES

    readme = (ROOT / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) operator queries\)", readme)
    assert m and int(m.group(1)) == len(QUERIES), (
        f"README operator-query count != {len(QUERIES)} — "
        "run python tools/sync_counts.py"
    )
    mo = re.search(r"(\d+) with full\nvalue oracles", readme)
    assert mo and int(mo.group(1)) == len(ORACLES)

    cov = (ROOT / "COVERAGE.md").read_text()
    c = re.search(
        r"Registry now \(round \d+\): \*\*(\d+) queries, (\d+) with full "
        r"value oracles", cov,
    )
    assert c and (int(c.group(1)), int(c.group(2))) == (
        len(QUERIES), len(ORACLES)
    ), "COVERAGE.md registry counts stale — run python tools/sync_counts.py"
