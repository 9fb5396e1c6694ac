"""Regression tripwire in the canonical-bench-record assembler
(tools/make_bench_record.py): a common query slower than the threshold
vs the previous canonical record must carry an explicit deliberate
declaration or the record is refused — the gate that would have caught
the 4952bac minhash_band_keys 8x regression before the slow spread got
archived unexamined. No Spark involved; pure record arithmetic."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TOOL = REPO / "tools" / "make_bench_record.py"

PREV = {
    "metric": "headline_query_suite_total",
    "value": 10.0,
    "unit": "sec",
    "queries": {"q_fast": 1.0, "q_probe": 3.2, "q_other": 5.8},
    "sf": 0.1,
    "estimator": "median_of_5",
}
# q_probe regressed 8x (the injected 4952bac shape); q_new is new.
FRESH = {
    "metric": "headline_query_suite_total",
    "value": 33.0,
    "unit": "sec",
    "queries": {"q_fast": 1.1, "q_probe": 25.5, "q_other": 5.9, "q_new": 0.5},
    "sf": 0.1,
    "estimator": "median_of_5",
}


def _run(tmp_path, fresh, *extra):
    fp, pp, op = tmp_path / "fresh.json", tmp_path / "prev.json", tmp_path / "out.json"
    fp.write_text(json.dumps(fresh))
    pp.write_text(json.dumps(PREV))
    proc = subprocess.run(
        [sys.executable, str(TOOL), str(fp), str(pp), str(op), *extra],
        capture_output=True, text=True,
    )
    return proc, op


def test_gate_fires_on_undeclared_regression(tmp_path):
    proc, out = _run(tmp_path, FRESH)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "REGRESSION GATE" in proc.stdout and "q_probe" in proc.stdout
    assert not out.exists(), "record must not be written on gate failure"


def test_declared_regression_passes_and_is_recorded(tmp_path):
    proc, out = _run(
        tmp_path, FRESH, "--declare", "q_probe=measured scale rationale"
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(out.read_text())
    comp = rec["comparison"]
    assert comp["deliberate_plan_changes"] == {
        "q_probe": "measured scale rationale"
    }
    gate = comp["regression_gate"]
    assert gate["threshold"] == 1.5
    assert list(gate["over_threshold"]) == ["q_probe"]
    assert gate["over_threshold"]["q_probe"]["ratio"] == 7.97
    assert comp["new_queries_this_round"] == ["q_new"]


def test_clean_run_writes_record_without_declarations(tmp_path):
    clean = dict(FRESH, queries=dict(FRESH["queries"], q_probe=3.3))
    proc, out = _run(tmp_path, clean)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(out.read_text())
    assert rec["comparison"]["regression_gate"]["over_threshold"] == {}
    assert "deliberate_plan_changes" not in rec["comparison"]


def test_unknown_declaration_is_surfaced(tmp_path):
    clean = dict(FRESH, queries=dict(FRESH["queries"], q_probe=3.3))
    proc, out = _run(tmp_path, clean, "--declare", "q_typo=whoops")
    assert proc.returncode == 0
    rec = json.loads(out.read_text())
    assert rec["comparison"]["regression_gate"]["unknown_declarations"] == ["q_typo"]
