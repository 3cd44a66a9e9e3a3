"""Smoke gate for the production rehearsal harness.

``tools/rehearse_e2e.py`` is the scale evidence the SCALE.md §21 tables
come from — a silent rot (an API drift in a plan it chains, a broken
stage) would only surface at the next manual sf10 run. This runs the
full chain (melt → xref → run 1 → consolidate → enrich → run 2) in SKEW
mode at sf0.001 in a subprocess (the tool builds its own UI-enabled
session) and checks the report's invariants.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import pytest

# heavyweight suite: deselected from the default driver gate (pytest.ini),
# run builder-side per round close via `pytest tests/ -m slow`
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rehearsal_skew_smoke():
    env = dict(os.environ, SPARK_GRAFT_SKEW="1", SPARK_GRAFT_CPUS="8")
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rehearse_e2e.py"),
         sf_dir],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(report["stages"]) == {
        "melt", "xref", "run1", "consolidate", "enrich", "run2",
    }
    for stage, m in report["stages"].items():
        assert m["wall_sec"] > 0, stage
    # the skew profile fired and found the planted heavy hitter
    assert report["skew_top"][0]["key"] == "mega-1"
    assert report["skew_top"][0]["share_ppm"] > 10000
    # duplicates merged, enrichment produced candidates + expansion,
    # and the incremental delta saw the drift and the external adds
    assert report["merged_ids"] > 0
    assert report["enrich"]["candidates"] > 0
    assert report["enrich"]["internal"] > 0
    assert report["delta_ops_run2"].get("MOD", 0) > 0
    assert report["delta_ops_run2"].get("ADD", 0) > 0
    assert report["entities_run1"] > 0
