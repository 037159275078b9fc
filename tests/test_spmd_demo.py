"""The full-CLI SPMD orchestration demo at micro scale (VERDICT r4 #5).

Runs tools/run_spmd_demo.py — the real `run.py` twice in subprocesses:
stage-1 data-parallel over 8 virtual devices, then the stage-2
continuation with guidance tensor-parallelism on a (data=4, model=2)
mesh — asserting on the mesh lines, checkpoints, and eval records. The
script itself raises on any missing piece, so the test body is one call.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spmd_demo_micro(tmp_path):
    out = tmp_path / "demo"
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/run_spmd_demo.py"),
         str(out), "--iters1", "8", "--iters2", "4", "--n_rand", "128"],
        check=True, cwd=ROOT, timeout=3000)
    rep = json.load(open(out / "spmd_demo.json"))
    assert rep["devices"] == 8 and rep["tp"] == 2
    assert rep["s1"]["iter"] == 8 and rep["s2"]["iter"] == 12
