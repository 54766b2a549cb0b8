"""Soak-harness e2e (tools/soak_train.py, VERDICT r4 #1): tiny family on
CPU — prep fabricates Real-ESRGAN pairs, the parent SIGKILLs the child
mid-run, the resumed child completes, and the analysis verdict is PASS."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_soak_tiny_kill_resume(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools/soak_train.py"),
            "--family", "tiny", "--steps", "6", "--kill_at", "3",
            "--ckpt_every", "2", "--n_pairs", "8",
            "--workdir", str(tmp_path / "soak"),
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    report = (tmp_path / "soak" / "SOAK_REPORT.md").read_text()
    assert "verdict: **PASS**" in report
    assert "planned SIGKILL" in report
    assert "resume_1_continuous | PASS" in report
    # two launches, two metric streams
    assert (tmp_path / "soak" / "metrics_0.jsonl").exists()
    assert (tmp_path / "soak" / "metrics_1.jsonl").exists()
