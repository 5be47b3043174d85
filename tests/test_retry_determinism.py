"""Determinism under task retry — the property every sampler/split in
this repo claims ('content-keyed hash, not rand()') proven by actually
killing a task: a run where partition 0's first attempt dies mid-batch
must produce byte-identical selections to a clean run.  rand()-based
sampling would re-draw on the retried attempt and silently diverge —
at 10^12 rows with preemptible executors that is thousands of divergent
tasks per job."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(sf_dir, mode):
    res = subprocess.run(
        [sys.executable, "tests/retry_job.py", sf_dir, mode],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_injected_task_failure_reproduces_identical_output(sf_dir):
    clean = _run(sf_dir, "clean")
    injected = _run(sf_dir, "inject")
    assert clean["n"] > 0
    assert injected == clean  # same rows, same digest
