"""bench.py supervisor mechanics (VERDICT r3 item 1): the driver must
ALWAYS get one JSON line, under any budget/timeout."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True, timeout=timeout, env=env, cwd=REPO)
    return r


def test_budget_overrun_still_emits_json():
    # 10 s budget cannot even finish setup: the supervisor must kill the
    # child and print the last milestone snapshot with rc 0
    r = _run(["--small", "--budget", "10", "--no-cache"], timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    line = r.stdout.decode().strip().splitlines()[-1]
    d = json.loads(line)
    assert d["extra"]["budget_exceeded"] is True
    assert {"metric", "value", "unit", "vs_baseline"} <= set(d)
