"""CLI (`python -m ksoup_ray`): one end-to-end subprocess smoke per
job — the CLI owns its own Ray session, so it must run out-of-process
from the test fixture's session."""

import json
import os
import subprocess
import sys


def test_cli_curate_and_resume(tmp_path):
    out = str(tmp_path / "curated")
    cmd = [sys.executable, "-m", "ksoup_ray", "curate",
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--out", out, "--cpus", "4", "--num-partitions", "4"]
    env = dict(os.environ, RAY_ADDRESS="")
    r1 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd="/root/repo", env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows"] > 0 and s1["resumed"] == []

    r2 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd="/root/repo", env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["resumed"] == [0, 1, 2, 3]
    assert s2["rows"] == s1["rows"]
