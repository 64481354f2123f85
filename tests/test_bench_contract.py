"""bench.py is part of the driver contract: one JSON line with
metric/value/unit/queries/sf. Run it at the smallest scale factor."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec"
    assert d["value"] > 0
    assert d["sf"] == 0.001
    assert d["n_queries"] == len(d["queries"]) > 50
    assert all(v >= 0 for v in d["queries"].values())
