"""bench.py driver contract: prints exactly one JSON line with the required
keys. Runs in a subprocess (bench manages its own SparkSessions and stops
them — must not touch the pytest session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_SCALING="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    doc = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in doc, key
    assert doc["unit"] == "sec"
    assert isinstance(doc["queries"], dict) and doc["queries"]
    assert all(isinstance(v, (int, float)) for v in doc["queries"].values())
