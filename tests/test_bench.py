"""bench.py is the driver's per-round deliverable — guard that its
entrypoint stays runnable (the TPU extras are exercised on hardware; the
CPU path must still produce the one-line JSON record)."""

import json
import subprocess
import sys


def test_bench_cpu_headline(tmp_path):
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["metric"].startswith("points_splatted_projected")
    assert rec["unit"] == "Mpoints/s"
    assert rec["value"] > 0
    assert "vs_baseline" in rec
