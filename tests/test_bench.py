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


def test_roofline_statement():
    """The roofline/MFU statement (VERDICT r4 item 6) is self-consistent:
    flop model counted from the kernel's real matmul shapes, achieved
    TFLOP/s derived from the throughput, compute-bound at the flagship
    shapes (the grid never round-trips HBM)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    import bench
    from dpcx.config import Config

    cfg = Config(vox_size=64, pc_num_points=16384)
    pts, quat = bench._inputs(48, 16384)
    r = bench.roofline(cfg, pts, quat, mpts=325.0)
    assert r["bound"] == "compute"
    assert 0 < r["mfu_call_pct"] < 100
    assert r["mfu_kernel_pct"] > r["mfu_call_pct"]
    assert r["splat_trips"] > 0
    # blur alone is ~0.57 GFLOP/sample at D=64 -> > 27 GFLOP/call
    assert r["mxu_gflops_per_call"] > 27
    # achieved = flops / (B*N / mpts): recompute to guard the arithmetic
    t_call = 48 * 16384 / (325.0 * 1e6)
    expect = r["mxu_gflops_per_call"] / 1e3 / t_call
    assert abs(r["achieved_tflops"] - expect) / expect < 0.01
