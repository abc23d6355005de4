"""Renderer throughput across configs, via the shared timing harness.

Run from the repo root:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_renderer_scan.py

All timing rules (operands as jit args, serialized scan, value-fetch
barrier, perturbed repeats) live in dpcx/utils/timing.py — do NOT hand-
roll perf_counter loops in scripts; this file is the exemplar.
"""

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.utils.timing import render_throughput_mpts

D, N, B = 64, 8192, 16
pts = jax.random.uniform(
    jax.random.PRNGKey(0), (B, N, 3), minval=-0.4, maxval=0.4
)
quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
sigma = jnp.asarray(0.02)

for name, cfg in [
    (
        "pallas_bf16",
        Config(vox_size=D, renderer="pallas", pallas_acc_dtype="bfloat16"),
    ),
    (
        "pallas_f32",
        Config(vox_size=D, renderer="pallas", pallas_acc_dtype="float32"),
    ),
    ("xla_matmul", Config(vox_size=D, renderer="xla", xla_splat="matmul")),
]:
    for bwd in (False, True):
        mpts = render_throughput_mpts(
            cfg, pts, quat, sigma, iters=100, backward=bwd
        )
        tag = "fwd+bwd" if bwd else "fwd"
        print(f"{name} {tag}: {mpts:.1f} Mpts/s", flush=True)
