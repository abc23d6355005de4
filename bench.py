#!/usr/bin/env python
"""Benchmark: points splatted+projected per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 100 Mpoints/s/chip at 64^3 on TPU v5e.
Measures the full renderer forward (perspective transform -> fused Pallas
splat -> Gaussian blur -> DRC silhouette) on the flagship config shapes:
N=8192 points, D=64 grid.
"""

import json
import time

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render.project import pointcloud_project


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        vox_size=64,
        pc_num_points=8192,
        renderer="pallas" if on_tpu else "xla",
        proj_depth=False,
    )
    B, N = (16, 8192) if on_tpu else (2, 512)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, N, 3), minval=-0.4, maxval=0.4)
    quat = jax.random.normal(jax.random.PRNGKey(1), (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    sigma = jnp.asarray(0.02)

    def run():
        return pointcloud_project(cfg, pts, quat, sigma).silhouette

    # warmup / compile
    run().block_until_ready()
    run().block_until_ready()

    iters = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pts_per_sec = B * N * iters / dt
    mpts = pts_per_sec / 1e6
    print(
        json.dumps(
            {
                "metric": "points_splatted_projected_per_sec_per_chip_64cubed",
                "value": round(mpts, 2),
                "unit": "Mpoints/s",
                "vs_baseline": round(mpts / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
